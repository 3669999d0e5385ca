/* Host-build shims for the ESP-IDF APIs used by libreasr_client.c.
 * Just enough surface to compile and unit-test the firmware's protocol
 * logic on a dev machine (tests/test_esp32_host.py) — NOT an emulator.
 */
#ifndef LIBREASR_IDF_SHIM_H
#define LIBREASR_IDF_SHIM_H

#include <stddef.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef int esp_err_t;
#define ESP_OK 0
#define ESP_ERROR_CHECK(x)                                       \
  do {                                                           \
    esp_err_t err_ = (x);                                        \
    if (err_ != ESP_OK) {                                        \
      fprintf(stderr, "ESP_ERROR_CHECK failed: %d\n", err_);     \
      exit(1);                                                   \
    }                                                            \
  } while (0)

#define ESP_LOGI(tag, fmt, ...) \
  fprintf(stderr, "I (%s) " fmt "\n", tag, ##__VA_ARGS__)

/* glibc has no strnstr (BSD); the firmware uses it for voice commands */
static inline const char *strnstr(const char *h, const char *n, size_t len) {
  size_t nl = strlen(n);
  if (!nl) return h;
  for (size_t i = 0; i + nl <= len; i++)
    if (h[i] == n[0] && memcmp(h + i, n, nl) == 0) return h + i;
  return NULL;
}

/* ---- freertos ---- */
#define portMAX_DELAY 0xffffffffu
#define portTICK_PERIOD_MS 1
typedef uint32_t TickType_t;
typedef void (*TaskFunction_t)(void *);
int xTaskCreate(TaskFunction_t fn, const char *name, int stack, void *arg,
                int prio, void *handle);
void vTaskDelay(TickType_t ticks);

/* ---- freertos queue ---- */
typedef struct queue_s *QueueHandle_t;
QueueHandle_t xQueueCreate(int len, size_t item_sz);
int xQueueSend(QueueHandle_t q, const void *item, TickType_t timeout);
int xQueueReceive(QueueHandle_t q, void *item, TickType_t timeout);

/* ---- gpio ---- */
typedef int gpio_num_t;
#define GPIO_NUM_22 22
#define GPIO_INTR_DISABLE 0
#define GPIO_MODE_OUTPUT 1
typedef struct {
  int intr_type;
  int mode;
  uint64_t pin_bit_mask;
} gpio_config_t;
esp_err_t gpio_config(const gpio_config_t *cfg);
esp_err_t gpio_set_level(gpio_num_t gpio, int level);

/* ---- i2s ---- */
typedef struct i2s_chan_s *i2s_chan_handle_t;
typedef struct { int id, role; } i2s_chan_config_t;
typedef struct { int mclk, bclk, ws, dout, din; } i2s_std_gpio_config_t;
typedef struct { int sample_rate_hz; } i2s_std_clk_config_t;
typedef struct { int data_bit_width, slot_mode; } i2s_std_slot_config_t;
typedef struct {
  i2s_std_clk_config_t clk_cfg;
  i2s_std_slot_config_t slot_cfg;
  i2s_std_gpio_config_t gpio_cfg;
} i2s_std_config_t;
#define I2S_NUM_0 0
#define I2S_ROLE_MASTER 0
#define I2S_GPIO_UNUSED (-1)
#define GPIO_NUM_25 25
#define GPIO_NUM_26 26
#define GPIO_NUM_33 33
#define I2S_DATA_BIT_WIDTH_16BIT 16
#define I2S_SLOT_MODE_MONO 1
#define I2S_SLOT_MODE_STEREO 2
#define I2S_CHANNEL_DEFAULT_CONFIG(num, role) {(num), (role)}
#define I2S_STD_CLK_DEFAULT_CONFIG(rate) {(rate)}
#define I2S_STD_MSB_SLOT_DEFAULT_CONFIG(w, m) {(w), (m)}
esp_err_t i2s_new_channel(const i2s_chan_config_t *cfg,
                          i2s_chan_handle_t *tx, i2s_chan_handle_t *rx);
esp_err_t i2s_channel_init_std_mode(i2s_chan_handle_t ch,
                                    const i2s_std_config_t *cfg);
esp_err_t i2s_channel_enable(i2s_chan_handle_t ch);
esp_err_t i2s_channel_read(i2s_chan_handle_t ch, void *dst, size_t len,
                           size_t *got, TickType_t timeout);

/* ---- event loop / log tags ---- */
typedef const char *esp_event_base_t;
typedef void (*esp_event_handler_t)(void *, esp_event_base_t, int32_t, void *);
esp_err_t esp_event_loop_create_default(void);
#define ESP_EVENT_ANY_ID (-1)
#define WIFI_EVENT "WIFI_EVENT"
enum { WIFI_EVENT_STA_DISCONNECTED = 5 };
esp_err_t esp_event_handler_register(esp_event_base_t base, int32_t id,
                                     esp_event_handler_t handler, void *arg);

/* ---- websocket client ---- */
typedef struct ws_client_s *esp_websocket_client_handle_t;
typedef struct { const char *uri; } esp_websocket_client_config_t;
typedef struct {
  const char *data_ptr;
  int data_len;
  int op_code;
} esp_websocket_event_data_t;
enum {
  WEBSOCKET_EVENT_ANY = -1,
  WEBSOCKET_EVENT_ERROR = 1,
  WEBSOCKET_EVENT_CONNECTED = 2,
  WEBSOCKET_EVENT_DATA = 3,
  WEBSOCKET_EVENT_DISCONNECTED = 4,
};
esp_websocket_client_handle_t esp_websocket_client_init(
    const esp_websocket_client_config_t *cfg);
esp_err_t esp_websocket_register_events(esp_websocket_client_handle_t c,
                                        int ev, esp_event_handler_t h,
                                        void *arg);
esp_err_t esp_websocket_client_start(esp_websocket_client_handle_t c);
int esp_websocket_client_is_connected(esp_websocket_client_handle_t c);
int esp_websocket_client_send_bin(esp_websocket_client_handle_t c,
                                  const char *data, int len,
                                  TickType_t timeout);

/* ---- wifi / nvs / netif ---- */
typedef struct { int _x; } wifi_init_config_t;
typedef struct {
  struct { uint8_t ssid[32]; uint8_t password[64]; } sta;
} wifi_config_t;
#define WIFI_INIT_CONFIG_DEFAULT() {0}
#define WIFI_MODE_STA 1
#define WIFI_IF_STA 0
typedef int wifi_mode_t;
typedef int wifi_interface_t;
esp_err_t nvs_flash_init(void);
esp_err_t esp_netif_init(void);
void *esp_netif_create_default_wifi_sta(void);
esp_err_t esp_wifi_init(const wifi_init_config_t *cfg);
esp_err_t esp_wifi_set_mode(wifi_mode_t m);
esp_err_t esp_wifi_set_config(wifi_interface_t i, wifi_config_t *c);
esp_err_t esp_wifi_start(void);
esp_err_t esp_wifi_connect(void);

/* Kconfig defaults for the host build */
#ifndef CONFIG_LIBREASR_WIFI_SSID
#define CONFIG_LIBREASR_WIFI_SSID "hostssid"
#endif
#ifndef CONFIG_LIBREASR_WIFI_PASS
#define CONFIG_LIBREASR_WIFI_PASS "hostpass"
#endif
#ifndef CONFIG_LIBREASR_WS_URI
#define CONFIG_LIBREASR_WS_URI "ws://localhost:8080/asupersecretwebsocketpath345"
#endif

#endif /* LIBREASR_IDF_SHIM_H */
