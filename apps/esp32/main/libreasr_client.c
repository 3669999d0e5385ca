/*
 * ESP32 streaming microphone client (clean-room rewrite; protocol-
 * compatible with the reference firmware apps/esp32/main/libreasr.c):
 *
 *  - I2S MEMS microphone at 16 kHz mono
 *  - 80 ms frames (1280 samples), int16 -> float32 scaled by 1/32768
 *  - each frame sent as one binary WebSocket message:
 *      [4B lang ascii][4B float32 sample-rate][1280 x float32 pcm]
 *  - transcripts arrive as text messages; "german"/"english" voice
 *    commands switch the language header (reference :105-141)
 *
 * Build with ESP-IDF >= 5.0: idf.py set-target esp32 && idf.py build
 * (This firmware is provided for client parity; it is not built in CI —
 * the repo's CI environment has no ESP-IDF toolchain.)
 */

#include <math.h>
#include <string.h>

#include "driver/i2s_std.h"
#include "esp_event.h"
#include "esp_log.h"
#include "esp_websocket_client.h"
#include "esp_wifi.h"
#include "freertos/FreeRTOS.h"
#include "freertos/task.h"
#include "nvs_flash.h"

#define TAG "libreasr"

#define WIFI_SSID CONFIG_LIBREASR_WIFI_SSID
#define WIFI_PASS CONFIG_LIBREASR_WIFI_PASS
#define WS_URI CONFIG_LIBREASR_WS_URI /* ws://host:8080/asupersecretwebsocketpath345 */

#define SAMPLE_RATE 16000
#define FRAME_MS 80
#define FRAME_SAMPLES (SAMPLE_RATE * FRAME_MS / 1000) /* 1280 */
#define HEADER_BYTES 8

static i2s_chan_handle_t s_rx_chan;
static esp_websocket_client_handle_t s_ws;
static char s_lang[4] = {'e', 'n', 0, 0};

/* [4B lang][4B f32 sr][f32 pcm...] — one frame per message */
static uint8_t s_frame[HEADER_BYTES + FRAME_SAMPLES * sizeof(float)];

static void set_lang(const char *lang) {
  memset(s_lang, 0, sizeof(s_lang));
  strncpy(s_lang, lang, sizeof(s_lang));
  ESP_LOGI(TAG, "language -> %s", lang);
}

static void on_transcript(const char *text, int len) {
  ESP_LOGI(TAG, "transcript: %.*s", len, text);
  /* voice-command language switching (reference :105-141) */
  if (len > 0) {
    if (strnstr(text, "german", len) || strnstr(text, "deutsch", len))
      set_lang("de");
    else if (strnstr(text, "english", len) || strnstr(text, "englisch", len))
      set_lang("en");
  }
}

static void ws_event(void *arg, esp_event_base_t base, int32_t id,
                     void *data) {
  esp_websocket_event_data_t *ev = (esp_websocket_event_data_t *)data;
  if (id == WEBSOCKET_EVENT_DATA && ev->op_code == 0x01 /* text */)
    on_transcript((const char *)ev->data_ptr, ev->data_len);
}

static void mic_task(void *arg) {
  static int16_t raw[FRAME_SAMPLES];
  float *pcm = (float *)(s_frame + HEADER_BYTES);
  float sr = (float)SAMPLE_RATE;
  memcpy(s_frame + 4, &sr, 4);

  for (;;) {
    size_t got = 0;
    i2s_channel_read(s_rx_chan, raw, sizeof(raw), &got, portMAX_DELAY);
    size_t n = got / sizeof(int16_t);
    for (size_t i = 0; i < n; i++) pcm[i] = raw[i] / 32768.0f;
    memcpy(s_frame, s_lang, 4);
    if (esp_websocket_client_is_connected(s_ws))
      esp_websocket_client_send_bin(
          s_ws, (const char *)s_frame,
          HEADER_BYTES + n * sizeof(float), portMAX_DELAY);
  }
}

static void init_i2s(void) {
  i2s_chan_config_t chan_cfg =
      I2S_CHANNEL_DEFAULT_CONFIG(I2S_NUM_0, I2S_ROLE_MASTER);
  ESP_ERROR_CHECK(i2s_new_channel(&chan_cfg, NULL, &s_rx_chan));
  i2s_std_config_t std_cfg = {
      .clk_cfg = I2S_STD_CLK_DEFAULT_CONFIG(SAMPLE_RATE),
      .slot_cfg = I2S_STD_MSB_SLOT_DEFAULT_CONFIG(I2S_DATA_BIT_WIDTH_16BIT,
                                                  I2S_SLOT_MODE_MONO),
      .gpio_cfg = {.mclk = I2S_GPIO_UNUSED,
                   .bclk = GPIO_NUM_26,
                   .ws = GPIO_NUM_25,
                   .dout = I2S_GPIO_UNUSED,
                   .din = GPIO_NUM_33},
  };
  ESP_ERROR_CHECK(i2s_channel_init_std_mode(s_rx_chan, &std_cfg));
  ESP_ERROR_CHECK(i2s_channel_enable(s_rx_chan));
}

static void init_wifi(void) {
  ESP_ERROR_CHECK(nvs_flash_init());
  ESP_ERROR_CHECK(esp_netif_init());
  ESP_ERROR_CHECK(esp_event_loop_create_default());
  esp_netif_create_default_wifi_sta();
  wifi_init_config_t cfg = WIFI_INIT_CONFIG_DEFAULT();
  ESP_ERROR_CHECK(esp_wifi_init(&cfg));
  wifi_config_t wc = {0};
  strncpy((char *)wc.sta.ssid, WIFI_SSID, sizeof(wc.sta.ssid));
  strncpy((char *)wc.sta.password, WIFI_PASS, sizeof(wc.sta.password));
  ESP_ERROR_CHECK(esp_wifi_set_mode(WIFI_MODE_STA));
  ESP_ERROR_CHECK(esp_wifi_set_config(WIFI_IF_STA, &wc));
  ESP_ERROR_CHECK(esp_wifi_start());
  ESP_ERROR_CHECK(esp_wifi_connect());
}

void app_main(void) {
  init_wifi();
  init_i2s();
  esp_websocket_client_config_t ws_cfg = {.uri = WS_URI};
  s_ws = esp_websocket_client_init(&ws_cfg);
  esp_websocket_register_events(s_ws, WEBSOCKET_EVENT_ANY, ws_event, NULL);
  esp_websocket_client_start(s_ws);
  xTaskCreate(mic_task, "mic", 8192, NULL, 5, NULL);
}
