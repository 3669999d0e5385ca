/* Host unit test for the ESP32 firmware's protocol logic.
 *
 * Compiles apps/esp32/main/libreasr_client.c against the IDF shims in
 * ./shim and drives it with synthetic mic audio, asserting:
 *   1. every WS frame is [4B lang][4B f32 sr][f32 pcm] with pcm ==
 *      int16/32768 of the mic samples (reference libreasr.c framing);
 *   2. "german"/"english" transcripts switch the lang header on the
 *      NEXT frame (reference :105-141 voice-command semantics);
 *   3. a short i2s read shrinks the frame, never pads stale samples.
 *
 * Run via tests/test_esp32_host.py (gcc build) or:
 *   cc -I shim host_harness.c -o /tmp/esp32_host && /tmp/esp32_host
 */
#include <assert.h>
#include <math.h>
#include <setjmp.h>

#include "shim/shim_common.h"

/* pull the firmware in so its static functions are testable */
#include "../main/libreasr_client.c"

/* ------------------------------------------------------------------ */
/* shim state: scripted mic input + captured WS output                 */

#define MAX_MSGS 16
static struct {
  uint8_t data[HEADER_BYTES + FRAME_SAMPLES * 4];
  int len;
} g_sent[MAX_MSGS];
static int g_n_sent = 0;

static int16_t g_mic[FRAME_SAMPLES];
static size_t g_mic_bytes = sizeof(g_mic); /* per-read byte count */
static int g_reads_left = 0;
static jmp_buf g_escape; /* mic_task loops forever; longjmp out */

static esp_event_handler_t g_ws_handler = NULL;

esp_err_t i2s_channel_read(i2s_chan_handle_t ch, void *dst, size_t len,
                           size_t *got, TickType_t timeout) {
  (void)ch;
  (void)timeout;
  if (g_reads_left-- <= 0) longjmp(g_escape, 1);
  size_t n = g_mic_bytes < len ? g_mic_bytes : len;
  memcpy(dst, g_mic, n);
  *got = n;
  return ESP_OK;
}

int esp_websocket_client_send_bin(esp_websocket_client_handle_t c,
                                  const char *data, int len,
                                  TickType_t timeout) {
  (void)c;
  (void)timeout;
  assert(g_n_sent < MAX_MSGS);
  assert(len <= (int)sizeof(g_sent[0].data));
  memcpy(g_sent[g_n_sent].data, data, len);
  g_sent[g_n_sent].len = len;
  g_n_sent++;
  return len;
}

int esp_websocket_client_is_connected(esp_websocket_client_handle_t c) {
  (void)c;
  return 1;
}

esp_websocket_client_handle_t esp_websocket_client_init(
    const esp_websocket_client_config_t *cfg) {
  (void)cfg;
  return (esp_websocket_client_handle_t)1;
}

esp_err_t esp_websocket_register_events(esp_websocket_client_handle_t c,
                                        int ev, esp_event_handler_t h,
                                        void *arg) {
  (void)c;
  (void)ev;
  (void)arg;
  g_ws_handler = h;
  return ESP_OK;
}

esp_err_t esp_websocket_client_start(esp_websocket_client_handle_t c) {
  (void)c;
  return ESP_OK;
}

/* the harness runs tasks synchronously instead of spawning them */
static TaskFunction_t g_task_fn = NULL;
int xTaskCreate(TaskFunction_t fn, const char *name, int stack, void *arg,
                int prio, void *handle) {
  (void)name;
  (void)stack;
  (void)arg;
  (void)prio;
  (void)handle;
  g_task_fn = fn;
  return 1;
}

/* inert init stubs */
esp_err_t i2s_new_channel(const i2s_chan_config_t *cfg,
                          i2s_chan_handle_t *tx, i2s_chan_handle_t *rx) {
  (void)cfg;
  (void)tx;
  *rx = (i2s_chan_handle_t)1;
  return ESP_OK;
}
esp_err_t i2s_channel_init_std_mode(i2s_chan_handle_t ch,
                                    const i2s_std_config_t *cfg) {
  (void)ch;
  (void)cfg;
  return ESP_OK;
}
esp_err_t i2s_channel_enable(i2s_chan_handle_t ch) {
  (void)ch;
  return ESP_OK;
}
esp_err_t esp_event_loop_create_default(void) { return ESP_OK; }
esp_err_t nvs_flash_init(void) { return ESP_OK; }
esp_err_t esp_netif_init(void) { return ESP_OK; }
void *esp_netif_create_default_wifi_sta(void) { return (void *)1; }
esp_err_t esp_wifi_init(const wifi_init_config_t *cfg) {
  (void)cfg;
  return ESP_OK;
}
esp_err_t esp_wifi_set_mode(wifi_mode_t m) {
  (void)m;
  return ESP_OK;
}
esp_err_t esp_wifi_set_config(wifi_interface_t i, wifi_config_t *c) {
  (void)i;
  (void)c;
  return ESP_OK;
}
esp_err_t esp_wifi_start(void) { return ESP_OK; }
esp_err_t esp_wifi_connect(void) { return ESP_OK; }

/* ------------------------------------------------------------------ */

static void run_mic_frames(int n_frames) {
  g_reads_left = n_frames;
  if (!setjmp(g_escape)) g_task_fn(NULL);
}

static void deliver_transcript(const char *text) {
  esp_websocket_event_data_t ev = {
      .data_ptr = text, .data_len = (int)strlen(text), .op_code = 0x01};
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DATA, &ev);
}

static void check_frame(int i, const char *lang, size_t n_samples) {
  assert(g_sent[i].len == (int)(HEADER_BYTES + n_samples * 4));
  /* [0..3]: 4-byte lang field, NUL-padded ascii */
  char got_lang[5] = {0};
  memcpy(got_lang, g_sent[i].data, 4);
  assert(strcmp(got_lang, lang) == 0);
  /* [4..7]: little-endian float32 sample rate */
  float sr;
  memcpy(&sr, g_sent[i].data + 4, 4);
  assert(sr == 16000.0f);
  /* payload: int16 mic samples scaled by 1/32768 */
  const float *pcm = (const float *)(g_sent[i].data + HEADER_BYTES);
  for (size_t k = 0; k < n_samples; k++) {
    float want = g_mic[k] / 32768.0f;
    assert(fabsf(pcm[k] - want) < 1e-7f);
  }
}

int main(void) {
  app_main();
  assert(g_task_fn != NULL && g_ws_handler != NULL);

  /* scripted mic signal: a ramp exercising the full int16 range */
  for (int k = 0; k < FRAME_SAMPLES; k++)
    g_mic[k] = (int16_t)((k * 51) - 32768);

  /* 1. default-language frames carry exact framing + payload */
  run_mic_frames(2);
  assert(g_n_sent == 2);
  check_frame(0, "en", FRAME_SAMPLES);
  check_frame(1, "en", FRAME_SAMPLES);

  /* 2. voice command switches the lang header on subsequent frames */
  deliver_transcript("please switch to german now");
  run_mic_frames(1);
  assert(g_n_sent == 3);
  check_frame(2, "de", FRAME_SAMPLES);

  deliver_transcript("und jetzt bitte englisch");
  run_mic_frames(1);
  assert(g_n_sent == 4);
  check_frame(3, "en", FRAME_SAMPLES);

  /* 3. binary (non-text) WS frames must NOT trigger a switch */
  esp_websocket_event_data_t bin_ev = {
      .data_ptr = "german", .data_len = 6, .op_code = 0x02};
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DATA, &bin_ev);
  run_mic_frames(1);
  check_frame(4, "en", FRAME_SAMPLES);

  /* 4. a short i2s read shrinks the frame (no stale-tail padding) */
  g_mic_bytes = 640 * sizeof(int16_t);
  run_mic_frames(1);
  assert(g_n_sent == 6);
  check_frame(5, "en", 640);

  printf("esp32 host harness: all assertions passed (%d frames)\n",
         g_n_sent);
  return 0;
}
