/* Host unit test for the ESP32 firmware's protocol + DSP logic.
 *
 * Compiles apps/esp32/main/libreasr_client.c against the IDF shims in
 * ./shim and drives it with synthetic mic audio, asserting:
 *   1. the 48 kHz stereo -> 16 kHz mono resampler: unity DC gain,
 *      <1% passband ripple at 1 kHz, >=40 dB stopband rejection at
 *      20 kHz (alias band), and chunked == one-shot streaming
 *      exactness (reference uses the ADF rsp_filter, libreasr.c
 *      :364-406; this firmware carries its own FIR);
 *   2. every WS frame is [4B lang][4B f32 sr][1280 x f32 pcm] built
 *      from the resampled capture (reference framing, :256-282);
 *   3. "german"/"english" transcripts switch the lang header on the
 *      NEXT frame (reference :105-141 voice-command semantics);
 *   4. the LED feedback task blinks once per transcript character and
 *      parks the LED low (reference leds_task, :283-300);
 *   5. WS reconnect backoff doubles 1 s -> 30 s cap and resets on
 *      connect; a WiFi drop re-joins immediately.
 *
 * Run via tests/test_esp32_host.py (gcc build) or:
 *   cc -I shim host_harness.c -o /tmp/esp32_host -lm && /tmp/esp32_host
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

/* continuous scripted stereo signal, generated per read */
static double g_sig_freq = 0.0;   /* Hz (0 = DC at g_sig_amp) */
static double g_sig_amp = 8000.0; /* int16 units */
static uint64_t g_sig_pos = 0;    /* capture-rate sample counter */
static int g_reads_left = 0;
static jmp_buf g_escape; /* tasks loop forever; longjmp out */

static esp_event_handler_t g_ws_handler = NULL;
static esp_event_handler_t g_wifi_handler = NULL;
static int g_ws_start_calls = 0;
static int g_wifi_connect_calls = 0;
static uint32_t g_last_delay_ms = 0;

static int16_t sig_sample(uint64_t k) {
  double v = (g_sig_freq == 0.0)
                 ? g_sig_amp
                 : g_sig_amp * sin(2.0 * M_PI * g_sig_freq * (double)k /
                                   (double)CAPTURE_RATE);
  return (int16_t)lrint(v);
}

esp_err_t i2s_channel_read(i2s_chan_handle_t ch, void *dst, size_t len,
                           size_t *got, TickType_t timeout) {
  (void)ch;
  (void)timeout;
  if (g_reads_left-- <= 0) longjmp(g_escape, 1);
  int16_t *out = (int16_t *)dst;
  size_t n_frames = len / (sizeof(int16_t) * CAPTURE_CHANNELS);
  for (size_t i = 0; i < n_frames; i++) {
    int16_t s = sig_sample(g_sig_pos++);
    out[2 * i] = s;
    out[2 * i + 1] = s;
  }
  *got = len;
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
  g_ws_start_calls++;
  return ESP_OK;
}

/* the harness runs tasks synchronously instead of spawning them */
static TaskFunction_t g_mic_fn = NULL, g_led_fn = NULL;
int xTaskCreate(TaskFunction_t fn, const char *name, int stack, void *arg,
                int prio, void *handle) {
  (void)stack;
  (void)arg;
  (void)prio;
  (void)handle;
  if (strcmp(name, "leds") == 0)
    g_led_fn = fn;
  else
    g_mic_fn = fn;
  return 1;
}

void vTaskDelay(TickType_t ticks) { g_last_delay_ms = ticks; }

/* ---- queue shim: bounded fifo, longjmp when drained ---- */
struct queue_s {
  uint32_t items[32];
  int head, tail;
  size_t item_sz;
};
static struct queue_s g_queue_storage;
QueueHandle_t xQueueCreate(int len, size_t item_sz) {
  (void)len;
  g_queue_storage.item_sz = item_sz;
  g_queue_storage.head = g_queue_storage.tail = 0;
  return &g_queue_storage;
}
int xQueueSend(QueueHandle_t q, const void *item, TickType_t timeout) {
  (void)timeout;
  memcpy(&q->items[q->tail++ % 32], item, q->item_sz);
  return 1;
}
int xQueueReceive(QueueHandle_t q, void *item, TickType_t timeout) {
  (void)timeout;
  if (q->head == q->tail) longjmp(g_escape, 1); /* drained: exit task */
  memcpy(item, &q->items[q->head++ % 32], q->item_sz);
  return 1;
}

/* ---- gpio shim: record the level sequence ---- */
static int g_gpio_seq[256];
static int g_n_gpio = 0;
esp_err_t gpio_config(const gpio_config_t *cfg) {
  (void)cfg;
  return ESP_OK;
}
esp_err_t gpio_set_level(gpio_num_t gpio, int level) {
  (void)gpio;
  if (g_n_gpio < 256) g_gpio_seq[g_n_gpio++] = level;
  return ESP_OK;
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
esp_err_t esp_event_handler_register(esp_event_base_t base, int32_t id,
                                     esp_event_handler_t handler, void *arg) {
  (void)base;
  (void)id;
  (void)arg;
  g_wifi_handler = handler;
  return ESP_OK;
}
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
esp_err_t esp_wifi_connect(void) {
  g_wifi_connect_calls++;
  return ESP_OK;
}

/* ------------------------------------------------------------------ */

static void run_mic_reads(int n_reads) {
  g_reads_left = n_reads;
  if (!setjmp(g_escape)) g_mic_fn(NULL);
}

static void run_led_task(void) {
  if (!setjmp(g_escape)) g_led_fn(NULL);
}

static void deliver_transcript(const char *text) {
  esp_websocket_event_data_t ev = {
      .data_ptr = text, .data_len = (int)strlen(text), .op_code = 0x01};
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DATA, &ev);
}

static void check_header(int i, const char *lang) {
  assert(g_sent[i].len == (int)(HEADER_BYTES + FRAME_SAMPLES * 4));
  char got_lang[5] = {0};
  memcpy(got_lang, g_sent[i].data, 4);
  assert(strcmp(got_lang, lang) == 0);
  float sr;
  memcpy(&sr, g_sent[i].data + 4, 4);
  assert(sr == 16000.0f);
}

/* RMS of a frame's float payload */
static double frame_rms(int i) {
  const float *pcm = (const float *)(g_sent[i].data + HEADER_BYTES);
  double acc = 0.0;
  for (int k = 0; k < FRAME_SAMPLES; k++) acc += (double)pcm[k] * pcm[k];
  return sqrt(acc / FRAME_SAMPLES);
}

/* ---- resampler unit tests (pure DSP, no tasks) ------------------- */

static double tone_gain(double freq_hz) {
  /* feed a CAPTURE_RATE stereo tone through a fresh resampler, return
   * output RMS / input RMS (skipping the filter warmup) */
  resampler_t rs = {0};
  enum { N_IN = 48000 };
  static int16_t in[N_IN * 2];
  static int16_t out[N_IN];
  for (int k = 0; k < N_IN; k++) {
    int16_t s = (int16_t)lrint(
        16000.0 * sin(2.0 * M_PI * freq_hz * k / CAPTURE_RATE));
    in[2 * k] = s;
    in[2 * k + 1] = s;
  }
  size_t n = resample_48k_to_16k(&rs, in, N_IN, out);
  assert(n == N_IN / DECIM);
  double acc = 0.0;
  size_t skip = 256;
  for (size_t k = skip; k < n; k++) acc += (double)out[k] * out[k];
  double out_rms = sqrt(acc / (n - skip));
  return out_rms / (16000.0 / sqrt(2.0));
}

static void test_resampler(void) {
  /* unity DC gain */
  resampler_t rs = {0};
  enum { N_DC = 4800 };
  static int16_t dc_in[N_DC * 2], dc_out[N_DC];
  for (int k = 0; k < N_DC; k++) dc_in[2 * k] = dc_in[2 * k + 1] = 10000;
  size_t n = resample_48k_to_16k(&rs, dc_in, N_DC, dc_out);
  assert(n == N_DC / DECIM);
  for (size_t k = 200; k < n; k++)
    assert(abs((int)dc_out[k] - 10000) <= 1);

  /* passband: 1 kHz within 1% */
  double g1k = tone_gain(1000.0);
  assert(fabs(g1k - 1.0) < 0.01);

  /* stopband: 20 kHz (aliases to 4 kHz post-decimation) down >=40 dB */
  double g20k = tone_gain(20000.0);
  assert(g20k < 0.01);

  /* streaming exactness: chunked feed == one-shot feed */
  enum { N_ST = 9600 };
  static int16_t st_in[N_ST * 2], out_a[N_ST], out_b[N_ST];
  for (int k = 0; k < N_ST; k++) {
    int16_t s = (int16_t)lrint(
        12000.0 * sin(2.0 * M_PI * 700.0 * k / CAPTURE_RATE) +
        3000.0 * sin(2.0 * M_PI * 3100.0 * k / CAPTURE_RATE));
    st_in[2 * k] = s;
    st_in[2 * k + 1] = s;
  }
  resampler_t ra = {0}, rb = {0};
  size_t na = resample_48k_to_16k(&ra, st_in, N_ST, out_a);
  size_t nb = 0;
  size_t chunks[] = {7, 128, 1, 997, 2048, 64};
  size_t off = 0, ci = 0;
  while (off < N_ST) {
    size_t take = chunks[ci++ % 6];
    if (take > N_ST - off) take = N_ST - off;
    nb += resample_48k_to_16k(&rb, st_in + 2 * off, take, out_b + nb);
    off += take;
  }
  assert(na == nb);
  for (size_t k = 0; k < na; k++) assert(out_a[k] == out_b[k]);
  printf("resampler: dc/passband/stopband/streaming ok\n");
}

int main(void) {
  test_resampler();

  app_main();
  assert(g_mic_fn != NULL && g_led_fn != NULL);
  assert(g_ws_handler != NULL && g_wifi_handler != NULL);
  int start_calls_after_boot = g_ws_start_calls;

  /* 1. frames from 48 kHz stereo capture: correct framing, and a 1 kHz
   * tone survives the resampler at full amplitude (RMS = A/sqrt(2)) */
  g_sig_freq = 1000.0;
  g_sig_amp = 8000.0;
  run_mic_reads(3); /* each read = one 80 ms output frame of input */
  assert(g_n_sent == 3);
  check_header(0, "en");
  check_header(2, "en");
  double want_rms = (8000.0 / 32768.0) / sqrt(2.0);
  assert(fabs(frame_rms(2) - want_rms) / want_rms < 0.02);

  /* 2. voice command switches the lang header on subsequent frames */
  deliver_transcript("please switch to german now");
  run_mic_reads(1);
  assert(g_n_sent == 4);
  check_header(3, "de");

  deliver_transcript("und jetzt bitte englisch");
  run_mic_reads(1);
  assert(g_n_sent == 5);
  check_header(4, "en");

  /* 3. binary (non-text) WS frames must NOT trigger a switch */
  esp_websocket_event_data_t bin_ev = {
      .data_ptr = "german", .data_len = 6, .op_code = 0x02};
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DATA, &bin_ev);
  run_mic_reads(1);
  check_header(5, "en");

  /* 4. LED task: the two transcripts + binary-skip above queued blink
   * jobs; drain them and check one toggle per character + final low */
  g_n_gpio = 0;
  run_led_task();
  /* transcripts: 27 chars + 24 chars (binary frame queued nothing) */
  assert(g_n_gpio == 27 + 1 + 24 + 1);
  assert(g_gpio_seq[g_n_gpio - 1] == 0); /* parked low */

  /* 5. reconnect backoff: 1 s, 2 s, 4 s ... capped at 30 s */
  uint32_t want[] = {1000, 2000, 4000, 8000, 16000, 30000, 30000};
  for (int i = 0; i < 7; i++) {
    g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DISCONNECTED, NULL);
    assert(g_last_delay_ms == want[i]);
  }
  assert(g_ws_start_calls == start_calls_after_boot + 7);
  /* connect resets the backoff */
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_CONNECTED, NULL);
  g_ws_handler(NULL, "WEBSOCKET", WEBSOCKET_EVENT_DISCONNECTED, NULL);
  assert(g_last_delay_ms == 1000);

  /* 6. wifi drop re-joins */
  int before = g_wifi_connect_calls;
  g_wifi_handler(NULL, WIFI_EVENT, WIFI_EVENT_STA_DISCONNECTED, NULL);
  assert(g_wifi_connect_calls == before + 1);

  printf("esp32 host harness: all assertions passed (%d frames)\n",
         g_n_sent);
  return 0;
}
