/*
 * ESP32 streaming microphone client (clean-room rewrite; protocol- and
 * feature-compatible with the reference firmware apps/esp32/main/
 * libreasr.c):
 *
 *  - I2S capture at 48 kHz stereo (the reference board's codec rate,
 *    reference :364-380) decimated on-chip to 16 kHz mono by a
 *    windowed-sinc FIR polyphase (the reference uses the ADF
 *    rsp_filter element; this firmware carries its own resampler so it
 *    needs no ADF dependency). `LIBREASR_CAPTURE_16K` builds the
 *    direct 16 kHz mono path instead (MEMS mics that clock at 16 kHz).
 *  - 80 ms frames (1280 samples), int16 -> float32 scaled by 1/32768
 *  - each frame sent as one binary WebSocket message:
 *      [4B lang ascii][4B float32 sample-rate][1280 x float32 pcm]
 *  - transcripts arrive as text messages; "german"/"english" voice
 *    commands switch the language header (reference :105-141)
 *  - LED feedback: each transcript blinks the status LED once per
 *    received character (reference leds_task, :283-300)
 *  - reconnect: WebSocket drops re-dial with exponential backoff
 *    (1 s .. 30 s, reset on connect); WiFi station drops re-join
 *    immediately (the reference leans on the ADF client's silent
 *    auto-reconnect; this firmware makes the policy explicit)
 *
 * Build with ESP-IDF >= 5.0: idf.py set-target esp32 && idf.py build
 * (This firmware is provided for client parity; it is not built in CI —
 * the repo's CI has no ESP-IDF toolchain. Its protocol, resampler, LED
 * and reconnect logic are host-verified by apps/esp32/hosttest.)
 */

#include <math.h>
#include <string.h>

#ifndef M_PI /* strict-C11 host builds don't define it */
#define M_PI 3.14159265358979323846
#endif

#include "driver/gpio.h"
#include "driver/i2s_std.h"
#include "esp_event.h"
#include "esp_log.h"
#include "esp_websocket_client.h"
#include "esp_wifi.h"
#include "freertos/FreeRTOS.h"
#include "freertos/queue.h"
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

#define DECIM 3 /* 48 kHz -> 16 kHz (resampler ratio; always compiled) */
#ifndef LIBREASR_CAPTURE_16K
#define CAPTURE_RATE 48000
#define CAPTURE_CHANNELS 2
#else
#define CAPTURE_RATE 16000
#define CAPTURE_CHANNELS 1
#endif

#define LED_GPIO GPIO_NUM_22

static i2s_chan_handle_t s_rx_chan;
static esp_websocket_client_handle_t s_ws;
static char s_lang[4] = {'e', 'n', 0, 0};
static QueueHandle_t s_led_queue;

/* [4B lang][4B f32 sr][f32 pcm...] — one frame per message */
static uint8_t s_frame[HEADER_BYTES + FRAME_SAMPLES * sizeof(float)];

/* ------------------------------------------------------------------ */
/* 48 kHz stereo -> 16 kHz mono resampler.
 *
 * Stereo is averaged to mono, then low-passed by a 48-tap Hamming-
 * windowed sinc (cutoff 6.8 kHz: comfortably under the 8 kHz output
 * Nyquist; >50 dB stopband for this window/length) and decimated by 3.
 * The FIR history carries across calls, so feeding the stream in
 * arbitrary chunk sizes yields bit-identical output to one long call —
 * the same streaming-exactness property the server-side frontend
 * keeps. Fixed filter state: no ADF, no heap. */

#define RS_TAPS 48

typedef struct {
  float taps[RS_TAPS];
  /* the last RS_TAPS mono input samples (newest at [RS_TAPS-1]) */
  float hist[RS_TAPS];
  /* input-sample phase within the current decimation group (0..DECIM-1) */
  int phase;
  int initialized;
} resampler_t;

static void resampler_init(resampler_t *rs) {
  const float fc = 6800.0f / 48000.0f; /* normalized cutoff */
  float sum = 0.0f;
  for (int i = 0; i < RS_TAPS; i++) {
    float m = (float)i - (RS_TAPS - 1) / 2.0f;
    float sinc = (m == 0.0f)
                     ? 2.0f * fc
                     : sinf(2.0f * (float)M_PI * fc * m) / ((float)M_PI * m);
    float w = 0.54f - 0.46f * cosf(2.0f * (float)M_PI * i / (RS_TAPS - 1));
    rs->taps[i] = sinc * w;
    sum += rs->taps[i];
  }
  for (int i = 0; i < RS_TAPS; i++) rs->taps[i] /= sum; /* unity DC gain */
  memset(rs->hist, 0, sizeof(rs->hist));
  rs->phase = 0;
  rs->initialized = 1;
}

/* in: interleaved stereo int16, n_frames stereo frames.
 * out: mono int16 at 1/DECIM the rate. Returns samples written
 * (callers size `out` for n_frames / DECIM + 1). */
static size_t resample_48k_to_16k(resampler_t *rs, const int16_t *in,
                                  size_t n_frames, int16_t *out) {
  if (!rs->initialized) resampler_init(rs);
  size_t n_out = 0;
  for (size_t i = 0; i < n_frames; i++) {
    /* stereo -> mono average */
    float mono =
        0.5f * ((float)in[2 * i] + (float)in[2 * i + 1]);
    /* shift history, append */
    memmove(rs->hist, rs->hist + 1, (RS_TAPS - 1) * sizeof(float));
    rs->hist[RS_TAPS - 1] = mono;
    if (++rs->phase == DECIM) {
      rs->phase = 0;
      /* convolve: newest sample hist[RS_TAPS-1] pairs with taps[0] */
      float acc = 0.0f;
      for (int t = 0; t < RS_TAPS; t++)
        acc += rs->taps[t] * rs->hist[RS_TAPS - 1 - t];
      if (acc > 32767.0f) acc = 32767.0f;
      if (acc < -32768.0f) acc = -32768.0f;
      out[n_out++] = (int16_t)lrintf(acc);
    }
  }
  return n_out;
}

/* ------------------------------------------------------------------ */
/* WebSocket reconnect policy: exponential backoff, reset on connect.  */

#define RC_BASE_MS 1000
#define RC_MAX_MS 30000

typedef struct {
  int connected;
  uint32_t next_backoff_ms;
} reconnect_t;

static reconnect_t s_rc = {0, RC_BASE_MS};

/* returns the delay to wait before re-dialing */
static uint32_t reconnect_on_disconnect(reconnect_t *rc) {
  rc->connected = 0;
  uint32_t d = rc->next_backoff_ms;
  rc->next_backoff_ms *= 2;
  if (rc->next_backoff_ms > RC_MAX_MS) rc->next_backoff_ms = RC_MAX_MS;
  return d;
}

static void reconnect_on_connected(reconnect_t *rc) {
  rc->connected = 1;
  rc->next_backoff_ms = RC_BASE_MS;
}

/* ------------------------------------------------------------------ */

static void set_lang(const char *lang) {
  memset(s_lang, 0, sizeof(s_lang));
  strncpy(s_lang, lang, sizeof(s_lang));
  ESP_LOGI(TAG, "language -> %s", lang);
}

static void on_transcript(const char *text, int len) {
  ESP_LOGI(TAG, "transcript: %.*s", len, text);
  /* LED feedback: one blink per received character (reference
   * :283-300 blinks per payload byte) */
  if (s_led_queue) {
    uint32_t n = (uint32_t)len;
    xQueueSend(s_led_queue, &n, 0);
  }
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
  switch (id) {
    case WEBSOCKET_EVENT_CONNECTED:
      ESP_LOGI(TAG, "ws connected");
      reconnect_on_connected(&s_rc);
      break;
    case WEBSOCKET_EVENT_DISCONNECTED:
    case WEBSOCKET_EVENT_ERROR: {
      uint32_t delay = reconnect_on_disconnect(&s_rc);
      ESP_LOGI(TAG, "ws lost; re-dialing in %u ms", (unsigned)delay);
      vTaskDelay(delay / portTICK_PERIOD_MS);
      esp_websocket_client_start(s_ws);
      break;
    }
    case WEBSOCKET_EVENT_DATA:
      if (ev->op_code == 0x01 /* text */)
        on_transcript((const char *)ev->data_ptr, ev->data_len);
      break;
    default:
      break;
  }
}

static void wifi_event(void *arg, esp_event_base_t base, int32_t id,
                       void *data) {
  if (id == WIFI_EVENT_STA_DISCONNECTED) {
    ESP_LOGI(TAG, "wifi lost; re-joining");
    esp_wifi_connect();
  }
}

static void leds_task(void *arg) {
  uint32_t len;
  for (;;) {
    if (xQueueReceive(s_led_queue, &len, portMAX_DELAY)) {
      for (uint32_t i = 0; i < len; i++) {
        gpio_set_level(LED_GPIO, (int)(i % 2));
        vTaskDelay(50 / portTICK_PERIOD_MS);
      }
      gpio_set_level(LED_GPIO, 0);
    }
  }
}

static void send_frame(const int16_t *samples, size_t n) {
  float *pcm = (float *)(s_frame + HEADER_BYTES);
  for (size_t i = 0; i < n; i++) pcm[i] = samples[i] / 32768.0f;
  memcpy(s_frame, s_lang, 4);
  if (esp_websocket_client_is_connected(s_ws))
    esp_websocket_client_send_bin(s_ws, (const char *)s_frame,
                                  HEADER_BYTES + n * sizeof(float),
                                  portMAX_DELAY);
}

#ifndef LIBREASR_CAPTURE_16K

static void mic_task(void *arg) {
  /* one output frame of input: 80 ms at 48 kHz stereo */
  static int16_t raw[FRAME_SAMPLES * DECIM * CAPTURE_CHANNELS];
  static int16_t mono[FRAME_SAMPLES + 1];
  static int16_t frame[FRAME_SAMPLES];
  static resampler_t rs;
  size_t pending = 0; /* mono 16 kHz samples buffered toward a frame */
  float sr = (float)SAMPLE_RATE;
  memcpy(s_frame + 4, &sr, 4);

  for (;;) {
    size_t got = 0;
    i2s_channel_read(s_rx_chan, raw, sizeof(raw), &got, portMAX_DELAY);
    size_t n_stereo = got / (sizeof(int16_t) * CAPTURE_CHANNELS);
    size_t n = resample_48k_to_16k(&rs, raw, n_stereo, mono);
    /* pack resampled audio into exact 80 ms frames */
    size_t off = 0;
    while (off < n) {
      size_t take = FRAME_SAMPLES - pending;
      if (take > n - off) take = n - off;
      memcpy(frame + pending, mono + off, take * sizeof(int16_t));
      pending += take;
      off += take;
      if (pending == FRAME_SAMPLES) {
        send_frame(frame, FRAME_SAMPLES);
        pending = 0;
      }
    }
  }
}

#else /* LIBREASR_CAPTURE_16K: direct 16 kHz mono capture */

static void mic_task(void *arg) {
  static int16_t raw[FRAME_SAMPLES];
  float sr = (float)SAMPLE_RATE;
  memcpy(s_frame + 4, &sr, 4);

  for (;;) {
    size_t got = 0;
    i2s_channel_read(s_rx_chan, raw, sizeof(raw), &got, portMAX_DELAY);
    send_frame(raw, got / sizeof(int16_t));
  }
}

#endif

static void init_i2s(void) {
  i2s_chan_config_t chan_cfg =
      I2S_CHANNEL_DEFAULT_CONFIG(I2S_NUM_0, I2S_ROLE_MASTER);
  ESP_ERROR_CHECK(i2s_new_channel(&chan_cfg, NULL, &s_rx_chan));
  i2s_std_config_t std_cfg = {
      .clk_cfg = I2S_STD_CLK_DEFAULT_CONFIG(CAPTURE_RATE),
      .slot_cfg = I2S_STD_MSB_SLOT_DEFAULT_CONFIG(
          I2S_DATA_BIT_WIDTH_16BIT,
          CAPTURE_CHANNELS == 2 ? I2S_SLOT_MODE_STEREO : I2S_SLOT_MODE_MONO),
      .gpio_cfg = {.mclk = I2S_GPIO_UNUSED,
                   .bclk = GPIO_NUM_26,
                   .ws = GPIO_NUM_25,
                   .dout = I2S_GPIO_UNUSED,
                   .din = GPIO_NUM_33},
  };
  ESP_ERROR_CHECK(i2s_channel_init_std_mode(s_rx_chan, &std_cfg));
  ESP_ERROR_CHECK(i2s_channel_enable(s_rx_chan));
}

static void init_leds(void) {
  gpio_config_t io = {
      .intr_type = GPIO_INTR_DISABLE,
      .mode = GPIO_MODE_OUTPUT,
      .pin_bit_mask = 1ULL << LED_GPIO,
  };
  ESP_ERROR_CHECK(gpio_config(&io));
  s_led_queue = xQueueCreate(8, sizeof(uint32_t));
}

static void init_wifi(void) {
  ESP_ERROR_CHECK(nvs_flash_init());
  ESP_ERROR_CHECK(esp_netif_init());
  ESP_ERROR_CHECK(esp_event_loop_create_default());
  esp_netif_create_default_wifi_sta();
  wifi_init_config_t cfg = WIFI_INIT_CONFIG_DEFAULT();
  ESP_ERROR_CHECK(esp_wifi_init(&cfg));
  ESP_ERROR_CHECK(esp_event_handler_register(WIFI_EVENT, ESP_EVENT_ANY_ID,
                                             wifi_event, NULL));
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
  init_leds();
  esp_websocket_client_config_t ws_cfg = {.uri = WS_URI};
  s_ws = esp_websocket_client_init(&ws_cfg);
  esp_websocket_register_events(s_ws, WEBSOCKET_EVENT_ANY, ws_event, NULL);
  esp_websocket_client_start(s_ws);
  xTaskCreate(leds_task, "leds", 2048, NULL, 4, NULL);
  xTaskCreate(mic_task, "mic", 8192, NULL, 5, NULL);
}
