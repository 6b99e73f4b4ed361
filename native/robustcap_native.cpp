// RobustCap-TPU native streaming datapath.
//
// The reference's live pipeline moves sensor data through Python daemon
// threads with queue.Queue ring buffers and struct-based codecs
// (articulate/utils/xsens/xsens_dot_set.py:23-38, live_demo_sync.py:207-268,
// live_detector.py:58-61). This library provides the equivalent hot-path
// primitives natively so the host side of the 60 Hz loop never touches the
// Python allocator:
//
//  * rc_ring_*      — thread-safe drop-oldest ring buffer (the Queue(180)
//                     semantics of the BLE bridge),
//  * rc_resampler_* — N-IMU 60 Hz resampler with quaternion slerp between
//                     the two most recent samples per sensor
//                     (live_demo_sync.py:207-244's internal clock),
//  * rc_parse_imu_packet / rc_encode_floats_csv / rc_parse_floats_csv —
//                     the UDP/TCP wire codecs (binary t|q|a and '#'/','
//                     delimited CSV).
//
// C ABI only; bound from Python with ctypes (robustcap_tpu/streaming/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Ring buffer (drop-oldest)
// ---------------------------------------------------------------------------

struct RcRing {
  std::mutex mu;
  std::vector<uint8_t> data;
  size_t item_size = 0;
  size_t capacity = 0;
  size_t head = 0;  // next write slot
  size_t count = 0;
  uint64_t dropped = 0;
};

RcRing* rc_ring_new(size_t capacity, size_t item_size) {
  RcRing* r = new RcRing();
  r->item_size = item_size;
  r->capacity = capacity;
  r->data.resize(capacity * item_size);
  return r;
}

void rc_ring_free(RcRing* r) { delete r; }

// Push one item; drops the oldest when full. Returns 1 if an item was
// dropped.
int rc_ring_push(RcRing* r, const void* item) {
  std::lock_guard<std::mutex> lock(r->mu);
  std::memcpy(&r->data[r->head * r->item_size], item, r->item_size);
  r->head = (r->head + 1) % r->capacity;
  if (r->count == r->capacity) {
    r->dropped++;
    return 1;
  }
  r->count++;
  return 0;
}

// Pop the oldest item into out. Returns 0 on success, -1 if empty.
int rc_ring_pop(RcRing* r, void* out) {
  std::lock_guard<std::mutex> lock(r->mu);
  if (r->count == 0) return -1;
  size_t tail = (r->head + r->capacity - r->count) % r->capacity;
  std::memcpy(out, &r->data[tail * r->item_size], r->item_size);
  r->count--;
  return 0;
}

size_t rc_ring_size(RcRing* r) {
  std::lock_guard<std::mutex> lock(r->mu);
  return r->count;
}

uint64_t rc_ring_dropped(RcRing* r) {
  std::lock_guard<std::mutex> lock(r->mu);
  return r->dropped;
}

void rc_ring_clear(RcRing* r) {
  std::lock_guard<std::mutex> lock(r->mu);
  r->count = 0;
  r->head = 0;
}

// ---------------------------------------------------------------------------
// IMU resampler: per-sensor (t, quat wxyz, acc) pairs -> fixed-rate ticks
// ---------------------------------------------------------------------------

struct RcSample {
  double t = -1.0;
  float q[4] = {1, 0, 0, 0};
  float a[3] = {0, 0, 0};
};

struct RcResampler {
  std::mutex mu;
  int n_imu = 0;
  double dt = 1.0 / 60.0;
  double clock = -1.0;
  std::vector<RcSample> prev, cur;
};

RcResampler* rc_resampler_new(int n_imu, double fps) {
  RcResampler* rs = new RcResampler();
  rs->n_imu = n_imu;
  rs->dt = 1.0 / fps;
  rs->prev.resize(n_imu);
  rs->cur.resize(n_imu);
  return rs;
}

void rc_resampler_free(RcResampler* rs) { delete rs; }

void rc_resampler_push(RcResampler* rs, int imu, double t, const float* q,
                       const float* a) {
  std::lock_guard<std::mutex> lock(rs->mu);
  if (imu < 0 || imu >= rs->n_imu) return;
  rs->prev[imu] = rs->cur[imu];
  RcSample& s = rs->cur[imu];
  s.t = t;
  std::memcpy(s.q, q, 4 * sizeof(float));
  std::memcpy(s.a, a, 3 * sizeof(float));
}

static void slerp(const float* q0, const float* q1, float t, float* out) {
  float d = q0[0] * q1[0] + q0[1] * q1[1] + q0[2] * q1[2] + q0[3] * q1[3];
  float sign = 1.0f;
  if (d < 0) {
    d = -d;
    sign = -1.0f;
  }
  float w0, w1;
  if (d > 0.9995f) {
    w0 = 1.0f - t;
    w1 = t;
  } else {
    float th = std::acos(d < 1.0f ? d : 1.0f);
    float s = std::sin(th);
    w0 = std::sin((1.0f - t) * th) / s;
    w1 = std::sin(t * th) / s;
  }
  float n = 0;
  for (int i = 0; i < 4; i++) {
    out[i] = w0 * q0[i] + sign * w1 * q1[i];
    n += out[i] * out[i];
  }
  n = std::sqrt(n);
  for (int i = 0; i < 4; i++) out[i] /= (n > 0 ? n : 1.0f);
}

// Produce one fixed-rate tick: interpolated quaternions [n_imu * 4] and
// accelerations [n_imu * 3] at the internal clock, which advances by dt.
// Returns the tick timestamp, or -1 when any sensor has no data yet.
double rc_resampler_tick(RcResampler* rs, float* q_out, float* a_out) {
  std::lock_guard<std::mutex> lock(rs->mu);
  double newest = -1.0;
  for (int i = 0; i < rs->n_imu; i++) {
    if (rs->cur[i].t < 0) return -1.0;
    if (rs->cur[i].t > newest) newest = rs->cur[i].t;
  }
  if (rs->clock < 0) rs->clock = newest;
  // drop ticks if we fell behind by more than 2 frames (the reference skips
  // ticks when the queue backs up, live_demo_sync.py:233-242)
  if (newest - rs->clock > 2.0 * rs->dt) rs->clock = newest - rs->dt;

  for (int i = 0; i < rs->n_imu; i++) {
    const RcSample& p = rs->prev[i];
    const RcSample& c = rs->cur[i];
    float alpha = 1.0f;
    if (p.t >= 0 && c.t > p.t) {
      alpha = (float)((rs->clock - p.t) / (c.t - p.t));
      if (alpha < 0) alpha = 0;
      if (alpha > 1) alpha = 1;
    }
    slerp(p.t >= 0 ? p.q : c.q, c.q, alpha, q_out + 4 * i);
    for (int k = 0; k < 3; k++)
      a_out[3 * i + k] = p.t >= 0
                             ? (1 - alpha) * p.a[k] + alpha * c.a[k]
                             : c.a[k];
  }
  double t = rs->clock;
  rs->clock += rs->dt;
  return t;
}

// ---------------------------------------------------------------------------
// Wire codecs
// ---------------------------------------------------------------------------

// Binary IMU packet: float32 [t | q(4*n) | a(3*n)] (the BLE->UDP bridge
// layout, xsens_dot_server_no_gui.py / live_demo_sync.py:262-268).
int rc_parse_imu_packet(const uint8_t* buf, int len, int n_imu, double* t,
                        float* q, float* a) {
  int need = (1 + 4 * n_imu + 3 * n_imu) * (int)sizeof(float);
  if (len < need) return -1;
  const float* f = reinterpret_cast<const float*>(buf);
  *t = (double)f[0];
  std::memcpy(q, f + 1, 4 * n_imu * sizeof(float));
  std::memcpy(a, f + 1 + 4 * n_imu, 3 * n_imu * sizeof(float));
  return 0;
}

int rc_encode_imu_packet(double t, const float* q, const float* a, int n_imu,
                         uint8_t* out, int cap) {
  int need = (1 + 4 * n_imu + 3 * n_imu) * (int)sizeof(float);
  if (cap < need) return -1;
  float* f = reinterpret_cast<float*>(out);
  f[0] = (float)t;
  std::memcpy(f + 1, q, 4 * n_imu * sizeof(float));
  std::memcpy(f + 1 + 4 * n_imu, a, 3 * n_imu * sizeof(float));
  return need;
}

// Delimited float CSV ("%g"-style, ','-separated groups joined by the caller
// with '#'/'$' like the reference's detector/Unity protocols).
int rc_encode_floats_csv(const float* vals, int n, char sep, char* out,
                         int cap) {
  int pos = 0;
  for (int i = 0; i < n; i++) {
    int w;
    if (i == 0) {
      w = snprintf(out + pos, cap - pos, "%.6g", (double)vals[i]);
    } else {
      w = snprintf(out + pos, cap - pos, "%c%.6g", sep, (double)vals[i]);
    }
    if (w < 0 || pos + w >= cap) return -1;
    pos += w;
  }
  if (pos < cap) out[pos] = '\0';
  return pos;
}

int rc_parse_floats_csv(const char* str, char sep, float* out, int cap) {
  int n = 0;
  const char* p = str;
  char* end;
  while (*p && n < cap) {
    float v = strtof(p, &end);
    if (end == p) break;
    out[n++] = v;
    p = end;
    if (*p == sep) p++;
  }
  return n;
}

}  // extern "C"
