// First-party native audio I/O for audio_processor_tpu.
//
// Replaces the reference pipeline's native decode surface (ffmpeg
// subprocess + torchaudio's sox backend — see SURVEY.md §2.3) with a
// dependency-free C++ WAV parser/reader plus a multithreaded batch
// reader that fills caller-provided (pinned) host buffers, so Python
// can feed the TPU without holding the GIL during file I/O.
//
// Exported C ABI (ctypes-friendly):
//   ap_probe_wav(path, int64 out[4])                 -> 0 / error code
//   ap_read_wav(path, float* dst, int64 capacity,
//               int64 out[4])                        -> 0 / error code
//   ap_read_wav_batch(n, paths, dsts, caps, metas,
//                     n_threads)                     -> 0 (per-file codes
//                                                     in metas[i][3])
//
// out[4] = {sample_rate, num_frames, num_channels, bits_per_sample}
// dst layout: channel-major [C, T] float32 in [-1, 1].

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrParse = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrCapacity = -4;

constexpr uint16_t kFmtPcm = 0x0001;
constexpr uint16_t kFmtFloat = 0x0003;
constexpr uint16_t kFmtExtensible = 0xFFFE;

struct WavMeta {
  uint32_t sample_rate = 0;
  uint64_t num_frames = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;          // resolved format tag
  uint64_t data_offset = 0;
  uint64_t data_size = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

struct File {
  FILE* f = nullptr;
  explicit File(const char* path) { f = std::fopen(path, "rb"); }
  ~File() {
    if (f) std::fclose(f);
  }
};

int parse_header(FILE* f, WavMeta* meta) {
  uint8_t riff[12];
  if (std::fread(riff, 1, 12, f) != 12) return kErrParse;
  if (std::memcmp(riff, "RIFF", 4) != 0 || std::memcmp(riff + 8, "WAVE", 4))
    return kErrParse;

  bool have_fmt = false, have_data = false;
  uint64_t pos = 12;
  while (!(have_fmt && have_data)) {
    uint8_t hdr[8];
    if (std::fseek(f, static_cast<long>(pos), SEEK_SET) != 0) break;
    if (std::fread(hdr, 1, 8, f) != 8) break;
    uint32_t size = rd_u32(hdr + 4);
    if (std::memcmp(hdr, "fmt ", 4) == 0 && size >= 16) {
      uint8_t buf[40];
      size_t want = size < sizeof(buf) ? size : sizeof(buf);
      if (std::fread(buf, 1, want, f) != want) return kErrParse;
      meta->format = rd_u16(buf);
      meta->channels = rd_u16(buf + 2);
      meta->sample_rate = rd_u32(buf + 4);
      meta->bits = rd_u16(buf + 14);
      if (meta->format == kFmtExtensible && size >= 40)
        meta->format = rd_u16(buf + 24);
      have_fmt = true;
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      meta->data_offset = pos + 8;
      meta->data_size = size;
      have_data = true;
    }
    pos += 8 + size + (size & 1);
  }
  if (!have_fmt || !have_data) return kErrParse;
  if (meta->channels == 0 || meta->sample_rate == 0) return kErrParse;

  // Clamp data_size to the actual file size (streamed writers lie).
  std::fseek(f, 0, SEEK_END);
  uint64_t fsize = static_cast<uint64_t>(std::ftell(f));
  if (meta->data_offset > fsize) return kErrParse;
  if (meta->data_offset + meta->data_size > fsize)
    meta->data_size = fsize - meta->data_offset;

  const bool pcm_ok = meta->format == kFmtPcm &&
                      (meta->bits == 8 || meta->bits == 16 ||
                       meta->bits == 24 || meta->bits == 32);
  const bool float_ok =
      meta->format == kFmtFloat && (meta->bits == 32 || meta->bits == 64);
  if (!pcm_ok && !float_ok) return kErrUnsupported;

  uint64_t bpf = static_cast<uint64_t>(meta->channels) * (meta->bits / 8);
  meta->num_frames = bpf ? meta->data_size / bpf : 0;
  meta->data_size = meta->num_frames * bpf;
  return kOk;
}

// Convert interleaved raw samples to channel-major float32.
void convert(const uint8_t* raw, const WavMeta& m, float* dst) {
  const uint64_t T = m.num_frames;
  const unsigned C = m.channels;
  if (m.format == kFmtFloat && m.bits == 32) {
    const float* s = reinterpret_cast<const float*>(raw);
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c) {
        // corrupt/hostile float payloads can carry NaN/Inf bit
        // patterns; zero them so one bad file can't poison its
        // device batch (finite samples pass through untouched)
        const float v = s[t * C + c];
        dst[c * T + t] = std::isfinite(v) ? v : 0.0f;
      }
  } else if (m.format == kFmtFloat && m.bits == 64) {
    const double* s = reinterpret_cast<const double*>(raw);
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c) {
        const float v = static_cast<float>(s[t * C + c]);
        dst[c * T + t] = std::isfinite(v) ? v : 0.0f;
      }
  } else if (m.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(raw);
    constexpr float k = 1.0f / 32768.0f;
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c) dst[c * T + t] = s[t * C + c] * k;
  } else if (m.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(raw);
    constexpr float k = 1.0f / 2147483648.0f;
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c) dst[c * T + t] = s[t * C + c] * k;
  } else if (m.bits == 8) {
    constexpr float k = 1.0f / 128.0f;
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c)
        dst[c * T + t] = (static_cast<int>(raw[t * C + c]) - 128) * k;
  } else {  // 24-bit packed
    constexpr float k = 1.0f / 8388608.0f;
    for (uint64_t t = 0; t < T; ++t)
      for (unsigned c = 0; c < C; ++c) {
        const uint8_t* p = raw + (t * C + c) * 3;
        int32_t v = static_cast<int32_t>(p[0]) |
                    (static_cast<int32_t>(p[1]) << 8) |
                    (static_cast<int32_t>(p[2]) << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        dst[c * T + t] = v * k;
      }
  }
}

void fill_meta(const WavMeta& m, int64_t out[4]) {
  out[0] = m.sample_rate;
  out[1] = static_cast<int64_t>(m.num_frames);
  out[2] = m.channels;
  out[3] = m.bits;
}

int read_one(const char* path, float* dst, int64_t capacity,
             int64_t out_meta[4]) {
  File file(path);
  if (!file.f) return kErrOpen;
  WavMeta m;
  int rc = parse_header(file.f, &m);
  if (rc != kOk) return rc;
  fill_meta(m, out_meta);
  const int64_t needed =
      static_cast<int64_t>(m.num_frames) * static_cast<int64_t>(m.channels);
  if (needed > capacity) return kErrCapacity;
  std::vector<uint8_t> raw(m.data_size);
  if (std::fseek(file.f, static_cast<long>(m.data_offset), SEEK_SET) != 0)
    return kErrParse;
  if (std::fread(raw.data(), 1, m.data_size, file.f) != m.data_size)
    return kErrParse;
  convert(raw.data(), m, dst);
  return kOk;
}

}  // namespace

extern "C" {

int ap_probe_wav(const char* path, int64_t out_meta[4]) {
  File file(path);
  if (!file.f) return kErrOpen;
  WavMeta m;
  int rc = parse_header(file.f, &m);
  if (rc != kOk) return rc;
  fill_meta(m, out_meta);
  return kOk;
}

int ap_read_wav(const char* path, float* dst, int64_t capacity,
                int64_t out_meta[4]) {
  return read_one(path, dst, capacity, out_meta);
}

// Batch read with an internal thread pool. metas is [n][4]; the return
// code for file i is written to codes[i].
int ap_read_wav_batch(int64_t n, const char** paths, float** dsts,
                      const int64_t* capacities, int64_t* metas,
                      int32_t* codes, int32_t n_threads) {
  if (n <= 0) return kOk;
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      codes[i] = read_one(paths[i], dsts[i], capacities[i], metas + 4 * i);
    }
  };
  std::vector<std::thread> pool;
  int nt = static_cast<int>(n_threads < n ? n_threads : n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return kOk;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Fused-pipeline host prep: reflect-pad agent/client chunk pairs and
// quantize to int16 in one GIL-free multithreaded pass (the layout the
// fused TPU program consumes; see pipeline/asr_engine.py).
// out layout: [n, 2, bucket_len + 2*pad] int16.
// ---------------------------------------------------------------------

extern "C" int ap_prepare_fused(int64_t n, const float** agents,
                                const float** clients,
                                const int64_t* lengths,
                                int64_t bucket_len, int64_t pad,
                                int16_t* out, int32_t n_threads) {
  if (n <= 0) return 0;
  const int64_t row = bucket_len + 2 * pad;

  auto quant = [](float v) -> int16_t {
    float x = v * 32768.0f;
    x = std::nearbyintf(x);
    if (x > 32767.f) x = 32767.f;
    if (x < -32768.f) x = -32768.f;
    return static_cast<int16_t>(x);
  };

  auto fill = [&](const float* src, int64_t len, int16_t* dst) {
    std::memset(dst, 0, sizeof(int16_t) * row);
    if (len <= 0) return;
    if (len > bucket_len) len = bucket_len;
    for (int64_t i = 0; i < len; ++i) dst[pad + i] = quant(src[i]);
    int64_t edge = std::min<int64_t>(pad, len - 1);
    for (int64_t i = 0; i < edge; ++i) {
      dst[pad - 1 - i] = quant(src[i + 1]);          // left reflect
      dst[pad + len + i] = quant(src[len - 2 - i]);  // right reflect
    }
  };

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      fill(agents[i], lengths[i], out + i * 2 * row);
      fill(clients[i], lengths[i], out + i * 2 * row + row);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    int nt = static_cast<int>(std::min<int64_t>(n_threads, n));
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}
