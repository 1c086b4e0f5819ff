// First-party FLAC decoder (C++ port of the validated Python
// reference in audio_processor_tpu/io/flac.py; RFC 9639).
//
// Exported C ABI (mirrors vorbis.cpp):
//   ap_flac_probe(path, int64 out[4])              -> 0 / error
//       out = {sample_rate, total_samples, channels, bits_per_sample}
//   ap_flac_decode(path, float* dst, int64 capacity_frames,
//                  int64 out[4])                   -> 0 / error
//       dst layout: channel-major [C, frames] float32 in [-1, 1];
//       out[1] = frames written.
//
// Implements: metadata walk, frame headers with CRC-8, CONSTANT /
// VERBATIM / FIXED 0-4 / LPC 1-32 subframes, RICE/RICE2 residual
// partitions incl. escapes, wasted bits, left/right/mid-side stereo
// decorrelation, frame CRC-16, and STREAMINFO-MD5 verification over
// the decoded samples. Raw fLaC container only — Ogg-FLAC routes
// through the Python decoder (io/flac.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <stdexcept>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrParse = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrCapacity = -4;

// Wraparound int64 ops: valid streams never overflow (values are
// bounded by bps+order+coef widths, < 2^53), but corrupt residuals
// that will fail the frame CRC-16 can blow up the predictor feedback
// arbitrarily — keep that arithmetic defined (two's-complement wrap).
static inline int64_t wadd(int64_t a, int64_t b) {
  return static_cast<int64_t>(static_cast<uint64_t>(a) +
                              static_cast<uint64_t>(b));
}
static inline int64_t wsub(int64_t a, int64_t b) {
  return static_cast<int64_t>(static_cast<uint64_t>(a) -
                              static_cast<uint64_t>(b));
}
static inline int64_t wmul(int64_t a, int64_t b) {
  return static_cast<int64_t>(static_cast<uint64_t>(a) *
                              static_cast<uint64_t>(b));
}

static bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

// ------------------------------------------------------------- CRCs

struct CrcTables {
  uint8_t crc8[256];
  uint16_t crc16[256];
  CrcTables() {
    for (int i = 0; i < 256; ++i) {
      uint32_t c = static_cast<uint32_t>(i);
      for (int k = 0; k < 8; ++k)
        c = (c & 0x80) ? ((c << 1) ^ 0x07) & 0xFF : (c << 1) & 0xFF;
      crc8[i] = static_cast<uint8_t>(c);
      c = static_cast<uint32_t>(i) << 8;
      for (int k = 0; k < 8; ++k)
        c = (c & 0x8000) ? ((c << 1) ^ 0x8005) & 0xFFFF
                         : (c << 1) & 0xFFFF;
      crc16[i] = static_cast<uint16_t>(c);
    }
  }
};
static const CrcTables kCrc;

static uint8_t crc8(const uint8_t* p, size_t n) {
  uint8_t c = 0;
  for (size_t i = 0; i < n; ++i) c = kCrc.crc8[c ^ p[i]];
  return c;
}

static uint16_t crc16(const uint8_t* p, size_t n) {
  uint16_t c = 0;
  for (size_t i = 0; i < n; ++i)
    c = static_cast<uint16_t>(kCrc.crc16[((c >> 8) ^ p[i]) & 0xFF]
                              ^ ((c << 8) & 0xFFFF));
  return c;
}

// -------------------------------------------------------------- MD5

struct Md5 {
  uint32_t a = 0x67452301, b = 0xefcdab89, c = 0x98badcfe,
           d = 0x10325476;
  uint64_t total = 0;
  uint8_t buf[64];
  size_t fill = 0;

  static uint32_t rotl(uint32_t x, int s) {
    return (x << s) | (x >> (32 - s));
  }

  void block(const uint8_t* p) {
    static const uint32_t K[64] = {
        0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf,
        0x4787c62a, 0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af,
        0xffff5bb1, 0x895cd7be, 0x6b901122, 0xfd987193, 0xa679438e,
        0x49b40821, 0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
        0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8, 0x21e1cde6,
        0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
        0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122,
        0xfde5380c, 0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
        0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05, 0xd9d4d039,
        0xe6db99e5, 0x1fa27cf8, 0xc4ac5665, 0xf4292244, 0x432aff97,
        0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92, 0xffeff47d,
        0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
        0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};
    static const int S[64] = {7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17,
                              22, 7, 12, 17, 22, 5, 9, 14, 20, 5, 9,
                              14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 4,
                              11, 16, 23, 4, 11, 16, 23, 4, 11, 16,
                              23, 4, 11, 16, 23, 6, 10, 15, 21, 6, 10,
                              15, 21, 6, 10, 15, 21, 6, 10, 15, 21};
    uint32_t m[16];
    for (int i = 0; i < 16; ++i)
      m[i] = static_cast<uint32_t>(p[4 * i]) |
             (static_cast<uint32_t>(p[4 * i + 1]) << 8) |
             (static_cast<uint32_t>(p[4 * i + 2]) << 16) |
             (static_cast<uint32_t>(p[4 * i + 3]) << 24);
    uint32_t A = a, B = b, C = c, D = d;
    for (int i = 0; i < 64; ++i) {
      uint32_t f;
      int g;
      if (i < 16) { f = (B & C) | (~B & D); g = i; }
      else if (i < 32) { f = (D & B) | (~D & C); g = (5 * i + 1) & 15; }
      else if (i < 48) { f = B ^ C ^ D; g = (3 * i + 5) & 15; }
      else { f = C ^ (B | ~D); g = (7 * i) & 15; }
      uint32_t tmp = D;
      D = C;
      C = B;
      B = B + rotl(A + f + K[i] + m[g], S[i]);
      A = tmp;
    }
    a += A; b += B; c += C; d += D;
  }

  void update(const uint8_t* p, size_t n) {
    total += n;
    if (fill) {
      size_t take = std::min(n, sizeof(buf) - fill);
      std::memcpy(buf + fill, p, take);
      fill += take;
      p += take;
      n -= take;
      if (fill == 64) { block(buf); fill = 0; }
    }
    while (n >= 64) { block(p); p += 64; n -= 64; }
    if (n) { std::memcpy(buf, p, n); fill = n; }
  }

  void digest(uint8_t out[16]) {
    uint64_t bits = total * 8;
    uint8_t pad[72] = {0x80};
    size_t padlen = ((fill < 56) ? 56 : 120) - fill;
    update(pad, padlen);
    uint8_t len[8];
    for (int i = 0; i < 8; ++i)
      len[i] = static_cast<uint8_t>((bits >> (8 * i)) & 0xFF);
    total -= padlen;  // keep length finalization stable
    update(len, 8);
    uint32_t h[4] = {a, b, c, d};
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j)
        out[4 * i + j] = static_cast<uint8_t>((h[i] >> (8 * j)) & 0xFF);
  }
};

// ------------------------------------------------------- bit reader

class MsbReader {
 public:
  MsbReader(const uint8_t* data, size_t start, size_t end)
      : data_(data), pos_(start), end_(end), acc_(0), nacc_(0) {}

  uint64_t read(int n) {
    if (n == 0) return 0;
    while (nacc_ < n) refill();
    nacc_ -= n;
    return (acc_ >> nacc_) & mask(n);
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n && (v & (1ull << (n - 1))))
      return static_cast<int64_t>(v) - (1ll << n);
    return static_cast<int64_t>(v);
  }

  // uint64 so a corrupt stream's absurd quotient wraps defined
  // instead of overflowing int (the frame dies at CRC-16 anyway)
  uint64_t read_unary() {
    uint64_t q = 0;
    for (;;) {
      if (nacc_ == 0) refill();
      uint64_t window = acc_ & mask(nacc_);
      if (window == 0) {
        q += static_cast<uint64_t>(nacc_);
        nacc_ = 0;
        continue;
      }
      int lead = nacc_ - (64 - __builtin_clzll(window));
      q += static_cast<uint64_t>(lead);
      nacc_ -= lead + 1;
      return q;
    }
  }

  void align() { nacc_ -= nacc_ % 8; }

  // absolute byte offset of the next unread (byte-aligned) position
  size_t byte_pos() const { return pos_ - (nacc_ >> 3); }

 private:
  static uint64_t mask(int n) {
    return n >= 64 ? ~0ull : ((1ull << n) - 1);
  }

  void refill() {
    if (pos_ >= end_) throw std::out_of_range("eof");
    while (nacc_ <= 55 && pos_ < end_) {
      acc_ = (acc_ << 8) | data_[pos_++];
      nacc_ += 8;
    }
  }

  const uint8_t* data_;
  size_t pos_, end_;
  uint64_t acc_;
  int nacc_;
};

// ----------------------------------------------------------- stream

struct StreamInfo {
  int sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total = 0;
  uint8_t md5[16] = {0};
  bool has_md5 = false;
};

static const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1,
                                    -2, 256, 512, 1024, 2048, 4096,
                                    8192, 16384, 32768};
static const int kSampleRates[16] = {0, 88200, 176400, 192000, 8000,
                                     16000, 22050, 24000, 32000,
                                     44100, 48000, 96000, -1, -2, -3,
                                     0};
static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

static bool parse_streaminfo(const uint8_t* p, size_t n,
                             StreamInfo* si) {
  if (n < 34) return false;
  uint64_t packed = 0;
  for (int i = 10; i < 18; ++i) packed = (packed << 8) | p[i];
  si->sample_rate = static_cast<int>(packed >> 44);
  si->channels = static_cast<int>((packed >> 41) & 0x7) + 1;
  si->bps = static_cast<int>((packed >> 36) & 0x1F) + 1;
  si->total = packed & ((1ull << 36) - 1);
  std::memcpy(si->md5, p + 18, 16);
  for (int i = 0; i < 16; ++i)
    if (p[18 + i]) { si->has_md5 = true; break; }
  return si->sample_rate > 0 && si->channels >= 1;
}

static bool parse_metadata(const std::vector<uint8_t>& d, size_t* pos,
                           StreamInfo* si) {
  if (d.size() < 4 || std::memcmp(d.data(), "fLaC", 4) != 0)
    return false;
  size_t p = 4;
  bool have = false;
  while (p + 4 <= d.size()) {
    uint8_t hdr = d[p];
    bool last = hdr & 0x80;
    int btype = hdr & 0x7F;
    size_t size = (static_cast<size_t>(d[p + 1]) << 16) |
                  (static_cast<size_t>(d[p + 2]) << 8) | d[p + 3];
    if (p + 4 + size > d.size()) return false;
    if (btype == 0) have = parse_streaminfo(d.data() + p + 4, size, si);
    p += 4 + size;
    if (last) break;
  }
  *pos = p;
  return have;
}

// FLAC extended UTF-8 coded number
static bool utf8_coded(MsbReader* r, uint64_t* out) {
  uint64_t b0 = r->read(8);
  if (b0 < 0x80) { *out = b0; return true; }
  int n = 0;
  uint64_t m = 0x40;
  while (b0 & m) { ++n; m >>= 1; }
  if (n < 1 || n > 6) return false;
  uint64_t v = b0 & (m - 1);
  for (int i = 0; i < n; ++i) {
    uint64_t c = r->read(8);
    if ((c & 0xC0) != 0x80) return false;
    v = (v << 6) | (c & 0x3F);
  }
  *out = v;
  return true;
}

static void read_residual(MsbReader* r, int n, int order,
                          int64_t* res) {
  int method = static_cast<int>(r->read(2));
  if (method > 1) throw std::runtime_error("reserved residual method");
  int pbits = method == 0 ? 4 : 5;
  int escape = (1 << pbits) - 1;
  int po = static_cast<int>(r->read(4));
  int n_part = 1 << po;
  if (n % n_part) throw std::runtime_error("bad partition count");
  int idx = 0;
  for (int i = 0; i < n_part; ++i) {
    int cnt = (n >> po) - (i == 0 ? order : 0);
    if (cnt < 0) throw std::runtime_error("partition < order");
    int k = static_cast<int>(r->read(pbits));
    if (k == escape) {
      int width = static_cast<int>(r->read(5));
      for (int j = 0; j < cnt; ++j)
        res[idx++] = width ? r->read_signed(width) : 0;
    } else {
      for (int j = 0; j < cnt; ++j) {
        uint64_t q = r->read_unary();
        uint64_t u = (q << k) | r->read(k);
        res[idx++] = static_cast<int64_t>(u >> 1) ^
                     -static_cast<int64_t>(u & 1);
      }
    }
  }
}

static void read_subframe(MsbReader* r, int n, int bps, int64_t* out) {
  if (r->read(1)) throw std::runtime_error("subframe pad bit");
  int sftype = static_cast<int>(r->read(6));
  int wasted = 0;
  if (r->read(1)) {
    wasted = 1;
    while (r->read(1) == 0) ++wasted;
  }
  int eff = bps - wasted;
  if (eff <= 0) throw std::runtime_error("wasted >= bps");
  if (sftype == 0) {  // CONSTANT
    int64_t v = r->read_signed(eff);
    for (int i = 0; i < n; ++i) out[i] = v;
  } else if (sftype == 1) {  // VERBATIM
    for (int i = 0; i < n; ++i) out[i] = r->read_signed(eff);
  } else if (sftype >= 8 && sftype <= 12) {  // FIXED
    int order = sftype - 8;
    for (int i = 0; i < order; ++i) out[i] = r->read_signed(eff);
    read_residual(r, n, order, out + order);
    switch (order) {
      case 0:
        break;
      case 1:
        for (int i = 1; i < n; ++i) out[i] = wadd(out[i], out[i - 1]);
        break;
      case 2:
        for (int i = 2; i < n; ++i)
          out[i] = wadd(out[i], wsub(wmul(2, out[i - 1]), out[i - 2]));
        break;
      case 3:
        for (int i = 3; i < n; ++i)
          out[i] = wadd(out[i],
                        wadd(wsub(wmul(3, out[i - 1]),
                                  wmul(3, out[i - 2])),
                             out[i - 3]));
        break;
      case 4:
        for (int i = 4; i < n; ++i)
          out[i] = wadd(
              out[i],
              wadd(wsub(wmul(4, out[i - 1]), wmul(6, out[i - 2])),
                   wsub(wmul(4, out[i - 3]), out[i - 4])));
        break;
    }
  } else if (sftype >= 32) {  // LPC
    int order = sftype - 31;
    for (int i = 0; i < order; ++i) out[i] = r->read_signed(eff);
    int prec = static_cast<int>(r->read(4));
    if (prec == 15) throw std::runtime_error("LPC precision escape");
    ++prec;
    int shift = static_cast<int>(r->read_signed(5));
    if (shift < 0) throw std::runtime_error("negative LPC shift");
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = r->read_signed(prec);
    read_residual(r, n, order, out + order);
    for (int i = order; i < n; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j)
        acc = wadd(acc, wmul(coefs[j], out[i - 1 - j]));
      out[i] = wadd(out[i], acc >> shift);
    }
  } else {
    throw std::runtime_error("reserved subframe type");
  }
  if (wasted)
    for (int i = 0; i < n; ++i)
      out[i] = static_cast<int64_t>(static_cast<uint64_t>(out[i])
                                    << wasted);
}

struct Frame {
  int n = 0;
  int channels = 0;
  int sample_rate = 0;
  int bps = 0;
  size_t next = 0;
};

// decode one frame at byte offset pos; ch[c] receives n samples
static Frame decode_frame(const std::vector<uint8_t>& d, size_t pos,
                          const StreamInfo& si,
                          std::vector<std::vector<int64_t>>* ch) {
  MsbReader r(d.data(), pos, d.size());
  if (r.read(14) != 0x3FFE) throw std::runtime_error("bad sync");
  if (r.read(1)) throw std::runtime_error("reserved header bit");
  r.read(1);  // blocking strategy
  int bs_code = static_cast<int>(r.read(4));
  int sr_code = static_cast<int>(r.read(4));
  int ch_code = static_cast<int>(r.read(4));
  int ss_code = static_cast<int>(r.read(3));
  if (r.read(1)) throw std::runtime_error("reserved header bit");
  uint64_t num;
  if (!utf8_coded(&r, &num)) throw std::runtime_error("bad frame num");
  Frame f;
  if (bs_code == 0) throw std::runtime_error("reserved block size");
  if (bs_code == 6)
    f.n = static_cast<int>(r.read(8)) + 1;
  else if (bs_code == 7)
    f.n = static_cast<int>(r.read(16)) + 1;
  else
    f.n = kBlockSizes[bs_code];
  if (sr_code == 0)
    f.sample_rate = si.sample_rate;
  else if (sr_code == 12)
    f.sample_rate = static_cast<int>(r.read(8)) * 1000;
  else if (sr_code == 13)
    f.sample_rate = static_cast<int>(r.read(16));
  else if (sr_code == 14)
    f.sample_rate = static_cast<int>(r.read(16)) * 10;
  else if (sr_code == 15)
    throw std::runtime_error("invalid sample rate code");
  else
    f.sample_rate = kSampleRates[sr_code];
  f.bps = ss_code == 0 ? si.bps : kSampleSizes[ss_code];
  if (f.bps == 0) throw std::runtime_error("reserved sample size");
  size_t hdr_len = r.byte_pos() - pos;
  uint64_t crc_got = r.read(8);
  if (crc_got != crc8(d.data() + pos, hdr_len))
    throw std::runtime_error("frame header CRC-8 mismatch");

  auto sub = [&](int c, int bps_c) {
    (*ch)[c].resize(f.n);
    read_subframe(&r, f.n, bps_c, (*ch)[c].data());
  };
  // ch is sized to the STREAMINFO channel count; a frame header that
  // disagrees (its CRC-8 is recomputable, not a MAC) must not drive
  // out-of-bounds channel writes
  f.channels = ch_code < 8 ? ch_code + 1 : 2;
  if (f.channels > static_cast<int>(ch->size()))
    throw std::runtime_error("frame channels exceed STREAMINFO");
  if (ch_code < 8) {
    for (int c = 0; c < f.channels; ++c) sub(c, f.bps);
  } else if (ch_code == 8) {  // left/side
    sub(0, f.bps);
    sub(1, f.bps + 1);
    for (int i = 0; i < f.n; ++i)
      (*ch)[1][i] = wsub((*ch)[0][i], (*ch)[1][i]);
  } else if (ch_code == 9) {  // right/side (side first)
    sub(0, f.bps + 1);
    sub(1, f.bps);
    for (int i = 0; i < f.n; ++i)
      (*ch)[0][i] = wadd((*ch)[0][i], (*ch)[1][i]);
  } else if (ch_code == 10) {  // mid/side
    sub(0, f.bps);
    sub(1, f.bps + 1);
    for (int i = 0; i < f.n; ++i) {
      int64_t side = (*ch)[1][i];
      int64_t mid = static_cast<int64_t>(
          (static_cast<uint64_t>((*ch)[0][i]) << 1) |
          static_cast<uint64_t>(side & 1));
      (*ch)[0][i] = wadd(mid, side) >> 1;
      (*ch)[1][i] = wsub(mid, side) >> 1;
    }
  } else {
    throw std::runtime_error("reserved channel assignment");
  }
  r.align();
  size_t end = r.byte_pos();
  if (end + 2 > d.size()) throw std::runtime_error("truncated CRC-16");
  uint16_t got16 = static_cast<uint16_t>((d[end] << 8) | d[end + 1]);
  if (got16 != crc16(d.data() + pos, end - pos))
    throw std::runtime_error("frame CRC-16 mismatch");
  f.next = end + 2;
  return f;
}

}  // namespace

extern "C" {

int ap_flac_probe(const char* path, int64_t out[4]) {
  // Header-only: fLaC marker + the mandatory-first STREAMINFO block
  // (RFC 9639 §8.2) — no full-file read in the probe path.
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  uint8_t hdr[8];
  if (std::fread(hdr, 1, 8, f) != 8 ||
      std::memcmp(hdr, "fLaC", 4) != 0 || (hdr[4] & 0x7F) != 0) {
    std::fclose(f);
    return kErrParse;
  }
  size_t size = (static_cast<size_t>(hdr[5]) << 16) |
                (static_cast<size_t>(hdr[6]) << 8) | hdr[7];
  std::vector<uint8_t> body(size);
  size_t got = std::fread(body.data(), 1, size, f);
  std::fclose(f);
  StreamInfo si;
  if (got != size || !parse_streaminfo(body.data(), size, &si))
    return kErrParse;
  out[0] = si.sample_rate;
  out[1] = static_cast<int64_t>(si.total);
  out[2] = si.channels;
  out[3] = si.bps;
  return kOk;
}

int ap_flac_decode(const char* path, float* dst,
                   int64_t capacity_frames, int64_t out[4]) {
  std::vector<uint8_t> d;
  if (!read_file(path, &d)) return kErrOpen;
  StreamInfo si;
  size_t pos;
  if (!parse_metadata(d, &pos, &si)) return kErrParse;
  const int C = si.channels;
  std::vector<std::vector<int64_t>> ch(C);
  Md5 md5;
  std::vector<uint8_t> md5buf;
  const int width = si.bps / 8;
  const bool check_md5 = si.has_md5 && si.bps % 8 == 0 && si.total > 0;
  const float scale = 1.0f / static_cast<float>(1ll << (si.bps - 1));
  int64_t written = 0;
  int rate = si.sample_rate;
  try {
    while (pos + 2 < d.size()) {
      // stop cleanly at trailing non-FLAC bytes (ID3v1 tags etc.)
      // once the declared sample count is decoded
      if (si.total && written >= static_cast<int64_t>(si.total))
        break;
      Frame f = decode_frame(d, pos, si, &ch);
      if (f.channels != C) return kErrUnsupported;
      rate = f.sample_rate;
      int take = f.n;
      // trailing-partial-block trim, matching io/flac.py
      if (si.total && written + take > static_cast<int64_t>(si.total))
        take = static_cast<int>(static_cast<int64_t>(si.total) -
                                written);
      if (written + take > capacity_frames) return kErrCapacity;
      for (int c = 0; c < C; ++c) {
        float* o = dst + c * capacity_frames + written;
        const int64_t* s = ch[c].data();
        for (int i = 0; i < take; ++i) {
          float v = static_cast<float>(s[i]) * scale;
          o[i] = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        }
      }
      if (check_md5) {
        md5buf.resize(static_cast<size_t>(take) * C * width);
        uint8_t* b = md5buf.data();
        for (int i = 0; i < take; ++i)
          for (int c = 0; c < C; ++c) {
            int64_t v = ch[c][i];
            for (int w = 0; w < width; ++w)
              *b++ = static_cast<uint8_t>((v >> (8 * w)) & 0xFF);
          }
        md5.update(md5buf.data(), md5buf.size());
      }
      written += take;
      pos = f.next;
    }
  } catch (const std::exception&) {
    return kErrParse;
  }
  if (written == 0) return kErrParse;
  if (check_md5 && written == static_cast<int64_t>(si.total)) {
    uint8_t dig[16];
    md5.digest(dig);
    if (std::memcmp(dig, si.md5, 16) != 0) return kErrParse;
  }
  out[0] = rate;
  out[1] = written;
  out[2] = C;
  out[3] = si.bps;
  return kOk;
}

}  // extern "C"
