// First-party Ogg/Vorbis-I decoder (C++ port of the validated Python
// reference in audio_processor_tpu/io/vorbis.py).
//
// Exported C ABI:
//   ap_vorbis_probe(path, int64 out[3])            -> 0 / error
//       out = {sample_rate, granule_frames, channels}
//   ap_vorbis_decode(path, float* dst, int64 capacity_frames,
//                    int64 out[3])                 -> 0 / error
//       dst layout: channel-major [C, frames] float32.
//
// Implements: Ogg packet reassembly, LSb-first bit reading, codebook
// huffman + VQ decode, floor1 curve synthesis, residue formats 0/1/2,
// square-polar channel coupling, IMDCT, lapped Vorbis windows.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <algorithm>
#include <memory>
#include <tuple>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrParse = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrCapacity = -4;

// ---------------------------------------------------------------- util
struct Bytes {
  std::vector<uint8_t> d;
};

static bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

static int ilog(uint32_t x) {
  int r = 0;
  while (x > 0) {
    ++r;
    x >>= 1;
  }
  return r;
}

static double float32_unpack(uint32_t x) {
  double mantissa = static_cast<double>(x & 0x1FFFFF);
  int exponent = static_cast<int>((x & 0x7FE00000) >> 21);
  double v = mantissa * std::pow(2.0, exponent - 788);
  return (x & 0x80000000u) ? -v : v;
}

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len)
      : data_(data), nbits_(8 * len), pos_(0) {}

  uint32_t read(int n) {
    if (n == 0) return 0;
    if (pos_ + n > nbits_) throw std::out_of_range("eop");
    uint32_t out = 0;
    int got = 0;
    size_t pos = pos_;
    while (got < n) {
      uint8_t byte = data_[pos >> 3];
      int bit_off = static_cast<int>(pos & 7);
      int take = std::min(8 - bit_off, n - got);
      uint32_t chunk = (byte >> bit_off) & ((1u << take) - 1u);
      out |= chunk << got;
      got += take;
      pos += take;
    }
    pos_ = pos;
    return out;
  }

  size_t remaining_bits() const { return nbits_ - pos_; }

 private:
  const uint8_t* data_;
  size_t nbits_, pos_;
};

// ---------------------------------------------------------- ogg packets
static void ogg_packets(const std::vector<uint8_t>& data,
                        std::vector<std::vector<uint8_t>>* packets,
                        int64_t* last_granule) {
  size_t pos = 0, n = data.size();
  bool have_serial = false;
  uint32_t serial = 0;
  std::vector<uint8_t> partial;
  *last_granule = -1;
  while (pos + 27 <= n) {
    if (std::memcmp(&data[pos], "OggS", 4) != 0) {
      ++pos;
      continue;
    }
    uint8_t header_type = data[pos + 5];
    int64_t granule;
    std::memcpy(&granule, &data[pos + 6], 8);
    uint32_t page_serial;
    std::memcpy(&page_serial, &data[pos + 14], 4);
    uint8_t n_segs = data[pos + 26];
    size_t body = pos + 27 + n_segs;
    if (body > n) break;
    if (!have_serial) {
      serial = page_serial;
      have_serial = true;
    }
    size_t total = 0;
    for (int i = 0; i < n_segs; ++i) total += data[pos + 27 + i];
    if (page_serial != serial) {
      pos = body + total;
      continue;
    }
    if (granule >= 0) *last_granule = granule;
    if (!(header_type & 0x1)) partial.clear();
    size_t off = body;
    for (int i = 0; i < n_segs; ++i) {
      uint8_t seg = data[pos + 27 + i];
      if (off + seg > n) return;
      partial.insert(partial.end(), &data[off], &data[off] + seg);
      off += seg;
      if (seg < 255) {
        packets->push_back(partial);
        partial.clear();
      }
    }
    pos = off;
  }
}

// ------------------------------------------------------------ codebook
struct Codebook {
  int dimensions = 0;
  int entries = 0;
  std::vector<int> lengths;
  std::map<uint64_t, int> table;  // (len<<32)|code -> entry
  int lookup_type = 0;
  std::vector<float> vq;          // [entries * dimensions]

  void parse(BitReader& br) {
    if (br.read(24) != 0x564342) throw std::runtime_error("cb sync");
    dimensions = br.read(16);
    entries = br.read(24);
    // A zero-dimension codebook causes division by zero (residue kind-0
    // step) and a stuck partition loop when used as a classbook; the
    // spec requires dimensions >= 1.
    if (dimensions == 0) throw std::runtime_error("cb dimensions 0");
    // Cap the VQ table a crafted stream can demand (real streams stay
    // in the low thousands of entries; 4M floats = 16 MB is generous).
    if (static_cast<int64_t>(entries) * dimensions > (1 << 22))
      throw std::runtime_error("cb too large");
    lengths.assign(entries, 0);
    if (!br.read(1)) {  // unordered
      int sparse = br.read(1);
      for (int i = 0; i < entries; ++i) {
        if (sparse) {
          if (br.read(1)) lengths[i] = br.read(5) + 1;
        } else {
          lengths[i] = br.read(5) + 1;
        }
      }
    } else {
      int cur = 0, len = br.read(5) + 1;
      while (cur < entries) {
        int num = br.read(ilog(entries - cur));
        // ilog bits can express values past entries-cur (OOB write),
        // and code lengths past 32 overflow build_huffman's tables.
        if (cur + num > entries) throw std::runtime_error("cb ordered");
        if (len > 32) throw std::runtime_error("cb code length");
        for (int i = 0; i < num; ++i) lengths[cur + i] = len;
        cur += num;
        ++len;
      }
    }
    build_huffman();

    lookup_type = br.read(4);
    if (lookup_type == 0) return;
    if (lookup_type > 2) throw std::runtime_error("lookup type");
    double minimum = float32_unpack(br.read(32));
    double delta = float32_unpack(br.read(32));
    int value_bits = br.read(4) + 1;
    int sequence_p = br.read(1);
    int64_t lookup_values;
    if (lookup_type == 1) {
      int v = static_cast<int>(
          std::floor(std::pow(entries, 1.0 / dimensions)));
      while (std::pow(v + 1, dimensions) <= entries) ++v;
      while (std::pow(v, dimensions) > entries) --v;
      lookup_values = v;
    } else {
      lookup_values = static_cast<int64_t>(entries) * dimensions;
    }
    // The stream must actually contain lookup_values * value_bits bits;
    // check BEFORE allocating so a truncated/crafted header can't force
    // a multi-GB allocation (lookup_type 2: entries * dimensions values).
    if (static_cast<uint64_t>(lookup_values) * value_bits >
        br.remaining_bits())
      throw std::out_of_range("cb lookup truncated");
    std::vector<double> mults(lookup_values);
    for (int64_t i = 0; i < lookup_values; ++i)
      mults[i] = br.read(value_bits);
    vq.assign(static_cast<size_t>(entries) * dimensions, 0.f);
    for (int e = 0; e < entries; ++e) {
      double last = 0.0;
      if (lookup_type == 1) {
        int64_t idx_div = 1;
        for (int d = 0; d < dimensions; ++d) {
          int64_t off = (e / idx_div) % lookup_values;
          double v = mults[off] * delta + minimum + last;
          vq[static_cast<size_t>(e) * dimensions + d] =
              static_cast<float>(v);
          if (sequence_p) last = v;
          idx_div *= lookup_values;
        }
      } else {
        for (int d = 0; d < dimensions; ++d) {
          double v = mults[static_cast<size_t>(e) * dimensions + d] *
                         delta + minimum + last;
          vq[static_cast<size_t>(e) * dimensions + d] =
              static_cast<float>(v);
          if (sequence_p) last = v;
        }
      }
    }
  }

  void build_huffman() {
    table.clear();
    std::vector<int> used;
    for (int e = 0; e < entries; ++e)
      if (lengths[e] > 0) used.push_back(e);
    if (used.empty()) return;
    if (used.size() == 1) {
      table[(1ull << 32) | 0] = used[0];
      return;
    }
    uint32_t available[33] = {0};
    bool first = true;
    for (int e : used) {
      int l = lengths[e];
      if (first) {
        for (int y = 1; y <= l; ++y) available[y] = 1u << (32 - y);
        table[(static_cast<uint64_t>(l) << 32) | 0] = e;
        first = false;
        continue;
      }
      int z = l;
      while (z > 0 && available[z] == 0) --z;
      if (z == 0) throw std::runtime_error("huffman oversubscribed");
      uint32_t res = available[z];
      available[z] = 0;
      table[(static_cast<uint64_t>(l) << 32) | (res >> (32 - l))] = e;
      for (int y = z + 1; y <= l; ++y)
        available[y] = res | (1u << (32 - y));
    }
  }

  int decode(BitReader& br) const {
    uint32_t code = 0;
    for (int length = 1; length <= 32; ++length) {
      code = (code << 1) | br.read(1);
      auto it = table.find((static_cast<uint64_t>(length) << 32) | code);
      if (it != table.end()) return it->second;
    }
    throw std::runtime_error("bad huffman code");
  }
};

// --------------------------------------------------------------- floor1
struct Floor1 {
  std::vector<int> partition_class_list;
  std::vector<int> class_dimensions, class_subclasses, class_masterbooks;
  std::vector<std::vector<int>> subclass_books;
  int multiplier = 1;
  std::vector<int> x_list;

  void parse(BitReader& br) {
    int partitions = br.read(5);
    partition_class_list.resize(partitions);
    int max_class = -1;
    for (int i = 0; i < partitions; ++i) {
      partition_class_list[i] = br.read(4);
      max_class = std::max(max_class, partition_class_list[i]);
    }
    for (int c = 0; c <= max_class; ++c) {
      class_dimensions.push_back(br.read(3) + 1);
      int sub = br.read(2);
      class_subclasses.push_back(sub);
      class_masterbooks.push_back(sub ? static_cast<int>(br.read(8))
                                      : -1);
      std::vector<int> books;
      for (int k = 0; k < (1 << sub); ++k)
        books.push_back(static_cast<int>(br.read(8)) - 1);
      subclass_books.push_back(books);
    }
    multiplier = br.read(2) + 1;
    int rangebits = br.read(4);
    x_list = {0, 1 << rangebits};
    for (int cl : partition_class_list)
      for (int j = 0; j < class_dimensions[cl]; ++j)
        x_list.push_back(br.read(rangebits));
  }
};

// -------------------------------------------------------------- residue
struct Residue {
  int kind = 0;
  int begin = 0, end = 0, partition_size = 0, classifications = 0,
      classbook = 0;
  std::vector<int> cascade;
  std::vector<std::vector<int>> books;

  void parse(BitReader& br, int k) {
    kind = k;
    begin = br.read(24);
    end = br.read(24);
    partition_size = br.read(24) + 1;
    classifications = br.read(6) + 1;
    classbook = br.read(8);
    cascade.resize(classifications);
    for (int c = 0; c < classifications; ++c) {
      int low = br.read(3);
      int high = br.read(1) ? br.read(5) : 0;
      cascade[c] = (high << 3) | low;
    }
    books.assign(classifications, std::vector<int>(8, -1));
    for (int c = 0; c < classifications; ++c)
      for (int p = 0; p < 8; ++p)
        if ((cascade[c] >> p) & 1) books[c][p] = br.read(8);
  }
};

struct Mapping {
  int submaps = 1;
  std::vector<std::pair<int, int>> coupling;
  std::vector<int> mux, submap_floor, submap_residue;

  void parse(BitReader& br, int channels) {
    submaps = br.read(1) ? static_cast<int>(br.read(4)) + 1 : 1;
    if (br.read(1)) {
      int steps = br.read(8) + 1;
      int bits = ilog(channels - 1);
      for (int s = 0; s < steps; ++s) {
        int m = br.read(bits);
        int a = br.read(bits);
        coupling.emplace_back(m, a);
      }
    }
    if (br.read(2) != 0) throw std::runtime_error("mapping reserved");
    mux.assign(channels, 0);
    if (submaps > 1)
      for (int c = 0; c < channels; ++c) mux[c] = br.read(4);
    for (int s = 0; s < submaps; ++s) {
      br.read(8);
      submap_floor.push_back(br.read(8));
      submap_residue.push_back(br.read(8));
    }
  }
};

struct Mode {
  int blockflag = 0, mapping = 0;
};

}  // namespace

// Part 2 (setup/decode) continues in vorbis_decode.inc to keep this
// translation unit readable.
#include "vorbis_decode.inc"
