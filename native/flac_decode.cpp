// Native FLAC decoder (replaces the reference's torchaudio/libsox FLAC
// loading, reference utils/datasets.py:45). The image ships no FLAC tooling
// (no flac/ffmpeg CLI, no libFLAC), so LibriSpeech's .flac files are decoded
// here from scratch: metadata blocks, frame headers (UTF-8 coded numbers,
// CRC-8 skipped), subframe types CONSTANT/VERBATIM/FIXED(0-4)/LPC(1-32),
// Rice/Rice2 residual partitions with escape codes, wasted bits, and
// left-side/right-side/mid-side stereo decorrelation.
//
// C API (ctypes-friendly):
//   ecf_flac_info(data, size, &total_samples, &sample_rate, &channels, &bps)
//   ecf_flac_decode(data, size, out_int32, capacity_per_channel)
//     -> samples decoded per channel (interleaved output), or -1 on error.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  // Buffered MSB-first bit reader: a 64-bit cache refilled bytewise, with
  // count-leading-zeros unary decoding — the Rice decode hot path.
  const uint8_t* data;
  size_t size;
  size_t pos = 0;      // next byte to load into the cache
  uint64_t buf = 0;    // MSB-aligned cache
  int nbits = 0;       // valid bits at the top of buf
  bool error = false;

  BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

  void fill() {
    while (nbits <= 56 && pos < size) {
      buf |= (uint64_t)data[pos++] << (56 - nbits);
      nbits += 8;
    }
  }

  size_t bits_left() const { return (size - pos) * 8 + (size_t)nbits; }
  bool eof() const { return bits_left() == 0; }

  uint32_t read_bit() { return (uint32_t)read_bits(1); }

  uint64_t read_bits(int n) {  // n <= 57
    if (n == 0) return 0;
    if (n <= nbits) {  // fast path: whole read served from the cache
      uint64_t v = buf >> (64 - n);
      buf <<= n;
      nbits -= n;
      return v;
    }
    uint64_t v = 0;
    while (n > 0) {
      if (nbits == 0) {
        fill();
        if (nbits == 0) { error = true; return v << n; }
      }
      int take = n < nbits ? n : nbits;
      v = (v << take) | (buf >> (64 - take));
      buf <<= take;
      nbits -= take;
      n -= take;
    }
    return v;
  }

  int64_t read_signed(int n) {
    if (n == 0) return 0;
    uint64_t v = read_bits(n);
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    for (;;) {
      if (nbits == 0) {
        fill();
        if (nbits == 0) { error = true; return q; }
      }
      if (buf == 0) {  // all cached bits are zeros
        q += nbits;
        nbits = 0;
        if (q > (1u << 24)) { error = true; return q; }  // corrupt guard
        continue;
      }
      int lz = __builtin_clzll(buf);
      if (lz >= nbits) {
        q += nbits;
        buf = 0;
        nbits = 0;
        continue;
      }
      q += lz;
      buf <<= (lz + 1);
      nbits -= (lz + 1);
      return q;
    }
  }

  void align() {
    int drop = nbits % 8;
    if (drop) {
      buf <<= drop;
      nbits -= drop;
    }
  }
};

// Frame-header UTF-8 style coded number (frame or sample index).
uint64_t read_utf8(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) return b0;
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { br.error = true; return 0; }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.read_bits(8);
    if ((b & 0xC0) != 0x80) { br.error = true; return 0; }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

bool decode_residual(BitReader& br, int blocksize, int pred_order,
                     int64_t* out) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;
  uint32_t porder = (uint32_t)br.read_bits(4);
  uint32_t nparts = 1u << porder;
  if (blocksize % nparts) return false;
  int idx = pred_order;  // residuals are indexed by sample position
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = blocksize >> porder;
    if (p == 0) count -= pred_order;
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(plen);
    if (param == escape) {
      uint32_t rawbits = (uint32_t)br.read_bits(5);
      for (int i = 0; i < count; ++i)
        out[idx++] = br.read_signed((int)rawbits);
    } else {
      // Rice hot loop: keep the cache refilled so the common case (quotient
      // and remainder both inside the 64-bit cache) runs branch-light.
      for (int i = 0; i < count; ++i) {
        br.fill();
        uint64_t q;
        int lz;
        if (br.buf != 0 && (lz = __builtin_clzll(br.buf)) < br.nbits &&
            br.nbits - lz - 1 >= (int)param) {
          q = (uint64_t)lz;
          br.buf <<= (lz + 1);
          br.nbits -= (lz + 1);
          uint64_t r = param ? (br.buf >> (64 - param)) : 0;
          br.buf <<= param;
          br.nbits -= (int)param;
          uint64_t u = (q << param) | r;
          out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
        } else {
          q = br.read_unary();
          uint64_t u = (q << param) | br.read_bits((int)param);
          out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
        }
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  out.resize(blocksize);
  if (br.read_bit() != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) {
    wasted = 1;
    while (!br.error && br.read_bit() == 0) ++wasted;
  }
  bps -= wasted;
  if (bps <= 0 || br.error) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    int order = type & 0x07;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res.data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3]
                    - out[i - 4]; break;
      }
      out[i] = p + res[i];
    }
  } else if (type & 0x20) {  // LPC
    int order = (int)(type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    uint32_t prec = (uint32_t)br.read_bits(4);
    if (prec == 15) return false;
    int precision = (int)prec + 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    std::vector<int64_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res.data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] = (acc >> shift) + res[i];
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return !br.error;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
  size_t frames_offset = 0;  // byte offset of the first audio frame
  bool ok = false;
};

StreamInfo parse_header(const uint8_t* data, size_t size) {
  StreamInfo si;
  if (size < 8 || std::memcmp(data, "fLaC", 4) != 0) return si;
  size_t pos = 4;
  bool last = false;
  while (!last) {
    if (pos + 4 > size) return si;
    last = data[pos] & 0x80;
    int type = data[pos] & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + len > size) return si;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      si.sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) |
                       (p[12] >> 4);
      si.channels = ((p[12] >> 1) & 0x7) + 1;
      si.bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si.total_samples = ((uint64_t)(p[13] & 0x0F) << 32) |
                         ((uint64_t)p[14] << 24) | ((uint64_t)p[15] << 16) |
                         ((uint64_t)p[16] << 8) | p[17];
    }
    pos += len;
  }
  si.frames_offset = pos;
  si.ok = si.sample_rate != 0 && si.channels >= 1 && si.channels <= 8;
  return si;
}

const int kBlocksizeTable[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

}  // namespace

extern "C" {

int ecf_flac_info(const uint8_t* data, size_t size, long long* total_samples,
                  int* sample_rate, int* channels, int* bps) {
  StreamInfo si = parse_header(data, size);
  if (!si.ok) return -1;
  if (total_samples) *total_samples = (long long)si.total_samples;
  if (sample_rate) *sample_rate = (int)si.sample_rate;
  if (channels) *channels = si.channels;
  if (bps) *bps = si.bps;
  return 0;
}

// Decodes the whole stream. `out` receives interleaved int32 samples
// (capacity = capacity_per_channel * channels entries). Returns samples per
// channel, or -1 on error.
long long ecf_flac_decode(const uint8_t* data, size_t size, int32_t* out,
                          long long capacity_per_channel) {
  StreamInfo si = parse_header(data, size);
  if (!si.ok) return -1;
  BitReader br(data + si.frames_offset, size - si.frames_offset);
  long long written = 0;
  std::vector<std::vector<int64_t>> ch(si.channels);

  while (true) {
    br.align();
    if (br.eof()) break;  // clean EOF
    // frame sync: 14 bits 0b11111111111110
    uint32_t sync = (uint32_t)br.read_bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return -1;
    br.read_bit();                       // reserved
    br.read_bit();                       // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();                       // reserved
    read_utf8(br);                       // frame/sample number (unused)

    int blocksize;
    if (bs_code == 0) return -1;
    else if (bs_code == 6) blocksize = (int)br.read_bits(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.read_bits(16) + 1;
    else blocksize = kBlocksizeTable[bs_code];

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    else if (sr_code == 15) return -1;

    int bps = si.bps;
    switch (ss_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }
    br.read_bits(8);                     // CRC-8 (not verified)
    if (br.error) return -1;

    int nch = si.channels;
    int assign = -1;  // 0 l/s, 1 r/s, 2 m/s
    if (ch_code < 8) {
      if ((int)ch_code + 1 != si.channels) return -1;
    } else if (ch_code <= 10) {
      if (si.channels != 2) return -1;
      assign = (int)ch_code - 8;
      nch = 2;
    } else {
      return -1;
    }

    for (int c = 0; c < nch; ++c) {
      int sub_bps = bps;
      if ((assign == 0 && c == 1) || (assign == 1 && c == 0) ||
          (assign == 2 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return -1;
    }
    br.align();
    br.read_bits(16);                    // frame CRC-16 (not verified)
    if (br.error) return -1;

    // stereo decorrelation
    if (assign == 0) {          // left/side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (assign == 1) {   // right/side: ch0 = side, ch1 = right
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (assign == 2) {   // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    if (written + blocksize > capacity_per_channel) return -1;
    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < si.channels; ++c)
        out[(written + i) * si.channels + c] = (int32_t)ch[c][i];
    written += blocksize;
    if (si.total_samples && (uint64_t)written >= si.total_samples) break;
  }
  return written;
}

}  // extern "C"
