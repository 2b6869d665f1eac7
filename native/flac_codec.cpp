// Minimal FLAC decoder/encoder (decode: full fixed+LPC subset used by
// standard encoders; encode: fixed predictors + rice coding, like `flac -0`).
//
// Replaces the reference's soundfile/libsndfile dependency for its on-disk
// corpus format (every pipeline stage reads/writes 16 kHz mono FLAC chunks,
// e.g. pseudo-labelling/prepare_dataset.py sf.write, dataset/cool_dataset.py
// sf.read). Exposed via ctypes in taiwan_whisper_tpu/utils/native.py.
//
// Build: g++ -O3 -shared -fPIC (see utils/native.py; linked into the same
// libtwt_native.so as twt_native.cpp).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------- CRC
uint8_t crc8(const uint8_t* data, size_t len) {
  uint8_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* data, size_t len) {
  uint16_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= (uint16_t)data[i] << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
  }
  return crc;
}

// ------------------------------------------------------------------ readers
struct BitReader {
  const uint8_t* buf;
  size_t len;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)
  bool error = false;

  BitReader(const uint8_t* b, size_t l) : buf(b), len(l) {}

  bool eof() const { return byte >= len; }

  uint32_t read_bit() {
    if (byte >= len) {
      error = true;
      return 0;
    }
    uint32_t v = (buf[byte] >> (7 - bit)) & 1u;
    if (++bit == 8) {
      bit = 0;
      ++byte;
    }
    return v;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return (int64_t)(v | (~0ull << n));
    return (int64_t)v;
  }

  uint64_t read_unary() {
    uint64_t q = 0;
    while (!error && read_bit() == 0) ++q;
    return q;
  }

  int64_t read_rice(int param) {
    uint64_t q = read_unary();
    uint64_t r = read_bits(param);
    uint64_t u = (q << param) | r;
    return (u & 1) ? -(int64_t)((u + 1) >> 1) : (int64_t)(u >> 1);
  }

  void align() {
    if (bit != 0) {
      bit = 0;
      ++byte;
    }
  }
};

// UTF-8-style coded number in frame header (frame index / sample number)
uint64_t read_utf8_number(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra = 0;
  uint64_t v = 0;
  if (b0 < 0x80) return b0;
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else { br.error = true; return 0; }
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

// ------------------------------------------------------------------ decoder
struct FlacInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
};

bool decode_subframe(BitReader& br, uint32_t block_size, uint32_t bps,
                     std::vector<int64_t>& out) {
  // subframe header
  if (br.read_bit() != 0) return false;  // padding bit must be 0
  uint32_t type = (uint32_t)br.read_bits(6);
  uint32_t wasted = 0;
  if (br.read_bit()) {  // wasted bits flag
    wasted = 1 + (uint32_t)br.read_unary();
  }
  uint32_t eff_bps = bps - wasted;
  out.assign(block_size, 0);

  auto read_residuals = [&](uint32_t order) -> bool {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t parts = 1u << part_order;
    uint32_t idx = order;
    for (uint32_t p = 0; p < parts; ++p) {
      uint32_t param = (uint32_t)br.read_bits(method == 0 ? 4 : 5);
      uint32_t count = (block_size >> part_order) - (p == 0 ? order : 0);
      if ((method == 0 && param == 15) || (method == 1 && param == 31)) {
        uint32_t raw_bits = (uint32_t)br.read_bits(5);
        for (uint32_t i = 0; i < count; ++i) out[idx++] = br.read_signed(raw_bits);
      } else {
        for (uint32_t i = 0; i < count; ++i) out[idx++] = br.read_rice((int)param);
      }
    }
    return !br.error && idx == block_size;
  };

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed((int)eff_bps);
    for (uint32_t i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i) out[i] = br.read_signed((int)eff_bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED 0-4
    uint32_t order = type & 0x07;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.read_signed((int)eff_bps);
    if (!read_residuals(order)) return false;
    // fixed prediction reconstruction
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] += p;
    }
  } else if (type >= 0x20) {  // LPC, order = (type & 0x1F) + 1
    uint32_t order = (type & 0x1F) + 1;
    for (uint32_t i = 0; i < order; ++i) out[i] = br.read_signed((int)eff_bps);
    uint32_t precision = (uint32_t)br.read_bits(4) + 1;
    if (precision == 16) return false;  // 1111 invalid
    int shift = (int)br.read_signed(5);
    std::vector<int64_t> coefs(order);
    for (uint32_t i = 0; i < order; ++i) coefs[i] = br.read_signed((int)precision);
    if (!read_residuals(order)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted) {
    for (uint32_t i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return !br.error;
}

const uint32_t kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const uint32_t kSampleRates[12] = {0, 88200, 176400, 192000, 8000, 16000,
                                   22050, 24000, 32000, 44100, 48000, 96000};

// returns samples interleaved int32; empty on failure
bool flac_decode_buffer(const uint8_t* data, size_t len, FlacInfo& info,
                        std::vector<int32_t>& pcm) {
  if (len < 42 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool last = false;
  bool have_info = false;
  while (!last && pos + 4 <= len) {
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    uint8_t type = hdr & 0x7F;
    uint32_t blen = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) |
                    data[pos + 3];
    pos += 4;
    if (type == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* si = data + pos;
      info.sample_rate = ((uint32_t)si[10] << 12) | ((uint32_t)si[11] << 4) |
                         (si[12] >> 4);
      info.channels = ((si[12] >> 1) & 0x07) + 1;
      info.bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1;
      info.total_samples = ((uint64_t)(si[13] & 0x0F) << 32) |
                           ((uint64_t)si[14] << 24) | ((uint64_t)si[15] << 16) |
                           ((uint64_t)si[16] << 8) | si[17];
      have_info = true;
    }
    pos += blen;
  }
  if (!have_info || pos > len) return false;

  pcm.clear();
  if (info.total_samples) pcm.reserve(info.total_samples * info.channels);

  std::vector<std::vector<int64_t>> ch(info.channels);
  while (pos + 2 <= len) {
    // frame header
    if (data[pos] != 0xFF || (data[pos + 1] & 0xFC) != 0xF8) break;
    BitReader br(data + pos, len - pos);
    br.read_bits(14);  // sync
    br.read_bit();     // reserved
    br.read_bit();     // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved
    read_utf8_number(br);
    uint32_t block_size;
    if (bs_code == 6) block_size = (uint32_t)br.read_bits(8) + 1;
    else if (bs_code == 7) block_size = (uint32_t)br.read_bits(16) + 1;
    else block_size = kBlockSizes[bs_code];
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    br.read_bits(8);  // CRC-8 (unchecked)
    if (block_size == 0 || br.error) break;

    uint32_t bps = info.bps;
    switch (ss_code) {
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: break;  // 0 => streaminfo
    }

    uint32_t nch = info.channels;
    bool left_side = false, right_side = false, mid_side = false;
    if (ch_code == 8) { left_side = true; nch = 2; }
    else if (ch_code == 9) { right_side = true; nch = 2; }
    else if (ch_code == 10) { mid_side = true; nch = 2; }
    else nch = ch_code + 1;
    if (nch != info.channels) return false;

    for (uint32_t c = 0; c < nch; ++c) {
      uint32_t sub_bps = bps;
      // side channel carries one extra bit
      if ((left_side && c == 1) || (right_side && c == 0) || (mid_side && c == 1))
        sub_bps += 1;
      if (!decode_subframe(br, block_size, sub_bps, ch[c])) return false;
    }
    br.align();
    br.read_bits(16);  // CRC-16 (unchecked)
    if (br.error) return false;

    // stereo decorrelation
    if (left_side) {
      for (uint32_t i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (right_side) {
      for (uint32_t i = 0; i < block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (mid_side) {
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }
    for (uint32_t i = 0; i < block_size; ++i)
      for (uint32_t c = 0; c < info.channels; ++c)
        pcm.push_back((int32_t)ch[c][i]);

    pos += br.byte + (br.bit ? 1 : 0);
  }
  if (info.total_samples && pcm.size() > info.total_samples * info.channels)
    pcm.resize(info.total_samples * info.channels);
  return !pcm.empty();
}

// ------------------------------------------------------------------ encoder
struct BitWriter {
  std::vector<uint8_t> buf;
  uint8_t cur = 0;
  int nbits = 0;

  void put_bit(uint32_t b) {
    cur = (uint8_t)((cur << 1) | (b & 1));
    if (++nbits == 8) {
      buf.push_back(cur);
      cur = 0;
      nbits = 0;
    }
  }
  void put_bits(uint64_t v, int n) {
    for (int i = n - 1; i >= 0; --i) put_bit((uint32_t)((v >> i) & 1));
  }
  void put_rice(int64_t v, int param) {
    uint64_t u = (v >= 0) ? ((uint64_t)v << 1) : (((uint64_t)(-v) << 1) - 1);
    uint64_t q = u >> param;
    for (uint64_t i = 0; i < q; ++i) put_bit(0);
    put_bit(1);
    put_bits(u, param);
  }
  void align() {
    while (nbits != 0) put_bit(0);
  }
};

int best_rice_param(const int64_t* res, uint32_t n) {
  if (n == 0) return 0;
  uint64_t sum = 0;
  for (uint32_t i = 0; i < n; ++i) sum += res[i] >= 0 ? (uint64_t)res[i] : (uint64_t)(-res[i]);
  uint64_t mean = sum / n + 1;
  int p = 0;
  while ((1ull << p) < mean && p < 14) ++p;
  return p;
}

void write_utf8_number(std::vector<uint8_t>& out, uint64_t v) {
  if (v < 0x80) out.push_back((uint8_t)v);
  else if (v < 0x800) {
    out.push_back((uint8_t)(0xC0 | (v >> 6)));
    out.push_back((uint8_t)(0x80 | (v & 0x3F)));
  } else if (v < 0x10000) {
    out.push_back((uint8_t)(0xE0 | (v >> 12)));
    out.push_back((uint8_t)(0x80 | ((v >> 6) & 0x3F)));
    out.push_back((uint8_t)(0x80 | (v & 0x3F)));
  } else if (v < 0x200000) {
    out.push_back((uint8_t)(0xF0 | (v >> 18)));
    out.push_back((uint8_t)(0x80 | ((v >> 12) & 0x3F)));
    out.push_back((uint8_t)(0x80 | ((v >> 6) & 0x3F)));
    out.push_back((uint8_t)(0x80 | (v & 0x3F)));
  } else {
    out.push_back((uint8_t)(0xF8 | (v >> 24)));
    out.push_back((uint8_t)(0x80 | ((v >> 18) & 0x3F)));
    out.push_back((uint8_t)(0x80 | ((v >> 12) & 0x3F)));
    out.push_back((uint8_t)(0x80 | ((v >> 6) & 0x3F)));
    out.push_back((uint8_t)(0x80 | (v & 0x3F)));
  }
}

// encode one channel-block with the best fixed predictor
void encode_subframe(BitWriter& bw, const int32_t* x, uint32_t n, uint32_t bps) {
  // constant?
  bool all_same = true;
  for (uint32_t i = 1; i < n && all_same; ++i) all_same = x[i] == x[0];
  if (all_same) {
    const uint32_t mask = (bps == 32) ? ~0u : ((1u << bps) - 1);
    bw.put_bits(0, 1);  // padding
    bw.put_bits(0, 6);  // CONSTANT
    bw.put_bits(0, 1);  // no wasted bits
    bw.put_bits((uint64_t)((uint32_t)x[0] & mask), (int)bps);
    return;
  }
  // try fixed orders 0..4, pick min |residual| sum
  std::vector<int64_t> res[5];
  uint64_t cost[5];
  for (int order = 0; order <= 4; ++order) {
    res[order].resize(n);
    for (uint32_t i = 0; i < n; ++i) {
      int64_t p = 0;
      if (i >= (uint32_t)order) {
        switch (order) {
          case 0: p = 0; break;
          case 1: p = x[i - 1]; break;
          case 2: p = 2ll * x[i - 1] - x[i - 2]; break;
          case 3: p = 3ll * x[i - 1] - 3ll * x[i - 2] + x[i - 3]; break;
          case 4: p = 4ll * x[i - 1] - 6ll * x[i - 2] + 4ll * x[i - 3] - x[i - 4]; break;
        }
        res[order][i] = (int64_t)x[i] - p;
      } else {
        res[order][i] = x[i];
      }
    }
    cost[order] = 0;
    for (uint32_t i = order; i < n; ++i)
      cost[order] += res[order][i] >= 0 ? (uint64_t)res[order][i]
                                        : (uint64_t)(-res[order][i]);
    if (order > 0 && n < (uint32_t)order) cost[order] = ~0ull;
  }
  int order = 0;
  for (int o = 1; o <= 4; ++o)
    if ((uint32_t)o < n && cost[o] < cost[order]) order = o;

  bw.put_bits(0, 1);                     // padding
  bw.put_bits(0x08 | (uint32_t)order, 6);  // FIXED<order>
  bw.put_bits(0, 1);                     // no wasted bits
  for (int i = 0; i < order; ++i)
    bw.put_bits((uint64_t)(uint32_t)x[i] & ((bps == 32) ? ~0u : ((1u << bps) - 1)), (int)bps);
  // residual: rice method 0, partition order 0
  bw.put_bits(0, 2);  // method
  bw.put_bits(0, 4);  // partition order
  int param = best_rice_param(res[order].data() + order, n - order);
  bw.put_bits((uint64_t)param, 4);
  for (uint32_t i = order; i < n; ++i) bw.put_rice(res[order][i], param);
}

}  // namespace

extern "C" {

void tw_free(void* p) { free(p); }

// Decode a FLAC file. Returns 0 on success; fills out params. Caller frees
// *out_pcm with tw_free. PCM is interleaved int32 at the file's bit depth.
int32_t tw_flac_decode_file(const char* path, int32_t** out_pcm,
                            int64_t* out_frames, int32_t* out_channels,
                            int32_t* out_rate, int32_t* out_bps) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (fread(data.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -2;
  }
  fclose(f);
  FlacInfo info;
  std::vector<int32_t> pcm;
  if (!flac_decode_buffer(data.data(), data.size(), info, pcm)) return -3;
  *out_pcm = (int32_t*)malloc(pcm.size() * sizeof(int32_t));
  memcpy(*out_pcm, pcm.data(), pcm.size() * sizeof(int32_t));
  *out_frames = (int64_t)(pcm.size() / info.channels);
  *out_channels = (int32_t)info.channels;
  *out_rate = (int32_t)info.sample_rate;
  *out_bps = (int32_t)info.bps;
  return 0;
}

// Encode 16-bit PCM (interleaved) to a FLAC file with fixed predictors.
int32_t tw_flac_encode_file(const char* path, const int32_t* pcm,
                            int64_t frames, int32_t channels, int32_t rate) {
  const uint32_t bps = 16;
  const uint32_t block = 4096;
  std::vector<uint8_t> out;
  out.insert(out.end(), {'f', 'L', 'a', 'C'});
  // STREAMINFO (last metadata block)
  uint8_t si[38];
  memset(si, 0, sizeof(si));
  si[0] = 0x80;  // last block, type 0
  si[3] = 34;
  si[4] = (block >> 8) & 0xFF; si[5] = block & 0xFF;       // min block
  si[6] = (block >> 8) & 0xFF; si[7] = block & 0xFF;       // max block
  // min/max frame size: 0 (unknown)
  si[14] = (uint8_t)((rate >> 12) & 0xFF);
  si[15] = (uint8_t)((rate >> 4) & 0xFF);
  si[16] = (uint8_t)(((rate & 0x0F) << 4) | (((channels - 1) & 0x7) << 1) |
                     (((bps - 1) >> 4) & 1));
  si[17] = (uint8_t)((((bps - 1) & 0x0F) << 4) | ((frames >> 32) & 0x0F));
  si[18] = (uint8_t)((frames >> 24) & 0xFF);
  si[19] = (uint8_t)((frames >> 16) & 0xFF);
  si[20] = (uint8_t)((frames >> 8) & 0xFF);
  si[21] = (uint8_t)(frames & 0xFF);
  // md5 left zero (decoders tolerate)
  out.insert(out.end(), si, si + 38);

  std::vector<int32_t> chan;
  uint64_t frame_idx = 0;
  for (int64_t start = 0; start < frames; start += block, ++frame_idx) {
    uint32_t n = (uint32_t)((frames - start) < block ? (frames - start) : block);
    // frame header
    std::vector<uint8_t> hdr;
    hdr.push_back(0xFF);
    hdr.push_back(0xF8);  // fixed blocksize strategy
    uint8_t bs_code = (n == block) ? 12 /*4096*/ : 7 /*16-bit-1*/;
    if (n == block && block != 4096) bs_code = 7;
    uint8_t sr_code;
    switch (rate) {
      case 16000: sr_code = 5; break;
      case 8000: sr_code = 4; break;
      case 22050: sr_code = 6; break;
      case 24000: sr_code = 7; break;
      case 32000: sr_code = 8; break;
      case 44100: sr_code = 9; break;
      case 48000: sr_code = 10; break;
      default: sr_code = 0; break;
    }
    hdr.push_back((uint8_t)((bs_code << 4) | sr_code));
    uint8_t ch_code = (uint8_t)(channels - 1);
    uint8_t ss_code = 4;  // 16 bps
    hdr.push_back((uint8_t)((ch_code << 4) | (ss_code << 1)));
    write_utf8_number(hdr, frame_idx);
    if (bs_code == 7) {
      hdr.push_back((uint8_t)(((n - 1) >> 8) & 0xFF));
      hdr.push_back((uint8_t)((n - 1) & 0xFF));
    }
    hdr.push_back(crc8(hdr.data(), hdr.size()));

    BitWriter bw;
    for (int32_t c = 0; c < channels; ++c) {
      chan.resize(n);
      for (uint32_t i = 0; i < n; ++i) chan[i] = pcm[(start + i) * channels + c];
      encode_subframe(bw, chan.data(), n, bps);
    }
    bw.align();

    std::vector<uint8_t> frame(hdr);
    frame.insert(frame.end(), bw.buf.begin(), bw.buf.end());
    uint16_t c16 = crc16(frame.data(), frame.size());
    frame.push_back((uint8_t)(c16 >> 8));
    frame.push_back((uint8_t)(c16 & 0xFF));
    out.insert(out.end(), frame.begin(), frame.end());
  }

  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t wrote = fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  return wrote == out.size() ? 0 : -2;
}

}  // extern "C"
