// Native host-side data-path kernels for speech_recognition_tpu.
//
// Provides the performance-critical host decode work the reference delegated
// to tensorflow-io's C++ (reference: speech_recognition/data.py:82-119):
//   - CRC-32C (Castagnoli, slicing-by-8) for TFRecord framing
//   - FLAC decoding (STREAMINFO, fixed/LPC subframes, rice residuals,
//     stereo decorrelation)
//   - WAV (RIFF PCM16) decoding
//
// Exposed as a plain C ABI consumed through ctypes
// (speech_recognition_tpu/data/native.py).  Build: `make -C native`.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {

// ----------------------------------------------------------------- crc32c
static uint32_t crc_table[8][256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82F63B78u;
  for (int i = 0; i < 256; i++) {
    uint32_t crc = i;
    for (int j = 0; j < 8; j++) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    crc_table[0][i] = crc;
  }
  for (int t = 1; t < 8; t++)
    for (int i = 0; i < 256; i++)
      crc_table[t][i] = (crc_table[t - 1][i] >> 8) ^ crc_table[0][crc_table[t - 1][i] & 0xFF];
  crc_init_done = true;
}

uint32_t asr_crc32c(const uint8_t* data, uint64_t len) {
  crc_init();
  uint32_t crc = 0xFFFFFFFFu;
  uint64_t i = 0;
  while (i + 8 <= len) {
    uint32_t lo, hi;
    memcpy(&lo, data + i, 4);
    memcpy(&hi, data + i + 4, 4);
    lo ^= crc;
    crc = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
          crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][(lo >> 24) & 0xFF] ^
          crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
          crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][(hi >> 24) & 0xFF];
    i += 8;
  }
  for (; i < len; i++) crc = (crc >> 8) ^ crc_table[0][(crc ^ data[i]) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

// ------------------------------------------------------------------- FLAC
namespace {

struct BitReader {
  const uint8_t* data;
  uint64_t len;
  uint64_t pos;  // bit position

  uint32_t read(int nbits) {
    uint32_t val = 0;
    while (nbits > 0) {
      uint8_t byte = data[pos >> 3];
      int bit_off = pos & 7;
      int avail = 8 - bit_off;
      int take = avail < nbits ? avail : nbits;
      uint32_t chunk = (byte >> (avail - take)) & ((1u << take) - 1);
      val = (val << take) | chunk;
      pos += take;
      nbits -= take;
    }
    return val;
  }

  uint64_t read64(int nbits) {
    uint64_t val = 0;
    while (nbits > 0) {
      int take = nbits > 24 ? 24 : nbits;
      val = (val << take) | read(take);
      nbits -= take;
    }
    return val;
  }

  int64_t read_signed(int nbits) {
    int64_t v = (int64_t)read64(nbits);
    if (v >= (1ll << (nbits - 1))) v -= (1ll << nbits);
    return v;
  }

  int read_unary() {
    int count = 0;
    for (;;) {
      uint8_t byte = data[pos >> 3];
      int bit_off = pos & 7;
      uint8_t rem = byte & ((1u << (8 - bit_off)) - 1);
      if (rem == 0) {
        count += 8 - bit_off;
        pos += 8 - bit_off;
      } else {
        int msb = 31 - __builtin_clz((uint32_t)rem);
        int lead = (8 - bit_off) - (msb + 1);
        count += lead;
        pos += lead + 1;
        return count;
      }
    }
  }

  uint64_t read_utf8_coded() {
    uint32_t b0 = read(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    uint32_t mask = 0x80;
    while (b0 & mask) { n++; mask >>= 1; }
    uint64_t val = b0 & (mask - 1);
    for (int i = 0; i < n - 1; i++) val = (val << 6) | (read(8) & 0x3F);
    return val;
  }

  void align_byte() { pos = (pos + 7) & ~7ull; }
};

const int kFixedOrders[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residuals(BitReader& br, int block_size, int order,
                      std::vector<int64_t>& out) {
  int method = br.read(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = (1u << param_bits) - 1;
  int partition_order = br.read(4);
  int num_partitions = 1 << partition_order;
  out.resize(block_size - order);
  int idx = 0;
  for (int p = 0; p < num_partitions; p++) {
    int count = (block_size >> partition_order) - (p == 0 ? order : 0);
    uint32_t param = br.read(param_bits);
    if (param == escape) {
      int nbits = br.read(5);
      for (int i = 0; i < count; i++)
        out[idx + i] = nbits ? br.read_signed(nbits) : 0;
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = br.read_unary();
        uint64_t r = param ? br.read(param) : 0;
        uint64_t zz = (q << param) | r;
        out[idx + i] = (int64_t)(zz >> 1) ^ -(int64_t)(zz & 1);
      }
    }
    idx += count;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& samples) {
  if (br.read(1) != 0) return false;
  int sf_type = br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = 1 + br.read_unary();
  bps -= wasted;

  samples.resize(block_size);
  std::vector<int64_t> residuals;
  if (sf_type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; i++) samples[i] = v;
  } else if (sf_type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) samples[i] = br.read_signed(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    for (int i = 0; i < order; i++) samples[i] = br.read_signed(bps);
    if (!decode_residuals(br, block_size, order, residuals)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += kFixedOrders[order][j] * samples[i - 1 - j];
      samples[i] = residuals[i - order] + pred;
    }
  } else if (sf_type >= 32) {  // LPC
    int order = (sf_type & 31) + 1;
    for (int i = 0; i < order; i++) samples[i] = br.read_signed(bps);
    int precision = br.read(4) + 1;
    int shift = (int)br.read_signed(5);
    std::vector<int64_t> coeffs(order);
    for (int i = 0; i < order; i++) coeffs[i] = br.read_signed(precision);
    if (!decode_residuals(br, block_size, order, residuals)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coeffs[j] * samples[i - 1 - j];
      samples[i] = residuals[i - order] + (pred >> shift);
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < block_size; i++) samples[i] <<= wasted;
  return true;
}

}  // namespace

// Decode a FLAC stream.  Returns number of samples (frames) written, or -1.
// out buffer must hold out_capacity * channels int32 values (interleaved).
int64_t asr_flac_decode(const uint8_t* data, uint64_t len, int32_t* out,
                        int64_t out_capacity, int32_t* out_channels,
                        int32_t* out_sample_rate) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  uint64_t pos = 4;
  int sample_rate = 0, channels = 0, bps = 0;
  uint64_t total_samples = 0;
  for (;;) {
    if (pos + 4 > len) return -1;
    int last = data[pos] >> 7;
    int btype = data[pos] & 0x7F;
    uint32_t size = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    if (btype == 0) {
      BitReader br{data + pos + 4, size, 0};
      br.read(16); br.read(16); br.read(24); br.read(24);
      sample_rate = br.read(20);
      channels = br.read(3) + 1;
      bps = br.read(5) + 1;
      total_samples = br.read64(36);
    }
    pos += 4 + size;
    if (last) break;
  }
  *out_channels = channels;
  *out_sample_rate = sample_rate;

  BitReader br{data, len, pos * 8};
  int64_t written = 0;
  std::vector<std::vector<int64_t>> chans(8);
  while (br.pos + 32 <= len * 8) {
    if (br.read(14) != 0x3FFE) return written;  // lost sync: stop
    br.read(1);
    br.read(1);
    int bs_code = br.read(4);
    int sr_code = br.read(4);
    int ch_code = br.read(4);
    int ss_code = br.read(3);
    br.read(1);
    br.read_utf8_coded();
    int block_size;
    static const int kBlockSizes[8] = {0, 192, 576, 1152, 2304, 4608, 0, 0};
    if (bs_code == 6) block_size = br.read(8) + 1;
    else if (bs_code == 7) block_size = br.read(16) + 1;
    else if (bs_code >= 1 && bs_code <= 5) block_size = kBlockSizes[bs_code];
    else if (bs_code >= 8) block_size = 256 << (bs_code - 8);
    else return -1;
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    int frame_bps = (ss_code && kSampleSizes[ss_code]) ? kSampleSizes[ss_code] : bps;
    br.read(8);  // CRC-8

    int nch = channels;
    if (ch_code < 8) {
      nch = ch_code + 1;
      for (int c = 0; c < nch; c++)
        if (!decode_subframe(br, block_size, frame_bps, chans[c])) return -1;
    } else if (ch_code == 8) {  // left/side
      if (!decode_subframe(br, block_size, frame_bps, chans[0])) return -1;
      if (!decode_subframe(br, block_size, frame_bps + 1, chans[1])) return -1;
      for (int i = 0; i < block_size; i++) chans[1][i] = chans[0][i] - chans[1][i];
      nch = 2;
    } else if (ch_code == 9) {  // right/side
      if (!decode_subframe(br, block_size, frame_bps + 1, chans[0])) return -1;
      if (!decode_subframe(br, block_size, frame_bps, chans[1])) return -1;
      for (int i = 0; i < block_size; i++) chans[0][i] = chans[1][i] + chans[0][i];
      nch = 2;
    } else if (ch_code == 10) {  // mid/side
      if (!decode_subframe(br, block_size, frame_bps, chans[0])) return -1;
      if (!decode_subframe(br, block_size, frame_bps + 1, chans[1])) return -1;
      for (int i = 0; i < block_size; i++) {
        int64_t mid = chans[0][i], side = chans[1][i];
        int64_t left = (2 * mid + (side & 1) + side) >> 1;
        chans[0][i] = left;
        chans[1][i] = left - side;
      }
      nch = 2;
    } else {
      return -1;
    }
    br.align_byte();
    br.read(16);  // CRC-16

    if (written + block_size > out_capacity) block_size = (int)(out_capacity - written);
    for (int i = 0; i < block_size; i++)
      for (int c = 0; c < nch; c++)
        out[(written + i) * nch + c] = (int32_t)chans[c][i];
    written += block_size;
    if ((total_samples && written >= (int64_t)total_samples) || written >= out_capacity)
      break;
  }
  return written;
}

// Decode RIFF/WAVE PCM16 -> float32 interleaved (value / 32768).
// Returns frames written or -1.
int64_t asr_wav_decode_f32(const uint8_t* data, uint64_t len, float* out,
                           int64_t out_capacity, int32_t* out_channels,
                           int32_t* out_sample_rate) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  uint64_t pos = 12;
  int channels = 0, sample_rate = 0, bits = 0, fmt = 0;
  const uint8_t* samples = nullptr;
  uint64_t samples_len = 0;
  while (pos + 8 <= len) {
    uint32_t size;
    memcpy(&size, data + pos + 4, 4);
    if (memcmp(data + pos, "fmt ", 4) == 0) {
      uint16_t f, ch, b;
      uint32_t sr;
      memcpy(&f, data + pos + 8, 2);
      memcpy(&ch, data + pos + 10, 2);
      memcpy(&sr, data + pos + 12, 4);
      memcpy(&b, data + pos + 22, 2);
      fmt = f; channels = ch; sample_rate = sr; bits = b;
    } else if (memcmp(data + pos, "data", 4) == 0) {
      samples = data + pos + 8;
      samples_len = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!samples || bits != 16 || (fmt != 1 && fmt != 0xFFFE)) return -1;
  *out_channels = channels;
  *out_sample_rate = sample_rate;
  int64_t frames = (int64_t)(samples_len / 2 / channels);
  if (frames > out_capacity) frames = out_capacity;
  const int16_t* pcm = (const int16_t*)samples;
  int64_t n = frames * channels;
  for (int64_t i = 0; i < n; i++) out[i] = pcm[i] / 32768.0f;
  return frames;
}

}  // extern "C"
