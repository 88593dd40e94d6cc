// brever_tpu native runtime: parallel tar/WAV batch loading.
//
// The host input pipeline's hot loop is "read N tar members, decode WAV/FLAC,
// zero-pad to the bucket length, stack" — pure memory movement that
// Python threads serialize on the GIL. This library does it with
// pread() + std::thread, writing straight into the caller's output
// buffer (which the JAX host-to-device transfer then consumes).
//
// Exposed via ctypes (see brever_tpu/native.py); built with
// `make -C native` (plain g++, no third-party dependencies).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct WavFormat {
  uint16_t tag = 0;
  uint16_t channels = 0;
  uint32_t samplerate = 0;
  uint16_t bits = 0;
  uint16_t block_align = 0;
  const uint8_t* data = nullptr;  // start of sample payload
  uint64_t data_size = 0;
};

constexpr uint16_t kPcm = 0x0001;
constexpr uint16_t kFloat = 0x0003;
constexpr uint16_t kExtensible = 0xFFFE;

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

uint16_t rd_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

// Parse RIFF chunks up to 'data'. Returns false on malformed input.
bool parse_wav(const uint8_t* buf, uint64_t size, WavFormat* fmt) {
  if (size < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0) {
    return false;
  }
  uint64_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= size) {
    const uint8_t* chunk = buf + pos;
    uint32_t chunk_size = rd_u32(chunk + 4);
    pos += 8;
    if (pos + chunk_size > size) {
      chunk_size = size - pos;  // tolerate truncated final chunk
    }
    if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16) {
      fmt->tag = rd_u16(buf + pos);
      fmt->channels = rd_u16(buf + pos + 2);
      fmt->samplerate = rd_u32(buf + pos + 4);
      fmt->block_align = rd_u16(buf + pos + 12);
      fmt->bits = rd_u16(buf + pos + 14);
      if (fmt->tag == kExtensible && chunk_size >= 40) {
        fmt->tag = rd_u16(buf + pos + 24);
      }
      have_fmt = true;
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      if (!have_fmt) return false;
      fmt->data = buf + pos;
      fmt->data_size = chunk_size;
      return true;
    }
    pos += chunk_size + (chunk_size & 1);
  }
  return false;
}

// Decode up to max_frames interleaved frames into planar float32
// (channel-major: out[ch * max_frames + i]). Returns frames decoded.
int64_t decode_payload(const WavFormat& fmt, float* out,
                       int64_t max_frames, int out_stride) {
  const int ch = fmt.channels;
  const int64_t frames_avail =
      fmt.block_align ? static_cast<int64_t>(fmt.data_size / fmt.block_align)
                      : 0;
  const int64_t n = frames_avail < max_frames ? frames_avail : max_frames;

  if (fmt.tag == kFloat && fmt.bits == 32) {
    const float* src = reinterpret_cast<const float*>(fmt.data);
    for (int64_t i = 0; i < n; ++i)
      for (int c = 0; c < ch; ++c)
        out[c * out_stride + i] = src[i * ch + c];
  } else if (fmt.tag == kPcm && fmt.bits == 16) {
    const int16_t* src = reinterpret_cast<const int16_t*>(fmt.data);
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i)
      for (int c = 0; c < ch; ++c)
        out[c * out_stride + i] = src[i * ch + c] * kScale;
  } else if (fmt.tag == kPcm && fmt.bits == 32) {
    const int32_t* src = reinterpret_cast<const int32_t*>(fmt.data);
    constexpr float kScale = 1.0f / 2147483648.0f;
    for (int64_t i = 0; i < n; ++i)
      for (int c = 0; c < ch; ++c)
        out[c * out_stride + i] = src[i * ch + c] * kScale;
  } else if (fmt.tag == kPcm && fmt.bits == 24) {
    const uint8_t* src = fmt.data;
    constexpr float kScale = 1.0f / 8388608.0f;
    for (int64_t i = 0; i < n; ++i) {
      for (int c = 0; c < ch; ++c) {
        const uint8_t* s = src + (i * ch + c) * 3;
        int32_t v = s[0] | (s[1] << 8) | (s[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[c * out_stride + i] = v * kScale;
      }
    }
  } else {
    return -1;
  }
  return n;
}

// ---------------------------------------------------------------------
// FLAC decoder (mirrors brever_tpu/flac.py, the correctness reference):
// fixed-blocksize streams, constant/verbatim/fixed/LPC subframes, Rice
// and Rice2 residual partitions with escapes, wasted bits, and the
// independent / left-side / right-side / mid-side channel assignments.

struct BitReader {
  const uint8_t* buf;
  uint64_t size;
  uint64_t pos = 0;  // bit position
  bool ok = true;

  uint64_t ReadUint(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      uint64_t byte = pos >> 3;
      if (byte >= size) {
        ok = false;
        return 0;
      }
      v = (v << 1) | ((buf[byte] >> (7 - (pos & 7))) & 1);
      ++pos;
    }
    return v;
  }

  int64_t ReadInt(int n) {
    uint64_t v = ReadUint(n);
    if (n > 0 && (v >> (n - 1)) & 1) {
      return static_cast<int64_t>(v) - (int64_t{1} << n);
    }
    return static_cast<int64_t>(v);
  }

  int64_t ReadUnary() {
    int64_t q = 0;
    while (true) {
      uint64_t byte = pos >> 3;
      if (byte >= size) {
        ok = false;
        return 0;
      }
      if ((buf[byte] >> (7 - (pos & 7))) & 1) {
        ++pos;
        return q;
      }
      ++pos;
      ++q;
    }
  }

  void Align() { pos = (pos + 7) & ~uint64_t{7}; }
};

struct FlacInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
  uint64_t first_frame = 0;  // byte offset
};

bool parse_flac_header(const uint8_t* buf, uint64_t size, FlacInfo* info) {
  if (size < 8 || std::memcmp(buf, "fLaC", 4) != 0) return false;
  uint64_t pos = 4;
  bool have_info = false;
  while (pos + 4 <= size) {
    uint8_t header = buf[pos];
    uint32_t length = (buf[pos + 1] << 16) | (buf[pos + 2] << 8)
        | buf[pos + 3];
    if (pos + 4 + length > size) return false;
    if ((header & 0x7F) == 0 && length >= 34) {
      const uint8_t* p = buf + pos + 4;
      uint64_t rest = 0;
      for (int i = 10; i < 18; ++i) rest = (rest << 8) | p[i];
      info->sample_rate = static_cast<uint32_t>(rest >> 44);
      info->channels = static_cast<int>((rest >> 41) & 0x7) + 1;
      info->bps = static_cast<int>((rest >> 36) & 0x1F) + 1;
      info->total_samples = rest & ((uint64_t{1} << 36) - 1);
      have_info = true;
    }
    pos += 4 + length;
    if (header & 0x80) break;
  }
  info->first_frame = pos;
  return have_info;
}

bool read_utf8_coded(BitReader* r) {
  uint64_t first = r->ReadUint(8);
  if (first < 0x80) return r->ok;
  int n_extra = 0;
  uint64_t mask = 0x40;
  while (first & mask) {
    ++n_extra;
    mask >>= 1;
  }
  if (n_extra == 0 || n_extra > 6) return false;
  for (int i = 0; i < n_extra; ++i) {
    uint64_t b = r->ReadUint(8);
    if ((b & 0xC0) != 0x80) return false;
  }
  return r->ok;
}

bool decode_flac_residual(BitReader* r, int blocksize, int order,
                          int64_t* res) {
  int method = static_cast<int>(r->ReadUint(2));
  if (method > 1) return false;
  int param_bits = 4 + method;
  uint64_t escape = (uint64_t{1} << param_bits) - 1;
  int porder = static_cast<int>(r->ReadUint(4));
  int n_partitions = 1 << porder;
  if (blocksize % n_partitions) return false;
  int part_len = blocksize >> porder;
  int64_t filled = 0;
  for (int p = 0; p < n_partitions; ++p) {
    int n = part_len - (p == 0 ? order : 0);
    uint64_t param = r->ReadUint(param_bits);
    if (param == escape) {
      int raw_bits = static_cast<int>(r->ReadUint(5));
      for (int i = 0; i < n; ++i)
        res[filled++] = raw_bits ? r->ReadInt(raw_bits) : 0;
    } else {
      for (int i = 0; i < n; ++i) {
        int64_t q = r->ReadUnary();
        uint64_t rem = param ? r->ReadUint(static_cast<int>(param)) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | rem;
        res[filled++] = static_cast<int64_t>(u >> 1) ^
            -static_cast<int64_t>(u & 1);
      }
    }
    if (!r->ok) return false;
  }
  return true;
}

constexpr int kFixedCoefs[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0},
    {3, -3, 1, 0}, {4, -6, 4, -1}};

bool decode_flac_subframe(BitReader* r, int blocksize, int bps,
                          int64_t* out, std::vector<int64_t>* scratch) {
  if (r->ReadUint(1)) return false;
  int stype = static_cast<int>(r->ReadUint(6));
  int wasted = 0;
  if (r->ReadUint(1)) wasted = 1 + static_cast<int>(r->ReadUnary());
  bps -= wasted;
  if (!r->ok || bps <= 0 || bps > 33) return false;
  scratch->resize(blocksize);
  int64_t* res = scratch->data();

  if (stype == 0) {  // CONSTANT
    int64_t v = r->ReadInt(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (stype == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = r->ReadInt(bps);
  } else if (stype >= 8 && stype <= 12) {  // FIXED
    int order = stype - 8;
    for (int i = 0; i < order; ++i) out[i] = r->ReadInt(bps);
    if (!decode_flac_residual(r, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j)
        pred += kFixedCoefs[order][j] * out[i - 1 - j];
      out[i] = res[i - order] + pred;
    }
  } else if (stype >= 32) {  // LPC
    int order = (stype & 31) + 1;
    for (int i = 0; i < order; ++i) out[i] = r->ReadInt(bps);
    int precision = static_cast<int>(r->ReadUint(4)) + 1;
    if (precision == 16) return false;
    int shift = static_cast<int>(r->ReadInt(5));
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i) coefs[i] = r->ReadInt(precision);
    if (!decode_flac_residual(r, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coefs[j] * out[i - 1 - j];
      out[i] = res[i - order] + (pred >> shift);
    }
  } else {
    return false;
  }
  if (wasted) {
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  }
  return r->ok;
}

// Decode up to max_frames into planar float32 (channel-major with
// out_stride). Returns frames decoded, or negative on error.
int64_t decode_flac(const uint8_t* buf, uint64_t size, float* out,
                    int64_t max_frames, int out_stride,
                    FlacInfo* info_out) {
  FlacInfo info;
  if (!parse_flac_header(buf, size, &info)) return -2;
  *info_out = info;
  const int channels = info.channels;
  if (channels < 1 || channels > 8) return -2;
  const float scale = 1.0f / static_cast<float>(1u << (info.bps - 1));

  BitReader r{buf + info.first_frame, size - info.first_frame};
  std::vector<int64_t> sub[8];
  std::vector<int64_t> scratch;
  int64_t decoded = 0;
  while (decoded < max_frames && r.ok &&
         (r.pos >> 3) + 2 < r.size) {
    if (r.ReadUint(14) != 0x3FFE) break;
    r.ReadUint(2);  // reserved + blocking strategy
    int bs_code = static_cast<int>(r.ReadUint(4));
    r.ReadUint(4);  // sample rate code
    int ch_code = static_cast<int>(r.ReadUint(4));
    int ss_code = static_cast<int>(r.ReadUint(3));
    r.ReadUint(1);
    if (!read_utf8_coded(&r)) return -3;
    int blocksize;
    if (bs_code == 1) {
      blocksize = 192;
    } else if (bs_code >= 2 && bs_code <= 5) {
      blocksize = 576 << (bs_code - 2);
    } else if (bs_code == 6) {
      blocksize = static_cast<int>(r.ReadUint(8)) + 1;
    } else if (bs_code == 7) {
      blocksize = static_cast<int>(r.ReadUint(16)) + 1;
    } else if (bs_code >= 8) {
      blocksize = 256 << (bs_code - 8);
    } else {
      return -3;
    }
    static const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    int bps = ss_code == 0 ? info.bps : kSampleSizes[ss_code];
    if (bps == 0) return -3;
    r.ReadUint(8);  // CRC-8

    int n_sub = ch_code < 8 ? ch_code + 1 : 2;
    if (ch_code >= 11) return -3;
    if (n_sub != channels) return -3;
    for (int c = 0; c < n_sub; ++c) {
      int sub_bps = bps;
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1)) {
        sub_bps += 1;  // the 'side' channel carries one extra bit
      }
      sub[c].resize(blocksize);
      if (!decode_flac_subframe(&r, blocksize, sub_bps, sub[c].data(),
                                &scratch)) {
        return -3;
      }
    }
    r.Align();
    r.ReadUint(16);  // CRC-16

    int64_t n = blocksize;
    if (decoded + n > max_frames) n = max_frames - decoded;
    for (int64_t i = 0; i < n; ++i) {
      int64_t l, rr;
      if (ch_code == 8) {          // left/side
        l = sub[0][i];
        rr = sub[0][i] - sub[1][i];
      } else if (ch_code == 9) {   // right/side
        rr = sub[1][i];
        l = sub[1][i] + sub[0][i];
      } else if (ch_code == 10) {  // mid/side
        int64_t m2 = (sub[0][i] << 1) | (sub[1][i] & 1);
        l = (m2 + sub[1][i]) >> 1;
        rr = (m2 - sub[1][i]) >> 1;
      } else {
        for (int c = 0; c < channels; ++c)
          out[c * out_stride + decoded + i] =
              static_cast<float>(sub[c][i]) * scale;
        continue;
      }
      out[0 * out_stride + decoded + i] = static_cast<float>(l) * scale;
      out[1 * out_stride + decoded + i] = static_cast<float>(rr) * scale;
    }
    decoded += n;
  }
  return decoded;
}

}  // namespace

extern "C" {

// Decode one in-memory WAV or FLAC member into planar float32 (out has
// channels * max_frames floats, channel-major). Returns frames decoded
// or a negative error code.
int64_t bn_decode_wav(const uint8_t* buf, uint64_t size, float* out,
                      int64_t max_frames, int32_t* channels,
                      int32_t* samplerate) {
  if (size >= 4 && std::memcmp(buf, "fLaC", 4) == 0) {
    FlacInfo info;
    int64_t n = decode_flac(buf, size, out, max_frames, max_frames,
                            &info);
    if (n >= 0) {
      *channels = info.channels;
      *samplerate = static_cast<int32_t>(info.sample_rate);
    }
    return n;
  }
  WavFormat fmt;
  if (!parse_wav(buf, size, &fmt)) return -2;
  *channels = fmt.channels;
  *samplerate = fmt.samplerate;
  return decode_payload(fmt, out, max_frames, max_frames);
}

// Read `n` WAV members of one tar archive (byte ranges given by
// offsets/sizes) and decode them into a zero-initialized batch buffer
// `out` of shape [n, channels, max_frames] (C order). `lengths[i]`
// receives the decoded frame count. Parallel across members.
// Returns 0 on success, else the count of failed members.
int32_t bn_load_tar_batch(const char* tar_path, const uint64_t* offsets,
                          const uint64_t* sizes, int32_t n,
                          int32_t channels, int64_t max_frames, float* out,
                          int64_t* lengths, int32_t num_threads) {
  int fd = ::open(tar_path, O_RDONLY);
  if (fd < 0) return -1;

  std::atomic<int32_t> next(0);
  std::atomic<int32_t> failures(0);

  auto worker = [&]() {
    std::vector<uint8_t> buf;
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      buf.resize(sizes[i]);
      ssize_t got = ::pread(fd, buf.data(), sizes[i],
                            static_cast<off_t>(offsets[i]));
      if (got != static_cast<ssize_t>(sizes[i])) {
        failures.fetch_add(1);
        lengths[i] = 0;
        continue;
      }
      float* dst = out + static_cast<int64_t>(i) * channels * max_frames;
      int64_t decoded;
      if (sizes[i] >= 4 && std::memcmp(buf.data(), "fLaC", 4) == 0) {
        FlacInfo info;
        decoded = decode_flac(buf.data(), sizes[i], dst, max_frames,
                              max_frames, &info);
        if (decoded >= 0 && info.channels != channels) decoded = -4;
      } else {
        WavFormat fmt;
        if (!parse_wav(buf.data(), sizes[i], &fmt) ||
            fmt.channels != channels) {
          failures.fetch_add(1);
          lengths[i] = 0;
          continue;
        }
        decoded = decode_payload(fmt, dst, max_frames, max_frames);
      }
      if (decoded < 0) {
        failures.fetch_add(1);
        lengths[i] = 0;
      } else {
        lengths[i] = decoded;
      }
    }
  };

  int32_t n_threads = num_threads > 0 ? num_threads : 4;
  if (n_threads > n) n_threads = n;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  ::close(fd);
  return failures.load();
}

}  // extern "C"
