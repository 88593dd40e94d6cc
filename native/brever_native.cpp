// brever_tpu native runtime: parallel tar/WAV batch loading.
//
// The host input pipeline's hot loop is "read N tar members, decode WAV,
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

}  // namespace

extern "C" {

// Decode one in-memory WAV into planar float32 (out has
// channels * max_frames floats, channel-major). Returns frames decoded
// or a negative error code.
int64_t bn_decode_wav(const uint8_t* buf, uint64_t size, float* out,
                      int64_t max_frames, int32_t* channels,
                      int32_t* samplerate) {
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
      WavFormat fmt;
      if (!parse_wav(buf.data(), sizes[i], &fmt) ||
          fmt.channels != channels) {
        failures.fetch_add(1);
        lengths[i] = 0;
        continue;
      }
      float* dst = out + static_cast<int64_t>(i) * channels * max_frames;
      int64_t decoded = decode_payload(fmt, dst, max_frames, max_frames);
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
