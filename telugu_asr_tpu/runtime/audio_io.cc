// Native audio decode + batch assembly for the host data pipeline.
//
// The reference's host-side bottleneck is per-utterance Python audio decode
// inside tf.py_function (SURVEY §3, moonshine/dataset.py:246-266).  This
// library decodes RIFF/WAVE files (PCM 8/16/24/32 and IEEE float) straight
// into the caller's pinned batch buffer, fanning files across a thread pool
// so disk I/O and decode overlap with the device step.
//
// C ABI (ctypes-friendly):
//   decode_wav(path, out, cap, &sample_rate)           -> samples or -errno
//   decode_wav_batch(paths, n, out, cap, lengths, nthreads)
//       out is row-major [n, cap]; rows are zero-padded; lengths[i] holds the
//       decoded sample count (clipped to cap); returns 0 or the count of
//       failed rows (failed rows get length 0).
//
// Build: see build_native.py (g++ -O3 -shared -fPIC -pthread).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Fmt {
  uint16_t audio_format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

// Read a whole file into memory.  Returns false on I/O failure.
bool read_file(const char* path, std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  data.resize(static_cast<size_t>(size));
  size_t got = std::fread(data.data(), 1, data.size(), f);
  std::fclose(f);
  return got == data.size();
}

inline uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
inline uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Decode into out[0..cap); returns sample count (mono, post-downmix) or -1.
long decode_buffer(const std::vector<uint8_t>& d, float* out, long cap, int* sample_rate) {
  if (d.size() < 12 || std::memcmp(d.data(), "RIFF", 4) != 0 ||
      std::memcmp(d.data() + 8, "WAVE", 4) != 0) {
    return -1;
  }
  Fmt fmt;
  const uint8_t* raw = nullptr;
  size_t raw_size = 0;
  size_t pos = 12;
  while (pos + 8 <= d.size()) {
    const uint8_t* chunk = d.data() + pos;
    uint32_t chunk_size = rd_u32(chunk + 4);
    const uint8_t* body = chunk + 8;
    if (pos + 8 + chunk_size > d.size()) chunk_size = static_cast<uint32_t>(d.size() - pos - 8);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16) {
      fmt.audio_format = rd_u16(body);
      fmt.channels = rd_u16(body + 2);
      fmt.sample_rate = rd_u32(body + 4);
      fmt.bits = rd_u16(body + 14);
      if (fmt.audio_format == 0xFFFE) fmt.audio_format = 1;  // EXTENSIBLE -> PCM
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      raw = body;
      raw_size = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
    if (fmt.channels && raw) break;
  }
  if (!fmt.channels || !raw) return -1;
  if (sample_rate) *sample_rate = static_cast<int>(fmt.sample_rate);

  const long ch = fmt.channels;
  long frames = 0;
  switch (fmt.bits) {
    case 8:  frames = static_cast<long>(raw_size) / ch; break;
    case 16: frames = static_cast<long>(raw_size) / (2 * ch); break;
    case 24: frames = static_cast<long>(raw_size) / (3 * ch); break;
    case 32: frames = static_cast<long>(raw_size) / (4 * ch); break;
    case 64: frames = static_cast<long>(raw_size) / (8 * ch); break;
    default: return -1;
  }
  if (frames > cap) frames = cap;

  auto sample_at = [&](long i, long c) -> float {
    const long idx = i * ch + c;
    switch (fmt.audio_format) {
      case 1:  // integer PCM
        switch (fmt.bits) {
          case 16: {
            int16_t v;
            std::memcpy(&v, raw + idx * 2, 2);
            return static_cast<float>(v) / 32768.0f;
          }
          case 8:
            return (static_cast<float>(raw[idx]) - 128.0f) / 128.0f;
          case 24: {
            const uint8_t* p = raw + idx * 3;
            int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
            if (v >= (1 << 23)) v -= (1 << 24);
            return static_cast<float>(v) / 8388608.0f;
          }
          case 32: {
            int32_t v;
            std::memcpy(&v, raw + idx * 4, 4);
            return static_cast<float>(v) / 2147483648.0f;
          }
        }
        return 0.0f;
      case 3:  // IEEE float
        if (fmt.bits == 32) {
          float v;
          std::memcpy(&v, raw + idx * 4, 4);
          return v;
        } else {
          double v;
          std::memcpy(&v, raw + idx * 8, 8);
          return static_cast<float>(v);
        }
      default:
        return 0.0f;
    }
  };

  if (ch == 1) {
    for (long i = 0; i < frames; ++i) out[i] = sample_at(i, 0);
  } else {  // downmix: mean over channels (data_util.py:22-24 semantics)
    const float inv = 1.0f / static_cast<float>(ch);
    for (long i = 0; i < frames; ++i) {
      float acc = 0.0f;
      for (long c = 0; c < ch; ++c) acc += sample_at(i, c);
      out[i] = acc * inv;
    }
  }
  return frames;
}

}  // namespace

extern "C" {

long decode_wav(const char* path, float* out, long cap, int* sample_rate) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return -1;
  return decode_buffer(data, out, cap, sample_rate);
}

long decode_wav_batch(const char** paths, long n, float* out, long cap,
                      long* lengths, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<long> next(0);
  std::atomic<long> failures(0);

  auto worker = [&]() {
    std::vector<uint8_t> data;
    while (true) {
      const long i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + i * cap;
      std::memset(row, 0, sizeof(float) * static_cast<size_t>(cap));
      long got = -1;
      if (read_file(paths[i], data)) {
        got = decode_buffer(data, row, cap, nullptr);
      }
      if (got < 0) {
        lengths[i] = 0;
        failures.fetch_add(1);
      } else {
        lengths[i] = got;
      }
    }
  };

  std::vector<std::thread> pool;
  const int workers = static_cast<int>(n < n_threads ? n : n_threads);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
