// Native WAV chunk reader for the MUSDB18 data pipeline.
//
// The reference leans on libsndfile via the soundfile package for its
// seek-read chunk loader (reference: musdb_dataset.py:17-47).  This is the
// framework's own native IO layer: a dependency-free RIFF/WAVE parser with
// positioned reads, returning planar float32 (channels, frames) buffers
// ready for stacking into training batches.  Built with g++ at first use and
// bound through ctypes (tfswa_tpu/native/__init__.py).
//
// Supported encodings: PCM16, PCM24, PCM32, IEEE float32 — covers
// MUSDB18-HQ (PCM16) and common exports.
//
// Thread-safe: no global state; each call opens its own descriptor, so the
// Python loader's IO thread pool scales without locking.

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct WavInfo {
  int64_t data_offset = 0;   // byte offset of sample data
  int64_t num_frames = 0;
  int32_t channels = 0;
  int32_t sample_rate = 0;
  int32_t bits = 0;
  int32_t format = 0;        // 1 = PCM, 3 = IEEE float
};

bool read_header(std::FILE* f, WavInfo* info) {
  char id[4];
  uint32_t chunk_size = 0;
  if (std::fread(id, 1, 4, f) != 4 || std::memcmp(id, "RIFF", 4) != 0) {
    return false;
  }
  if (std::fread(&chunk_size, 4, 1, f) != 1) return false;
  if (std::fread(id, 1, 4, f) != 4 || std::memcmp(id, "WAVE", 4) != 0) {
    return false;
  }
  bool have_fmt = false;
  while (std::fread(id, 1, 4, f) == 4 && std::fread(&chunk_size, 4, 1, f) == 1) {
    if (std::memcmp(id, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (chunk_size < 16 || std::fread(fmt, 1, 16, f) != 16) return false;
      uint16_t tag;
      std::memcpy(&tag, fmt, 2);
      info->format = tag;
      uint16_t ch;
      std::memcpy(&ch, fmt + 2, 2);
      info->channels = ch;
      uint32_t sr;
      std::memcpy(&sr, fmt + 4, 4);
      info->sample_rate = static_cast<int32_t>(sr);
      uint16_t bits;
      std::memcpy(&bits, fmt + 14, 2);
      info->bits = bits;
      // WAVE_FORMAT_EXTENSIBLE: the real tag lives in the SubFormat GUID
      if (tag == 0xFFFE && chunk_size >= 40) {
        unsigned char ext[24];
        if (std::fread(ext, 1, 24, f) != 24) return false;
        uint16_t sub;
        std::memcpy(&sub, ext + 8, 2);
        info->format = sub;
        if (chunk_size > 40) std::fseek(f, chunk_size - 40, SEEK_CUR);
      } else if (chunk_size > 16) {
        std::fseek(f, chunk_size - 16, SEEK_CUR);
      }
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      info->data_offset = std::ftell(f);
      if (have_fmt && info->channels > 0 && info->bits > 0) {
        info->num_frames =
            static_cast<int64_t>(chunk_size) / (info->channels * info->bits / 8);
      }
      return have_fmt;
    } else {
      // skip unknown chunk (word-aligned)
      std::fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  return false;
}

inline float pcm16_to_f32(const unsigned char* p) {
  int16_t v;
  std::memcpy(&v, p, 2);
  return static_cast<float>(v) / 32768.0f;
}

inline float pcm24_to_f32(const unsigned char* p) {
  int32_t v = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);  // sign-extended <<8
  return static_cast<float>(v >> 8) / 8388608.0f;
}

inline float pcm32_to_f32(const unsigned char* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return static_cast<float>(v) / 2147483648.0f;
}

}  // namespace

extern "C" {

// Returns 0 on success. Outputs: frames, channels, sample_rate.
int tfswa_wav_info(const char* path, int64_t* frames, int32_t* channels,
                   int32_t* sample_rate) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = read_header(f, &info);
  std::fclose(f);
  if (!ok) return -2;
  *frames = info.num_frames;
  *channels = info.channels;
  *sample_rate = info.sample_rate;
  return 0;
}

// Read `frames` frames starting at frame `start` into planar float32
// out[out_channels][frames].  Frames past EOF are zero-filled; mono sources
// are duplicated across output channels (reference: musdb_dataset.py:35-44).
// Returns 0 on success.
int tfswa_wav_read(const char* path, int64_t start, int64_t frames,
                   int32_t out_channels, float* out) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_header(f, &info)) {
    std::fclose(f);
    return -2;
  }
  const int32_t bytes_per_sample = info.bits / 8;
  const int32_t frame_bytes = info.channels * bytes_per_sample;
  const bool is_float = info.format == 3 && info.bits == 32;
  const bool is_pcm16 = info.format == 1 && info.bits == 16;
  const bool is_pcm24 = info.format == 1 && info.bits == 24;
  const bool is_pcm32 = info.format == 1 && info.bits == 32;
  if (!is_float && !is_pcm16 && !is_pcm24 && !is_pcm32) {
    std::fclose(f);
    return -3;
  }

  std::memset(out, 0, sizeof(float) * out_channels * frames);

  int64_t first = start < 0 ? 0 : start;
  if (first < info.num_frames && frames > 0) {
    int64_t avail = info.num_frames - first;
    int64_t todo = frames < avail ? frames : avail;
    std::fseek(f, static_cast<long>(info.data_offset + first * frame_bytes),
               SEEK_SET);

    constexpr int64_t kBuf = 1 << 16;  // frames per read
    unsigned char* buf = new unsigned char[kBuf * frame_bytes];
    int64_t done = 0;
    while (done < todo) {
      int64_t n = todo - done < kBuf ? todo - done : kBuf;
      size_t got = std::fread(buf, frame_bytes, static_cast<size_t>(n), f);
      if (got == 0) break;
      for (size_t i = 0; i < got; ++i) {
        for (int32_t c = 0; c < out_channels; ++c) {
          int32_t src_c = c < info.channels ? c : info.channels - 1;
          const unsigned char* p =
              buf + i * frame_bytes + src_c * bytes_per_sample;
          float v;
          if (is_pcm16) v = pcm16_to_f32(p);
          else if (is_pcm24) v = pcm24_to_f32(p);
          else if (is_pcm32) v = pcm32_to_f32(p);
          else std::memcpy(&v, p, 4);
          out[c * frames + done + i] = v;
        }
      }
      done += static_cast<int64_t>(got);
    }
    delete[] buf;
  }
  std::fclose(f);
  return 0;
}

// Write planar float32 data[channels][frames] as PCM16 WAV. Returns 0 on ok.
int tfswa_wav_write(const char* path, const float* data, int64_t frames,
                    int32_t channels, int32_t sample_rate) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_bytes = static_cast<uint32_t>(frames * channels * 2);
  uint32_t riff_size = 36 + data_bytes;
  uint16_t tag = 1, bits = 16;
  uint16_t block = static_cast<uint16_t>(channels * 2);
  uint32_t byte_rate = sample_rate * block;
  uint32_t fmt_size = 16;
  uint16_t ch16 = static_cast<uint16_t>(channels);
  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVE", 1, 4, f);
  std::fwrite("fmt ", 1, 4, f);
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&tag, 2, 1, f);
  std::fwrite(&ch16, 2, 1, f);
  std::fwrite(&sample_rate, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_bytes, 4, 1, f);
  const int64_t kBuf = 1 << 16;
  int16_t* buf = new int16_t[kBuf * channels];
  int64_t done = 0;
  while (done < frames) {
    int64_t n = frames - done < kBuf ? frames - done : kBuf;
    for (int64_t i = 0; i < n; ++i) {
      for (int32_t c = 0; c < channels; ++c) {
        float v = data[c * frames + done + i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        buf[i * channels + c] = static_cast<int16_t>(v * 32767.0f);
      }
    }
    std::fwrite(buf, 2, static_cast<size_t>(n * channels), f);
    done += n;
  }
  delete[] buf;
  std::fclose(f);
  return 0;
}

}  // extern "C"
