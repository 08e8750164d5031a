// WAV ingestion: PCM16/PCM32/PCM8 read + windowed-sinc polyphase resampling.
//
// Native counterpart of the reference's sox/sph2pipe subprocess usage
// (reference datasets/*/prepare.py, prepare_kaldi.py:36-42) and librosa
// loading (utils/data_io.py:192) — decode + resample in-process.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {
constexpr double kPi = 3.14159265358979323846;

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  long data_offset = 0;
  long data_bytes = 0;
};

bool supported_format(const WavInfo& info) {
  if (info.channels <= 0 || info.sample_rate <= 0) return false;
  if (info.format == 1)  // integer PCM
    return info.bits == 8 || info.bits == 16 || info.bits == 24 ||
           info.bits == 32;
  if (info.format == 3)  // IEEE float
    return info.bits == 32;
  return false;
}

bool parse_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;
  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return false;
    if (memcmp(id, "fmt ", 4) == 0) {
      if (size < 16) return false;
      std::vector<char> buf(size);
      if (fread(buf.data(), 1, size, f) != size) return false;
      info->format = *(uint16_t*)(buf.data() + 0);
      info->channels = *(uint16_t*)(buf.data() + 2);
      info->sample_rate = *(uint32_t*)(buf.data() + 4);
      info->bits = *(uint16_t*)(buf.data() + 14);
      if (info->format == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
        info->format = *(uint16_t*)(buf.data() + 24);  // subformat GUID tag
      have_fmt = true;
      if (size & 1) fseek(f, 1, SEEK_CUR);  // RIFF pad byte
    } else if (memcmp(id, "data", 4) == 0) {
      if (!have_fmt || !supported_format(*info)) return false;
      info->data_offset = ftell(f);
      // clamp to the bytes actually present (truncated/streamed files
      // declare more; a 0xFFFFFFFF header would otherwise drive a 4 GB
      // allocation)
      fseek(f, 0, SEEK_END);
      const long remaining = ftell(f) - info->data_offset;
      info->data_bytes = std::min((long)size, std::max(remaining, 0L));
      return true;
    } else {
      // chunks are word-aligned: odd sizes carry a pad byte
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}
}  // namespace

extern "C" {

// returns sample count (mono, averaged over channels), fills *sample_rate;
// pass out=nullptr to query the size first. Returns -1 on error.
int64_t mlvae_read_wav(const char* path, float* out, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return -1;
  }
  const int bytes_per = info.bits / 8;
  const long frames = info.data_bytes / (bytes_per * info.channels);
  *sample_rate = info.sample_rate;
  if (out == nullptr) {
    fclose(f);
    return frames;
  }
  fseek(f, info.data_offset, SEEK_SET);
  std::vector<char> raw(info.data_bytes);
  const size_t got = fread(raw.data(), 1, info.data_bytes, f);
  fclose(f);
  const long have = (long)(got / (bytes_per * info.channels));
  for (long i = 0; i < have; ++i) {
    double acc = 0.0;
    for (int c = 0; c < info.channels; ++c) {
      const char* p = raw.data() + (i * info.channels + c) * bytes_per;
      if (info.format == 3)  // IEEE float32
        acc += *(const float*)p;
      else if (info.bits == 16)
        acc += *(int16_t*)p / 32768.0;
      else if (info.bits == 32)
        acc += *(int32_t*)p / 2147483648.0;
      else if (info.bits == 24) {
        // little-endian signed 24-bit
        int32_t v = (uint8_t)p[0] | ((uint8_t)p[1] << 8) |
                    ((int8_t)p[2] << 16);
        acc += v / 8388608.0;
      } else if (info.bits == 8)
        acc += ((*(uint8_t*)p) - 128) / 128.0;
    }
    out[i] = (float)(acc / info.channels);
  }
  return have;
}

// windowed-sinc polyphase resample; returns output length
int64_t mlvae_resample(const float* in, int64_t n_in, int32_t sr_in,
                       int32_t sr_out, float* out, int64_t out_capacity) {
  if (sr_in == sr_out) {
    const int64_t n = std::min(n_in, out_capacity);
    memcpy(out, in, sizeof(float) * n);
    return n;
  }
  const double ratio = (double)sr_out / sr_in;
  const int64_t n_out = std::min<int64_t>(
      (int64_t)std::ceil(n_in * ratio), out_capacity);
  const double cutoff = 0.475 * std::min(1.0, ratio);
  const int half = 16;
  for (int64_t i = 0; i < n_out; ++i) {
    const double center = i / ratio;
    const long j0 = (long)std::floor(center) - half;
    double acc = 0.0, wsum = 0.0;
    for (long j = j0; j <= j0 + 2 * half; ++j) {
      if (j < 0 || j >= n_in) continue;
      const double x = center - j;
      const double sinc =
          x == 0.0 ? 2 * cutoff : std::sin(2 * kPi * cutoff * x) / (kPi * x);
      const double win = 0.5 + 0.5 * std::cos(kPi * (x) / (half + 1));
      acc += in[j] * sinc * win;
      wsum += sinc * win;
    }
    out[i] = (float)(acc / (wsum > 1e-12 ? wsum : 1.0));
  }
  return n_out;
}

}  // extern "C"
