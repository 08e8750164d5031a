// WAV ingestion: RIFF PCM read, NIST SPHERE read (raw PCM/ulaw and
// embedded-shorten payloads, the actual LDC TIMIT encoding), and
// windowed-sinc polyphase resampling.
//
// Native counterpart of the reference's sox/sph2pipe subprocess usage
// (reference datasets/*/prepare.py, prepare_kaldi.py:36-42) and librosa
// loading (utils/data_io.py:192) — decode + resample in-process.  The
// shorten decoder is the C++ twin of mlvae_tpu/data/shorten.py and is
// cross-checked against it by tests/test_shorten.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
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

// ---------------------------------------------------------------------------
// shorten ("ajkg") decoder — mirrors mlvae_tpu/data/shorten.py
// ---------------------------------------------------------------------------
namespace shn {

enum {
  FN_DIFF0 = 0, FN_DIFF1 = 1, FN_DIFF2 = 2, FN_DIFF3 = 3,
  FN_QUIT = 4, FN_BLOCKSIZE = 5, FN_BITSHIFT = 6, FN_QLPC = 7,
  FN_ZERO = 8, FN_VERBATIM = 9,
};
enum {
  TYPE_AU1 = 0, TYPE_S8 = 1, TYPE_U8 = 2, TYPE_S16HL = 3, TYPE_U16HL = 4,
  TYPE_S16LH = 5, TYPE_U16LH = 6, TYPE_ULAW = 7, TYPE_AU2 = 8,
  TYPE_AU3 = 9, TYPE_ALAW = 10,
};
constexpr int kLpcQuant = 5;

struct BitReader {
  const uint8_t* data;
  size_t nbits;
  size_t pos = 0;
  bool ok = true;

  BitReader(const uint8_t* d, size_t nbytes) : data(d), nbits(nbytes * 8) {}

  int bit() {
    if (pos >= nbits) {
      ok = false;
      return 1;  // terminate unary runs so callers exit via !ok
    }
    const int b = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
    ++pos;
    return b;
  }
  long uvar(int k) {
    long v = 0;
    while (bit() == 0) {
      if (!ok) return 0;
      ++v;
    }
    for (int i = 0; i < k; ++i) v = (v << 1) | bit();
    return ok ? v : 0;
  }
  long svar(int k) {  // zig-zag signed residual
    const unsigned long u = (unsigned long)uvar(k + 1);
    return (u & 1) ? -(long)(u >> 1) - 1 : (long)(u >> 1);
  }
  long ulong_() { return uvar((int)uvar(2)); }
};

inline long cdiv(long a, long b) {  // C-style truncation toward zero
  long q = (a < 0 ? -a : a) / b;
  return ((a < 0) != (b < 0)) ? -q : q;
}
inline long rounded_shift_down(long x, int n) {
  return n == 0 ? x : ((x >> (n - 1)) + 1) >> 1;
}

// Decodes a complete stream.  On success fills per-channel sample vectors
// (file-type-domain values) and *ftype; returns true.
bool decode(const uint8_t* payload, size_t n, int* ftype_out,
            std::vector<std::vector<long>>* chans) {
  if (n < 5 || memcmp(payload, "ajkg", 4) != 0) return false;
  const int version = payload[4];
  if (version < 1 || version > 3) return false;
  BitReader r(payload + 5, n - 5);

  const long ftype = r.ulong_();
  const long nchan = r.ulong_();
  long blocksize = r.ulong_();
  const long maxnlpc = r.ulong_();
  const long nmean = r.ulong_();
  const long nskip = r.ulong_();
  for (long i = 0; i < nskip; ++i) r.uvar(7);
  if (!r.ok || nchan < 1 || nchan > 64 || blocksize < 1 ||
      blocksize > (1 << 20) || maxnlpc < 0 || maxnlpc > 1024)
    return false;
  if (ftype == TYPE_ALAW || ftype == TYPE_AU3) return false;

  const long nwrap = std::max(3L, maxnlpc);
  long mean0 = 0;
  if (ftype == TYPE_U8) mean0 = 0x80;
  if (ftype == TYPE_U16HL || ftype == TYPE_U16LH) mean0 = 0x8000;
  std::vector<std::vector<long>> hist(nchan, std::vector<long>(nwrap, 0));
  std::vector<std::vector<long>> offs(
      nchan, std::vector<long>(std::max(1L, nmean), mean0));
  chans->assign(nchan, {});
  const long lpcqoffset = version >= 2 ? (1L << kLpcQuant) : 0;
  int bitshift = 0;
  long chan = 0;
  std::vector<long> buf, qlpc;

  while (r.ok) {
    const long fn = r.uvar(2);
    if (!r.ok || fn == FN_QUIT) break;
    if (fn == FN_BLOCKSIZE) {
      blocksize = r.ulong_();
      if (blocksize < 1 || blocksize > (1 << 20)) return false;
      continue;
    }
    if (fn == FN_BITSHIFT) {
      bitshift = (int)r.uvar(2);
      continue;
    }
    if (fn == FN_VERBATIM) {
      const long len = r.uvar(5);
      for (long i = 0; i < len; ++i) r.uvar(8);
      continue;
    }
    if (fn > FN_VERBATIM) return false;

    int resn = 0;
    if (fn != FN_ZERO) {
      resn = (int)r.uvar(3);
      if (version == 0) --resn;
    }

    long coffset;
    if (nmean == 0) {
      coffset = offs[chan][0];
    } else {
      long sum = version >= 2 ? nmean / 2 : 0;
      for (long v : offs[chan]) sum += v;
      coffset = version >= 2
                    ? rounded_shift_down(cdiv(sum, nmean), bitshift)
                    : cdiv(sum, nmean);
    }

    std::vector<long>& h = hist[chan];
    buf.assign(blocksize, 0);
    switch (fn) {
      case FN_ZERO:
        break;
      case FN_DIFF0:
        for (long i = 0; i < blocksize; ++i) buf[i] = r.svar(resn) + coffset;
        break;
      case FN_DIFF1: {
        long p1 = h[nwrap - 1];
        for (long i = 0; i < blocksize; ++i) p1 = buf[i] = r.svar(resn) + p1;
        break;
      }
      case FN_DIFF2: {
        long p1 = h[nwrap - 1], p2 = h[nwrap - 2];
        for (long i = 0; i < blocksize; ++i) {
          const long cur = r.svar(resn) + 2 * p1 - p2;
          buf[i] = cur;
          p2 = p1;
          p1 = cur;
        }
        break;
      }
      case FN_DIFF3: {
        long p1 = h[nwrap - 1], p2 = h[nwrap - 2], p3 = h[nwrap - 3];
        for (long i = 0; i < blocksize; ++i) {
          const long cur = r.svar(resn) + 3 * (p1 - p2) + p3;
          buf[i] = cur;
          p3 = p2;
          p2 = p1;
          p1 = cur;
        }
        break;
      }
      case FN_QLPC: {
        const long nlpc = r.uvar(2);
        if (nlpc > nwrap) return false;
        qlpc.assign(nlpc, 0);
        for (long j = 0; j < nlpc; ++j) qlpc[j] = r.svar(kLpcQuant);
        // prediction runs in the offset-removed domain
        std::vector<long> work(nlpc + blocksize, 0);
        for (long j = 0; j < nlpc; ++j)
          work[j] = h[nwrap - nlpc + j] - coffset;
        for (long i = 0; i < blocksize; ++i) {
          long s = lpcqoffset;
          for (long j = 0; j < nlpc; ++j)
            s += qlpc[j] * work[nlpc + i - j - 1];
          work[nlpc + i] = r.svar(resn) + (s >> kLpcQuant);
        }
        for (long i = 0; i < blocksize; ++i) buf[i] = work[nlpc + i] + coffset;
        break;
      }
    }
    if (!r.ok) break;

    if (nmean > 0) {
      long sum = version >= 2 ? blocksize / 2 : 0;
      for (long v : buf) sum += v;
      offs[chan].erase(offs[chan].begin());
      const long m = cdiv(sum, blocksize);
      offs[chan].push_back(version >= 2 ? (m << bitshift) : m);
    }
    // wrap history (unshifted), then apply the bitshift to the output
    if (blocksize >= nwrap) {
      for (long i = 0; i < nwrap; ++i) h[i] = buf[blocksize - nwrap + i];
    } else {
      std::vector<long> merged(h);
      merged.insert(merged.end(), buf.begin(), buf.end());
      for (long i = 0; i < nwrap; ++i)
        h[i] = merged[merged.size() - nwrap + i];
    }
    std::vector<long>& out = (*chans)[chan];
    for (long v : buf) out.push_back(bitshift ? (v << bitshift) : v);
    chan = (chan + 1) % nchan;
  }
  *ftype_out = (int)ftype;
  return true;
}

}  // namespace shn

namespace {

inline int16_t ulaw_to_linear(uint8_t code) {
  const int u = (~code) & 0xFF;
  const int sign = (u >> 7) & 1;
  const int exp = (u >> 4) & 7;
  const int mant = u & 0xF;
  const int mag = (((mant << 1) + 33) << exp) - 33;
  return (int16_t)(sign ? -mag : mag);
}

struct SphereInfo {
  int sample_rate = 16000;
  int channels = 1;
  int sample_n_bytes = 2;
  long sample_count = -1;
  bool big_endian = false;
  bool ulaw = false;
  bool shorten = false;
};

// NIST SPHERE: 1024-byte ASCII header of "name -type value" lines.
bool parse_sphere_header(FILE* f, SphereInfo* info, long* data_offset) {
  char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "NIST_1A", 7) != 0)
    return false;
  char size_buf[9] = {0};
  if (fread(size_buf, 1, 8, f) != 8) return false;
  const long header_size = atol(size_buf);
  if (header_size < 16 || header_size > (1 << 20)) return false;
  std::vector<char> text(header_size - 16 + 1, 0);
  if (fread(text.data(), 1, header_size - 16, f) !=
      (size_t)(header_size - 16))
    return false;
  std::string header(text.data());
  size_t start = 0;
  while (start < header.size()) {
    size_t end = header.find('\n', start);
    if (end == std::string::npos) end = header.size();
    const std::string line = header.substr(start, end - start);
    start = end + 1;
    char name[64], type[16], value[256];
    if (sscanf(line.c_str(), "%63s %15s %255s", name, type, value) != 3 ||
        type[0] != '-')
      continue;
    if (strcmp(name, "sample_rate") == 0) info->sample_rate = atoi(value);
    else if (strcmp(name, "channel_count") == 0) info->channels = atoi(value);
    else if (strcmp(name, "sample_n_bytes") == 0)
      info->sample_n_bytes = atoi(value);
    else if (strcmp(name, "sample_count") == 0)
      info->sample_count = atol(value);
    else if (strcmp(name, "sample_byte_format") == 0)
      info->big_endian = strcmp(value, "10") == 0;
    else if (strcmp(name, "sample_coding") == 0) {
      if (strstr(value, "ulaw") || strstr(value, "mu-law")) info->ulaw = true;
      if (strstr(value, "shorten")) info->shorten = true;
    }
  }
  *data_offset = header_size;
  return info->sample_rate > 0 && info->channels > 0;
}

// Decodes a SPHERE file to mono float32 (channel-averaged); two-call
// protocol like mlvae_read_wav.  Returns frame count or -1.
int64_t read_sphere(FILE* f, float* out, int32_t* sample_rate) {
  SphereInfo info;
  long data_offset = 0;
  if (!parse_sphere_header(f, &info, &data_offset)) return -1;
  *sample_rate = info.sample_rate;
  fseek(f, 0, SEEK_END);
  const long payload_bytes = ftell(f) - data_offset;
  if (payload_bytes < 0) return -1;
  fseek(f, data_offset, SEEK_SET);
  std::vector<uint8_t> raw(payload_bytes);
  if (payload_bytes > 0 &&
      fread(raw.data(), 1, payload_bytes, f) != (size_t)payload_bytes)
    return -1;

  const int ch = info.channels;
  if (info.shorten) {
    int ftype = 0;
    std::vector<std::vector<long>> chans;
    if (!shn::decode(raw.data(), raw.size(), &ftype, &chans) ||
        (int)chans.size() != ch)
      return -1;
    long frames = chans[0].size();
    for (const auto& c : chans) frames = std::min(frames, (long)c.size());
    if (info.sample_count >= 0) frames = std::min(frames, info.sample_count);
    if (out == nullptr) return frames;
    const bool as_ulaw = info.ulaw || ftype == shn::TYPE_ULAW ||
                         ftype == shn::TYPE_AU1 || ftype == shn::TYPE_AU2;
    for (long i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < ch; ++c) {
        const long v = chans[c][i];
        acc += as_ulaw ? ulaw_to_linear((uint8_t)(v & 0xFF)) / 8192.0
                       : v / 32768.0;
      }
      out[i] = (float)(acc / ch);
    }
    return frames;
  }

  // raw PCM16 / ulaw payload
  const int bytes_per = info.ulaw ? 1 : info.sample_n_bytes;
  if (!info.ulaw && bytes_per != 2) return -1;
  long frames = payload_bytes / (bytes_per * ch);
  if (info.sample_count >= 0) frames = std::min(frames, info.sample_count);
  if (out == nullptr) return frames;
  for (long i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* p = raw.data() + (i * ch + c) * bytes_per;
      if (info.ulaw) {
        acc += ulaw_to_linear(*p) / 8192.0;
      } else {
        const int16_t v = info.big_endian ? (int16_t)((p[0] << 8) | p[1])
                                          : (int16_t)(p[0] | (p[1] << 8));
        acc += v / 32768.0;
      }
    }
    out[i] = (float)(acc / ch);
  }
  return frames;
}

}  // namespace

extern "C" {

// returns sample count (mono, averaged over channels), fills *sample_rate;
// pass out=nullptr to query the size first. Returns -1 on error.
int64_t mlvae_read_wav(const char* path, float* out, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char probe[7] = {0};
  const size_t got_probe = fread(probe, 1, 7, f);
  fseek(f, 0, SEEK_SET);
  if (got_probe == 7 && memcmp(probe, "NIST_1A", 7) == 0) {
    const int64_t r = read_sphere(f, out, sample_rate);
    fclose(f);
    return r;
  }
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
