// libvalle_audio — native audio I/O + DSP for the valle2_tpu data pipeline.
//
// The reference does all host-side audio work in Python/torchaudio inside
// DataLoader workers (/root/reference/valle/utils.py:62-79, data.py:30-43).  This
// library provides the host-side equivalents as native code: RIFF/WAV parsing,
// PCM decode, mono mixdown, peak normalization and a windowed-sinc polyphase
// resampler — so the Python layer never touches samples one at a time.  Exposed
// through a C ABI consumed via ctypes (valle2_tpu/native/audio.py).
//
// Everything is plain C++17 + libm; no external dependencies.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};

int64_t gcd64(int64_t a, int64_t b) { return b == 0 ? a : gcd64(b, a % b); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// WAV I/O
// ---------------------------------------------------------------------------

// Parse a WAV file. On success returns number of frames and fills metadata;
// returns -1 on failure.  Caller passes a buffer of capacity `max_frames *
// max_channels` floats (interleaved output) or queries sizes first with
// out == nullptr.
int64_t valle_wav_read(const char* path, float* out, int64_t max_samples,
                       int32_t* out_sample_rate, int32_t* out_channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  RiffHeader hdr;
  if (std::fread(&hdr, sizeof(hdr), 1, f) != 1 ||
      std::memcmp(hdr.riff, "RIFF", 4) != 0 ||
      std::memcmp(hdr.wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return -1;
  }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  int64_t n_samples = -1;

  char chunk_id[4];
  uint32_t chunk_size = 0;
  while (std::fread(chunk_id, 4, 1, f) == 1 &&
         std::fread(&chunk_size, 4, 1, f) == 1) {
    if (std::memcmp(chunk_id, "fmt ", 4) == 0) {
      std::vector<uint8_t> fmt(chunk_size);
      if (std::fread(fmt.data(), 1, chunk_size, f) != chunk_size) break;
      format = *reinterpret_cast<uint16_t*>(&fmt[0]);
      channels = *reinterpret_cast<uint16_t*>(&fmt[2]);
      sample_rate = *reinterpret_cast<uint32_t*>(&fmt[4]);
      bits = *reinterpret_cast<uint16_t*>(&fmt[14]);
    } else if (std::memcmp(chunk_id, "data", 4) == 0) {
      if (format == 0 || channels == 0) break;
      const int bytes_per = bits / 8;
      n_samples = static_cast<int64_t>(chunk_size) / bytes_per;
      if (out == nullptr) break;  // size query only
      if (n_samples > max_samples) n_samples = max_samples;
      std::vector<uint8_t> raw(n_samples * bytes_per);
      if (std::fread(raw.data(), bytes_per, n_samples, f) !=
          static_cast<size_t>(n_samples)) {
        n_samples = -1;
        break;
      }
      for (int64_t i = 0; i < n_samples; ++i) {
        float v = 0.f;
        const uint8_t* p = &raw[i * bytes_per];
        if (format == 3 && bits == 32) {           // IEEE float
          v = *reinterpret_cast<const float*>(p);
        } else if (bits == 16) {
          v = *reinterpret_cast<const int16_t*>(p) / 32768.f;
        } else if (bits == 32) {
          v = *reinterpret_cast<const int32_t*>(p) / 2147483648.f;
        } else if (bits == 24) {
          int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
          v = (s >> 8) / 8388608.f;
        } else if (bits == 8) {
          v = (static_cast<int>(p[0]) - 128) / 128.f;
        }
        out[i] = v;
      }
      break;
    } else {
      std::fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
      continue;
    }
  }
  std::fclose(f);
  if (n_samples < 0 || sample_rate == 0) return -1;
  *out_sample_rate = static_cast<int32_t>(sample_rate);
  *out_channels = static_cast<int32_t>(channels);
  return n_samples;  // total interleaved samples (frames * channels)
}

int32_t valle_wav_write(const char* path, const float* samples, int64_t n,
                        int32_t sample_rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = static_cast<uint32_t>(n * 2);
  const uint32_t riff_size = 36 + data_bytes;
  uint16_t u16;
  uint32_t u32;
  std::fwrite("RIFF", 4, 1, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVEfmt ", 8, 1, f);
  u32 = 16; std::fwrite(&u32, 4, 1, f);
  u16 = 1; std::fwrite(&u16, 2, 1, f);          // PCM
  u16 = 1; std::fwrite(&u16, 2, 1, f);          // mono
  u32 = sample_rate; std::fwrite(&u32, 4, 1, f);
  u32 = sample_rate * 2; std::fwrite(&u32, 4, 1, f);
  u16 = 2; std::fwrite(&u16, 2, 1, f);          // block align
  u16 = 16; std::fwrite(&u16, 2, 1, f);         // bits
  std::fwrite("data", 4, 1, f);
  std::fwrite(&data_bytes, 4, 1, f);
  for (int64_t i = 0; i < n; ++i) {
    float v = std::clamp(samples[i], -1.f, 1.f);
    int16_t s = static_cast<int16_t>(std::lrintf(v * 32767.f));
    std::fwrite(&s, 2, 1, f);
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// DSP
// ---------------------------------------------------------------------------

// Interleaved multi-channel → mono average, in place semantics via out buffer.
void valle_mono_mix(const float* in, int64_t frames, int32_t channels,
                    float* out) {
  if (channels == 1) {
    std::memcpy(out, in, frames * sizeof(float));
    return;
  }
  const float inv = 1.0f / channels;
  for (int64_t i = 0; i < frames; ++i) {
    float acc = 0.f;
    for (int32_t c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = acc * inv;
  }
}

// Peak-normalize to [-1, 1] in place (reference utils.py:71).
void valle_peak_normalize(float* buf, int64_t n) {
  float peak = 1e-9f;
  for (int64_t i = 0; i < n; ++i) peak = std::max(peak, std::fabs(buf[i]));
  const float inv = 1.0f / peak;
  for (int64_t i = 0; i < n; ++i) buf[i] *= inv;
}

// Expected output length of the resampler for buffer sizing.
int64_t valle_resample_out_len(int64_t n_in, int32_t sr_in, int32_t sr_out) {
  const int64_t g = gcd64(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  return (n_in * up + down - 1) / down;
}

// Polyphase windowed-sinc resampler (Hann window, 6 zero crossings/side).
// Precomputes per-phase filter taps; O(n_out * taps_per_phase).
int64_t valle_resample(const float* in, int64_t n_in, int32_t sr_in,
                       int32_t sr_out, float* out, int64_t max_out) {
  if (sr_in == sr_out) {
    int64_t n = std::min(n_in, max_out);
    std::memcpy(out, in, n * sizeof(float));
    return n;
  }
  const int64_t g = gcd64(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  const int64_t n_out =
      std::min((n_in * up + down - 1) / down, max_out);

  const int kZeros = 6;
  const double cutoff = 0.99 * 0.5 / std::max(up, down);  // of the dense grid
  const int64_t half = kZeros * std::max(up, down);

  // Output j sits at dense index m = j*down; input i at dense i*up.  With
  // base = floor(m/up) and phase p = m % up, the contributing inputs are
  // i = base + r where d = r*up - p lies in [-half, half]:
  //   out[j] = Σ_r in[base + r] · h(r·up − p),  h = windowed sinc · up.
  std::vector<std::vector<float>> phase_taps(up);
  std::vector<int64_t> phase_rmin(up);
  for (int64_t p = 0; p < up; ++p) {
    const int64_t r_min = -((half - p) / up);           // ceil((-half+p)/up)
    const int64_t r_max = (half + p) / up;
    phase_rmin[p] = r_min;
    for (int64_t r = r_min; r <= r_max; ++r) {
      const int64_t d = r * up - p;
      const double x = 2.0 * cutoff * d;
      const double sinc = (d == 0) ? 1.0 : std::sin(kPi * x) / (kPi * x);
      const double win = 0.5 * (1.0 + std::cos(kPi * d / (double)half));
      phase_taps[p].push_back(static_cast<float>(2.0 * cutoff * sinc * win * up));
    }
  }

  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t m = j * down;
    const int64_t base = m / up;
    const int64_t p = m % up;
    const auto& taps = phase_taps[p];
    const int64_t r0 = phase_rmin[p];
    float acc = 0.f;
    for (size_t ti = 0; ti < taps.size(); ++ti) {
      const int64_t idx = base + r0 + static_cast<int64_t>(ti);
      if (idx >= 0 && idx < n_in) acc += taps[ti] * in[idx];
    }
    out[j] = acc;
  }
  return n_out;
}

}  // extern "C"
