// Native audio runtime: WAV I/O + polyphase resampler + manifest scan.
//
// TPU-native replacement for the reference's native data-path deps
// (SURVEY.md §2.9): torchaudio/soundfile loading and the soxr (C)
// resampler used by open_universe/prepare/resample.py. Exposed via a thin
// C ABI consumed with ctypes (no pybind11 in this image).
//
// Build: see build.sh (g++ -O3 -shared -fPIC).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV read
// Returns number of frames, or -1 on error. Caller passes a buffer of
// capacity `max_samples` floats (interleaved) and receives fs/channels.
int64_t wav_read(const char* path, float* out, int64_t max_samples,
                 int32_t* fs_out, int32_t* channels_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
        memcmp(hdr + 8, "WAVE", 4)) { fclose(f); return -1; }

    uint16_t fmt = 0, n_ch = 0, bits = 0;
    uint32_t fs = 0;
    int64_t n_samples = -1;
    while (true) {
        uint8_t chdr[8];
        if (fread(chdr, 1, 8, f) != 8) break;
        uint32_t size; memcpy(&size, chdr + 4, 4);
        if (!memcmp(chdr, "fmt ", 4)) {
            std::vector<uint8_t> buf(size);
            if (fread(buf.data(), 1, size, f) != size) { fclose(f); return -1; }
            memcpy(&fmt, buf.data(), 2);
            memcpy(&n_ch, buf.data() + 2, 2);
            memcpy(&fs, buf.data() + 4, 4);
            memcpy(&bits, buf.data() + 14, 2);
            if (fmt == 0xFFFE && size >= 26) memcpy(&fmt, buf.data() + 24, 2);
            if (size & 1) fseek(f, 1, SEEK_CUR);
        } else if (!memcmp(chdr, "data", 4)) {
            if (!n_ch || !bits) { fclose(f); return -1; }
            int64_t count = (int64_t)size / (bits / 8);
            if (count > max_samples) count = max_samples;
            std::vector<uint8_t> raw((size_t)count * (bits / 8));
            size_t got = fread(raw.data(), bits / 8, count, f);
            count = (int64_t)got;
            if (fmt == 1 && bits == 16) {
                const int16_t* p = (const int16_t*)raw.data();
                for (int64_t i = 0; i < count; i++) out[i] = p[i] / 32768.0f;
            } else if (fmt == 1 && bits == 32) {
                const int32_t* p = (const int32_t*)raw.data();
                for (int64_t i = 0; i < count; i++)
                    out[i] = (float)(p[i] / 2147483648.0);
            } else if (fmt == 1 && bits == 24) {
                for (int64_t i = 0; i < count; i++) {
                    int32_t v = raw[3 * i] | (raw[3 * i + 1] << 8) |
                                ((int8_t)raw[3 * i + 2] << 16);
                    out[i] = v / 8388608.0f;
                }
            } else if (fmt == 3 && bits == 32) {
                memcpy(out, raw.data(), (size_t)count * 4);
            } else { fclose(f); return -1; }
            n_samples = count;
            break;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    fclose(f);
    if (n_samples < 0) return -1;
    *fs_out = (int32_t)fs;
    *channels_out = (int32_t)n_ch;
    return n_samples / n_ch;  // frames
}

// --------------------------------------------------------------- WAV write
int64_t wav_write(const char* path, const float* data, int64_t n_frames,
                  int32_t channels, int32_t fs) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    int64_t n = n_frames * channels;
    uint32_t data_bytes = (uint32_t)(n * 2);
    uint32_t riff_size = 36 + data_bytes;
    uint16_t block = (uint16_t)(channels * 2);
    uint32_t byte_rate = fs * block;
    uint16_t one = 1, ch = (uint16_t)channels, bits = 16;
    fwrite("RIFF", 1, 4, f); fwrite(&riff_size, 4, 1, f);
    fwrite("WAVEfmt ", 1, 8, f);
    uint32_t fmt_size = 16;
    fwrite(&fmt_size, 4, 1, f);
    fwrite(&one, 2, 1, f); fwrite(&ch, 2, 1, f);
    fwrite(&fs, 4, 1, f); fwrite(&byte_rate, 4, 1, f);
    fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
    fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
    std::vector<int16_t> buf((size_t)n);
    for (int64_t i = 0; i < n; i++) {
        float v = data[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        buf[i] = (int16_t)lrintf(v * 32767.0f);
    }
    fwrite(buf.data(), 2, (size_t)n, f);
    fclose(f);
    return n_frames;
}

// ------------------------------------------------------------ header probe
// Returns frames or -1; fills fs/channels.
int64_t wav_info(const char* path, int32_t* fs_out, int32_t* channels_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
        memcmp(hdr + 8, "WAVE", 4)) { fclose(f); return -1; }
    uint16_t n_ch = 0, bits = 0; uint32_t fs = 0;
    int64_t frames = -1;
    while (true) {
        uint8_t chdr[8];
        if (fread(chdr, 1, 8, f) != 8) break;
        uint32_t size; memcpy(&size, chdr + 4, 4);
        if (!memcmp(chdr, "fmt ", 4)) {
            std::vector<uint8_t> buf(size);
            if (fread(buf.data(), 1, size, f) != size) break;
            memcpy(&n_ch, buf.data() + 2, 2);
            memcpy(&fs, buf.data() + 4, 4);
            memcpy(&bits, buf.data() + 14, 2);
            if (size & 1) fseek(f, 1, SEEK_CUR);
        } else if (!memcmp(chdr, "data", 4)) {
            if (n_ch && bits) frames = (int64_t)size / (n_ch * bits / 8);
            break;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    fclose(f);
    if (frames >= 0) { *fs_out = (int32_t)fs; *channels_out = (int32_t)n_ch; }
    return frames;
}

// ------------------------------------------------------- polyphase resample
// Hann-windowed sinc, rolloff 0.99, width 6 (same design as the JAX
// ops/resample.py and torchaudio's kernel). Mono only. Returns output
// length or -1.
int64_t resample_poly(const float* in, int64_t n_in, int32_t orig_fs,
                      int32_t new_fs, float* out, int64_t max_out) {
    if (orig_fs == new_fs) {
        int64_t n = n_in < max_out ? n_in : max_out;
        memcpy(out, in, (size_t)n * 4);
        return n;
    }
    // reduce by gcd
    int64_t a = orig_fs, b = new_fs;
    while (b) { int64_t t = a % b; a = b; b = t; }
    int32_t orig = (int32_t)(orig_fs / a), nw = (int32_t)(new_fs / a);
    int32_t base = orig < nw ? orig : nw;
    double rolloff = 0.99, lowpass_width = 6.0;
    double cutoff = rolloff * base / orig;
    int32_t width = (int32_t)ceil(lowpass_width * orig / base);
    int32_t n_taps = 2 * width + orig;

    // build per-phase kernels
    std::vector<float> kernels((size_t)nw * n_taps);
    for (int32_t p = 0; p < nw; p++) {
        for (int32_t i = 0; i < n_taps; i++) {
            double idx = (double)(i - width) / orig;
            double t = idx - (double)p / nw;
            double win_arg = t * base / lowpass_width;
            if (win_arg < -1) win_arg = -1;
            if (win_arg > 1) win_arg = 1;
            double window = cos(win_arg * M_PI / 2.0);
            window *= window;
            double ts = t * M_PI * cutoff * orig;
            double sinc = ts == 0.0 ? 1.0 : sin(ts) / ts;
            kernels[(size_t)p * n_taps + i] = (float)(sinc * window * cutoff);
        }
    }

    int64_t n_out_total = (int64_t)ceil((double)n_in * nw / orig);
    int64_t n_blocks = (n_in + orig - 1) / orig;
    int64_t written = 0;
    for (int64_t q = 0; q < n_blocks && written < max_out; q++) {
        for (int32_t p = 0; p < nw && written < max_out; p++) {
            int64_t oi = q * nw + p;
            if (oi >= n_out_total) break;
            double acc = 0.0;
            const float* k = &kernels[(size_t)p * n_taps];
            int64_t start = q * orig - width;
            for (int32_t i = 0; i < n_taps; i++) {
                int64_t s = start + i;
                if (s >= 0 && s < n_in) acc += (double)in[s] * k[i];
            }
            out[written++] = (float)acc;
        }
    }
    return written;
}

}  // extern "C"
