// Native PESQ-family perceptual speech-quality scorer (C++).
//
// From-spec reimplementation of the ITU-T P.862 algorithm family:
//   - narrowband P.862 raw score + P.862.1 MOS-LQO mapping (fs = 8000)
//   - wideband  P.862.2 (fs = 16000)
//
// This fills the reference's `pesq` C-extension dependency
// (open_universe/metrics/wrapper.py:29, metrics/pesq.py) with an in-repo
// native component (SURVEY.md §2.9: "native component to implement: C++
// metrics kernel(s)"). It is written from the published algorithm
// description, NOT derived from the ITU reference code, and therefore is
// a *PESQ-compatible* scorer rather than a bit-exact P.862 conformance
// implementation. Documented simplifications:
//   - a single global delay (crude envelope alignment + fine waveform
//     cross-correlation) instead of per-utterance variable delay with
//     utterance splitting — exact for the enhancement-evaluation use case
//     where reference and degraded files are already aligned;
//   - no "bad interval" re-alignment pass;
//   - Bark bands are generated analytically (uniform on the Zwicker
//     13*atan(0.00076 f) + 3.5*atan((f/7500)^2) scale) and the absolute
//     hearing threshold from Terhardt's approximation, instead of the
//     ITU lookup tables.
// The perceptual chain (level alignment to 1e7 band power, IRS/flat input
// filtering, Hann |FFT|^2 -> Bark pitch power densities, partial frequency
// response compensation, smoothed short-term gain compensation, Zwicker
// loudness, masked disturbance, asymmetry factor, (L6 over split-seconds,
// L2 over time) aggregation, 4.5 - 0.1 d_sym - 0.0309 d_asym, logistic
// MOS-LQO mapping) follows the standard.
//
// C ABI (ctypes): see pesq_mos / pesq_raw at the bottom.
#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <complex>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ------------------------------------------------------------------ FFT
// Iterative radix-2 complex FFT (sizes are powers of two: 256/512 frames,
// larger pow2 for alignment correlation).
void fft_inplace(std::vector<std::complex<double>>& a, bool inverse) {
    const size_t n = a.size();
    for (size_t i = 1, j = 0; i < n; i++) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        double ang = 2 * kPi / (double)len * (inverse ? 1 : -1);
        std::complex<double> wl(std::cos(ang), std::sin(ang));
        for (size_t i = 0; i < n; i += len) {
            std::complex<double> w(1.0, 0.0);
            for (size_t k = 0; k < len / 2; k++) {
                std::complex<double> u = a[i + k];
                std::complex<double> v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
    if (inverse)
        for (auto& x : a) x /= (double)n;
}

// --------------------------------------------------------- Bark machinery
double hz_to_bark(double f) {
    return 13.0 * std::atan(0.00076 * f) +
           3.5 * std::atan((f / 7500.0) * (f / 7500.0));
}

// Terhardt absolute threshold of hearing, dB SPL.
double abs_thresh_db(double f) {
    double khz = std::max(f, 20.0) / 1000.0;
    double t = 3.64 * std::pow(khz, -0.8) -
               6.5 * std::exp(-0.6 * (khz - 3.3) * (khz - 3.3)) +
               1e-3 * std::pow(khz, 4.0);
    return std::min(t, 100.0);
}

struct Config {
    int fs;            // 8000 or 16000
    int frame;         // 32 ms FFT frame (256 / 512)
    int nbands;        // 42 / 82.2-style 49
    bool wideband;     // P.862.2 input filter + mapping
    double sp;         // power scaling (ITU-published calibration values)
    double sl;         // loudness scaling
};

Config make_config(int fs) {
    Config c;
    c.fs = fs;
    if (fs == 16000) {
        c.frame = 512; c.nbands = 49; c.wideband = true;
        c.sp = 6.910853e-6; c.sl = 1.866055e-1;
    } else {
        c.frame = 256; c.nbands = 42; c.wideband = false;
        c.sp = 2.764344e-5; c.sl = 1.866055e-1;
    }
    return c;
}

// Piecewise-linear filter gain (dB) interpolated in linear frequency.
double interp_gain_db(const double* fr, const double* gdb, int n, double f) {
    if (f <= fr[0]) return gdb[0];
    if (f >= fr[n - 1]) return gdb[n - 1];
    int i = 0;
    while (f > fr[i + 1]) i++;
    double a = (f - fr[i]) / (fr[i + 1] - fr[i]);
    return gdb[i] + a * (gdb[i + 1] - gdb[i]);
}

// IRS receive characteristic (narrowband P.862 input filter), classic
// 300-3400 band-pass with high-frequency emphasis.
double nb_filter_db(double f) {
    static const double fr[] = {0,   50,  100, 125, 160, 200, 250, 300,
                                350, 400, 500, 600, 700, 800, 1000, 1300,
                                1600, 2000, 2500, 3000, 3250, 3500, 4000};
    static const double g[] = {-200, -40, -20, -12, -6,  0,   4,   6,
                               8,    8,   8,   8,   8,   8,   8,   8,
                               8,    8,   8,   8,   4,   -80, -200};
    return interp_gain_db(fr, g, sizeof(fr) / sizeof(double), f);
}

// Wideband P.862.2 input filter: flat with a high-pass below ~100 Hz and
// gentle roll-off at the top edge.
double wb_filter_db(double f) {
    static const double fr[] = {0, 50, 100, 150, 7000, 7600, 8000};
    static const double g[] = {-500, -40, -10, 0, 0, -3, -40};
    return interp_gain_db(fr, g, sizeof(fr) / sizeof(double), f);
}

// --------------------------------------------------------------- aligner
// Crude delay from 4 ms log-energy envelopes + fine refinement by direct
// waveform cross-correlation around the crude estimate.
int64_t estimate_delay(const std::vector<double>& ref,
                       const std::vector<double>& deg, int fs) {
    const int hop = fs / 250;  // 4 ms
    auto envelope = [&](const std::vector<double>& x) {
        std::vector<double> e(x.size() / hop);
        for (size_t i = 0; i < e.size(); i++) {
            double s = 0;
            for (int j = 0; j < hop; j++) s += x[i * hop + j] * x[i * hop + j];
            e[i] = std::log(std::max(s, 1e-10));
        }
        double m = 0;
        for (double v : e) m += v;
        m /= std::max<size_t>(e.size(), 1);
        for (double& v : e) v = std::max(v - m, 0.0);  // active part only
        return e;
    };
    std::vector<double> er = envelope(ref), ed = envelope(deg);
    size_t n = er.size() + ed.size();
    size_t nfft = 1;
    while (nfft < 2 * n) nfft <<= 1;
    std::vector<std::complex<double>> A(nfft), B(nfft);
    for (size_t i = 0; i < er.size(); i++) A[i] = er[i];
    for (size_t i = 0; i < ed.size(); i++) B[i] = ed[i];
    fft_inplace(A, false);
    fft_inplace(B, false);
    for (size_t i = 0; i < nfft; i++) A[i] = B[i] * std::conj(A[i]);
    fft_inplace(A, true);
    // lag l in [-(er.size()-1), ed.size()-1]; corr(l) = A[(l+nfft)%nfft]
    int64_t best = 0;
    double bm = -1;
    for (int64_t l = -(int64_t)er.size() + 1; l < (int64_t)ed.size(); l++) {
        double v = std::abs(A[(size_t)((l + (int64_t)nfft) % (int64_t)nfft)]);
        if (v > bm) { bm = v; best = l; }
    }
    int64_t crude = best * hop;
    // fine: direct correlation over +-hop around crude
    int64_t lo = crude - hop, hi = crude + hop;
    int64_t fine = crude;
    double fm = -1e300;
    for (int64_t l = lo; l <= hi; l++) {
        double s = 0;
        int64_t i0 = std::max<int64_t>(0, -l);
        int64_t i1 = std::min<int64_t>((int64_t)ref.size(),
                                       (int64_t)deg.size() - l);
        for (int64_t i = i0; i < i1; i++) s += ref[i] * deg[i + l];
        if (s > fm) { fm = s; fine = l; }
    }
    return fine;
}

// ------------------------------------------------------- perceptual model
struct BandLayout {
    std::vector<int> lo_bin, hi_bin;      // [lo, hi) FFT bin range
    std::vector<double> width_bark;       // band width on the Bark axis
    std::vector<double> thresh;           // absolute threshold, power units
    std::vector<double> centre_hz;
};

BandLayout make_bands(const Config& c) {
    BandLayout L;
    const double fmax = c.wideband ? 8000.0 : 4000.0;
    const double zmax = hz_to_bark(fmax);
    const double df = (double)c.fs / c.frame;
    const int nbins = c.frame / 2;
    auto bark_to_hz = [&](double z) {
        double lo = 0, hi = fmax;
        for (int it = 0; it < 60; it++) {
            double mid = 0.5 * (lo + hi);
            (hz_to_bark(mid) < z ? lo : hi) = mid;
        }
        return 0.5 * (lo + hi);
    };
    int prev = 1;  // skip DC bin
    for (int b = 0; b < c.nbands; b++) {
        double z1 = zmax * (b + 1) / c.nbands;
        double f1 = bark_to_hz(z1);
        int hi = (b == c.nbands - 1) ? nbins
                                     : (int)std::floor(f1 / df + 0.5);
        hi = std::max(hi, prev);  // empty bands share the boundary bin
        hi = std::min(hi, nbins);
        L.lo_bin.push_back(prev);
        L.hi_bin.push_back(hi);
        L.width_bark.push_back(zmax / c.nbands);
        double z0 = zmax * b / c.nbands;
        double fc = bark_to_hz(0.5 * (z0 + z1));
        L.centre_hz.push_back(fc);
        L.thresh.push_back(std::pow(10.0, abs_thresh_db(fc) / 10.0));
        prev = hi;
    }
    return L;
}

// Bark pitch power densities for one frame (already windowed+FFT'd power
// spectrum `pow_bins`), integrating bin power over each band. Empty bands
// (possible at low frequency) borrow the boundary bin's density scaled by
// band width so the Bark axis stays gap-free.
void bark_bands(const Config& c, const BandLayout& L, const double* pow_bins,
                double* out) {
    const double df = (double)c.fs / c.frame;
    for (int b = 0; b < c.nbands; b++) {
        double s = 0;
        if (L.hi_bin[b] > L.lo_bin[b]) {
            for (int i = L.lo_bin[b]; i < L.hi_bin[b]; i++) s += pow_bins[i];
        } else {
            int i = std::min(L.lo_bin[b], c.frame / 2 - 1);
            // fractional share of the bin covering this empty band
            double fwidth_hz = L.width_bark[b] /
                (hz_to_bark(L.centre_hz[b] + 0.5 * df) -
                 hz_to_bark(std::max(L.centre_hz[b] - 0.5 * df, 1.0)) + 1e-12);
            s = pow_bins[i] * std::min(fwidth_hz, 1.0);
        }
        out[b] = c.sp * s;
    }
}

double zwicker_loudness(double p, double p0, double sl) {
    if (p <= p0) return 0.0;
    const double g = 0.23;
    return sl * std::pow(p0 / 0.5, g) *
           (std::pow(0.5 + 0.5 * p / p0, g) - 1.0);
}

struct PesqResult { double raw; double mos; double d_sym; double d_asym; int err; };

PesqResult pesq_core(const float* ref_in, int64_t n_ref, const float* deg_in,
                     int64_t n_deg, int fs) {
    PesqResult R{0, 0, 0, 0, 0};
    if (fs != 8000 && fs != 16000) { R.err = -2; return R; }
    if (n_ref < fs / 4 || n_deg < fs / 4) { R.err = -3; return R; }
    Config c = make_config(fs);
    BandLayout L = make_bands(c);
    const int N = c.frame, H = N / 2, nbins = N / 2;

    std::vector<double> ref(ref_in, ref_in + n_ref);
    std::vector<double> deg(deg_in, deg_in + n_deg);
    for (auto* v : {&ref, &deg}) {  // DC removal
        double m = 0;
        for (double x : *v) m += x;
        m /= v->size();
        for (double& x : *v) x -= m;
    }

    // global time alignment; shift degraded so deg[i + d] ~ ref[i]
    int64_t d = estimate_delay(ref, deg, fs);
    int64_t n = std::min<int64_t>((int64_t)ref.size(),
                                  (int64_t)deg.size() - d);
    if (d < 0) n = std::min<int64_t>((int64_t)ref.size() + d,
                                     (int64_t)deg.size() - std::max<int64_t>(d, 0));
    // build aligned views
    std::vector<double> r2, g2;
    for (int64_t i = 0; i < (int64_t)ref.size(); i++) {
        int64_t j = i + d;
        if (j < 0 || j >= (int64_t)deg.size()) continue;
        r2.push_back(ref[i]);
        g2.push_back(deg[j]);
    }
    if ((int64_t)r2.size() < fs / 4) { R.err = -3; return R; }

    const int nframes = (int)((r2.size() - N) / H) + 1;
    if (nframes < 4) { R.err = -3; return R; }

    // Hann window
    std::vector<double> win(N);
    for (int i = 0; i < N; i++)
        win[i] = 0.5 * (1.0 - std::cos(2.0 * kPi * i / N));

    // input filter gains per bin
    std::vector<double> filt(nbins);
    const double df = (double)fs / N;
    for (int i = 0; i < nbins; i++) {
        double gdb = c.wideband ? wb_filter_db(i * df) : nb_filter_db(i * df);
        filt[i] = std::pow(10.0, gdb / 10.0);  // power-domain gain
    }

    // ---- framewise power spectra (filtered) ----
    auto spectra = [&](const std::vector<double>& x,
                       std::vector<std::vector<double>>& out,
                       std::vector<double>& frame_pow) {
        out.assign(nframes, std::vector<double>(nbins));
        frame_pow.assign(nframes, 0.0);
        std::vector<std::complex<double>> buf(N);
        for (int k = 0; k < nframes; k++) {
            for (int i = 0; i < N; i++)
                buf[i] = x[(size_t)k * H + i] * win[i];
            fft_inplace(buf, false);
            double tp = 0;
            for (int i = 0; i < nbins; i++) {
                double p = std::norm(buf[i]) * filt[i];
                out[k][i] = p;
                tp += p;
            }
            frame_pow[k] = tp;
        }
    };
    std::vector<std::vector<double>> Sr, Sg;
    std::vector<double> pr, pg;
    spectra(r2, Sr, pr);
    spectra(g2, Sg, pg);

    // ---- level alignment: scale to 1e7 mean active band power (350-3250)
    auto level_gain = [&](std::vector<std::vector<double>>& S) {
        int b0 = (int)std::ceil(350.0 / df), b1 = (int)(3250.0 / df);
        b1 = std::min(b1, nbins - 1);
        double tot = 0;
        for (int k = 0; k < nframes; k++)
            for (int i = b0; i <= b1; i++) tot += S[k][i];
        tot /= nframes;
        double gain = 1e7 / std::max(tot, 1e-20);
        for (auto& fr : S)
            for (double& v : fr) v *= gain;
        return gain;
    };
    double gr = level_gain(Sr);
    double gg = level_gain(Sg);
    for (int k = 0; k < nframes; k++) { pr[k] *= gr; pg[k] *= gg; }

    // speech-active frames: within 35 dB of the loudest reference frame
    double pmax = 1e-20;
    for (int k = 0; k < nframes; k++) pmax = std::max(pmax, pr[k]);
    std::vector<char> active(nframes);
    int n_active = 0;
    for (int k = 0; k < nframes; k++) {
        active[k] = pr[k] > pmax * 3.16e-4;
        n_active += active[k];
    }
    if (n_active < 2) { R.err = -3; return R; }

    // ---- Bark pitch power densities ----
    const int NB = c.nbands;
    std::vector<std::vector<double>> Br(nframes, std::vector<double>(NB));
    std::vector<std::vector<double>> Bg(nframes, std::vector<double>(NB));
    for (int k = 0; k < nframes; k++) {
        bark_bands(c, L, Sr[k].data(), Br[k].data());
        bark_bands(c, L, Sg[k].data(), Bg[k].data());
    }

    // listening-level calibration: the absolute-threshold table is in
    // dB-SPL power units (Terhardt), and P.862 presents speech at a 79 dB
    // SPL listening level — scale each signal's Bark densities so the
    // active-frame total band power averages 10^7.9 in those units
    auto calibrate = [&](std::vector<std::vector<double>>& B) {
        double tot = 0;
        int cnt = 0;
        for (int k = 0; k < nframes; k++) {
            if (!active[k]) continue;
            for (int b = 0; b < NB; b++) tot += B[k][b];
            cnt++;
        }
        double g = std::pow(10.0, 7.9) / std::max(tot / std::max(cnt, 1), 1e-20);
        for (auto& fr : B)
            for (double& v : fr) v *= g;
    };
    calibrate(Br);
    calibrate(Bg);

    // ---- partial frequency response compensation (applied to reference)
    for (int b = 0; b < NB; b++) {
        double ar = 0, ag = 0;
        for (int k = 0; k < nframes; k++)
            if (active[k]) { ar += Br[k][b]; ag += Bg[k][b]; }
        // partial compensation of time-invariant linear filtering on the
        // degraded side: scale the reference band toward the degraded
        // average, bounded so strong distortions stay penalised
        double f = (ag + 1000.0) / (ar + 1000.0);
        f = std::min(std::max(f, 0.01), 100.0);
        for (int k = 0; k < nframes; k++) Br[k][b] *= f;
    }

    // ---- smoothed short-term gain compensation (applied to degraded)
    double gsm = 1.0;
    std::vector<std::vector<double>> Bgc = Bg;
    for (int k = 0; k < nframes; k++) {
        double tr = 0, tg = 0;
        for (int b = 0; b < NB; b++) {
            if (Br[k][b] > L.thresh[b]) tr += Br[k][b];
            if (Bg[k][b] > L.thresh[b]) tg += Bg[k][b];
        }
        double h = (tr + 5e3) / (tg + 5e3);
        gsm = 0.8 * gsm + 0.2 * h;
        double gk = std::min(std::max(gsm, 3e-4), 5.0);
        for (int b = 0; b < NB; b++) Bgc[k][b] = Bg[k][b] * gk;
    }

    // ---- loudness, disturbance, aggregation ----
    std::vector<double> D(nframes, 0.0), DA(nframes, 0.0);
    double W = 0;  // total Bark width, for the pseudo-Lp band norm
    for (int b = 0; b < NB; b++) W += L.width_bark[b];
    for (int k = 0; k < nframes; k++) {
        double d2 = 0, da = 0;
        for (int b = 0; b < NB; b++) {
            double lr = zwicker_loudness(Br[k][b], L.thresh[b], c.sl);
            double lg = zwicker_loudness(Bgc[k][b], L.thresh[b], c.sl);
            double diff = lg - lr;
            double m = 0.25 * std::min(lr, lg);
            double dd = (std::fabs(diff) <= m)
                            ? 0.0
                            : (diff > 0 ? diff - m : diff + m);
            double w = L.width_bark[b];
            d2 += (dd * w) * (dd * w);
            // asymmetry factor
            double ratio = (Bgc[k][b] + 50.0) / (Br[k][b] + 50.0);
            double af = std::pow(ratio, 1.2);
            if (af < 3.0) af = 0.0;
            af = std::min(af, 12.0);
            da += std::fabs(dd) * af * w;
        }
        // pseudo-Lp band norm: (sum (d*w)^p / W)^(1/p) * W; p=2 symmetric,
        // p=1 asymmetric (where the normalization cancels)
        double Dk = std::sqrt(d2 / W) * W;
        // emphasise audible frames; 0.04-power weighting per the standard
        double wk = std::pow((pr[k] + 1e5) / 1e7, 0.04);
        Dk = std::min(Dk / wk, 45.0);
        double DAk = std::min(da / wk, 45.0);
        D[k] = Dk;
        DA[k] = DAk;
    }

    // split-second aggregation: L6 over 20-frame windows (hop 10), then L2
    auto aggregate = [&](const std::vector<double>& x) {
        const int W = 20, HP = 10;
        std::vector<double> wins;
        for (int s = 0; s < nframes; s += HP) {
            int e = std::min(s + W, nframes);
            double acc = 0;
            int cnt = 0;
            for (int k = s; k < e; k++) { acc += std::pow(x[k], 6.0); cnt++; }
            if (cnt) wins.push_back(std::pow(acc / cnt, 1.0 / 6.0));
            if (e == nframes) break;
        }
        double acc = 0;
        for (double v : wins) acc += v * v;
        return std::sqrt(acc / std::max<size_t>(wins.size(), 1));
    };
    double d_sym = aggregate(D);
    double d_asym = aggregate(DA);

    double raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym;
    raw = std::min(std::max(raw, -0.5), 4.5);
    double mos;
    if (c.wideband) {  // P.862.2
        mos = 0.999 + 4.0 / (1.0 + std::exp(-1.3669 * raw + 3.8224));
    } else {  // P.862.1
        mos = 0.999 + 4.0 / (1.0 + std::exp(-1.4945 * raw + 4.6607));
    }
    R.raw = raw;
    R.mos = mos;
    R.d_sym = d_sym;
    R.d_asym = d_asym;
    return R;
}

}  // namespace

extern "C" {

// MOS-LQO (P.862.1 for fs=8000, P.862.2 for fs=16000). Returns NaN on
// error (bad fs, too-short input).
double pesq_mos(const float* ref, int64_t n_ref, const float* deg,
                int64_t n_deg, int32_t fs) {
    PesqResult r = pesq_core(ref, n_ref, deg, n_deg, fs);
    if (r.err) return std::nan("");
    return r.mos;
}

// Raw P.862 score (pre-mapping), for diagnostics/tests.
double pesq_raw(const float* ref, int64_t n_ref, const float* deg,
                int64_t n_deg, int32_t fs) {
    PesqResult r = pesq_core(ref, n_ref, deg, n_deg, fs);
    if (r.err) return std::nan("");
    return r.raw;
}

// Diagnostics: writes [raw, mos, d_sym, d_asym] into out4. Returns 0 / err.
int32_t pesq_diag(const float* ref, int64_t n_ref, const float* deg,
                  int64_t n_deg, int32_t fs, double* out4) {
    PesqResult r = pesq_core(ref, n_ref, deg, n_deg, fs);
    if (r.err) return r.err;
    out4[0] = r.raw; out4[1] = r.mos; out4[2] = r.d_sym; out4[3] = r.d_asym;
    return 0;
}

}  // extern "C"
