"""Microbench: DiscriminatorR cost split (STFT vs convs) + DFT-matmul STFT.

MRD resolutions ((1024,120,600),(2048,240,1200),(512,50,240)) at 4 s/16 kHz
produce (B, F, frames, 1) spectrograms convolved by 32-ch (3,9) kernels.
Measures: (a) the rFFT-based STFT, (b) the conv stack, (c) an STFT computed
as ONE bf16 matmul with the windowed DFT basis (frames x n_fft) @
(n_fft x 2F) — MXU work instead of the TPU FFT path.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from open_universe_tpu.ops.stft import stft as stft_fn


def timed(fn, *args, n=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def frame(w, n_fft, hop):
    n_frames = 1 + (w.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return w[:, idx]


def main():
    b, t = 32, 64160  # real+fake concat at train batch 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t)) * 0.1

    @jax.jit
    def stft_path(x):
        acc = jnp.zeros(())
        for n_fft, hop, win in RESOLUTIONS:
            p = (n_fft - hop) // 2
            w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
            spec = stft_fn(w, n_fft, hop, win_length=win, center=False)
            mag = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-12)
            acc = acc + mag.astype(jnp.float32).sum()
        return acc

    @jax.jit
    def dft_matmul_path(x):
        acc = jnp.zeros(())
        for n_fft, hop, win in RESOLUTIONS:
            p = (n_fft - hop) // 2
            w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
            fr = frame(w, n_fft, hop)  # (B, frames, n_fft)
            # windowed DFT basis, cos/sin stacked: (n_fft, 2(F))
            k = np.arange(n_fft // 2 + 1)
            n = np.arange(n_fft)
            ang = 2 * np.pi * np.outer(n, k) / n_fft
            window = np.zeros(n_fft, np.float32)
            h = np.hanning(win + 1)[:win]
            off = (n_fft - win) // 2
            window[off:off + win] = h
            basis = np.concatenate([np.cos(ang), -np.sin(ang)],
                                   axis=1) * window[:, None]
            basis = jnp.asarray(basis, jnp.bfloat16)
            z = fr.astype(jnp.bfloat16) @ basis  # (B, frames, 2F)
            f = n_fft // 2 + 1
            re, im = z[..., :f].astype(jnp.float32), z[..., f:].astype(
                jnp.float32)
            mag = jnp.sqrt(re**2 + im**2 + 1e-12)
            acc = acc + mag.sum()
        return acc

    ws = []
    key = jax.random.PRNGKey(1)
    chans = [(1, 32), (32, 32), (32, 32), (32, 32), (32, 32)]
    kerns = [(3, 9), (3, 9), (3, 9), (3, 9), (3, 3)]
    strs = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    for (ci, co), kk in zip(chans, kerns):
        key, k = jax.random.split(key)
        ws.append(jax.random.normal(k, kk + (ci, co), jnp.bfloat16) * 0.05)

    @jax.jit
    def conv_path(x):
        acc = jnp.zeros(())
        for n_fft, hop, win in RESOLUTIONS:
            p = (n_fft - hop) // 2
            w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
            spec = stft_fn(w, n_fft, hop, win_length=win, center=False)
            mag = jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-12)
            h = jnp.swapaxes(mag, 1, 2)[..., None].astype(jnp.bfloat16)
            for wk, st, kk in zip(ws, strs, kerns):
                pads = [((kk[0] - 1) // 2,) * 2, (4, 4) if kk[1] == 9 else
                        (1, 1)]
                h = jax.lax.conv_general_dilated(
                    h, wk, window_strides=st, padding=pads,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jnp.where(h >= 0, h, 0.1 * h)
            acc = acc + h.astype(jnp.float32).sum()
        return acc

    for name, fn in [("stft (rfft) x3 res", stft_path),
                     ("stft (dft matmul) x3", dft_matmul_path),
                     ("stft + conv stack x3", conv_path)]:
        dt_s = timed(fn, x)
        print(f"{name:22s}: {dt_s*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and "grad" not in __import__("sys").argv:
    main()


def main_grad():
    """Gradient-path bisect: which part of MRD input-bwd is slow."""
    b, t = 32, 64160
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t)) * 0.1
    from open_universe_tpu.ops.stft import stft_magnitude, dft_basis

    @jax.jit
    def g_stft_mag(x):
        def loss(x):
            s = jnp.zeros(())
            for n_fft, hop, win in RESOLUTIONS:
                p = (n_fft - hop) // 2
                w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
                mag = stft_magnitude(w, n_fft, hop, win_length=win,
                                     center=False, dtype=jnp.bfloat16)
                s = s + mag.sum()
            return s
        return jax.grad(loss)(x).astype(jnp.float32).sum()

    @jax.jit
    def g_conv_stft(x):
        def loss(x):
            s = jnp.zeros(())
            for n_fft, hop, win in RESOLUTIONS:
                p = (n_fft - hop) // 2
                w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
                basis = jnp.asarray(dft_basis(n_fft, win), jnp.bfloat16)
                kernel = basis[:, None, :]  # (n_fft, 1, 2F)
                z = jax.lax.conv_general_dilated(
                    w[..., None].astype(jnp.bfloat16), kernel,
                    window_strides=(hop,), padding=[(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"))
                f = n_fft // 2 + 1
                re = z[..., :f].astype(jnp.float32)
                im = z[..., f:].astype(jnp.float32)
                s = s + jnp.sqrt(re * re + im * im + 1e-12).sum()
            return s
        return jax.grad(loss)(x).astype(jnp.float32).sum()

    @jax.jit
    def g_rfft(x):
        def loss(x):
            s = jnp.zeros(())
            for n_fft, hop, win in RESOLUTIONS:
                p = (n_fft - hop) // 2
                w = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
                spec = stft_fn(w, n_fft, hop, win_length=win, center=False)
                s = s + jnp.sqrt(spec.real**2 + spec.imag**2 + 1e-12).sum()
            return s
        return jax.grad(loss)(x).astype(jnp.float32).sum()

    for name, fn in [("grad stft_magnitude", g_stft_mag),
                     ("grad conv-stft", g_conv_stft),
                     ("grad rfft stft", g_rfft)]:
        dt_s = timed(fn, x)
        print(f"{name:22s}: {dt_s*1e3:8.1f} ms", flush=True)


if __name__ == "__main__" and "grad" in __import__("sys").argv:
    main_grad()
