"""STFT / mel / istft / resample / misc ops tests (torch as oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import importlib

# the package re-exports the `stft` *function*, which shadows the submodule
# attribute; import the module explicitly
ops_stft = importlib.import_module("open_universe_tpu.ops.stft")
from open_universe_tpu.ops.antialias import binomial_filter, low_pass_filter
from open_universe_tpu.ops.film import film
from open_universe_tpu.ops.resample import resample


@pytest.mark.parametrize("n_fft,hop,win", [(640, 160, 640), (1024, 120, 600),
                                           (512, 50, 240)])
def test_stft_matches_torch_center_false(n_fft, hop, win):
    rng = np.random.default_rng(0)
    t = 4000
    x = rng.standard_normal((2, t)).astype(np.float32)

    spec = ops_stft.stft(jnp.asarray(x), n_fft, hop, win_length=win,
                         center=False)
    xt = torch.from_numpy(x)
    st = torch.stft(xt, n_fft=n_fft, hop_length=hop, win_length=win,
                    window=torch.hann_window(win), center=False,
                    return_complex=True)
    st = st.numpy().transpose(0, 2, 1)  # (B, NF, F)
    np.testing.assert_allclose(np.asarray(spec), st, rtol=1e-3, atol=1e-3)


def test_stft_center_true_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    n_fft, hop = 256, 64
    spec = ops_stft.stft(jnp.asarray(x), n_fft, hop, center=True)
    st = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                    window=torch.hann_window(n_fft), center=True,
                    pad_mode="reflect", return_complex=True)
    st = st.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(spec), st, rtol=1e-3, atol=1e-3)


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    n_fft, hop = 256, 64
    spec = ops_stft.stft(jnp.asarray(x), n_fft, hop, center=True)
    y = ops_stft.istft(spec, n_fft, hop, length=2048, center=True)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = ops_stft.mel_filterbank(321, 80, 24000)
    assert fb.shape == (321, 80)
    assert fb.min() >= 0.0
    # every filter has some mass; peaks increase in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_melspectrogram_shapes():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 64000)),
                    dtype=jnp.float32)
    # pad as MelAdapter does: left/right (n_fft-hop)/2 => frames = T/hop
    n_fft, hop = 640, 160
    xp = jnp.pad(x, ((0, 0), (240, 240)))
    m = ops_stft.melspectrogram(xp, n_fft, hop, 80, 24000)
    assert m.shape == (2, 64000 // 160, 80)
    assert bool(jnp.all(m >= 0))


def test_resample_tone_preservation():
    fs = 16000
    t = np.arange(8000) / fs
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None, :, None]
    up = resample(jnp.asarray(x), 1, 2)
    assert up.shape[1] == 16000
    # upsampled signal should still be a 440 Hz tone at 32 kHz
    t2 = np.arange(up.shape[1]) / (2 * fs)
    ref = np.sin(2 * np.pi * 440.0 * t2)
    err = np.abs(np.asarray(up)[0, 100:-100, 0] - ref[100:-100]).max()
    assert err < 0.02
    down = resample(up, 2, 1)
    assert down.shape[1] == 8000
    err2 = np.abs(np.asarray(down)[0, 100:-100, 0] - x[0, 100:-100, 0]).max()
    assert err2 < 0.02


def test_binomial_filter_taps():
    taps = binomial_filter(3)
    # row [1, 2, 1] with unit RMS
    expected = np.array([1.0, 2.0, 1.0])
    expected = expected / np.sqrt(np.mean(expected**2))
    np.testing.assert_allclose(taps, expected, rtol=1e-6)
    x = jnp.ones((1, 10, 2))
    y = low_pass_filter(x, 3)
    assert y.shape == (1, 10, 2)


def test_film():
    x = jnp.ones((2, 5, 3))
    y = jnp.concatenate([2 * jnp.ones((2, 3)), jnp.ones((2, 3))], axis=-1)
    out = film(x, y)
    np.testing.assert_allclose(np.asarray(out), 3.0 * np.ones((2, 5, 3)))


def test_sigma_embeddings():
    from open_universe_tpu.ops.embeddings import SigmaBlock, SimpleTimeEmbedding
    s = jnp.asarray([0.1, 1.0, -2.0])
    m1 = SigmaBlock(n_rff=8, n_dim=32)
    p1 = m1.init(jax.random.PRNGKey(0), s)
    assert m1.apply(p1, s).shape == (3, 32)
    m2 = SimpleTimeEmbedding(n_dim=32)
    p2 = m2.init(jax.random.PRNGKey(0), s)
    assert m2.apply(p2, s).shape == (3, 32)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 120, 600), (512, 50, 240)])
def test_stft_magnitude_matmul_matches_fft(n_fft, hop, win):
    """The windowed-DFT-matmul magnitude (MRD fast path) == |stft|."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    ref = jnp.abs(ops_stft.stft(x, n_fft, hop, win_length=win, center=False))
    mag = ops_stft.stft_magnitude(x, n_fft, hop, win_length=win,
                                  center=False)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # bf16 variant stays close in a relative sense where energy lives
    mag16 = ops_stft.stft_magnitude(x, n_fft, hop, win_length=win,
                                    center=False, dtype=jnp.bfloat16)
    err = np.abs(np.asarray(mag16) - np.asarray(ref))
    assert float(np.median(err / (np.asarray(ref) + 1.0))) < 0.05


def test_stft_magnitude_custom_vjp_grad():
    """The custom backward (matmul + static OLA) == autodiff of |stft|."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32))
    n_fft, hop, win = 512, 50, 240

    def loss_ref(x):
        s = ops_stft.stft(x, n_fft, hop, win_length=win, center=False)
        m = jnp.sqrt(s.real**2 + s.imag**2 + 1e-12)
        return jnp.sum(jnp.sin(m))  # nontrivial cotangent

    def loss_new(x):
        m = ops_stft.stft_magnitude(x, n_fft, hop, win_length=win,
                                    center=False)
        return jnp.sum(jnp.sin(m))

    g_ref = jax.grad(loss_ref)(x)
    g_new = jax.grad(loss_new)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_overlap_add_static_matches_conv():
    rng = np.random.default_rng(3)
    fr = jnp.asarray(rng.standard_normal((2, 7, 96)).astype(np.float32))
    for hop in (24, 40, 96):
        ref = ops_stft.overlap_add(fr, hop)
        new = ops_stft.overlap_add_static(fr, hop, ref.shape[1])
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
