"""Diffusion schedule / sampler / sigma sampling tests.

The fake-score oracle test mirrors the reference's built-in sampler
self-test (universe.py:278-298): with a perfect analytic score the
recursion must recover the target.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_universe_tpu.diffusion import (
    DiffusionConfig,
    make_edm_score_fn,
    reverse_sde_sample,
    sample_sigma,
    sampler_coefficients,
)
from open_universe_tpu.diffusion.sampler import make_oracle_score_fn
from open_universe_tpu.utils.random import center_truncated_normal


CFG = DiffusionConfig()


def test_sampler_coefficients():
    sigma, eta, beta = sampler_coefficients(CFG)
    assert sigma.shape == (8,)
    np.testing.assert_allclose(float(sigma[0]), 5.0, rtol=1e-5)
    np.testing.assert_allclose(float(sigma[-1]), 5e-4, rtol=1e-5)
    # geometric: constant ratio
    r = np.asarray(sigma[1:]) / np.asarray(sigma[:-1])
    np.testing.assert_allclose(r, r[0], rtol=1e-4)
    assert 0 < eta < 1
    assert 0 < beta < 1


def test_oracle_sampler_recovers_target():
    """With a high-SNR analytic score, 8 steps must land near the target."""
    key = jax.random.PRNGKey(0)
    t = np.linspace(0, 1, 800)
    target = jnp.asarray(
        0.1 * np.sin(2 * np.pi * 13 * t), dtype=jnp.float32)[None, :, None]
    score_fn = make_oracle_score_fn(target, score_snr_db=40.0)
    out = reverse_sde_sample(score_fn, None, target.shape, key, CFG,
                             oracle_uses_key=True)
    err = float(jnp.sqrt(jnp.mean((out - target) ** 2)))
    # final sigma is 5e-4; high-snr score should land within a few x of that
    assert err < 5e-3, err


def test_oracle_sampler_degrades_with_snr():
    key = jax.random.PRNGKey(1)
    target = jnp.zeros((1, 800, 1))
    e = {}
    for snr in [40.0, 0.0]:
        score_fn = make_oracle_score_fn(target, score_snr_db=snr)
        out = reverse_sde_sample(score_fn, None, target.shape, key, CFG,
                                 oracle_uses_key=True)
        e[snr] = float(jnp.sqrt(jnp.mean(out**2)))
    assert e[40.0] < e[0.0]


def test_warm_start():
    key = jax.random.PRNGKey(2)
    target = jnp.ones((1, 800, 1)) * 0.05
    score_fn = make_oracle_score_fn(target, score_snr_db=40.0)
    out = reverse_sde_sample(score_fn, None, target.shape, key, CFG,
                             warm_start=5, aux_signal=target,
                             oracle_uses_key=True)
    err = float(jnp.sqrt(jnp.mean((out - target) ** 2)))
    assert err < 5e-3


@pytest.mark.parametrize("strategy", ["time_uniform", "sigma_linear",
                                      "diffsym", "time_discrete",
                                      "time_normal_0.95"])
def test_sample_sigma_ranges(strategy):
    key = jax.random.PRNGKey(3)
    sigma, time = sample_sigma(key, 512, CFG, strategy)
    s = np.asarray(sigma)
    assert s.shape == (512,)
    assert (s >= CFG.sigma_min * 0.999).all()
    assert (s <= CFG.sigma_max * 1.001).all()
    tt = np.asarray(time)
    assert (tt >= -1e-6).all() and (tt <= 1 + 1e-6).all()


def test_adaptive_sigma_sampling():
    key = jax.random.PRNGKey(4)
    bins = jnp.linspace(0.0, 1.0, 6)
    # all mass in last bin
    pr_cum = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    sigma, time = sample_sigma(key, 256, CFG, "adaptive",
                               adaptive_pr_cum=pr_cum, adaptive_bins=bins)
    assert (np.asarray(time) >= 0.8 - 1e-6).all()


def test_center_truncated_normal_stats():
    key = jax.random.PRNGKey(5)
    x = center_truncated_normal(key, area=0.95, t_min=0.0, t_max=1.0,
                                shape=(20000,))
    xn = np.asarray(x)
    assert (xn >= 0).all() and (xn <= 1).all()
    assert abs(xn.mean() - 0.5) < 0.01
    # more mass in the center than uniform
    assert ((xn > 0.25) & (xn < 0.75)).mean() > 0.6


def test_edm_score_consistency():
    """EDM wrapper must reduce to (denoised - x)/sigma^2."""
    from open_universe_tpu.diffusion import EDMConfig

    denoised = jnp.ones((2, 16, 1)) * 0.3

    def net(x, s, c):
        w_out = s  # placeholder: verify plumbing shape-wise
        return jnp.zeros_like(x) + denoised

    fn = make_edm_score_fn(lambda x, s, c: denoised, EDMConfig())
    x = jnp.zeros((2, 16, 1))
    sigma = jnp.full((2,), 0.5)
    score, est = fn(x, sigma, None, with_speech_est=True)
    # score == (est - x)/sigma^2
    np.testing.assert_allclose(np.asarray(score),
                               np.asarray((est - x) / 0.25), rtol=1e-5)
