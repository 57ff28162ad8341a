"""Reverse-SDE diffusion sampler as a single ``lax.scan``.

Parity target: the reference's sequential Python sampler loop
(universe.py:300-343): per step
    x <- x + sigma_n^2 * eta * score(x, sigma_n) + beta * sigma_{n+1} * z
and a final x <- x + sigma_N^2 * score(x, sigma_N).

TPU design: the whole n-step recursion is one ``lax.scan`` over
(sigma_now, sigma_next, step_key) — zero host round-trips; the PRNG key is
split ahead of time. Supports the reference's oracle mode
(``target`` + ``fake_score_snr``, universe.py:278-298) for testing the
recursion with a perfect/degraded analytic score, and warm starting from
the conditioner's auxiliary estimate.
"""
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionConfig, sampler_coefficients


def make_oracle_score_fn(target, score_snr_db: float = 5.0):
    """Analytic score -(x - target)/sigma^2 plus controlled noise."""
    def score_fn(x, sigma, cond, key=None):
        true_score = -(x - target) / sigma[:, None, None] ** 2
        score_rms = jnp.sqrt(jnp.mean(true_score**2))
        noise_rms = score_rms * 10.0 ** (-score_snr_db / 20.0)
        noise = jax.random.normal(key, x.shape, x.dtype)
        return true_score + noise * noise_rms

    return score_fn


def reverse_sde_sample(
    score_fn: Callable,
    cond,
    shape,
    key,
    cfg: DiffusionConfig,
    n_steps: Optional[int] = None,
    epsilon: Optional[float] = None,
    warm_start: Optional[int] = None,
    aux_signal=None,
    oracle_uses_key: bool = False,
    noise=None,
):
    """Run the reverse SDE. score_fn(x, sigma, cond[, key]) -> score.

    ``noise``, if given, is a pair ``(noise_init, noise_steps)`` of unit
    normals — ``noise_init`` of ``shape`` and ``noise_steps`` of
    ``(n_iter,) + shape`` — consumed in place of fresh PRNG draws. This
    is the parity-test hook: it mirrors injecting the reference's torch
    ``randn(x, sigma, rng)`` draws (universe.py:326-339) so both
    samplers can be run on identical noise.

    Returns the final sample of ``shape`` (B, T, C).
    """
    n = n_steps or cfg.n_steps
    sigma, eta, beta = sampler_coefficients(cfg, n_steps=n, epsilon=epsilon)

    def call_score(x, s, k):
        s_b = jnp.broadcast_to(s, (shape[0],))
        if oracle_uses_key:
            return score_fn(x, s_b, cond, key=k)
        return score_fn(x, s_b, cond)

    noise_init = noise_steps = None
    if noise is not None:
        noise_init, noise_steps = noise

    key, k_init = jax.random.split(key)
    if noise_init is None:
        noise_init = jax.random.normal(k_init, shape)
    if warm_start is None:
        x = sigma[0] * noise_init
        n_start = 0
    else:
        x = aux_signal + sigma[warm_start] * noise_init
        n_start = warm_start

    n_iter = (n - 1) - n_start
    step_keys = jax.random.split(key, 2 * n_iter + 1)
    scan_keys = step_keys[: 2 * n_iter].reshape(n_iter, 2, -1)
    final_key = step_keys[-1]

    sig_now = sigma[n_start : n - 1]
    sig_next = sigma[n_start + 1 : n]

    def step(x, inp):
        s_now, s_next, ks, z_in = inp
        score = call_score(x, s_now, ks[0])
        z0 = (jax.random.normal(ks[1], x.shape, x.dtype)
              if noise_steps is None else z_in)
        x = x + s_now**2 * eta * score + beta * (s_next * z0)
        return x, None

    zs = (jnp.zeros((n_iter, 0)) if noise_steps is None
          else jnp.asarray(noise_steps))
    x, _ = jax.lax.scan(step, x, (sig_now, sig_next, scan_keys, zs))

    # final deterministic step at sigma_min
    score = call_score(x, sigma[-1], final_key)
    x = x + sigma[-1] ** 2 * score
    return x
