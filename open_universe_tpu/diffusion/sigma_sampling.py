"""Training-time sigma/time sampling strategies.

Parity target: reference ``sample_sigma`` (universe.py:414-470):
time_uniform | sigma_linear | diffsym | time_discrete | time_normal_<a> |
adaptive (importance sampling from per-bin validation losses,
universe.py:391-412). All jit-friendly; the adaptive variant takes the
cumulative bin distribution as an explicit argument instead of module
state.
"""
import math

import jax
import jax.numpy as jnp

from ..utils.random import center_truncated_normal
from .schedule import DiffusionConfig, get_std_dev


def adaptive_pr_cum(bin_losses, floor: float = 5e-4):
    """Cumulative sampling distribution from per-bin val score losses.

    Parity: reference validation_step (universe.py:630-638): clamp the
    losses at ``floor``, normalized cumsum, last bound 1 + 1e-5 so the
    top edge is included by the searchsorted in sample_sigma."""
    v = jnp.maximum(jnp.asarray(bin_losses, jnp.float32), floor)
    pr = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(v)])
    pr = pr / pr[-1]
    return pr.at[-1].set(1.0 + 1e-5)


def sample_sigma(key, batch_size: int, cfg: DiffusionConfig,
                 time_sampling: str = "time_uniform",
                 t_min: float = 0.0, t_max: float = 1.0,
                 adaptive_pr_cum=None, adaptive_bins=None):
    """Returns (sigma, time), each (batch_size,)."""
    s_min, s_max = cfg.sigma_min, cfg.sigma_max
    u = jax.random.uniform(key, (batch_size,))
    time = (t_max - t_min) * u + t_min

    if time_sampling == "time_uniform":
        sigma = get_std_dev(time, cfg)
    elif time_sampling == "sigma_linear":
        sigma = (s_max - s_min) * time + s_min
    elif time_sampling == "diffsym":
        sigma = (s_max - s_min) * time + s_min
        sigma = s_max + s_min - sigma
        num = jnp.log10((s_max + s_min - sigma) / s_min)
        denom = math.log10(s_max / s_min)
        time = 1.0 - num / denom
        sigma = get_std_dev(time, cfg)
    elif time_sampling == "time_discrete":
        steps = jnp.linspace(0.0, 1.0, cfg.n_steps)
        idx = jnp.argmin(jnp.abs(steps[:, None] - time[None, :]), axis=0)
        time = steps[idx]
        sigma = get_std_dev(time, cfg)
    elif time_sampling.startswith("time_normal"):
        try:
            alpha = float(time_sampling.split("_")[2])
        except (IndexError, ValueError):
            alpha = 0.95
        time = center_truncated_normal(key, area=alpha, t_min=t_min,
                                       t_max=t_max, shape=(batch_size,))
        sigma = get_std_dev(time, cfg)
    elif time_sampling == "adaptive":
        if adaptive_pr_cum is None:
            sigma = get_std_dev(time, cfg)  # first epoch: uniform
        else:
            # inverse-CDF over the per-bin histogram (universe.py:391-412)
            k1, k2 = jax.random.split(key)
            dice = jax.random.uniform(k1, (batch_size,))
            # bin index where dice falls in [pr_cum[i], pr_cum[i+1])
            idx = jnp.clip(
                jnp.searchsorted(adaptive_pr_cum, dice, side="right") - 1,
                0, adaptive_bins.shape[0] - 2)
            ts = adaptive_bins[idx]
            te = adaptive_bins[idx + 1]
            time = jax.random.uniform(k2, (batch_size,)) * (te - ts) + ts
            sigma = get_std_dev(time, cfg)
    else:
        raise NotImplementedError(time_sampling)

    return sigma, time
