"""Diffusion noise schedule.

Parity target: reference geometric schedule (universe.py:380-386) and the
8-step sampler coefficients (universe.py:300-311):
  gamma = (sigma_max/sigma_min)^(-1/(n-1)),  eta = 1 - gamma^eps,
  beta = sqrt(1 - gamma^(2(eps-1))).
"""
import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    schedule: str = "geometric"
    sigma_min: float = 0.0005
    sigma_max: float = 5.0
    n_steps: int = 8
    epsilon: float = 1.3


def get_std_dev(time, cfg: DiffusionConfig):
    if cfg.schedule == "geometric":
        return cfg.sigma_min * (cfg.sigma_max / cfg.sigma_min) ** time
    raise NotImplementedError(cfg.schedule)


def sampler_coefficients(cfg: DiffusionConfig, n_steps=None, epsilon=None):
    """Returns (sigma[n_steps] descending, eta, beta)."""
    n = n_steps or cfg.n_steps
    eps = epsilon if epsilon is not None else cfg.epsilon
    delta_t = 1.0 / (n - 1)
    gamma = (cfg.sigma_max / cfg.sigma_min) ** (-delta_t)
    eta = 1.0 - gamma**eps
    beta = math.sqrt(1.0 - gamma ** (2.0 * (eps - 1.0)))
    time = jnp.linspace(0.0, 1.0, n)[::-1]
    sigma = get_std_dev(time, cfg)
    return sigma, eta, beta
