"""EDM ("Elucidating the Design Space of Diffusion Models") parameterization.

Parity target: reference ``_get_edm_weights`` / ``_edm_score_wrapper``
(universe.py:175-209): the network predicts denoised speech; the score is
derived via skip/in/out weights with sigma_data = 10^(level_db/20).
Enabled by default for UNIVERSE++ (config/model/default.yaml:11-12,
edm.noise = 0.25).
"""
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    noise: float = 0.25
    data_level_db: float = -26.0


def edm_weights(sigma, cfg: EDMConfig):
    sigma_data = 10.0 ** (cfg.data_level_db / 20.0)
    sigma_norm = jnp.sqrt(sigma**2 + sigma_data**2)
    return {
        "skip": sigma_data**2 / (sigma**2 + sigma_data**2),
        "in": 1.0 / sigma_norm,
        "out": sigma * sigma_data / sigma_norm,
        "noise": cfg.noise,
    }


def make_edm_score_fn(net_fn, cfg: EDMConfig):
    """Wrap a denoiser net into a score function.

    net_fn(x, sigma, cond) -> denoised estimate; returns
    score_fn(x, sigma, cond, with_speech_est=False).
    """
    def score_fn(x, sigma, cond, with_speech_est=False):
        w = edm_weights(sigma, cfg)
        w_in = w["in"][:, None, None]
        w_out = w["out"][:, None, None]
        w_skip = w["skip"][:, None, None]
        net_out = net_fn(w_in * x, w["noise"] * sigma, cond)
        speech_est = w_skip * x + w_out * net_out
        score = (speech_est - x) / sigma[:, None, None] ** 2
        if with_speech_est:
            return score, speech_est
        return score

    return score_fn
