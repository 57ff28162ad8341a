"""Ensemble statistics.

Parity target: reference ``signal_median`` (utils/stats.py) — pick, per
batch element, the ensemble member with median energy-weighted distance to
the others (a robust "median signal" rather than samplewise median).
"""
import jax.numpy as jnp


def signal_median(x):
    """x: (E, B, T, C) ensemble -> (B, T, C).

    Selects the member minimizing the sum of L1 distances to all others
    (the geometric-median-like representative used for ensembling).
    """
    e = x.shape[0]
    d = jnp.abs(x[:, None] - x[None, :]).sum(axis=(-2, -1))  # (E, E, B)
    total = d.sum(axis=1)  # (E, B)
    idx = jnp.argmin(total, axis=0)  # (B,)
    return jnp.take_along_axis(
        x, idx[None, :, None, None], axis=0)[0]
