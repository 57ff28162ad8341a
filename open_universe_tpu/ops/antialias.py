"""Binomial low-pass anti-aliasing filter.

Parity target: reference ``get_binomial_filter`` / ``BinomialAntiAlias``
(blocks.py:66-84, 123-134): taps are the last row of Pascal's triangle,
RMS-normalized twice (a quirk of the reference we reproduce numerically:
first by the RMS of the whole lower-triangular Pascal matrix, then by the
RMS of the resulting taps — the second normalization makes the first a
no-op, so taps are simply row / rms(row)).

On TPU a depthwise "same" conv with a small static kernel is a cheap VPU
op that XLA fuses with neighbors; channels-last keeps lanes dense.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def binomial_filter(kernel_size: int) -> np.ndarray:
    """Binomial taps with unit RMS, float32. Static (host-computed)."""
    row = np.ones((kernel_size,), dtype=np.float64)
    for i in range(1, kernel_size):
        row[i] = row[i - 1] * (kernel_size - i) / i  # C(n-1, i)
    row = row / np.sqrt(np.mean(row**2))
    return row.astype(np.float32)


def low_pass_filter(x, kernel_size: int):
    """Depthwise binomial low-pass, x ``(B, T, C)``, "same" padding."""
    taps = jnp.asarray(binomial_filter(kernel_size), dtype=x.dtype)
    c = x.shape[-1]
    kernel = jnp.broadcast_to(taps[:, None, None], (kernel_size, 1, c))
    lo = (kernel_size - 1) // 2
    hi = kernel_size - 1 - lo
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1,),
        padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )


class BinomialAntiAlias:
    """Stateless functional stand-in mirroring the reference module."""

    def __init__(self, kernel_size: int):
        self.kernel_size = kernel_size

    def __call__(self, x):
        return low_pass_filter(x, self.kernel_size)
