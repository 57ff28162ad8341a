"""Profiling helpers: JAX traces + speed-of-light accounting.

The reference ships no profiling at all (SURVEY.md §5); here tracing is a
first-class tool:
  - ``trace(dir)``: context manager around jax.profiler for TensorBoard/
    Perfetto traces;
  - ``flops_estimate``: analytic FLOP count of the UNIVERSE forward so
    measured step times can be compared against the chip's peak
    (speed-of-light fraction).
"""
import contextlib
import math
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def conv1d_flops(t_out: int, kernel: int, c_in: int, c_out: int) -> int:
    return 2 * t_out * kernel * c_in * c_out


def score_network_flops(t: int, rate_factors=(2, 4, 4, 5), n_channels: int = 32,
                        extra_conv_block: bool = True) -> int:
    """Approximate FLOPs of one ScoreNetwork forward (batch 1)."""
    total = 0
    c = n_channels
    t_cur = t
    total += conv1d_flops(t_cur, 3, 1, c)  # input conv
    # encoder + mirrored decoder conv blocks
    for i, r in enumerate(list(rate_factors)):
        ci = c * 2**i
        # conv5 + conv3 + conv3 at t_cur, both encoder and decoder sides
        per_block = (conv1d_flops(t_cur, 5, ci, ci)
                     + 2 * conv1d_flops(t_cur, 3, ci, ci))
        total += 2 * per_block
        # rate-change convs (down: ci->2ci stride r; up mirrored)
        total += 2 * conv1d_flops(t_cur // r, r, ci, 2 * ci)
        t_cur //= r
    oc = c * 2 ** len(rate_factors)
    if extra_conv_block:
        per_block = (conv1d_flops(t_cur, 5, oc, oc)
                     + 2 * conv1d_flops(t_cur, 3, oc, oc))
        total += 2 * per_block
    # BiGRU bottleneck: 2 dirs x (3 gates x (oc x oc/2) x2 matmuls)
    total += 2 * t_cur * 3 * 2 * (oc * oc // 2) * 2
    total += conv1d_flops(t, 3, c, 1)  # output conv
    return total


def enhance_flops(t: int, n_steps: int = 8, **kwargs) -> int:
    """FLOPs of one enhance() call: conditioner ~= score net cost."""
    score = score_network_flops(t, **kwargs)
    return score * n_steps + score  # n score passes + 1 conditioner pass


def speed_of_light_report(measured_s: float, flops: int,
                          peak_tflops: float = 394.0) -> dict:
    """v5e bf16 peak default; returns achieved fraction."""
    achieved = flops / measured_s / 1e12
    return {
        "measured_s": measured_s,
        "gflops": flops / 1e9,
        "achieved_tflops": achieved,
        "peak_tflops": peak_tflops,
        "sol_fraction": achieved / peak_tflops,
    }
