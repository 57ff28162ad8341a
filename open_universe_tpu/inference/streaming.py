"""Chunked (overlap-add) enhancement for very long audio.

The reference processes long inputs whole (memory grows linearly,
SURVEY.md §5 "long-context"); the TPU plan is chunked streaming: fixed
chunk shapes (one XLA compile), overlap-add with a cross-fade so chunk
boundaries are seam-free.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def enhance_streaming(model, params, mix, key, chunk_seconds: float = 4.0,
                      overlap_seconds: float = 0.5, fs: Optional[int] = None,
                      **enhance_kwargs):
    """Enhance a long mono waveform in fixed-size chunks.

    mix: 1-D array. Returns enhanced waveform of the same length.
    """
    fs = fs or model.cfg.fs
    mix = np.asarray(mix).reshape(-1)
    t = len(mix)
    chunk = int(chunk_seconds * fs)
    chunk = -(-chunk // model.tot_ds) * model.tot_ds
    hop_ovl = int(overlap_seconds * fs)
    hop = chunk - hop_ovl
    if t <= chunk:
        return np.asarray(model.enhance(params, jnp.asarray(mix), key,
                                        **enhance_kwargs))

    enhance_fn = jax.jit(
        lambda p, m, k: model.enhance(p, m, k, **enhance_kwargs))

    fade_in = np.linspace(0.0, 1.0, hop_ovl, dtype=np.float32)
    out = np.zeros(t + chunk, np.float32)
    weight = np.zeros(t + chunk, np.float32)

    n_chunks = -(-max(t - hop_ovl, 1) // hop)
    for i in range(n_chunks):
        start = i * hop
        seg = mix[start : start + chunk]
        if len(seg) < chunk:
            seg = np.pad(seg, (0, chunk - len(seg)))
        key, k = jax.random.split(key)
        est = np.asarray(enhance_fn(params, jnp.asarray(seg)[None, :], k))[0]
        w = np.ones(chunk, np.float32)
        if i > 0:
            w[:hop_ovl] = fade_in
        if i < n_chunks - 1:
            w[chunk - hop_ovl:] = fade_in[::-1]
        out[start : start + chunk] += est * w
        weight[start : start + chunk] += w
    out = out[:t] / np.maximum(weight[:t], 1e-8)
    return out
