"""Chunked (overlap-add) enhancement for very long audio.

The reference processes long inputs whole (memory grows linearly,
SURVEY.md §5 "long-context"); the TPU plan is chunked streaming: fixed
chunk shapes (one XLA compile), overlap-add with a cross-fade so chunk
boundaries are seam-free.

Two drivers over the same chunking/overlap-add core:

- ``enhance_streaming``: sequential, one chunk per device pass (bounded
  memory, lowest latency-to-first-audio).
- ``enhance_streaming_sharded``: chunk-parallel over a device mesh — the
  chunk axis IS the batch axis, sharded over the mesh's ``data`` axis, so
  N chunks are enhanced per pass. This is the TPU-idiomatic answer to
  sequence scaling here: the score/conditioner bottleneck is a GRU that is
  sequential over frames, so true sequence sharding (halo-exchange conv +
  a ppermute state chain) would serialize chips behind the recurrence;
  mapping chunks onto devices keeps every chip dense and scales long-audio
  throughput ~linearly with chip count.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _chunk_grid(t: int, chunk: int, hop_ovl: int):
    """(n_chunks, hop, crossfade weights per chunk position)."""
    hop = chunk - hop_ovl
    n_chunks = -(-max(t - hop_ovl, 1) // hop)
    fade_in = np.linspace(0.0, 1.0, hop_ovl, dtype=np.float32)
    return n_chunks, hop, fade_in


def _chunk_weight(i, n_chunks, chunk, hop_ovl, fade_in):
    w = np.ones(chunk, np.float32)
    if i > 0:
        w[:hop_ovl] = fade_in
    if i < n_chunks - 1:
        w[chunk - hop_ovl:] = fade_in[::-1]
    return w


def _round_chunk(model, chunk_seconds, fs):
    chunk = int(chunk_seconds * fs)
    return -(-chunk // model.tot_ds) * model.tot_ds


def enhance_streaming(model, params, mix, key, chunk_seconds: float = 4.0,
                      overlap_seconds: float = 0.5, fs: Optional[int] = None,
                      **enhance_kwargs):
    """Enhance a long mono waveform in fixed-size chunks, sequentially.

    mix: 1-D array. Returns enhanced waveform of the same length.
    """
    fs = fs or model.cfg.fs
    mix = np.asarray(mix).reshape(-1)
    t = len(mix)
    chunk = _round_chunk(model, chunk_seconds, fs)
    hop_ovl = int(overlap_seconds * fs)
    if t <= chunk:
        return np.asarray(model.enhance(params, jnp.asarray(mix), key,
                                        **enhance_kwargs))

    enhance_fn = jax.jit(
        lambda p, m, k: model.enhance(p, m, k, **enhance_kwargs))

    n_chunks, hop, fade_in = _chunk_grid(t, chunk, hop_ovl)
    out = np.zeros(t + chunk, np.float32)
    weight = np.zeros(t + chunk, np.float32)
    for i in range(n_chunks):
        start = i * hop
        seg = mix[start : start + chunk]
        if len(seg) < chunk:
            seg = np.pad(seg, (0, chunk - len(seg)))
        key, k = jax.random.split(key)
        est = np.asarray(enhance_fn(params, jnp.asarray(seg)[None, :], k))[0]
        w = _chunk_weight(i, n_chunks, chunk, hop_ovl, fade_in)
        out[start : start + chunk] += est * w
        weight[start : start + chunk] += w
    return out[:t] / np.maximum(weight[:t], 1e-8)


def enhance_streaming_sharded(model, params, mix, key, mesh=None,
                              chunk_seconds: float = 4.0,
                              overlap_seconds: float = 0.5,
                              fs: Optional[int] = None,
                              chunks_per_device: int = 1,
                              data_axis: str = "data",
                              **enhance_kwargs):
    """Chunk-parallel long-audio enhancement over a device mesh.

    Splits ``mix`` (1-D) into overlapping fixed-size chunks, enhances
    ``mesh.shape[data_axis] * chunks_per_device`` chunks per jit pass with
    the chunk-batch axis sharded over ``data_axis``, and overlap-adds with
    a linear cross-fade. With ``mesh=None`` the same batched path runs
    unsharded on the default device (useful as the single-chip reference
    for the sharded output).

    Returns the enhanced waveform, same length as ``mix``.
    """
    fs = fs or model.cfg.fs
    mix = np.asarray(mix).reshape(-1)
    t = len(mix)
    chunk = _round_chunk(model, chunk_seconds, fs)
    hop_ovl = int(overlap_seconds * fs)
    if t <= chunk:
        return np.asarray(model.enhance(params, jnp.asarray(mix), key,
                                        **enhance_kwargs))

    n_chunks, hop, fade_in = _chunk_grid(t, chunk, hop_ovl)
    n_lanes = (mesh.shape[data_axis] if mesh is not None else 1)
    per_pass = max(1, n_lanes * chunks_per_device)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P(data_axis, None))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, jax.tree_util.tree_map(
            lambda _: repl, params))
        enhance_fn = jax.jit(
            lambda p, m, k: model.enhance(p, m, k, **enhance_kwargs),
            in_shardings=(jax.tree_util.tree_map(lambda _: repl, params),
                          batch_sharding, repl))
    else:
        batch_sharding = None
        enhance_fn = jax.jit(
            lambda p, m, k: model.enhance(p, m, k, **enhance_kwargs))

    out = np.zeros(t + chunk, np.float32)
    weight = np.zeros(t + chunk, np.float32)
    n_passes = -(-n_chunks // per_pass)
    for p_idx in range(n_passes):
        idx = range(p_idx * per_pass, min((p_idx + 1) * per_pass, n_chunks))
        segs = []
        for i in idx:
            seg = mix[i * hop : i * hop + chunk]
            if len(seg) < chunk:
                seg = np.pad(seg, (0, chunk - len(seg)))
            segs.append(seg)
        n_real = len(segs)
        while len(segs) < per_pass:  # pad the pass to the static batch
            segs.append(np.zeros(chunk, np.float32))
        batch = jnp.asarray(np.stack(segs))
        if batch_sharding is not None:
            batch = jax.device_put(batch, batch_sharding)
        est = np.asarray(enhance_fn(params, batch,
                                    jax.random.fold_in(key, p_idx)))
        for j, i in enumerate(idx):
            if j >= n_real:
                break
            w = _chunk_weight(i, n_chunks, chunk, hop_ovl, fade_in)
            out[i * hop : i * hop + chunk] += est[j] * w
            weight[i * hop : i * hop + chunk] += w
    return out[:t] / np.maximum(weight[:t], 1e-8)
