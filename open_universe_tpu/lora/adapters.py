"""LoRA adapters over parameter pytrees.

Parity target: reference ``lora/lora.py`` (LoraConv1d/LoraLinear/
LoraConvTranspose1d: w' = w + (alpha/rank) * a @ b with a zeros, b normal)
and ``lora/utils.py`` (inject/remove/freeze_parameters_except_lora_and_bias).

JAX design: instead of monkey-patching modules, LoRA lives as a SEPARATE
pytree of (a, b) factors keyed by the same paths as the base params; the
merged weights are recomputed on the fly (cheap rank-r outer products) and
``merge_lora`` folds them in permanently (the reference's ``un_lora``).
The reference removes weight norm before injecting (networks/universe/
lora.py:157-158) — ``fold_weight_norm`` provides that step for our trees.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _is_kernel(path) -> bool:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf == "kernel"


def _path_str(path):
    return "/".join(str(getattr(p, "key", p)) for p in path)


def fold_weight_norm(params):
    """Replace (kernel_v, kernel_g) pairs by the effective kernel.

    Works on any nested dict; norm axes are all-but-last (our convention
    for Conv1d/ConvT/Dense/Conv2d weight norm).
    """
    if not isinstance(params, dict):
        return params
    out = {}
    keys = set(params.keys())
    if "kernel_v" in keys and "kernel_g" in keys:
        v = params["kernel_v"]
        g = params["kernel_g"]
        axes = tuple(range(v.ndim - 1))
        norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
        out["kernel"] = v * (g.reshape((1,) * (v.ndim - 1) + (-1,)) / norm)
        keys -= {"kernel_v", "kernel_g"}
    for k in keys:
        out[k] = fold_weight_norm(params[k])
    return out


def init_lora(key, params, rank: int = 16, alpha: Optional[float] = None,
              min_dim: Optional[int] = None):
    """Create LoRA factors for every `kernel` leaf with big-enough dims.

    Returns a pytree mirroring params containing dicts {"a", "b"} at the
    adapted leaves (b ~ N(0,1) like the reference, a zeros so the initial
    delta is zero).
    """
    min_dim = rank if min_dim is None else min_dim
    leaves = []

    def build(path, leaf):
        if not _is_kernel(path):
            return None
        out_dim = leaf.shape[-1]
        in_dim = int(np.prod(leaf.shape[:-1]))
        fan_in_ch = leaf.shape[-2] if leaf.ndim >= 2 else in_dim
        if out_dim < rank or fan_in_ch < rank:
            return None
        leaves.append(_path_str(path))
        return leaf  # marker; replaced below

    # walk with paths to decide which leaves are adapted
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    adapted = {}
    for path, leaf in flat:
        if build(path, leaf) is not None:
            adapted[_path_str(path)] = leaf

    keys = jax.random.split(key, max(len(adapted), 1))
    lora = {}
    for i, (pstr, leaf) in enumerate(sorted(adapted.items())):
        out_dim = leaf.shape[-1]
        in_dim = int(np.prod(leaf.shape[:-1]))
        lora[pstr] = {
            "a": jnp.zeros((rank, out_dim), leaf.dtype),
            "b": jax.random.normal(keys[i], (in_dim, rank), leaf.dtype),
        }
    # NOTE: rank/alpha are NOT stored in the tree (must stay differentiable);
    # pass them to apply_lora/merge_lora
    return lora


def apply_lora(params, lora, rank: int, alpha: Optional[float] = None):
    """Merged params: kernel + (alpha/rank) * reshape(b @ a)."""
    if not lora:
        return params
    scale = (alpha if alpha is not None else rank) / rank

    def merge(path, leaf):
        pstr = _path_str(path)
        if pstr in lora:
            ab = lora[pstr]["b"] @ lora[pstr]["a"]  # (in, out)
            return leaf + scale * ab.reshape(leaf.shape)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora(params, lora, rank: int, alpha: Optional[float] = None):
    """Permanently fold the adapters (reference ``un_lora``)."""
    return apply_lora(params, lora, rank, alpha)


def _is_bias(path) -> bool:
    leaf = str(getattr(path[-1], "key", path[-1]))
    return "bias" in leaf or leaf in ("b_ih", "b_hh")


def partition_trainable(params, train_biases: bool = True,
                        train_names=()):
    """Split params into (trainable, frozen) trees by the reference's
    freeze rule (lora/utils.py:92-120): biases + any name substrings.
    Both outputs have the SAME structure with None at the other side's
    leaves."""
    def walk(node, path):
        if isinstance(node, dict):
            t, f = {}, {}
            for k, v in node.items():
                t[k], f[k] = walk(v, path + (k,))
            return t, f
        pstr = "/".join(path)
        leaf_name = path[-1] if path else ""
        is_train = (train_biases and ("bias" in leaf_name
                                      or leaf_name in ("b_ih", "b_hh"))) \
            or any(s in pstr for s in train_names)
        return (node, None) if is_train else (None, node)

    return walk(params, ())


def combine_params(train, frozen):
    """Inverse of partition_trainable."""
    if isinstance(frozen, dict):
        return {k: combine_params(train[k] if train else None, frozen[k])
                for k in frozen}
    return frozen if frozen is not None else train
