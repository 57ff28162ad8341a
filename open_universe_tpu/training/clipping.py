"""Gradient clipping: fixed per-subtree global-norm clip + AutoClip.

Parity targets: reference ``FixedClipper`` / per-module
``clip_grad_norm_`` calls (universe_gan.py:225-230, 293-299; grad clip
values config/model/default.yaml:94-98) and ``AutoClipper``
(utils/autoclip_module.py:54-90, percentile-of-history AutoClip) — here
the history is a fixed-size device-resident ring buffer so the whole
update stays inside one jit.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(tree)))


def clip_by_global_norm(tree, max_norm: float):
    """Returns (clipped_tree, norm)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda x: x * scale, tree), norm


def clip_by_global_norm_subtrees(grads: Dict[str, Any],
                                 max_norms: Dict[str, float]):
    """Clip each named top-level subtree separately (reference per-module clip).

    Returns (clipped grads, {name: norm}).
    """
    out, norms = {}, {}
    for name, sub in grads.items():
        mn = max_norms.get(name)
        if mn is None:
            out[name] = sub
            norms[name] = global_norm(sub)
        else:
            out[name], norms[name] = clip_by_global_norm(sub, mn)
    return out, norms


def clip_subtrees_transform(max_norms: Dict[str, float]):
    """Optax transform: per-subtree global-norm clip inside the optimizer.

    Placing the clip in the transformation chain (instead of on raw
    per-micro-batch grads) keeps the standard clip(mean(g)) semantics when
    the chain is wrapped in optax.MultiSteps for gradient accumulation."""
    import optax

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params
        out = dict(grads)
        for name, mn in max_norms.items():
            if name in out and mn is not None:
                out[name], _ = clip_by_global_norm(out[name], mn)
        return out, state

    return optax.GradientTransformation(init, update)


def clip_global_transform(max_norm: float):
    """Optax transform: whole-tree global-norm clip (see above)."""
    import optax

    def init(params):
        del params
        return optax.EmptyState()

    def update(grads, state, params=None):
        del params
        clipped, _ = clip_by_global_norm(grads, max_norm)
        return clipped, state

    return optax.GradientTransformation(init, update)


@struct.dataclass
class AutoClipState:
    history: jnp.ndarray  # (capacity,) grad norms, inf-padded
    count: jnp.ndarray    # int32 number of valid entries
    percentile: float = struct.field(pytree_node=False)


def autoclip_init(percentile: float = 10.0, capacity: int = 8192):
    return AutoClipState(history=jnp.full((capacity,), jnp.inf),
                         count=jnp.zeros((), jnp.int32),
                         percentile=percentile)


def autoclip(state: AutoClipState, grads):
    """Insert current grad norm into history, clip at the p-th percentile."""
    norm = global_norm(grads)
    cap = state.history.shape[0]
    idx = jnp.mod(state.count, cap)
    history = state.history.at[idx].set(norm)
    count = state.count + 1
    n_valid = jnp.minimum(count, cap)
    # percentile over valid entries: sort (inf padding goes last)
    sorted_h = jnp.sort(history)
    pos = jnp.clip((state.percentile / 100.0) * n_valid.astype(jnp.float32),
                   0, (n_valid - 1).astype(jnp.float32)).astype(jnp.int32)
    thresh = sorted_h[pos]
    scale = jnp.minimum(1.0, thresh / jnp.maximum(norm, 1e-12))
    clipped = jax.tree_util.tree_map(lambda x: x * scale, grads)
    return state.replace(history=history, count=count), clipped, norm, thresh
