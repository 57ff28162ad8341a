"""Sharding rules and the data-parallel train step.

Design (SURVEY.md §2.8 TPU-native plan): batch axis sharded over the
``data`` mesh axis; parameters/optimizer/EMA replicated. Under jit, XLA
inserts the gradient all-reduce over ICI automatically — no NCCL-style
explicit collectives.
"""
from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of (B, ...) arrays with B sharded over `data`."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def param_sharding_rules(mesh: Mesh, tree, model_axis: str = "model",
                         min_size: int = 1024):
    """NamedSharding tree for tensor-parallel parameter sharding.

    Rule: shard the LAST axis (output channels / packed GRU gates / bias
    width) of every large-enough weight over ``model_axis``; replicate
    everything else. GSPMD propagates the activation shardings and inserts
    the collectives — the per-layer pattern is the classic Megatron-style
    column split, expressed declaratively. At reference scale (~100M
    params) weights fit one chip and ``make_parallel_train_step`` defaults
    to replication; this path is for wider variants."""
    m_size = mesh.shape[model_axis]

    def rule(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.size >= min_size
                and x.shape[-1] % m_size == 0
                and x.shape[-1] >= m_size * 8):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def make_parallel_train_step(trainer, mesh: Mesh,
                             model_sharding: bool = False,
                             shard_min_size: int = 1024):
    """jit a trainer.train_step with batch sharded over ``data``.

    Parameters are replicated by default (reference-scale DDP equivalent);
    with ``model_sharding=True`` (mesh must have a ``model`` axis) large
    weights are tensor-sharded per param_sharding_rules.
    Works for GanTrainer and MdnTrainer (any (state, batch, key) step).
    """
    repl = replicated(mesh)
    state_shardings = []  # computed once; the state structure is fixed

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        return trainer.train_step(state, batch, key)

    def run(state, batch, key):
        batch = shard_batch(mesh, batch)
        if model_sharding and "model" in mesh.axis_names:
            if not state_shardings:
                state_shardings.append(param_sharding_rules(
                    mesh, state, min_size=shard_min_size))
            state = jax.device_put(state, state_shardings[0])
        else:
            state = jax.device_put(state, repl)
        key = jax.device_put(key, repl)
        return step(state, batch, key)

    return run
