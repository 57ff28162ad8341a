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


def make_parallel_train_step(trainer, mesh: Mesh):
    """jit a trainer.train_step with state replicated and batch sharded.

    Works for GanTrainer and MdnTrainer (any (state, batch, key) step).
    """
    repl = replicated(mesh)
    bsh = NamedSharding(mesh, P("data"))

    def spec_for_batch(batch):
        return jax.tree_util.tree_map(lambda _: bsh, batch)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        return trainer.train_step(state, batch, key)

    def run(state, batch, key):
        batch = shard_batch(mesh, batch)
        state = jax.device_put(state, repl)
        key = jax.device_put(key, repl)
        return step(state, batch, key)

    return run
