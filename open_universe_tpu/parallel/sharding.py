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
    """Place a pytree of (B, ...) arrays with B sharded over `data`.

    Single-process: a plain sharded device_put. Multi-host: each process
    holds only ITS shard of the global batch (per-host input sharding,
    ``build_datamodule(shard_rank=...)``), so the global array is built
    from process-local data — global batch = per-host batch x n_processes,
    the reference's DDP semantics (per-GPU batch x world size)."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(put, batch)


def _replicate(mesh: Mesh, tree):
    """Replicate host-local values over a (possibly multi-host) mesh.

    Pass-through for arrays already replicated over this mesh (the
    steady-state case: the previous step's output), so this costs
    nothing per step; only the initial host-local state pays the
    build-global-array transfer."""
    repl = replicated(mesh)
    if jax.process_count() <= 1:
        return jax.device_put(tree, repl)
    import numpy as np

    mesh_devs = set(mesh.devices.flat)

    def put(x):
        if (isinstance(x, jax.Array)
                and x.sharding.is_fully_replicated
                and set(x.sharding.device_set) == mesh_devs):
            return x
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


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

    # explicit replicated out_shardings (pytree prefix: whole new_state +
    # all metrics): without it GSPMD may place scalar metrics on a single
    # device, which is non-addressable from other processes — fetching
    # them then desyncs the ranks (observed: Gloo shutdown-barrier
    # deadline in the 2-process CLI run). Tensor-sharded mode keeps the
    # compiler's choice (params are deliberately not replicated there).
    out_sh = None if model_sharding else (repl, repl)

    @partial(jax.jit, donate_argnums=(0,), out_shardings=out_sh)
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
            state = _replicate(mesh, state)
        key = _replicate(mesh, key)
        return step(state, batch, key)

    return run
