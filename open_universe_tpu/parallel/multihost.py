"""Multi-host utilities.

TPU-native replacement for the reference's DDP helpers (utils/ddp.py:23-68
env-var rank discovery + Lightning sync_dist): JAX's coordinator handles
rank discovery; metric reduction uses a tiny pmapped psum.
"""
import jax
import jax.numpy as jnp
import numpy as np


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize multi-host JAX (no-op when single-process).

    Only calls ``jax.distributed.initialize`` when a coordinator is
    actually configured (arguments or the standard env vars) — on some
    backends an unconfigured initialize() BLOCKS waiting for cluster
    discovery instead of raising (observed on the axon TPU platform).
    """
    import os

    configured = coordinator_address is not None or any(
        os.environ.get(v) for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if configured:
        # explicit env-var fallbacks: some JAX versions only auto-detect
        # these under a recognized cluster environment (SLURM etc.), so a
        # bare `JAX_COORDINATOR_ADDRESS=...` launch (scripts/
        # multihost_cli_run.py) resolves them here instead
        if coordinator_address is None:
            coordinator_address = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                                   or os.environ.get("COORDINATOR_ADDRESS"))
        if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        if process_id is None and os.environ.get("JAX_PROCESS_ID"):
            process_id = int(os.environ["JAX_PROCESS_ID"])
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except (ValueError, RuntimeError):
            pass  # already initialized or single-host
    return jax.process_index(), jax.process_count()


def is_rank_zero() -> bool:
    return jax.process_index() == 0


def all_mean_scalar_dict(metrics: dict) -> dict:
    """Mean of host-local scalar metrics across all processes
    (the reference's sync_dist=True equivalent)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(local).sum(axis=0)
    return {k: float(summed[i] / jax.process_count())
            for i, k in enumerate(keys)}


def align_processes(tag: str = "pre_train", timeout_ms: int = 1_200_000):
    """Coordination-service barrier (NOT a device collective; no-op
    single-host).

    XLA:CPU's Gloo pair-context rendezvous gives each peer lookup a hard
    ~30 s KV deadline, so the FIRST device collective fails outright if
    the processes dispatch it more than ~30 s apart (compile-time skew is
    routinely minutes when one rank hits a warm compile cache). This
    barrier rides the jax.distributed coordination service instead —
    its timeout is configurable and generous — so ranks leave it within
    milliseconds of each other and every subsequent Gloo context forms
    inside the deadline. Call it right before the first sharded dispatch.
    """
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(tag, timeout_ms)
    except (ImportError, AttributeError):  # pragma: no cover - jax internals
        pass  # fall back to hoping dispatch skew is small


def final_sync(tag: str = "train_end") -> None:
    """Block until every process reaches this point (no-op single-host).

    Called right before process exit in ``bin/train``: rank 0 finishes
    with a final checkpoint write that the other ranks don't perform, so
    without a sync the fast ranks hit the ``jax.distributed`` shutdown
    barrier alone and its ~5 min deadline kills the whole job with the
    training already complete (observed in the round-4/5 real-CLI
    2-process runs: both ranks logged bit-identical step-20 metrics +
    "training done", then died rc=1 in ``Shutdown::`` barrier timeout
    while rank 0 was still serializing the checkpoint on a contended
    host). A device collective has no such deadline.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def worker_seed(base_seed: int) -> int:
    """Deterministic per-host seed folding (replaces pytorch_worker_seed)."""
    return base_seed * 1000003 + jax.process_index()
