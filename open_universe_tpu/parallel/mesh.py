"""Device mesh construction.

The reference's only parallelism is Lightning DDP over NCCL
(SURVEY.md §2.8). The TPU-native equivalent: a ``jax.sharding.Mesh`` with
a ``data`` axis spanning ICI/DCN; gradient allreduce is implicit in the
sharded (pjit) train step. A ``model`` axis is reserved for future tensor
sharding of larger variants (weights are replicated at reference scale).

Multi-host: call ``jax.distributed.initialize()`` before ``default_mesh``
(the reference's env-var rank discovery, utils/ddp.py:32-64, is subsumed
by JAX's coordinator).
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str],
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev, axis_names)


def default_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or n_data) devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_data or len(devices)
    return make_mesh((n,), ("data",), devices)
