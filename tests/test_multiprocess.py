"""True multi-process distributed test on CPU (2 processes).

The reference validates multi-GPU behavior only by running Lightning DDP
for real (SURVEY.md §4); here the multi-host path (jax.distributed
coordinator + cross-process metric reduction + per-host seeds + per-host
data sharding) is exercised with two actual processes on the CPU backend
— no pod required.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from open_universe_tpu.parallel.multihost import (
    all_mean_scalar_dict,
    initialize_distributed,
    is_rank_zero,
    worker_seed,
)

rank, count = initialize_distributed(coordinator_address=coord,
                                     num_processes=nproc, process_id=pid)
assert rank == pid and count == nproc, (rank, count)
assert is_rank_zero() == (pid == 0)

# cross-process metric mean (the reference's sync_dist=True equivalent)
m = all_mean_scalar_dict({"loss": 1.0 + pid, "acc": 0.5})
assert abs(m["loss"] - 1.5) < 1e-6, m
assert abs(m["acc"] - 0.5) < 1e-6, m

# per-host seeds must be distinct across the job
import numpy as np
from jax.experimental import multihost_utils

seeds = multihost_utils.process_allgather(
    np.asarray([worker_seed(7)], np.int64))
assert len(set(int(s) for s in np.ravel(seeds))) == nproc, seeds
print(f"MULTIHOST_OK rank={rank} count={count}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH', '')}"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "jax.distributed" in out and (
                "not supported" in out or "Unimplemented" in out):
            pytest.skip(f"jax.distributed unsupported here: {out[-200:]}")
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"MULTIHOST_OK rank={i} count=2" in out, out
