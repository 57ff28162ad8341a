"""Metrics logging: JSONL always, Weights & Biases when available.

Parity target: the reference's W&B logger + per-step loss logging
(train.py:102-137, universe_gan.py:306-347). wandb is optional here.
"""
import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, log_dir, project=None, run_name=None,
                 use_wandb: bool = True, config: dict = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        # rank-suffixed file on non-zero hosts: every host logs (useful
        # for debugging skew) but never interleaves into rank 0's
        # canonical metrics.jsonl on a shared filesystem
        import jax
        rank = jax.process_index() if jax.process_count() > 1 else 0
        name = "metrics.jsonl" if rank == 0 else f"metrics_rank{rank}.jsonl"
        self._fh = open(self.log_dir / name, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                # run-id reattachment across restarts (reference recovers
                # the W&B id from the run dir on resume, train.py:95-127)
                id_file = self.log_dir / "wandb_id.txt"
                run_id = (id_file.read_text().strip()
                          if id_file.exists() else None)
                self._wandb = wandb.init(project=project or "open-universe-tpu",
                                         name=run_name, config=config,
                                         dir=str(self.log_dir), id=run_id,
                                         resume="allow")
                id_file.write_text(self._wandb.id)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception:
                pass

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
