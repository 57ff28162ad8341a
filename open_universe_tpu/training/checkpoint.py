"""Checkpoint save/restore (Orbax) + model loading for inference.

Parity targets: the reference's Lightning ModelCheckpoint + EMA
serialization (universe.py:832-875, train.py:141-150) and
``inference_utils.load_model`` (model_loader.py:33-133): checkpoints
carry the config alongside the weights; inference prefers EMA params.
"""
import json
import os
import shutil
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp
import yaml


def _ckptr():
    return ocp.StandardCheckpointer()


def _swap_in(tmp: Path, dest: Path) -> None:
    """Atomically promote ``tmp`` to ``dest`` with a valid snapshot on
    disk at every instant: rename the old dest aside, rename tmp in,
    then delete the old copy. The previous rmtree(dest)-then-replace
    sequence had a window with NO dest at all — a kill landing there
    (the watchdog's stall kill, or the runbook's kill-by-pid) left only
    ``dest.tmp`` and an empty artifact."""
    old = dest.with_name(dest.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if dest.exists():
        os.replace(dest, old)
    os.replace(tmp, dest)
    shutil.rmtree(old, ignore_errors=True)


def run_dir_has_checkpoints(ckpt_dir) -> bool:
    """True when ckpt_dir already holds run assets a fresh start could
    destroy (checkpoints, a best pointer, or a metrics log)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return False
    return bool(list(ckpt_dir.glob("step_*"))
                or (ckpt_dir / "best").exists()
                or (ckpt_dir / "best.json").exists()
                or (ckpt_dir / "last.json").exists()
                or (ckpt_dir / "metrics.jsonl").exists())


def prepare_run_dir(ckpt_dir, fresh: bool = False) -> dict:
    """Checkpoint-safety gate, run BEFORE any state is written.

    Returns {"resume": bool, "run_id": str}. Semantics (VERDICT round-2
    item 2 — a second ``bin/train`` invocation must never destroy an
    existing run; the reference's only rail is Lightning's
    resume-from-``last.ckpt``, train.py:171-181):

    - resumable run (``last.json`` present, no ``fresh``): reuse the
      stored run-id and resume.
    - populated dir WITHOUT ``last.json`` (e.g. a crashed run that still
      holds ``best``/metrics): refuse to start unless ``fresh=True``.
    - ``fresh=True`` on any populated dir: ARCHIVE it to
      ``<dir>.bak-<n>`` (never delete) and start from step 0.
    - empty/missing dir: fresh start with a new run-id.
    """
    import uuid

    ckpt_dir = Path(ckpt_dir).absolute()
    if latest_step(ckpt_dir) is not None and not fresh:
        rid_file = ckpt_dir / "run_id.json"
        if rid_file.exists():
            with open(rid_file) as f:
                run_id = json.load(f)["run_id"]
        else:  # pre-safety-rails run dir
            run_id = uuid.uuid4().hex[:12]
            with open(rid_file, "w") as f:
                json.dump({"run_id": run_id}, f)
        return {"resume": True, "run_id": run_id}
    ckpt_assets = bool(list(ckpt_dir.glob("step_*"))
                       or (ckpt_dir / "best").exists()
                       or (ckpt_dir / "best.json").exists()
                       or (ckpt_dir / "last.json").exists())
    if run_dir_has_checkpoints(ckpt_dir) and not ckpt_assets and not fresh:
        # bookkeeping-only dir (run_id/heartbeat/metrics but no
        # checkpoint): a run that died before its first checkpoint. A
        # watchdog restart lands here — continuing appends to
        # metrics.jsonl and destroys nothing, so it must NOT be refused
        # (round-4 incident: a crash-loop of refused restarts after a
        # first-compile stall kill).
        rid_file = ckpt_dir / "run_id.json"
        if rid_file.exists():
            with open(rid_file) as f:
                run_id = json.load(f)["run_id"]
        else:
            run_id = uuid.uuid4().hex[:12]
            with open(rid_file, "w") as f:
                json.dump({"run_id": run_id}, f)
        return {"resume": False, "run_id": run_id}
    if run_dir_has_checkpoints(ckpt_dir):
        if not fresh:
            raise RuntimeError(
                f"refusing to start a fresh run into populated checkpoint "
                f"dir {ckpt_dir} (holds "
                f"{sorted(p.name for p in ckpt_dir.iterdir())[:8]}...). "
                f"Pass --fresh to archive it to {ckpt_dir}.bak-N first, or "
                f"point run.ckpt_dir elsewhere.")
        n = 0
        while Path(f"{ckpt_dir}.bak-{n}").exists():
            n += 1
        shutil.move(str(ckpt_dir), f"{ckpt_dir}.bak-{n}")
        print(f"archived existing run dir to {ckpt_dir}.bak-{n}", flush=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    run_id = uuid.uuid4().hex[:12]
    with open(ckpt_dir / "run_id.json", "w") as f:
        json.dump({"run_id": run_id}, f)
    return {"resume": False, "run_id": run_id}


def _run_id(ckpt_dir) -> Optional[str]:
    rid = Path(ckpt_dir) / "run_id.json"
    if rid.exists():
        with open(rid) as f:
            return json.load(f)["run_id"]
    return None


def save_checkpoint(ckpt_dir, step: int, state, config: Optional[dict] = None,
                    keep_last: int = 2):
    """Save train state under ckpt_dir/step_N; maintains `last` pointer."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step}"
    if path.exists():
        shutil.rmtree(path)
    c = _ckptr()
    c.save(str(path), state)
    c.wait_until_finished()
    if config is not None:
        with open(ckpt_dir / "config.yaml", "w") as f:
            yaml.safe_dump(config, f)
    with open(ckpt_dir / "last.json", "w") as f:
        json.dump({"step": step, "run_id": _run_id(ckpt_dir)}, f)
    # prune old checkpoints
    steps = sorted(int(p.name.split("_")[1]) for p in ckpt_dir.glob("step_*"))
    for s in steps[:-keep_last]:
        shutil.rmtree(ckpt_dir / f"step_{s}", ignore_errors=True)


def save_best_checkpoint(ckpt_dir, step: int, state, score: float,
                         minimize: bool = True) -> bool:
    """Keep the single best checkpoint by a monitored score.

    Parity: reference ModelCheckpoint(save_top_k=1) monitoring
    cfg.model.validation.main_loss (val/score), train.py:141-150.
    Returns True when the checkpoint was saved (score improved)."""
    import math

    if not math.isfinite(score):
        return False  # a diverged val score must never clobber the best
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_file = ckpt_dir / "best.json"
    if best_file.exists():
        with open(best_file) as f:
            prev = json.load(f)["score"]
        if math.isfinite(prev) and (
                (score >= prev) if minimize else (score <= prev)):
            return False
    path = ckpt_dir / "best"
    if path.exists():
        shutil.rmtree(path)
    c = _ckptr()
    c.save(str(path), state)
    c.wait_until_finished()
    with open(best_file, "w") as f:
        json.dump({"step": step, "score": float(score),
                   "run_id": _run_id(ckpt_dir)}, f)
    return True


def snapshot_best(ckpt_dir, dest) -> None:
    """Copy the current best checkpoint to ``dest`` (a loadable run dir:
    ``dest/best`` + ``best.json``/``config.yaml``/``run_id.json``, so
    ``bin/enhance --ckpt dest --step best`` serves it directly).

    Atomic (copy to ``dest.tmp`` then rename) so a crash mid-copy never
    leaves a half-written snapshot; protects multi-hour chip assets from
    the round-2 failure mode where the live run dir was clobbered
    (VERDICT round-2 "what's weak" item 3)."""
    ckpt_dir, dest = Path(ckpt_dir), Path(dest)
    src = ckpt_dir / "best"
    if not src.exists():
        return
    tmp = dest.with_name(dest.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    shutil.copytree(src, tmp / "best")
    for meta in ("best.json", "config.yaml", "run_id.json"):
        if (ckpt_dir / meta).exists():
            shutil.copy(ckpt_dir / meta, tmp / meta)
    _swap_in(tmp, dest)


def snapshot_last(ckpt_dir, dest, include_best: bool = True) -> Optional[int]:
    """Copy the latest full train-state checkpoint to ``dest`` as a
    RESUMABLE run dir (``dest/step_N`` + ``last.json`` + config/run-id,
    plus ``best``/``best.json`` when ``include_best``).

    Complements :func:`snapshot_best` (which captures only the
    best-metric state, enough to *serve* but which loses optimizer
    progress past the best step): ``snapshot_last`` is the
    session-boundary handoff — commit ``dest`` to the repo and a later
    session rebuilds the live run dir with :func:`restore_run_dir` and
    continues the schedule from step N with full optimizer/EMA state.
    Atomic like ``snapshot_best`` (write ``dest.tmp`` then rename).
    Returns the snapshotted step, or None when no checkpoint exists.
    """
    ckpt_dir, dest = Path(ckpt_dir), Path(dest)
    step = latest_step(ckpt_dir)
    if step is None or not (ckpt_dir / f"step_{step}").exists():
        return None
    tmp = dest.with_name(dest.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    shutil.copytree(ckpt_dir / f"step_{step}", tmp / f"step_{step}")
    # best.json travels UNCONDITIONALLY: save_best_checkpoint compares
    # against best.json alone, so a restored run dir without it would
    # treat the first post-resume validation as an unconditional best
    # and silently overwrite the committed best artifact with a
    # potentially worse checkpoint. include_best gates only the heavy
    # best/ checkpoint dir.
    for meta in ("last.json", "best.json", "config.yaml", "run_id.json"):
        if (ckpt_dir / meta).exists():
            shutil.copy(ckpt_dir / meta, tmp / meta)
    if include_best and (ckpt_dir / "best").exists():
        shutil.copytree(ckpt_dir / "best", tmp / "best")
    _swap_in(tmp, dest)
    return step


def restore_run_dir(snapshot, ckpt_dir) -> int:
    """Rebuild a live, resumable run dir at ``ckpt_dir`` from a committed
    snapshot (the inverse of :func:`snapshot_last`; also accepts a
    best-only :func:`snapshot_best` dir, synthesizing ``step_N`` and
    ``last.json`` from ``best``/``best.json`` — resuming then repeats
    steps after N, which the trajectory-aware log rebuild
    (scripts/log_to_jsonl.py) already de-duplicates).

    Uses hardlink copies when source and dest share a filesystem (Orbax
    never mutates checkpoint files in place, so links are safe) and
    refuses to overwrite an existing populated ``ckpt_dir``.
    Returns the resumable step.
    """
    snapshot, ckpt_dir = Path(snapshot), Path(ckpt_dir)
    if run_dir_has_checkpoints(ckpt_dir) or (ckpt_dir / "last.json").exists():
        raise RuntimeError(
            f"refusing to rebuild into populated run dir {ckpt_dir}; "
            f"remove it or point elsewhere")

    def _copy(src, dst):
        try:
            shutil.copytree(src, dst, copy_function=os.link)
            # hardlinks share inodes with the committed artifact; make
            # them read-only so any future in-place mutation of a
            # run-dir checkpoint file fails loudly instead of silently
            # corrupting the artifact (rmtree/unlink still work — they
            # need directory perms, not file perms)
            for root, _, files in os.walk(dst):
                for f in files:
                    os.chmod(Path(root) / f, 0o444)
        except OSError:
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)

    step = latest_step(snapshot)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if step is not None and (snapshot / f"step_{step}").exists():
        _copy(snapshot / f"step_{step}", ckpt_dir / f"step_{step}")
        shutil.copy(snapshot / "last.json", ckpt_dir / "last.json")
    else:  # best-only snapshot
        bstep = best_step(snapshot)
        if bstep is None or not (snapshot / "best").exists():
            raise FileNotFoundError(
                f"{snapshot} holds neither a last nor a best checkpoint")
        step = bstep
        _copy(snapshot / "best", ckpt_dir / f"step_{step}")
        rid = _run_id(snapshot)
        with open(ckpt_dir / "last.json", "w") as f:
            json.dump({"step": step, "run_id": rid}, f)
    if (snapshot / "best").exists() and not (ckpt_dir / "best").exists():
        _copy(snapshot / "best", ckpt_dir / "best")
    # best.json restores even when the heavy best/ dir was not
    # snapshotted: it carries the monitor threshold that keeps
    # save_best_checkpoint from treating the first post-resume
    # validation as an unconditional improvement
    if (snapshot / "best.json").exists() \
            and not (ckpt_dir / "best.json").exists():
        shutil.copy(snapshot / "best.json", ckpt_dir / "best.json")
    for meta in ("config.yaml", "run_id.json"):
        if (snapshot / meta).exists() and not (ckpt_dir / meta).exists():
            shutil.copy(snapshot / meta, ckpt_dir / meta)
    return step


def best_step(ckpt_dir) -> Optional[int]:
    best = Path(ckpt_dir) / "best.json"
    if not best.exists():
        return None
    with open(best) as f:
        return json.load(f)["step"]


def latest_step(ckpt_dir) -> Optional[int]:
    last = Path(ckpt_dir) / "last.json"
    if not last.exists():
        return None
    with open(last) as f:
        return json.load(f)["step"]


def restore_checkpoint(ckpt_dir, state_template, step=None,
                       keep_roots=None):
    """Restore into the structure of state_template. Returns (state, step).

    ``step`` may be an int, None (latest), or "best" (the best-val/score
    checkpoint saved by save_best_checkpoint).

    ``keep_roots``: optional set of top-level state fields to actually
    read; every other field is restored as ``ocp.PLACEHOLDER`` (orbax
    partial restore). Serving only needs the EMA/params subtrees
    (~170 MB of a 1.1 GB full-size train state — the optimizer moments
    and discriminators are dead weight at inference), so skipping them
    cuts the disk-read part of cold start by the same factor
    (PERF.md serving cold-start section)."""
    ckpt_dir = Path(ckpt_dir).absolute()
    if step == "best":
        bstep = best_step(ckpt_dir)
        if bstep is None:
            raise FileNotFoundError(f"no best checkpoint in {ckpt_dir}")
        path, step = ckpt_dir / "best", bstep
    else:
        if step is None:
            step = latest_step(ckpt_dir)
            if step is None:
                raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        path = ckpt_dir / f"step_{step}"
    target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                    state_template)
    if keep_roots is None:
        state = _ckptr().restore(str(path), target=target)
    else:
        # subset-item partial restore: only the named top-level fields
        # are read from disk; the result is a namespace exposing just
        # those fields (inference callers use attribute access)
        from types import SimpleNamespace

        sub = {}
        for root in keep_roots:
            if isinstance(state_template, dict):
                if root in state_template:
                    sub[root] = state_template[root]
            elif hasattr(state_template, root):
                sub[root] = getattr(state_template, root)
        sub_t = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, sub)
        with ocp.PyTreeCheckpointer() as c:
            restored = c.restore(
                str(path),
                args=ocp.args.PyTreeRestore(item=sub_t,
                                            partial_restore=True))
        state = SimpleNamespace(**restored)
    return state, step


def load_config(ckpt_dir) -> dict:
    with open(Path(ckpt_dir) / "config.yaml") as f:
        return yaml.safe_load(f)


def load_model_for_inference(ckpt_dir, step: Optional[int] = None,
                             use_ema: bool = True):
    """Build the model from a checkpoint dir and return (model, params).

    Prefers EMA weights like the reference loader (model_loader.py:122-130).
    """
    from ..runtime import build_model, build_trainer

    cfg = load_config(ckpt_dir)
    model = build_model(cfg["model"])
    trainer = build_trainer(model, cfg["trainer"])
    # serving cold-start: build the restore template ABSTRACTLY.
    # trainer.init materializes the full train state (params + two
    # optimizer states + EMA + discriminators, ~1 GB at full size) on the
    # default device — over a tunneled TPU that alone took ~10 min of the
    # measured serving cold start. restore_checkpoint only needs the
    # tree structure/shapes/dtypes, so trace init with jax.eval_shape:
    # zero FLOPs, zero device transfers.
    init_kwargs = ({"batch": 1} if cfg["trainer"].get("kind") == "mdn"
                   else {"example_len": model.tot_ds * 10, "batch": 1})
    template = jax.eval_shape(
        lambda k: trainer.init(k, **init_kwargs), jax.random.PRNGKey(0))
    # partial restore: inference touches only the EMA/params subtrees;
    # optimizer moments + discriminators (the bulk of the state) stay
    # unread on disk
    keep = {"ema", "gen_params", "params"} if use_ema else \
        {"gen_params", "params"}
    state, step = restore_checkpoint(ckpt_dir, template, step=step,
                                     keep_roots=keep)
    if use_ema:
        ema = state.ema.params
        if "decoupling" in getattr(state, "gen_params", {}):
            params = dict(ema)
            if "decoupling" not in params:
                params["decoupling"] = state.gen_params["decoupling"]
        else:
            params = dict(ema)
    else:
        if hasattr(state, "gen_params"):
            params = state.gen_params
        else:
            params = {"score": state.params["score"],
                      "cond": state.params["cond"]}
    return model, params, cfg
