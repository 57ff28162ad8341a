"""Checkpoint-safety rails + watchdog (VERDICT round-2 item 2).

The reference's recovery story is manual resume from ``last.ckpt``
(reference train.py:171-181) with rclone off-site copies
(rsync/cloud_sync.py:38-89); it has no guard against a fresh run
clobbering an existing run dir and no stall detection.  These tests pin
the framework's stronger rails:

  - a second ``bin/train`` invocation cannot destroy an existing run;
  - ``--fresh`` archives instead of clobbering;
  - run-ids stamp every pointer file;
  - best-checkpoint snapshots are atomic and loadable;
  - the watchdog restarts a stalled or crashed child (simulated stall).
"""
import json
import os
import stat
import sys
import textwrap
from pathlib import Path

import pytest

from open_universe_tpu.training.checkpoint import (
    prepare_run_dir,
    run_dir_has_checkpoints,
    save_best_checkpoint,
    save_checkpoint,
    snapshot_best,
)
from open_universe_tpu.training.watchdog import (
    heartbeat_age,
    supervise,
    write_heartbeat,
)


# --------------------------------------------------------- prepare_run_dir
def test_fresh_start_empty_dir(tmp_path):
    d = tmp_path / "run"
    info = prepare_run_dir(d)
    assert info["resume"] is False
    assert len(info["run_id"]) == 12
    assert json.loads((d / "run_id.json").read_text())["run_id"] == \
        info["run_id"]


def test_resumable_dir_always_resumes(tmp_path):
    d = tmp_path / "run"
    d.mkdir()
    (d / "last.json").write_text(json.dumps({"step": 100}))
    info = prepare_run_dir(d)
    assert info["resume"] is True
    info2 = prepare_run_dir(d)
    assert info2["run_id"] == info["run_id"]
    assert (d / "last.json").exists()
    # --fresh on a resumable dir: archives (never deletes) and starts over
    info3 = prepare_run_dir(d, fresh=True)
    assert info3["resume"] is False
    bak = Path(str(d) + ".bak-0")
    assert json.loads((bak / "last.json").read_text())["step"] == 100


def test_populated_nonresumable_dir_refused(tmp_path):
    """A crashed run (best checkpoint but no last.json) must not be
    silently clobbered by a new step-0 run — the round-2 failure mode."""
    d = tmp_path / "run"
    (d / "best").mkdir(parents=True)
    (d / "best.json").write_text(json.dumps({"step": 4000, "score": 0.2}))
    (d / "metrics.jsonl").write_text("{}\n")
    assert run_dir_has_checkpoints(d)
    with pytest.raises(RuntimeError, match="refusing"):
        prepare_run_dir(d)
    # assets untouched by the refusal
    assert (d / "best.json").exists()


def test_fresh_archives_instead_of_clobbering(tmp_path):
    d = tmp_path / "run"
    (d / "best").mkdir(parents=True)
    (d / "best.json").write_text(json.dumps({"step": 4000, "score": 0.2}))
    info = prepare_run_dir(d, fresh=True)
    assert info["resume"] is False
    bak = Path(str(d) + ".bak-0")
    assert json.loads((bak / "best.json").read_text())["step"] == 4000
    assert not (d / "best.json").exists()
    # a second --fresh archive gets a distinct suffix
    (d / "metrics.jsonl").write_text("{}\n")
    prepare_run_dir(d, fresh=True)
    assert Path(str(d) + ".bak-1").exists()


def test_train_cli_refuses_populated_dir(tmp_path):
    """The guard is wired into bin/train BEFORE any state is built."""
    import yaml

    from open_universe_tpu.bin.train import main as train_main

    d = tmp_path / "exp"
    (d / "best").mkdir(parents=True)
    (d / "best.json").write_text(json.dumps({"step": 10, "score": 0.5}))
    cfg = {"model": {}, "trainer": {}, "datamodule": {},
           "run": {"max_steps": 1, "ckpt_dir": str(d)}}
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(RuntimeError, match="refusing"):
        train_main(["--config", str(cfg_path)])
    assert (d / "best.json").exists()


# ----------------------------------------------------- run-id stamping
def test_pointers_carry_run_id(tmp_path):
    d = tmp_path / "run"
    info = prepare_run_dir(d)
    state = {"w": [1.0, 2.0]}
    save_checkpoint(d, 10, state, keep_last=4)
    assert json.loads((d / "last.json").read_text())["run_id"] == \
        info["run_id"]
    assert save_best_checkpoint(d, 10, state, 0.5)
    assert json.loads((d / "best.json").read_text())["run_id"] == \
        info["run_id"]


def test_keep_last_pruning(tmp_path):
    d = tmp_path / "run"
    prepare_run_dir(d)
    state = {"w": [1.0]}
    for s in (10, 20, 30, 40, 50):
        save_checkpoint(d, s, state, keep_last=3)
    steps = sorted(int(p.name.split("_")[1]) for p in d.glob("step_*"))
    assert steps == [30, 40, 50]


def test_snapshot_best_is_loadable(tmp_path):
    from open_universe_tpu.training.checkpoint import restore_checkpoint

    d = tmp_path / "run"
    prepare_run_dir(d)
    import numpy as np

    state = {"w": np.arange(4, dtype=np.float32)}
    save_best_checkpoint(d, 7, state, 0.25)
    snap = tmp_path / "artifacts" / "best_snapshot"
    snapshot_best(d, snap)
    assert json.loads((snap / "best.json").read_text())["step"] == 7
    restored, step = restore_checkpoint(
        snap, {"w": np.zeros(4, dtype=np.float32)}, step="best")
    assert step == 7
    assert np.allclose(restored["w"], state["w"])
    # second snapshot replaces atomically
    save_best_checkpoint(d, 9, state, 0.1)
    snapshot_best(d, snap)
    assert json.loads((snap / "best.json").read_text())["step"] == 9
    assert not snap.with_name(snap.name + ".tmp").exists()


def test_snapshot_last_roundtrips_to_resumable_run_dir(tmp_path):
    """Session-boundary handoff: snapshot_last captures the latest FULL
    train state; restore_run_dir rebuilds a live dir that
    prepare_run_dir resumes (same run-id, same step) — the rail that
    lets a committed artifact continue a run across driver sessions
    where the gitignored exp/ dir does not survive."""
    import numpy as np

    from open_universe_tpu.training.checkpoint import (
        restore_checkpoint,
        restore_run_dir,
        snapshot_last,
    )

    d = tmp_path / "run"
    info0 = prepare_run_dir(d)
    state = {"w": np.arange(6, dtype=np.float32)}
    save_checkpoint(d, 4, state, config={"a": 1})
    save_best_checkpoint(d, 4, state, 0.5)
    save_checkpoint(d, 9, {"w": state["w"] * 2}, config={"a": 1})
    snap = tmp_path / "artifacts" / "last_snapshot"
    assert snapshot_last(d, snap) == 9
    assert json.loads((snap / "last.json").read_text())["step"] == 9
    assert (snap / "best.json").exists()  # include_best default

    live = tmp_path / "run2"
    assert restore_run_dir(snap, live) == 9
    info = prepare_run_dir(live)
    assert info["resume"] is True
    assert info["run_id"] == info0["run_id"]
    restored, step = restore_checkpoint(
        live, {"w": np.zeros(6, dtype=np.float32)})
    assert step == 9 and np.allclose(restored["w"], state["w"] * 2)
    # best survives the roundtrip for the monitor comparison
    restored_b, bstep = restore_checkpoint(
        live, {"w": np.zeros(6, dtype=np.float32)}, step="best")
    assert bstep == 4 and np.allclose(restored_b["w"], state["w"])

    # refuses to clobber a populated run dir
    with pytest.raises(RuntimeError, match="refusing"):
        restore_run_dir(snap, live)

    # best-only snapshots (snapshot_best layout) are also resumable:
    # step_N is synthesized from best/best.json
    bsnap = tmp_path / "artifacts" / "best_snapshot"
    snapshot_best(d, bsnap)
    live2 = tmp_path / "run3"
    assert restore_run_dir(bsnap, live2) == 4
    assert prepare_run_dir(live2)["resume"] is True
    restored2, step2 = restore_checkpoint(
        live2, {"w": np.zeros(6, dtype=np.float32)})
    assert step2 == 4 and np.allclose(restored2["w"], state["w"])


def test_snapshot_last_without_best_dir_keeps_monitor_threshold(tmp_path):
    """The in-loop mirror runs include_best=False (the heavy best/ dir
    is snapshotted separately on improvement) — but best.json must
    STILL travel, or a restored run dir would treat the first
    post-resume validation as an unconditional best and overwrite the
    committed best artifact with a worse checkpoint (round-4 advisor
    finding, bin/train.py:316)."""
    import numpy as np

    from open_universe_tpu.training.checkpoint import (
        restore_run_dir,
        snapshot_last,
    )

    d = tmp_path / "run"
    prepare_run_dir(d)
    state = {"w": np.arange(4, dtype=np.float32)}
    save_checkpoint(d, 5, state, config={"a": 1})
    save_best_checkpoint(d, 5, state, 1.72, minimize=False)
    snap = tmp_path / "artifacts" / "last_only"
    assert snapshot_last(d, snap, include_best=False) == 5
    assert not (snap / "best").exists()
    assert json.loads((snap / "best.json").read_text())["score"] == 1.72

    live = tmp_path / "run2"
    restore_run_dir(snap, live)
    # a WORSE post-resume score must not become the new best
    assert save_best_checkpoint(live, 6, state, 1.60,
                                minimize=False) is False
    # a better one still does
    assert save_best_checkpoint(live, 7, state, 1.80,
                                minimize=False) is True


def test_snapshot_swap_never_leaves_missing_dest(tmp_path):
    """Snapshot promotion renames the old dest aside instead of
    rmtree-ing it first, so a valid snapshot dir exists at every
    instant and no .tmp/.old debris survives a successful swap."""
    import numpy as np

    from open_universe_tpu.training.checkpoint import snapshot_last

    d = tmp_path / "run"
    prepare_run_dir(d)
    state = {"w": np.zeros(3, dtype=np.float32)}
    save_checkpoint(d, 1, state, config={})
    snap = tmp_path / "artifacts" / "snap"
    assert snapshot_last(d, snap) == 1
    save_checkpoint(d, 2, state, config={})
    assert snapshot_last(d, snap) == 2  # overwrite path exercised
    assert json.loads((snap / "last.json").read_text())["step"] == 2
    assert not snap.with_name(snap.name + ".tmp").exists()
    assert not snap.with_name(snap.name + ".old").exists()


# ------------------------------------------------------------- watchdog
# child processes run with a bare env: the container's sitecustomize
# registers a PJRT plugin at interpreter start (~2 s), which is noise
# these sub-second-timeout tests must not measure
_CHILD_ENV = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}


def _write_child(path, body):
    path.write_text(textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


def test_heartbeat_roundtrip(tmp_path):
    hb = tmp_path / "heartbeat.json"
    assert heartbeat_age(hb) == float("inf")
    write_heartbeat(hb, 42, extra={"note": "x"})
    assert heartbeat_age(hb) < 5.0
    assert json.loads(hb.read_text())["step"] == 42


def test_supervise_clean_exit(tmp_path):
    hb = tmp_path / "hb.json"
    child = tmp_path / "child.py"
    _write_child(child, f"""
        import json, time
        with open({str(hb)!r}, "w") as f:
            json.dump({{"step": 1, "time": time.time()}}, f)
    """)
    rc = supervise([sys.executable, str(child)], hb,
                   stall_timeout=5.0, poll=0.2, log=lambda *a, **k: None,
                   env=_CHILD_ENV)
    assert rc == 0


def test_supervise_restarts_after_stall(tmp_path):
    """Incarnation 1 heartbeats once then hangs forever (the hung-RPC
    failure mode observed twice on the axon tunnel); the watchdog must
    kill it by pgid and restart; incarnation 2 finishes cleanly."""
    hb = tmp_path / "hb.json"
    marker = tmp_path / "started_once"
    child = tmp_path / "child.py"
    _write_child(child, f"""
        import json, os, sys, time
        def beat(step):
            with open({str(hb)!r}, "w") as f:
                json.dump({{"step": step, "time": time.time()}}, f)
        if os.path.exists({str(marker)!r}):
            beat(2)
            sys.exit(0)  # resumed incarnation: clean finish
        open({str(marker)!r}, "w").close()
        beat(1)
        time.sleep(3600)  # simulated hung device RPC
    """)
    rc = supervise([sys.executable, str(child)], hb,
                   stall_timeout=1.5, poll=0.2, max_restarts=3,
                   log=lambda *a, **k: None, env=_CHILD_ENV)
    assert rc == 0
    assert marker.exists()
    assert json.loads(hb.read_text())["step"] == 2


def test_supervise_restarts_after_crash(tmp_path):
    hb = tmp_path / "hb.json"
    marker = tmp_path / "crashed_once"
    child = tmp_path / "child.py"
    _write_child(child, f"""
        import json, os, sys, time
        with open({str(hb)!r}, "w") as f:
            json.dump({{"step": 1, "time": time.time()}}, f)
        if not os.path.exists({str(marker)!r}):
            open({str(marker)!r}, "w").close()
            sys.exit(3)  # simulated crash
        sys.exit(0)
    """)
    rc = supervise([sys.executable, str(child)], hb,
                   stall_timeout=30.0, poll=0.2, max_restarts=3,
                   log=lambda *a, **k: None, env=_CHILD_ENV)
    assert rc == 0


def test_supervise_gives_up_after_max_restarts(tmp_path):
    hb = tmp_path / "hb.json"
    child = tmp_path / "child.py"
    _write_child(child, """
        import sys
        sys.exit(5)
    """)
    rc = supervise([sys.executable, str(child)], hb,
                   stall_timeout=30.0, poll=0.1, max_restarts=2,
                   log=lambda *a, **k: None, env=_CHILD_ENV)
    assert rc == 5


@pytest.mark.slow
def test_nan_tripwire_aborts_without_checkpoint(tmp_path):
    """A non-finite training loss aborts the run BEFORE any further
    checkpoint write (reference analogue: the breakpoint() NaN traps,
    universe.py:526-528). weight_mel_l1=inf forces loss_gen=inf at the
    very first logged step."""
    import numpy as np
    import yaml

    from open_universe_tpu.bin.train import main as train_main
    from open_universe_tpu.data.wavio import write_wav

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        for d in ("noisy", "clean"):
            (data / split / d).mkdir(parents=True)
        for i in range(4):
            clean = 0.1 * np.sin(np.arange(320) * 0.3 * (i + 1))
            write_wav(data / split / "clean" / f"u{i}.wav", clean, 800)
            write_wav(data / split / "noisy" / f"u{i}.wav",
                      clean + 0.03 * rng.standard_normal(320), 800)
    cfg = {
        "model": {"fs": 800, "rate_factors": [2, 4], "n_channels": 4,
                  "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
                  "diffusion": {"n_steps": 4}},
        "trainer": {"kind": "gan", "mpd_periods": [2, 3],
                    "mrd_resolutions": [[64, 16, 32]],
                    "weight_mel_l1": float("inf")},
        "datamodule": {"audio_path": str(data), "fs": 800,
                       "audio_len": 0.2, "length_mode": "crop",
                       "batch_size": 2, "num_workers": 0},
        "run": {"max_steps": 3, "log_every": 1, "val_every": 1000,
                "ckpt_every": 1000, "ckpt_dir": str(tmp_path / "exp"),
                "seed": 0},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(RuntimeError, match="NaN tripwire"):
        train_main(["--config", str(cfg_path)])
    # no checkpoint was written by the aborting run
    assert not list((tmp_path / "exp").glob("step_*"))


def test_supervise_restart_strips_one_shot_flags(tmp_path):
    """--fresh must NOT survive into watchdog restarts: a restart that
    re-archives the run dir would wipe the progress the watchdog exists
    to protect. supervise() runs `cmd` once, then `restart_cmd`."""
    hb = tmp_path / "hb.json"
    seen = tmp_path / "argv_log"
    child = tmp_path / "child.py"
    _write_child(child, f"""
        import json, sys, time
        with open({str(seen)!r}, "a") as f:
            f.write(" ".join(sys.argv[1:]) + chr(10))
        with open({str(hb)!r}, "w") as f:
            json.dump({{"step": 1, "time": time.time()}}, f)
        lines = open({str(seen)!r}).read().splitlines()
        sys.exit(7 if len(lines) == 1 else 0)  # crash once, then finish
    """)
    rc = supervise([sys.executable, str(child), "--fresh"], hb,
                   stall_timeout=30.0, poll=0.1, max_restarts=3,
                   log=lambda *a, **k: None, env=_CHILD_ENV,
                   restart_cmd=[sys.executable, str(child)])
    assert rc == 0
    lines = seen.read_text().splitlines()
    assert lines == ["--fresh", ""]  # restart ran WITHOUT --fresh


def test_supervise_self_restart_cmd():
    from open_universe_tpu.training.watchdog import supervise_self  # noqa
    import open_universe_tpu.training.watchdog as wd

    captured = {}

    def fake_supervise(cmd, hb, stall_timeout, max_restarts, restart_cmd):
        captured["cmd"] = cmd
        captured["restart"] = restart_cmd
        return 0

    orig = wd.supervise
    wd.supervise = fake_supervise
    try:
        wd.supervise_self(["--config", "c.yaml", "--supervise", "--fresh"],
                          "hb.json")
    finally:
        wd.supervise = orig
    assert "--fresh" in captured["cmd"]
    assert "--supervise" not in captured["cmd"]
    assert "--fresh" not in captured["restart"]


@pytest.mark.slow
def test_host_rss_recycle_checkpoints_then_restart_code(tmp_path):
    """run.max_host_rss_gb: when host RSS exceeds the bound, the trainer
    checkpoints AT THE CURRENT STEP and exits with the restart code (75)
    so the watchdog resumes with a fresh process — zero step loss. A
    tiny threshold triggers on the first logged step."""
    import numpy as np
    import yaml

    from open_universe_tpu.bin.train import main as train_main
    from open_universe_tpu.data.wavio import write_wav

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        for d in ("noisy", "clean"):
            (data / split / d).mkdir(parents=True)
        for i in range(4):
            clean = 0.1 * np.sin(np.arange(320) * 0.3 * (i + 1))
            write_wav(data / split / "clean" / f"u{i}.wav", clean, 800)
            write_wav(data / split / "noisy" / f"u{i}.wav",
                      clean + 0.03 * rng.standard_normal(320), 800)
    cfg = {
        "model": {"fs": 800, "rate_factors": [2, 4], "n_channels": 4,
                  "n_rff": 8, "noise_cond_dim": 32, "n_mels": 8,
                  "diffusion": {"n_steps": 4}},
        "trainer": {"kind": "gan", "mpd_periods": [2, 3],
                    "mrd_resolutions": [[64, 16, 32]]},
        "datamodule": {"audio_path": str(data), "fs": 800,
                       "audio_len": 0.2, "length_mode": "crop",
                       "batch_size": 2, "num_workers": 0},
        "run": {"max_steps": 10, "log_every": 2, "val_every": 1000,
                "ckpt_every": 1000, "ckpt_dir": str(tmp_path / "exp"),
                "seed": 0, "max_host_rss_gb": 0.001},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(SystemExit) as exc:
        train_main(["--config", str(cfg_path)])
    assert exc.value.code == 75
    assert json.loads(
        (tmp_path / "exp" / "last.json").read_text())["step"] == 2


# ------------------------------------------ abstract-init restore (mdn)
def test_load_model_for_inference_mdn(tmp_path):
    """load_model_for_inference's jax.eval_shape restore template must
    cover BOTH trainer kinds: the gan branch is exercised by the serving
    evals; this covers kind='mdn' (round-3 ADVICE item 4) — any
    value-dependent Python control flow in the trainer init would fail at
    trace time here."""
    import jax
    import jax.numpy as jnp

    from open_universe_tpu.runtime import build_model, build_trainer
    from open_universe_tpu.training.checkpoint import (
        load_model_for_inference,
        save_checkpoint,
    )

    cfg = {"model": {"fs": 16000, "n_channels": 8, "noise_cond_dim": 64,
                     "n_rff": 8, "n_mels": 16},
           "trainer": {"kind": "mdn"},
           "datamodule": {}, "run": {}}
    model = build_model(cfg["model"])
    trainer = build_trainer(model, cfg["trainer"])
    state = trainer.init(jax.random.PRNGKey(0), batch=1)
    d = tmp_path / "ckpt"
    save_checkpoint(d, 7, jax.device_get(state), config=cfg)

    m2, params, cfg2 = load_model_for_inference(d, use_ema=True)
    assert cfg2["trainer"]["kind"] == "mdn"
    # restored params must drive the serving path
    out = m2.enhance(params, jnp.zeros((1, m2.tot_ds * 10)),
                     jax.random.PRNGKey(1), n_steps=2)
    assert out.shape == (1, m2.tot_ds * 10)
    assert bool(jnp.isfinite(out).all())


def test_prepare_run_dir_bookkeeping_only_continues(tmp_path):
    """A run dir holding only bookkeeping files (run_id/heartbeat/metrics
    — a run that died before its first checkpoint) must be continuable
    WITHOUT --fresh: watchdog restarts land here and appending to
    metrics.jsonl destroys nothing (round-4 crash-loop incident)."""
    d = tmp_path / "run"
    info0 = prepare_run_dir(d)  # fresh dir, mints run id
    (d / "heartbeat.json").write_text('{"step": 0}')
    (d / "metrics.jsonl").write_text('{"step": 1}\n')
    info = prepare_run_dir(d)  # no fresh flag — must NOT raise
    assert info["resume"] is False
    assert info["run_id"] == info0["run_id"]
    assert (d / "metrics.jsonl").exists()  # nothing archived or deleted

    # but once a checkpoint-ish asset exists, the rail still refuses
    (d / "best.json").write_text('{"step": 5, "score": 1.0}')
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="refusing"):
        prepare_run_dir(d)
