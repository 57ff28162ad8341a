"""Training supervisor: heartbeat-based stall detection + auto-restart.

The reference's entire recovery story is "resume from last.ckpt by hand"
(reference train.py:171-181) plus off-site copies via rclone
(rsync/cloud_sync.py:38-89).  On a TPU tunnel the observed failure mode
is different: the device RPC *hangs* (no crash, no exception), so the
training process must be killed from outside and restarted — it then
auto-resumes from the last checkpoint.  Round-2 quality runs needed this
twice, with an ad-hoc external watchdog; this module folds that into the
train CLI (``bin/train --supervise``).

Design: the supervisor runs the real trainer as a child process in its
own process group and watches the heartbeat file the trainer writes
whenever device results are actually fetched (so a hung RPC stops the
heartbeat even though the Python loop may be blocked).  On a stale
heartbeat or a nonzero exit the child group is killed by exact pgid
(never by pattern) and restarted; the child resumes from ``last.json``.
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path


def write_heartbeat(path, step: int, extra: dict = None):
    """Atomically write the heartbeat file (tmp + rename).

    The tmp name is per-PID: in a multi-process run every rank beats the
    shared run dir's heartbeat, and a shared tmp name races — one rank's
    os.replace consumes another's tmp and the loser dies FileNotFoundError
    mid-logging (observed killing rank 1 of the real-CLI 2-process run at
    its final validation). Concurrent winners just overwrite the target,
    which is fine — any fresh beat proves liveness.
    """
    path = Path(path)
    tmp = path.with_suffix(f".tmp.{os.getpid()}")
    payload = {"step": int(step), "time": time.time()}
    if extra:
        payload.update(extra)
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def heartbeat_age(path) -> float:
    """Seconds since the last heartbeat; +inf if the file doesn't exist."""
    try:
        with open(path) as f:
            return time.time() - json.load(f)["time"]
    except (OSError, ValueError, KeyError):
        return float("inf")


def supervise(cmd, heartbeat, stall_timeout: float = 1800.0,
              max_restarts: int = 20, poll: float = 20.0,
              log=print, env=None, restart_cmd=None) -> int:
    """Run ``cmd`` under heartbeat supervision; restart on stall or crash.

    Returns the child's final exit code (0 = the child finished cleanly).
    A *stall* is a heartbeat older than ``stall_timeout`` seconds while
    the child is still alive; the whole child process group is then
    SIGKILLed (the hung-RPC case ignores SIGTERM) and the command is
    rerun — it resumes from the last checkpoint.  ``max_restarts`` bounds
    total restarts (stalls + crashes combined).

    ``restart_cmd`` (default: ``cmd``) is used from the second
    incarnation on — one-shot flags like ``--fresh`` MUST NOT survive
    into restarts (a restart that re-archives the run dir would wipe the
    very progress the watchdog exists to protect).
    """
    heartbeat = Path(heartbeat)
    if restart_cmd is None:
        restart_cmd = cmd
    restarts = 0
    while True:
        start = time.time()
        child = subprocess.Popen(cmd if restarts == 0 else restart_cmd,
                                 start_new_session=True, env=env)
        log(f"[watchdog] child pid={child.pid} started "
            f"(restart {restarts}/{max_restarts})", flush=True)
        stalled = False
        while True:
            try:
                rc = child.wait(timeout=poll)
                break
            except subprocess.TimeoutExpired:
                pass
            age = heartbeat_age(heartbeat)
            # before the first heartbeat of this incarnation, measure
            # from child start (covers long first compiles)
            alive_for = time.time() - start
            if age > stall_timeout and alive_for > stall_timeout:
                log(f"[watchdog] STALL: heartbeat {age:.0f}s old "
                    f"(> {stall_timeout:.0f}s); killing pgid {child.pid}",
                    flush=True)
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                rc = child.wait()
                stalled = True
                break
        if rc == 0 and not stalled:
            log("[watchdog] child finished cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > max_restarts:
            log(f"[watchdog] giving up after {max_restarts} restarts "
                f"(last rc={rc})", flush=True)
            return rc if rc != 0 else 1
        # decode the exit status so restarts are attributable from the log
        # alone (round-3 postmortem: an adopted child's death had no
        # recorded cause). rc < 0 is death-by-signal; SIGKILL without a
        # watchdog stall is the kernel OOM killer's signature on Linux.
        if rc < 0:
            try:
                signame = signal.Signals(-rc).name
            except ValueError:
                signame = str(-rc)
            why = f"killed by {signame}"
            if -rc == signal.SIGKILL and not stalled:
                why += " (not the watchdog — likely the kernel OOM killer)"
        else:
            why = {75: "restart requested (host-RSS recycle / EX_TEMPFAIL)"
                   }.get(rc, f"exit code {rc}")
        log(f"[watchdog] child exited rc={rc} (stalled={stalled}; {why}); "
            f"restarting", flush=True)
        time.sleep(2.0)


def supervise_self(argv, heartbeat, stall_timeout: float = 1800.0,
                   max_restarts: int = 20) -> int:
    """Re-invoke this interpreter's module without ``--supervise``.

    ``--fresh`` is one-shot: it applies to the FIRST incarnation only
    (archive-and-start-over is the user's explicit request for THIS
    launch); restarts after a stall/crash must RESUME, so the flag is
    stripped from the restart command.
    """
    base = [sys.executable, "-m", "open_universe_tpu.bin.train"]
    cmd = base + [a for a in argv if a != "--supervise"]
    restart = base + [a for a in argv if a not in ("--supervise", "--fresh")]
    return supervise(cmd, heartbeat, stall_timeout=stall_timeout,
                     max_restarts=max_restarts, restart_cmd=restart)
