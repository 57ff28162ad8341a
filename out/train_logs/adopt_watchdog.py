"""One-off: adopt the already-running round-3 trainer child under the
fixed watchdog (the original supervisor's restart command carried
--fresh, which would archive the run on restart — fixed in
training/watchdog.py; this adopter bridges the running child)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from open_universe_tpu.training.watchdog import heartbeat_age, supervise

child = int(sys.argv[1])
hb = "/root/repo/exp/synth_quality_16k/heartbeat.json"
STALL = 1500.0

print(f"[adopter] watching existing child pid={child}", flush=True)
while True:
    try:
        os.kill(child, 0)
        alive = True
    except ProcessLookupError:
        alive = False
    if not alive:
        print("[adopter] child exited; handing over to supervise()",
              flush=True)
        break
    age = heartbeat_age(hb)
    if age > STALL:
        print(f"[adopter] STALL ({age:.0f}s); killing child pgid", flush=True)
        import signal
        try:
            os.killpg(child, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            try:
                os.kill(child, signal.SIGKILL)
            except ProcessLookupError:
                pass
        time.sleep(3)
        break
    time.sleep(20)

cmd = [sys.executable, "-m", "open_universe_tpu.bin.train",
       "--config", "open_universe_tpu/config/synth_quality_16k.yaml",
       "--stall-timeout", "1500"]
rc = supervise(cmd, hb, stall_timeout=1500.0, max_restarts=20)
print(f"[adopter] supervise finished rc={rc}", flush=True)
sys.exit(rc)
