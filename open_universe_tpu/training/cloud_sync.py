"""Cloud checkpoint backup via rclone (background).

Parity target: reference ``RsyncBackup`` Lightning callback
(rsync/cloud_sync.py:15-89): background ``rclone sync`` of the run dir at
start and after each checkpoint save; remote root from the
``CLOUD_EXP_ROOT`` env var. Gated on rclone's presence.
"""
import os
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Optional


class CloudBackup:
    def __init__(self, run_dir, remote_root: Optional[str] = None,
                 tool: str = "rclone"):
        self.run_dir = Path(run_dir)
        self.remote_root = remote_root or os.environ.get("CLOUD_EXP_ROOT")
        self.tool = tool
        self._thread = None

    @property
    def enabled(self) -> bool:
        return (self.remote_root is not None
                and shutil.which(self.tool) is not None)

    def _sync(self):
        dest = f"{self.remote_root.rstrip('/')}/{self.run_dir.name}"
        try:
            subprocess.run(
                [self.tool, "sync", str(self.run_dir), dest, "--quiet"],
                check=False, timeout=3600)
        except Exception as e:  # backup must never kill training
            print(f"[cloud_sync] backup failed: {e}")

    def trigger(self):
        """Start a background sync (skips if one is still running)."""
        if not self.enabled:
            return False
        if self._thread is not None and self._thread.is_alive():
            return False
        self._thread = threading.Thread(target=self._sync, daemon=True)
        self._thread.start()
        return True

    def wait(self):
        if self._thread is not None:
            self._thread.join()
