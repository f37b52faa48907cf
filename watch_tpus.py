"""TPU idle watchdog (parity: reference `watch_gpus.py` — polls utilization and
shuts the node down after sustained inactivity; cost control, not recovery).

On TPU-VMs there is no gpustat; activity is inferred from libtpu client
processes and recent jax activity stamps under /tmp/vod_tpu_heartbeat.

Run: python watch_tpus.py --timeout_minutes 60 [--action echo|shutdown]
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from vod_tpu.utils import Arguantic

HEARTBEAT = pathlib.Path("/tmp/vod_tpu_heartbeat")


class Args(Arguantic):
    timeout_minutes: int = 60
    poll_seconds: int = 60
    action: str = "echo"  # echo | shutdown


def touch_heartbeat() -> None:
    """Call from training loops to mark activity."""
    HEARTBEAT.write_text(str(time.time()))


def _tpu_busy() -> bool:
    if HEARTBEAT.exists():
        try:
            if time.time() - float(HEARTBEAT.read_text()) < 300:
                return True
        except ValueError:
            pass
    try:
        out = subprocess.run(
            ["pgrep", "-f", "libtpu|jax"], capture_output=True, text=True, timeout=10
        )
        return bool(out.stdout.strip())
    except Exception:
        return False


def main() -> None:
    args = Args.parse()
    idle_since = None
    while True:
        if _tpu_busy():
            idle_since = None
        elif idle_since is None:
            idle_since = time.time()
        elif time.time() - idle_since > args.timeout_minutes * 60:
            print(f"TPU idle for {args.timeout_minutes} minutes")
            if args.action == "shutdown":
                subprocess.run(["shutdown", "-h", "now"], check=False)
            return
        time.sleep(args.poll_seconds)


if __name__ == "__main__":
    main()
