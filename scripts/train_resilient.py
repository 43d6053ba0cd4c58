"""Relaunch-on-watchdog wrapper for long TPU runs.

The axon device relay can hang a dispatch indefinitely (ROADMAP
"environment hazards"; it killed a 100k-step run mid-flight in round 3).
``run.py --watchdog_timeout N`` makes the trainer exit with code 17 when no
dispatch completes for N seconds; this wrapper relaunches it with
``--ckpt_path last.ckpt`` so the run resumes from the last saved epoch.

    python scripts/train_resilient.py --config configs/quality_laptop_ae.json \
        --watchdog_timeout 900

Any exit code other than 17 (success, real failure, Ctrl-C) propagates.
A relaunch cap guards against checkpoint-corrupting crash loops.
"""

import subprocess
import sys

WATCHDOG_EXIT_CODE = 17
MAX_RELAUNCHES = 20


def main() -> int:
    args = sys.argv[1:]
    if "--watchdog_timeout" not in args:
        args += ["--watchdog_timeout", "900"]
    for attempt in range(MAX_RELAUNCHES + 1):
        cmd = [sys.executable, "run.py", *args]
        if attempt > 0 and "--ckpt_path" not in args:
            cmd += ["--ckpt_path", "last.ckpt"]
        print(f"[train_resilient] launching (attempt {attempt}): {' '.join(cmd)}",
              flush=True)
        rc = subprocess.call(cmd)
        if rc != WATCHDOG_EXIT_CODE:
            return rc
        print(f"[train_resilient] watchdog tripped (exit {rc}); resuming",
              flush=True)
    print(f"[train_resilient] giving up after {MAX_RELAUNCHES} relaunches",
          flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
