# Run a TPU lane under a wedge watchdog (BENCH_NOTES.md "remote-worker
# wedge mode"): the axon worker can fault and leave the client sleeping
# forever with zero CPU accrual.  Detect via utime+stime standing still
# for WEDGE_S seconds while the child is alive, kill the child (by PID —
# never by pattern), and exit 99 so a wrapper can retry; the compile
# cache makes retries cheap.
#
# WEDGE_S must sit ABOVE worst-case remote-compile wait: a client blocked
# on a cold remote compile also accrues no CPU, and bench.py documents
# 40 s – 10 min cold compiles on this image — a 360 s default kill-looped
# healthy cold-cache runs (ADVICE r4).  900 s trades slower wedge
# detection for never killing a legitimate compile wait.
import os
import signal
import subprocess
import sys
import time

WEDGE_S = int(os.environ.get("WATCHDOG_WEDGE_S", 900))
POLL_S = 30


def cpu_jiffies(pid: int) -> int:
    with open(f"/proc/{pid}/stat") as f:
        parts = f.read().split()
    return int(parts[13]) + int(parts[14])  # utime + stime


def main() -> int:
    child = subprocess.Popen(sys.argv[1:])
    last_cpu = -1
    still = 0.0
    while True:
        rc = child.poll()
        if rc is not None:
            return rc
        time.sleep(POLL_S)
        try:
            cpu = cpu_jiffies(child.pid)
        except FileNotFoundError:
            continue
        if cpu == last_cpu:
            still += POLL_S
            if still >= WEDGE_S:
                print(f"watchdog: no CPU accrual for {still:.0f}s — "
                      "assuming wedged worker, killing child",
                      file=sys.stderr, flush=True)
                child.send_signal(signal.SIGKILL)
                child.wait()
                return 99
        else:
            still = 0.0
            last_cpu = cpu


if __name__ == "__main__":
    sys.exit(main())
