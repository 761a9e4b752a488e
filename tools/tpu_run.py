"""Wedge-watchdog runner for TPU jobs (dev tool; bench.py has its own).

The axon tunnel nondeterministically wedges inside a blocking device call:
the process sleeps on the relay socket and its CPU clock freezes, while a
healthy job keeps accruing CPU except during one big remote XLA compile
(~45-90 s of silence).  run_tpu.sh's heuristic (total CPU < 3 s) only
catches wedges at device acquisition; this runner watches *CPU progress*:
if the child's process-tree CPU advances < 1 s over STALL_S (default 180)
AND it printed nothing new, kill the tree and retry.

Usage: python tools/tpu_run.py [--attempts N] [--stall S] -- cmd args...
Child stdout/stderr stream through unchanged.
"""

import os
import signal
import subprocess
import sys
import time


def tree_cpu(pid):
    """Total utime+stime over the process tree rooted at pid, seconds."""
    clk = os.sysconf("SC_CLK_TCK")
    children = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            cpu = (int(parts[11]) + int(parts[12])) / clk
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append((int(d), cpu))
    total = 0.0
    stack = [pid]
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
        except (OSError, IndexError, ValueError):
            pass
        for c, _ in children.get(p, []):
            stack.append(c)
    return total


def main():
    args = sys.argv[1:]
    attempts = 4
    stall_s = 180.0
    while args and args[0].startswith("--"):
        if args[0] == "--":
            args = args[1:]
            break
        if args[0] == "--attempts":
            attempts = int(args[1]); args = args[2:]
        elif args[0] == "--stall":
            stall_s = float(args[1]); args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    if not args:
        raise SystemExit("usage: tpu_run.py [--attempts N] [--stall S] -- cmd ...")

    for attempt in range(1, attempts + 1):
        if attempt > 1:
            time.sleep(15.0)
        print(f"[tpu_run] attempt {attempt}: {' '.join(args)}", file=sys.stderr, flush=True)
        proc = subprocess.Popen(args, start_new_session=True)
        last_cpu, last_t = 0.0, time.time()
        wedged = False
        while proc.poll() is None:
            time.sleep(5.0)
            cpu = tree_cpu(proc.pid)
            # rate test per 5 s sample (>=10% CPU = real work): a wedged
            # process still CREEPS ~0.05 s/min, which a cumulative-delta
            # test mistakes for progress and postpones the kill forever
            if cpu - last_cpu > 0.5:
                last_t = time.time()
            last_cpu = cpu
            # two-phase fuse: startup wedges freeze at <= ~2 s of CPU
            # (observed: jax import done, first device op never returns) —
            # catch those within a couple of minutes instead of spending
            # the full long-compile stall budget (meant for the ~12-minute
            # CPU-silent remote XLA compiles).  Any job past ~2.5 s of CPU
            # has reached real work and gets the long fuse.
            # (the split only applies to long --stall budgets; a short
            # budget is its own startup fuse.  Jobs that go CPU-silent at
            # ~2 s legitimately — e.g. resumed runs that jump straight to
            # a remote compile — should use --stall <= 600.)
            fuse = stall_s if (cpu > 2.5 or stall_s <= 600.0) else min(stall_s, 150.0)
            if time.time() - last_t > fuse:
                wedged = True
                break
        if wedged:
            print(
                f"[tpu_run] wedge: tree CPU frozen at {last_cpu:.0f}s for "
                f"{stall_s:.0f}s; killing pg {proc.pid}",
                file=sys.stderr, flush=True,
            )
            try:
                os.killpg(proc.pid, signal.SIGTERM)
                time.sleep(3.0)
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            proc.wait()
            continue
        rc = proc.returncode
        print(f"[tpu_run] rc={rc}", file=sys.stderr, flush=True)
        sys.exit(rc)
    print("[tpu_run] giving up: all attempts wedged", file=sys.stderr, flush=True)
    sys.exit(98)


if __name__ == "__main__":
    main()
