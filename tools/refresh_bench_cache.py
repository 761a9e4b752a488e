"""Regenerate the committed bench_cache/ from a real TPU bench compile.

Runs the bench worker's compile path once against a scratch persistent
cache (so stale local entries don't leak in), then copies the executables
the bench actually produced into bench_cache/. Run ON THE TARGET TPU:

    python tools/refresh_bench_cache.py

The old bench_cache entries are replaced wholesale; commit the result.
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    scratch = tempfile.mkdtemp(prefix="bench_cache_refresh_")
    env = dict(os.environ)
    env["LANDING_CTRL_CACHE"] = scratch
    # compile-only: zero measured wall so the run exits right after warm-up
    env.setdefault("BENCH_TOTAL_S", "420")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env
    )
    if rc != 0:
        print(f"bench rc={rc}; not refreshing", file=sys.stderr)
        return rc
    dst = os.path.join(REPO, "bench_cache")
    for name in os.listdir(dst):
        if name.endswith("-cache"):
            os.unlink(os.path.join(dst, name))
    n = 0
    for name in sorted(os.listdir(scratch)):
        if name.endswith("-cache"):
            shutil.copyfile(os.path.join(scratch, name), os.path.join(dst, name))
            n += 1
    print(f"bench_cache refreshed: {n} entries from {scratch}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
