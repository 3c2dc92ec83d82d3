"""Pre-warm the persistent compile cache with the EXACT default bench
program (post-build step; VERDICT round 2 item 2a).

Round 2's driver run blew the 900s watchdog deadline compiling the
fused dual-Pallas solver cold and fell 7x to the backward-only tier —
the full-speed program had never been compiled with the committed
default env in this container, so the (otherwise working) persistent
cache had nothing to serve. Measured facts this cache strategy rests
on (round 3 probes):

  * the persistent cache hits across fresh processes on the axon
    remote-compile path (1.34s cold -> 0.08s warm);
  * the container (and .jax_cache/, untracked) persists across the
    builder -> driver round boundary (the driver's round-2 bench wrote
    cache entries into this very directory at 02:57);
  * cache keys are insensitive to source-line shifts (locations are
    stripped), so later edits to unrelated code don't evict the entry
    — but any change to the traced program does. RE-RUN THIS after any
    edit that could alter the bench's traced computation.

Usage:  python tools/prewarm_bench.py            # ~10-25 min cold, ~2 min warm
        BENCH_BATCH=4096 python tools/prewarm_bench.py   # custom shapes
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ)
    # The exact default tier-1 program: same shapes, same kernels, same
    # schedule as `python bench.py`'s first watchdog tier. One rep —
    # reps re-execute the already-compiled program.
    env.setdefault("BENCH_REPS", "1")
    env["BENCH_TIER"] = "prewarm"
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--inner"],
        env=env, text=True, capture_output=True,
    )
    sys.stderr.write(r.stderr)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        print(f"[prewarm] FAILED after {dt:.0f}s (rc={r.returncode})")
        sys.exit(1)
    # Stamp the cache as prewarmed for THIS program (sources + resolved
    # BENCH_* config); bench.py probes it and tests/test_prewarm_stamp.py
    # fails until the stamp is fresh (VERDICT r3 item 8).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from prewarm_stamp import write_stamp

    write_stamp()
    print(f"[prewarm] cache warm after {dt:.0f}s; stamp written; "
          f"a fresh `python bench.py` should now start in seconds")


if __name__ == "__main__":
    main()
