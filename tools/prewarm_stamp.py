"""Prewarm stamp: makes the bench-cache prewarm a MECHANISM, not a memory.

Round 2's driver run silently paid a 900s cold compile and fell off the
fused tier because nobody had re-run tools/prewarm_bench.py after the
traced program changed (VERDICT r3 item 8). This module fingerprints
everything that shapes bench.py's tier-1 traced program — the source
files the trace flows through, the resolved BENCH_* configuration, and
the jax version — so staleness is detectable without compiling:

  * tools/prewarm_bench.py writes the stamp after a successful prewarm;
  * bench.py probes it at watchdog startup and prints a loud banner
    (plus a `prewarm_stale` field in the recorded JSON) when the cache
    was not prewarmed for THIS program;
  * tests/test_prewarm_stamp.py fails the suite until the prewarm is
    re-run, so a stale cache can't survive to a driver round unnoticed.

The fingerprint is deliberately a SUPERSET trigger: any edit to a
listed source file invalidates it, even edits the XLA cache key would
ignore (comments, docstrings). False "stale" costs one ~2-min warm
prewarm; false "fresh" costs a 900s driver compile — asymmetric, so we
err toward stale.
"""

from __future__ import annotations

import hashlib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(REPO, ".jax_cache", "prewarm_stamp.json")

# Source files the tier-1 bench program traces through (bench.py main:
# SINDy train, scheduled/fused iLQR solver, both Pallas kernels, the
# receding-horizon quality gate). Keep in sync with bench.py imports.
_TRACED_SOURCES = [
    "bench.py",
    "autompc_tpu/control/ilqr.py",
    "autompc_tpu/control/receding.py",
    "autompc_tpu/ops/riccati.py",
    "autompc_tpu/ops/pallas_riccati.py",
    "autompc_tpu/ops/pallas_linesearch.py",
    "autompc_tpu/ops/pallas_relin.py",
    "autompc_tpu/ops/lstsq.py",
    "autompc_tpu/sysid/sindy.py",
    "autompc_tpu/sysid/basis.py",
    "autompc_tpu/sysid/model.py",
    "autompc_tpu/costs/cost.py",
    "autompc_tpu/costs/quad_cost.py",
    "autompc_tpu/benchmarks/cartpole.py",
    "autompc_tpu/benchmarks/data_generation.py",
    "autompc_tpu/core/system.py",
    "autompc_tpu/core/trajectory.py",
    "autompc_tpu/utils/simulation.py",
]

# BENCH_* vars (with bench.py's defaults) that select the tier-1
# program. Mirrors bench.py's inline os.environ.get defaults — if you
# change a default there, change it here (a mismatch only mis-reports
# staleness; it cannot mis-report freshness for a truly changed value).
_BENCH_ENV_DEFAULTS = {
    "BENCH_BATCH": "65536",
    "BENCH_BACKWARD": "pallas",
    "BENCH_LS": "fused",
    "BENCH_BLOCK": "128",
    "BENCH_RELIN": "auto",
    "BENCH_RELIN_BLOCK": "1024",
    "BENCH_SPARSE": "auto",
    "BENCH_LBLK": "10",
    "BENCH_SCHED": "on",
    "BENCH_SCHEDULE": "8:0.75,15:0.5,22:0.25,30:0.125,40:0.0625",
    "BENCH_QUALITY": "on",
    "BENCH_QUALITY_B": "256",
}


def resolved_bench_env() -> dict:
    return {
        k: os.environ.get(k, d) for k, d in _BENCH_ENV_DEFAULTS.items()
    }


def compute_fingerprint() -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(json.dumps(resolved_bench_env(), sort_keys=True).encode())
    for rel in _TRACED_SOURCES:
        path = os.path.join(REPO, rel)
        h.update(rel.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def write_stamp() -> None:
    os.makedirs(os.path.dirname(STAMP_PATH), exist_ok=True)
    with open(STAMP_PATH, "w") as f:
        json.dump(
            {
                "fingerprint": compute_fingerprint(),
                "bench_env": resolved_bench_env(),
            },
            f, indent=1,
        )


def stamp_status() -> tuple[bool, str]:
    """(fresh, reason). fresh=True iff the stamp exists and matches the
    current sources + resolved BENCH_* configuration."""
    if not os.path.exists(STAMP_PATH):
        return False, "no prewarm stamp found"
    try:
        with open(STAMP_PATH) as f:
            stamp = json.load(f)
    except (OSError, ValueError) as e:
        return False, f"unreadable prewarm stamp: {e}"
    if stamp.get("fingerprint") != compute_fingerprint():
        return False, (
            "bench sources or BENCH_* configuration changed since the "
            "last prewarm"
        )
    return True, "prewarm stamp matches"
