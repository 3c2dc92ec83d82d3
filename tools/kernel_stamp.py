"""On-TPU kernel-numerics stamp (VERDICT r4 item 8).

The Pallas kernels are CI-tested in interpret mode only (a CPU mesh
cannot compile Mosaic); their compiled-on-TPU numerics used to live in
manually-run tools whose results were prose in PERF.md. This module
gives that check the prewarm-stamp mechanism (tools/prewarm_stamp.py):

  * tools/check_kernels_tpu.py runs the compiled kernels on real TPU
    against honest f32 references and writes this stamp (fingerprint
    of the kernel sources + the measured errors + pass/fail);
  * tests/test_kernel_stamp.py fails the suite when a kernel source
    changed since the last on-TPU check (or the check failed), so
    "tested where it runs" can't silently go stale.
"""

from __future__ import annotations

import hashlib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(REPO, ".jax_cache", "kernels_tpu_stamp.json")

# Kernel / kernel-adjacent sources whose edits invalidate the on-TPU
# numerics check. Superset trigger on purpose (comment edits count):
# false "stale" costs one ~3-min TPU run, false "fresh" ships an
# unverified kernel.
KERNEL_SOURCES = [
    "autompc_tpu/ops/pallas_riccati.py",
    "autompc_tpu/ops/pallas_linesearch.py",
    "autompc_tpu/ops/pallas_relin.py",
    "autompc_tpu/ops/pallas_mlp_linesearch.py",
    "autompc_tpu/ops/riccati.py",
]


def compute_fingerprint() -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    for rel in KERNEL_SOURCES:
        path = os.path.join(REPO, rel)
        h.update(rel.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def write_stamp(results: dict, passed: bool) -> None:
    os.makedirs(os.path.dirname(STAMP_PATH), exist_ok=True)
    with open(STAMP_PATH, "w") as f:
        json.dump(
            {
                "fingerprint": compute_fingerprint(),
                "passed": bool(passed),
                "results": results,
            },
            f, indent=1,
        )


def stamp_status() -> tuple[bool, str]:
    """(ok, reason): ok iff the stamp exists, matches the current
    kernel sources, and recorded a pass."""
    if not os.path.exists(STAMP_PATH):
        return False, (
            "no on-TPU kernel-numerics stamp; run "
            "`python tools/check_kernels_tpu.py` on the TPU host"
        )
    try:
        with open(STAMP_PATH) as f:
            stamp = json.load(f)
    except Exception as e:
        return False, f"unreadable stamp: {e}"
    if stamp.get("fingerprint") != compute_fingerprint():
        return False, (
            "kernel sources changed since the last on-TPU numerics "
            "check; re-run `python tools/check_kernels_tpu.py`"
        )
    if not stamp.get("passed"):
        return False, (
            "last on-TPU kernel-numerics check FAILED: "
            f"{stamp.get('results')}"
        )
    return True, "fresh"
