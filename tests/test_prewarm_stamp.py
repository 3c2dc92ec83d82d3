"""Prewarm discipline (VERDICT r3 item 8).

The driver's end-of-round bench run reads the persistent compile cache
this container carries across the builder->driver boundary; if the
bench's traced program changed since the last `tools/prewarm_bench.py`,
tier 1 pays a cold ~10-25 min compile and can blow the 900s watchdog
deadline (it did in round 2). This test turns the "re-run prewarm after
touching the bench program" checklist item into a suite failure: it is
red from the moment a listed source file changes until the prewarm is
re-run.

Instant (pure hashing, no TPU, no compile).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from prewarm_stamp import (  # noqa: E402
    STAMP_PATH,
    compute_fingerprint,
    stamp_status,
)


def test_prewarm_stamp_fresh():
    if not os.path.isdir(os.path.dirname(STAMP_PATH)):
        pytest.skip(
            "no .jax_cache/ in this checkout (fresh clone without a "
            "bench run) — the stamp only matters where the persistent "
            "cache lives"
        )
    fresh, reason = stamp_status()
    assert fresh, (
        f"persistent compile cache is STALE for the bench program "
        f"({reason}). Run `python tools/prewarm_bench.py` (~2 min when "
        f"the program is unchanged server-side, ~10-25 min after real "
        f"program edits) so the driver's bench starts warm."
    )


def test_fingerprint_is_deterministic():
    assert compute_fingerprint() == compute_fingerprint()
