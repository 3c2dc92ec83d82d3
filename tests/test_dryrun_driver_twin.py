"""Driver-twin test for the multichip dryrun deliverable.

Round 2 shipped a green test suite and a red MULTICHIP deliverable:
`dryrun_multichip` asserted x64-grade tolerances, the suite passed only
because tests/conftest.py enables x64 in-process, and the driver's
plain-f32 run tripped on roundoff (VERDICT.md round 2, item 1). This
test runs the dryrun the way the DRIVER runs it — a fresh subprocess,
no conftest, no JAX_ENABLE_X64, 8 forced host-platform devices — so a
red deliverable can never again hide behind a green suite.

Deliberately NOT slow-marked (ADVICE r3 item 4 considered): the whole
point is that the deliverable twin runs on EVERY smoke-tier pass, not
only in the full tier — the conftest's documented smoke budget (~8 min
cold) includes this test's compile time.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_fresh_f32_subprocess():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_ENABLE_X64", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    # The driver invokes dryrun_multichip(n) from a bare `python -c`
    # (MULTICHIP_r02.json tail: `File "<string>", line 3`);
    # _ensure_n_devices inside the entry handles backend selection and
    # the forced-device-count flag, exactly as in the driver's run.
    r = subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, %r)\n"
            "from __graft_entry__ import dryrun_multichip\n"
            "dryrun_multichip(8)\n"
            "print('DRYRUN_TWIN_OK')" % REPO,
        ],
        capture_output=True, text=True, env=env, timeout=580, cwd=REPO,
    )
    assert r.returncode == 0, (
        f"driver-twin dryrun failed (rc={r.returncode}):\n"
        f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-4000:]}"
    )
    assert "DRYRUN_TWIN_OK" in r.stdout
