"""Golden-pinned halfcheetah oracle trajectories.

The reference treats MuJoCo as a black-box ground truth
(autompc/benchmarks/halfcheetah.py:187-202); our from-scratch planar
articulated-body simulator is the fixed oracle standing in for it, so
the pin IS the contract: a physics refactor that silently shifts the
benchmark must fail here, not pass CI behind behavioral tests.

Golden data: assets/golden/halfcheetah_oracle.npz — three 200-step
rollouts from the task init state under seeded uniform controls,
generated at float64 on CPU (tools: the generation snippet is recorded
in this file's history; regenerate ONLY for an intentional,
changelog-documented physics change).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autompc_tpu.benchmarks import HalfcheetahBenchmark

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "assets", "golden",
    "halfcheetah_oracle.npz",
)


@pytest.fixture(scope="module")
def rolled():
    hc = HalfcheetahBenchmark()
    data = np.load(GOLDEN)

    @jax.jit
    def roll(x0, us):
        def step(x, u):
            x1 = hc.dynamics(x, u)
            return x1, x1

        _, xs = jax.lax.scan(step, x0, us)
        return xs

    x0 = jnp.asarray(np.asarray(hc.task.get_init_obs(), dtype=float))
    out = []
    for i in range(3):
        us = jnp.asarray(data[f"ctrl_{i}"])
        xs = np.concatenate(
            [np.asarray(x0)[None], np.asarray(roll(x0, us))]
        )
        out.append((xs, data[f"obs_{i}"]))
    return out


def test_trajectories_match_golden(rolled):
    for i, (xs, golden) in enumerate(rolled):
        np.testing.assert_allclose(
            xs, golden, rtol=1e-6, atol=1e-8,
            err_msg=(
                f"halfcheetah oracle rollout {i} diverged from the "
                "pinned golden — if this is an INTENTIONAL physics "
                "change, regenerate assets/golden/halfcheetah_oracle.npz "
                "and document it"
            ),
        )


def test_rollouts_physically_sane(rolled):
    """Invariants independent of the pin: bounded states, bodies above
    ground (height coordinate), finite everywhere."""
    for xs, _ in rolled:
        assert np.isfinite(xs).all()
        assert np.abs(xs).max() < 100.0
