"""Parallel fan-out tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.parallel import (
    DirectTranscriptionFanout,
    MPPIFanout,
    QuadCostFanout,
    make_mesh,
    pad_to_multiple,
    shard_vmap,
)
from autompc_tpu.sysid import SINDy


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


class TestMeshUtils:
    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("config",)
        mesh2 = make_mesh(n_devices=4)
        assert mesh2.devices.size == 4

    def test_pad_to_multiple(self):
        batch = {"a": jnp.arange(10.0), "b": jnp.ones((10, 3))}
        padded, n = pad_to_multiple(batch, 8)
        assert n == 10
        assert padded["a"].shape[0] == 16
        assert padded["b"].shape[0] == 16

    def test_shard_vmap_correctness(self):
        mesh = make_mesh()

        def f(x):
            return jnp.sum(x**2)

        call = shard_vmap(f, mesh=mesh)
        xs = jnp.arange(24.0).reshape(12, 2)
        out = np.asarray(call(xs))
        expected = np.sum(np.asarray(xs) ** 2, axis=1)
        np.testing.assert_allclose(out, expected)

    def test_shard_vmap_sharding_applied(self):
        mesh = make_mesh()

        def f(x):
            return x * 2

        call = shard_vmap(f, mesh=mesh)
        out = call(jnp.ones((16, 4)))
        assert out.shape == (16, 4)


@pytest.fixture(scope="module")
def setup():
    benchmark = CartpoleSwingupBenchmark()
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=60, traj_len=80)
    model = SINDy(
        benchmark.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    # Score candidates on the pole dimensions only — the full 3-dim
    # threshold metric saturates for every untuned candidate because the
    # cart drifts, making the objective uninformative for these tests.
    from autompc_tpu.costs import ThresholdCost

    task = benchmark.task.copy()
    task.set_cost(
        ThresholdCost(
            benchmark.system, goal=np.zeros(4), threshold=0.2, obs_range=(0, 2)
        )
    )
    benchmark.task = task
    return benchmark, model


class TestQuadCostFanout:
    def test_batched_candidate_eval(self, setup):
        benchmark, model = setup
        # Start near upright so a 40-step budget separates candidates
        # (from theta=3.1 no 10-step-horizon candidate swings up in 40
        # steps and the threshold metric saturates identically).
        task = benchmark.task.copy()
        task.set_init_obs(np.array([0.5, 0.0, 0.0, 0.0]))
        fanout = QuadCostFanout(
            benchmark.system, task, model, model,
            horizon=10, n_steps=40, mesh=make_mesh(),
            goal=np.zeros(4),
        )
        B = 12
        rng = np.random.default_rng(0)
        batch = {
            "Qdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Fdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Rdiag": jnp.asarray(rng.uniform(0.001, 1.0, (B, 1))),
        }
        costs = np.asarray(fanout(batch))
        assert costs.shape == (B,)
        # diverging candidates legitimately score +inf (bad-config
        # contract); nothing may come back NaN
        assert not np.isnan(costs).any()
        assert np.isfinite(costs).any()
        # different gains -> different rollout costs
        assert len(np.unique(np.round(costs[np.isfinite(costs)], 6))) > 1

    def test_good_gains_beat_bad_gains(self, setup):
        """A sensible swing-up weighting scores better than an absurd
        one, so the fan-out is a usable tuning objective."""
        benchmark, model = setup
        fanout = QuadCostFanout(
            benchmark.system, benchmark.task, model, model,
            horizon=20, n_steps=150, mesh=make_mesh(),
            goal=np.zeros(4),
        )
        batch = {
            "Qdiag": jnp.asarray([[10.0, 0.1, 0.01, 0.01],
                                  [0.001, 0.001, 100.0, 100.0]]),
            "Fdiag": jnp.asarray([[10.0, 0.1, 0.01, 0.01],
                                  [0.001, 0.001, 100.0, 100.0]]),
            "Rdiag": jnp.asarray([[0.001], [10.0]]),
        }
        costs = np.asarray(fanout(batch))
        assert costs[0] < costs[1]


class TestDirectTranscriptionFanout:
    def test_batched_dt_eval(self, setup):
        benchmark, model = setup
        task = benchmark.task.copy()
        task.set_init_obs(np.array([0.5, 0.0, 0.0, 0.0]))
        fanout = DirectTranscriptionFanout(
            benchmark.system, task, model, model,
            horizon_knots=10, n_steps=30, mesh=make_mesh(),
            goal=np.zeros(4),
        )
        B = 8
        rng = np.random.default_rng(2)
        batch = {
            "Qdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Fdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Rdiag": jnp.asarray(rng.uniform(0.001, 1.0, (B, 1))),
        }
        costs = np.asarray(fanout(batch))
        assert costs.shape == (B,)
        assert not np.isnan(costs).any()
        assert np.isfinite(costs).any()
        finite = costs[np.isfinite(costs)]
        assert len(np.unique(np.round(finite, 6))) > 1


class TestMPPIFanout:
    def test_batched_mppi_eval(self, setup):
        benchmark, model = setup
        fanout = MPPIFanout(
            benchmark.system, benchmark.task, model, model,
            horizon=10, num_path=64, n_steps=30, mesh=make_mesh(),
        )
        B = 8
        rng = np.random.default_rng(1)
        batch = {
            "Qdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Fdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Rdiag": jnp.asarray(rng.uniform(0.001, 1.0, (B, 1))),
            "sigma": jnp.asarray(rng.uniform(0.5, 1.5, (B,))),
            "lmda": jnp.asarray(rng.uniform(0.3, 1.5, (B,))),
        }
        costs = np.asarray(fanout(batch))
        assert costs.shape == (B,)
        assert np.isfinite(costs).all()


class TestMPPIRolloutSharding:
    def test_sharded_paths_match_single_device(self, setup):
        """MPPI with the sampled-rollout axis sharded over the 8-device
        mesh produces the same control sequence as the unsharded
        controller (same PRNG stream; reductions reassociate)."""
        from autompc_tpu.control import MPPI
        from autompc_tpu.utils import simulate

        benchmark, model = setup
        task = benchmark.task.copy()
        task.set_num_steps(10)
        mesh = make_mesh(axis_names=("rollout",))
        kw = dict(horizon=8, num_path=128, sigma=1.0, lmda=0.5, seed=3)
        con_plain = MPPI(benchmark.system, task, model, **kw)
        con_shard = MPPI(benchmark.system, task, model, mesh=mesh, **kw)

        x0 = np.array([3.1, 0.0, 0.0, 0.0])
        traj_p = simulate(con_plain, x0, term_cond=task.term_cond,
                          sim_model=model, max_steps=10)
        traj_s = simulate(con_shard, x0, term_cond=task.term_cond,
                          sim_model=model, max_steps=10)
        np.testing.assert_allclose(
            np.asarray(traj_s.ctrls), np.asarray(traj_p.ctrls),
            rtol=1e-5, atol=1e-6,
        )

    def test_num_path_not_divisible_raises(self, setup):
        from autompc_tpu.control import MPPI

        benchmark, model = setup
        mesh = make_mesh(axis_names=("rollout",))
        with pytest.raises(ValueError, match="not divisible"):
            MPPI(benchmark.system, benchmark.task, model,
                 horizon=8, num_path=100, mesh=mesh)


class TestBatchedFanoutCompaction:
    def test_compacted_fanout_matches_plain_on_mesh(self, setup):
        """Converged-lane compaction inside the fan-out's per-step solve
        (argsort + gather under SPMD sharding) changes nothing about the
        candidate scores on an 8-device mesh."""
        benchmark, model = setup
        mesh = make_mesh()
        kw = dict(horizon=8, n_steps=15, mesh=mesh, goal=np.zeros(4))
        f_plain = QuadCostFanout(
            benchmark.system, benchmark.task, model, model, **kw
        )
        f_comp = QuadCostFanout(
            benchmark.system, benchmark.task, model, model,
            compact_schedule=((6, 0.5), (12, 0.25)), **kw
        )
        rng = np.random.default_rng(0)
        B = 64
        batch = {
            "Qdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Fdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Rdiag": jnp.asarray(rng.uniform(0.001, 1.0, (B, 1))),
        }
        c1 = np.asarray(f_plain(batch))
        c2 = np.asarray(f_comp(batch))
        fin = np.isfinite(c1)
        np.testing.assert_array_equal(fin, np.isfinite(c2))
        np.testing.assert_allclose(c1[fin], c2[fin], rtol=1e-6)

    def test_batched_impl_matches_vmap_impl(self, setup):
        """The batch-native fan-out scores candidates like the
        per-candidate vmapped formulation (converged solves; f32
        op-order drift only)."""
        benchmark, model = setup
        task = benchmark.task.copy()
        task.set_init_obs(np.array([0.5, 0.0, 0.0, 0.0]))
        kw = dict(horizon=8, n_steps=20, mesh=make_mesh(), goal=np.zeros(4))
        f_b = QuadCostFanout(
            benchmark.system, task, model, model, impl="batched", **kw
        )
        f_v = QuadCostFanout(
            benchmark.system, task, model, model, impl="vmap", **kw
        )
        rng = np.random.default_rng(5)
        B = 16
        batch = {
            "Qdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Fdiag": jnp.asarray(rng.uniform(0.1, 20.0, (B, 4))),
            "Rdiag": jnp.asarray(rng.uniform(0.001, 1.0, (B, 1))),
        }
        cb = np.asarray(f_b(batch))
        cv = np.asarray(f_v(batch))
        fin = np.isfinite(cv)
        np.testing.assert_array_equal(fin, np.isfinite(cb))
        np.testing.assert_allclose(cb[fin], cv[fin], rtol=1e-4)


def test_warm_started_fanout_scores_sanely(setup):
    """warm_start=True (receding-horizon warm start, beyond-parity
    option) produces finite scores that track the zero-guess scores on
    a stabilization task (both controllers converge, so closed-loop
    costs land close)."""
    benchmark, model = setup
    task = benchmark.task.copy()
    task.set_init_obs(np.array([0.5, 0.0, 0.0, 0.0]))
    kw = dict(horizon=8, n_steps=20, mesh=make_mesh(), goal=np.zeros(4))
    f_cold = QuadCostFanout(benchmark.system, task, model, model, **kw)
    f_warm = QuadCostFanout(
        benchmark.system, task, model, model, warm_start=True, **kw
    )
    rng = np.random.default_rng(9)
    B = 8
    batch = {
        "Qdiag": jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
        "Fdiag": jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
        "Rdiag": jnp.asarray(rng.uniform(0.001, 0.5, (B, 1))),
    }
    c_cold = np.asarray(f_cold(batch))
    c_warm = np.asarray(f_warm(batch))
    assert np.isfinite(c_warm).all()
    # Same task, converged solves: warm-started closed-loop costs stay
    # within 20% of the zero-guess ones on this stabilization workload.
    np.testing.assert_allclose(c_warm, c_cold, rtol=0.2)
