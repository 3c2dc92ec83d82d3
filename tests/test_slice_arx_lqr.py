"""End-to-end slice tests: ARX + QuadCost + LQR on cartpole
(BASELINE.json configs[0]). Golden checks recompute reference semantics
with independent numpy implementations inside the tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.benchmarks.cartpole import dt_cartpole_dynamics
from autompc_tpu.control import FiniteHorizonLQR, InfiniteHorizonLQR, LQRFactory, ZeroController
from autompc_tpu.costs import QuadCost
from autompc_tpu.sysid import ARX, ARXFactory
from autompc_tpu.utils import simulate


# --- numpy re-derivation of reference semantics (lqr.py:15-47) ---------
def np_riccati(A, B, Q, R, N, P):
    return (
        A.T @ P @ A
        - (A.T @ P @ B + N)
        @ np.linalg.inv(R + B.T @ P @ B)
        @ (B.T @ P @ A + N.T)
        + Q
    )


def np_finite_lqr(A, B, Q, R, N, F, horizon):
    P = F
    for _ in range(horizon + 1):
        P = np_riccati(A, B, Q, R, N, P)
    return -np.linalg.inv(R + B.T @ P @ B) @ B.T @ P @ A


@pytest.fixture(scope="module")
def benchmark():
    return CartpoleSwingupBenchmark()


@pytest.fixture(scope="module")
def trajs(benchmark):
    return benchmark.gen_trajs_batch(seed=42, n_trajs=30, traj_len=100)


class TestARX:
    def test_train_shapes(self, benchmark, trajs):
        model = ARX(benchmark.system, history=3)
        model.train(trajs)
        ds = model.state_dim
        assert ds == 4 + 2 * 5 + 1
        assert model.A.shape == (ds, ds)
        assert model.B.shape == (ds, 1)
        assert model.is_linear and model.is_diff

    def test_exact_on_linear_system(self):
        """ARX recovers an exactly-linear system to machine precision."""
        system = ampc.System(["p", "v"], ["u"], dt=0.05)
        A_true = np.array([[1.0, 0.05], [0.0, 1.0]])
        B_true = np.array([[0.0], [0.05]])

        def dyn(x, u):
            return A_true @ x + B_true @ u

        rng = np.random.default_rng(5)
        trajs = []
        for _ in range(10):
            x = rng.uniform(-1, 1, 2)
            obs, us = [], []
            for _ in range(40):
                u = rng.uniform(-1, 1, 1)
                obs.append(x)
                us.append(u)
                x = dyn(x, u)
            trajs.append(ampc.from_arrays(system, np.array(obs), np.array(us)))

        model = ARX(system, history=2)
        model.train(trajs)
        holdout = trajs[0]
        states = model.traj_to_states(holdout)
        preds = model.pred_batch(states[:-1], holdout.ctrls[:-1])
        errs = np.asarray(preds[:, :2]) - np.asarray(holdout.obs[1:])
        assert np.abs(errs).max() < 1e-6

    def test_one_step_sane_on_cartpole(self, benchmark, trajs):
        """On nonlinear cartpole data the linear ARX fit is approximate but
        must track the short-horizon behavior (finite, bounded error)."""
        model = ARX(benchmark.system, history=4)
        model.train(trajs)
        holdout = benchmark.gen_trajs_batch(seed=7, n_trajs=2, traj_len=50)[0]
        states = model.traj_to_states(holdout)
        preds = model.pred_batch(states[:-1], holdout.ctrls[:-1])
        errs = np.asarray(preds[:, :4]) - np.asarray(holdout.obs[1:])
        deltas = np.abs(np.diff(np.asarray(holdout.obs), axis=0))
        assert np.isfinite(errs).all()
        # mean error well below the mean per-step state change
        assert np.abs(errs).mean() < deltas.mean()

    def test_state_roundtrip(self, benchmark, trajs):
        model = ARX(benchmark.system, history=2)
        model.train(trajs)
        t0 = trajs[0]
        state = model.traj_to_state(t0[:10])
        # state starts with current obs
        np.testing.assert_allclose(
            np.asarray(state[:4]), np.asarray(t0.obs[9]), rtol=1e-6
        )
        # constant slot is 1
        assert float(state[-1]) == pytest.approx(1.0)

    def test_update_state_consistency(self, benchmark, trajs):
        """update_state(traj_to_state(traj[:t]), u_t, obs_{t+1}) equals
        traj_to_state(traj[:t+1]) (companion-shift correctness)."""
        model = ARX(benchmark.system, history=3)
        model.train(trajs)
        t0 = trajs[0]
        s = model.traj_to_state(t0[:10])
        s_next = model.update_state(s, t0.ctrls[9], t0.obs[10])
        expected = model.traj_to_state(t0[:11])
        np.testing.assert_allclose(np.asarray(s_next), np.asarray(expected), atol=1e-8)

    def test_pred_diff_is_AB(self, benchmark, trajs):
        model = ARX(benchmark.system, history=2)
        model.train(trajs)
        s = model.traj_to_state(trajs[0][:5])
        u = jnp.ones(1)
        pred, jx, ju = model.pred_diff(s, u)
        np.testing.assert_allclose(np.asarray(jx), np.asarray(model.A))
        np.testing.assert_allclose(np.asarray(ju), np.asarray(model.B))
        A, B = model.to_linear()
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(A @ s + B @ u), rtol=1e-6
        )

    def test_set_get_parameters(self, benchmark, trajs):
        m1 = ARX(benchmark.system, history=2)
        m1.train(trajs)
        params = m1.get_parameters()
        m2 = ARX(benchmark.system, history=2)
        m2.set_parameters(params)
        s = m1.traj_to_state(trajs[0][:5])
        u = jnp.zeros(1)
        np.testing.assert_allclose(
            np.asarray(m1.pred(s, u)), np.asarray(m2.pred(s, u))
        )

    def test_factory(self, benchmark, trajs):
        factory = ARXFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        assert cfg["history"] == 4
        model = factory(cfg, trajs)
        assert model.k == 4
        assert model.A is not None


class TestLQRGain:
    def test_matches_numpy_reference_semantics(self, benchmark, trajs):
        model = ARX(benchmark.system, history=2)
        model.train(trajs)
        task = benchmark.task.copy()
        Q = np.diag([10.0, 1.0, 1.0, 1.0])
        R = 0.1 * np.eye(1)
        F = np.eye(4)
        task.set_cost(QuadCost(benchmark.system, Q, R, F, goal=np.zeros(4)))

        con = FiniteHorizonLQR(benchmark.system, task, model, horizon=50)
        A, B = np.asarray(model.A), np.asarray(model.B)
        ds = model.state_dim
        Qp = np.zeros((ds, ds))
        Qp[:4, :4] = Q
        Fp = np.zeros((ds, ds))
        Fp[:4, :4] = F
        K_ref = np_finite_lqr(A, B, Qp, R, np.zeros((ds, 1)), Fp, 50)
        np.testing.assert_allclose(np.asarray(con.K), K_ref, rtol=1e-6, atol=1e-8)

    def test_infinite_horizon_stabilizes(self, benchmark, trajs):
        model = ARX(benchmark.system, history=2)
        model.train(trajs)
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(
                benchmark.system,
                np.diag([10.0, 1.0, 1.0, 1.0]),
                0.1 * np.eye(1),
                goal=np.zeros(4),
            )
        )
        con = InfiniteHorizonLQR(benchmark.system, task, model)
        A, B = np.asarray(model.A), np.asarray(model.B)
        K = np.asarray(con.K)
        eig = np.abs(np.linalg.eigvals(A + B @ K))
        # Closed loop is stable on the controllable/observable subspace;
        # the constant-1 slot carries eigenvalue 1 by construction.
        assert np.sum(eig > 1.0 + 1e-6) == 0


class TestClosedLoopSlice:
    def _build(self, benchmark, trajs, horizon=80):
        # ARX is a global linear fit; train it on short trajectories near
        # the upright equilibrium so the fit is valid where LQR operates
        # (the upright cartpole is unstable — long excitation trajectories
        # leave the linear regime within ~20 steps).
        from autompc_tpu.benchmarks.data_generation import (
            uniform_random_generate_batch,
        )

        task_small = benchmark.task.copy()
        task_small.set_ctrl_bound("u", -2.0, 2.0)
        local = uniform_random_generate_batch(
            benchmark.system, task_small, benchmark.dynamics,
            np.random.default_rng(42),
            init_min=-0.15 * np.ones(4), init_max=0.15 * np.ones(4),
            traj_len=8, n_trajs=300,
        )
        model = ARX(benchmark.system, history=2)
        model.train(local)
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(
                benchmark.system,
                np.diag([100.0, 10.0, 1.0, 1.0]),
                0.01 * np.eye(1),
                np.diag([100.0, 10.0, 1.0, 1.0]),
                goal=np.zeros(4),
            )
        )
        return FiniteHorizonLQR(benchmark.system, task, model, horizon), task

    def test_stabilize_near_upright(self, benchmark, trajs):
        con, task = self._build(benchmark, trajs)
        init = np.array([0.3, 0.0, 0.0, 0.0])
        traj = simulate(
            con,
            init,
            term_cond=task.term_cond,
            dynamics=benchmark.dynamics,
            max_steps=200,
        )
        assert traj.size == 200
        final = np.asarray(traj.obs[-1])
        assert abs(final[0]) < 0.05  # pole upright
        assert abs(final[1]) < 0.05

    def test_scan_matches_python_fallback(self, benchmark, trajs):
        con, task = self._build(benchmark, trajs)
        init = np.array([0.2, 0.0, 0.0, 0.0])

        traj_scan = simulate(
            con, init, term_cond=task.term_cond,
            dynamics=benchmark.dynamics, max_steps=60,
        )
        # Python fallback (custom term cond w/o marker). The scan path
        # with max_steps=60 and a 200-step term cond runs 60 steps ->
        # size 61 (reference simulation.py:52-63 semantics).
        cond = lambda tr: len(tr) >= 61
        traj_py = simulate(
            con, init, term_cond=cond,
            dynamics=lambda x, u: np.asarray(
                dt_cartpole_dynamics(jnp.asarray(x), jnp.asarray(u), 0.05)
            ),
            max_steps=1000,
        )
        assert traj_scan.size == traj_py.size == 61
        np.testing.assert_allclose(
            np.asarray(traj_scan.obs), np.asarray(traj_py.obs), atol=1e-5
        )

    def test_simulate_with_surrogate_model(self, benchmark, trajs):
        """Rollout against the learned model as surrogate (the tuner's
        inner loop, pipeline_tuner.py:213-258)."""
        con, task = self._build(benchmark, trajs)
        surrogate = ARX(benchmark.system, history=4)
        surrogate.train(trajs)
        traj = simulate(
            con,
            np.array([0.2, 0.0, 0.0, 0.0]),
            term_cond=task.term_cond,
            sim_model=surrogate,
            max_steps=100,
        )
        # max_steps=100 binds before the 200-step term cond -> 101 rows
        assert traj.size == 101
        assert np.isfinite(np.asarray(traj.obs)).all()

    def test_zero_controller(self, benchmark):
        con = ZeroController(benchmark.system, benchmark.task, None)
        traj = simulate(
            con,
            np.array([0.1, 0.0, 0.0, 0.0]),
            dynamics=benchmark.dynamics,
            max_steps=10,
        )
        assert traj.size == 11
        np.testing.assert_array_equal(np.asarray(traj.ctrls), 0.0)


class TestLQRFactory:
    def test_config_space(self, benchmark):
        factory = LQRFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        assert cfg["finite_horizon"] == "true"
        assert "horizon" in cfg
        cfg["finite_horizon"] = "false"
        assert "horizon" not in cfg

    def test_instantiation(self, benchmark, trajs):
        model = ARX(benchmark.system, history=2)
        model.train(trajs)
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(benchmark.system, np.eye(4), np.eye(1), goal=np.zeros(4))
        )
        factory = LQRFactory(benchmark.system)
        cfg = factory.get_configuration_space().get_default_configuration()
        con = factory(cfg, task, model)
        assert con.state_dim == model.state_dim + 1


class TestDataGeneration:
    def test_uniform_respects_bounds(self, benchmark):
        tb = benchmark.gen_trajs_batch(seed=0, n_trajs=5, traj_len=20)
        ctrls = np.asarray(tb.ctrls)
        assert (ctrls >= -20.0).all() and (ctrls <= 20.0).all()
        assert np.isfinite(np.asarray(tb.obs)).all()

    def test_rollout_consistency(self, benchmark):
        """obs[t+1] == dynamics(obs[t], ctrl[t]) exactly."""
        tb = benchmark.gen_trajs_batch(seed=1, n_trajs=2, traj_len=10)
        obs, ctrls = np.asarray(tb.obs), np.asarray(tb.ctrls)
        for t in range(9):
            expected = np.asarray(
                benchmark.dynamics(jnp.asarray(obs[0, t]), jnp.asarray(ctrls[0, t]))
            )
            np.testing.assert_allclose(obs[0, t + 1], expected, rtol=1e-6)

    def test_all_methods_run(self):
        for method in CartpoleSwingupBenchmark.data_gen_methods():
            b = CartpoleSwingupBenchmark(data_gen_method=method)
            tb = b.gen_trajs_batch(seed=3, n_trajs=4, traj_len=16)
            assert np.isfinite(np.asarray(tb.obs)).all()
