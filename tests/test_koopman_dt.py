"""Koopman + DirectTranscription tests (BASELINE.json configs[3])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.control import (
    DirectTranscriptionController,
    DirectTranscriptionControllerFactory,
)
from autompc_tpu.costs import QuadCost
from autompc_tpu.ops.trajqp import qp_backward, qp_forward
from autompc_tpu.sysid import Koopman, KoopmanFactory
from autompc_tpu.sysid.stable_koopman import (
    checkdstable,
    polar,
    project_psd,
    solve_discrete_lyapunov,
    sqrtm_psd,
    stabilize_discrete,
)
from autompc_tpu.utils import simulate


@pytest.fixture(scope="module")
def benchmark():
    return CartpoleSwingupBenchmark()


@pytest.fixture(scope="module")
def trajs(benchmark):
    return benchmark.gen_trajs_batch(seed=42, n_trajs=60, traj_len=80)


class TestStableKoopmanOps:
    def test_project_psd(self):
        rng = np.random.default_rng(0)
        M = rng.normal(size=(5, 5))
        P = np.asarray(project_psd(jnp.asarray(M), 0.0, 1.0))
        e = np.linalg.eigvalsh(P)
        assert (e >= -1e-10).all() and (e <= 1.0 + 1e-10).all()

    def test_polar(self):
        rng = np.random.default_rng(1)
        M = rng.normal(size=(4, 4))
        U, P = polar(jnp.asarray(M))
        np.testing.assert_allclose(np.asarray(U @ P), M, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(U.T @ U), np.eye(4), atol=1e-8
        )
        assert (np.linalg.eigvalsh(np.asarray(P)) >= -1e-9).all()

    def test_sqrtm(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(4, 4))
        P = A @ A.T
        S = np.asarray(sqrtm_psd(jnp.asarray(P)))
        np.testing.assert_allclose(S @ S, P, atol=1e-8)

    def test_lyapunov(self):
        rng = np.random.default_rng(3)
        A = 0.9 * np.linalg.qr(rng.normal(size=(4, 4)))[0]
        Q = np.eye(4)
        X = np.asarray(solve_discrete_lyapunov(jnp.asarray(A), jnp.asarray(Q)))
        np.testing.assert_allclose(A @ X @ A.T + Q, X, atol=1e-6)

    def test_checkdstable(self):
        rng = np.random.default_rng(4)
        A = 0.8 * np.linalg.qr(rng.normal(size=(3, 3)))[0]
        P, S, U, B = checkdstable(jnp.asarray(A))
        A_rec = np.asarray(
            jnp.linalg.inv(S) @ U @ B @ S
        )
        np.testing.assert_allclose(A_rec, A, atol=1e-6)

    def test_stabilize_discrete_produces_stable_A(self):
        rng = np.random.default_rng(5)
        n, m, N = 4, 1, 200
        A_true = np.diag([1.05, 0.9, 0.8, 0.7])  # slightly unstable
        B_true = rng.normal(size=(n, m))
        X = rng.normal(size=(n, N))
        U = rng.normal(size=(m, N))
        Y = A_true @ X + B_true @ U + 0.01 * rng.normal(size=(n, N))
        A, S, Uo, B, Bcon, err = stabilize_discrete(
            jnp.asarray(X), jnp.asarray(U), jnp.asarray(Y)
        )
        eig = np.abs(np.linalg.eigvals(np.asarray(A)))
        assert (eig <= 1.0 + 1e-6).all(), f"|eig| {eig}"
        assert np.isfinite(float(err))


class TestKoopman:
    def test_lstsq_linear_recovery(self):
        system = ampc.System(["p", "v"], ["u"], dt=0.1)
        A_true = np.array([[0.95, 0.1], [0.0, 0.9]])
        B_true = np.array([[0.0], [0.1]])
        rng = np.random.default_rng(7)
        trajs = []
        for _ in range(5):
            x = rng.uniform(-1, 1, 2)
            obs, us = [], []
            for _ in range(50):
                u = rng.uniform(-1, 1, 1)
                obs.append(x)
                us.append(u)
                x = A_true @ x + B_true @ u
            trajs.append(ampc.from_arrays(system, np.array(obs), np.array(us)))
        model = Koopman(system, method="lstsq")
        model.train(trajs)
        A, B = model.to_linear()
        np.testing.assert_allclose(np.asarray(A), A_true, atol=1e-8)
        np.testing.assert_allclose(np.asarray(B), B_true, atol=1e-8)

    def test_lifted_prediction(self, benchmark, trajs):
        model = Koopman(
            benchmark.system, method="lstsq", trig_basis=True, trig_freq=1
        )
        model.train(trajs)
        assert model.state_dim == 4 * 3  # identity + sin + cos blocks
        holdout = benchmark.gen_trajs_batch(seed=3, n_trajs=2, traj_len=30)[0]
        states = model.traj_to_states(holdout)
        preds = model.pred_batch(states[:-1], holdout.ctrls[:-1])
        errs = np.asarray(preds[:, :4]) - np.asarray(holdout.obs[1:])
        deltas = np.abs(np.diff(np.asarray(holdout.obs), axis=0))
        assert np.abs(errs).mean() < deltas.mean()

    def test_stable_method_runs(self, benchmark, trajs):
        model = Koopman(benchmark.system, method="stable")
        model.train(trajs)
        eig = np.abs(np.linalg.eigvals(np.asarray(model.A)))
        assert (eig <= 1.0 + 1e-5).all()

    def test_factory_space(self, benchmark):
        factory = KoopmanFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        cfg["method"] = "lasso"
        assert "lasso_alpha" in cfg
        cfg["method"] = "lstsq"
        assert "lasso_alpha" not in cfg


class TestTrajQP:
    def test_matches_dense_kkt(self):
        """The Riccati-structured solve equals the dense KKT solution."""
        rng = np.random.default_rng(11)
        H, ds, dc = 5, 3, 2
        A_seq = rng.normal(size=(H, ds, ds)) * 0.5
        B_seq = rng.normal(size=(H, ds, dc))
        Cxx = np.stack([np.eye(ds)] * H)
        Cuu = np.stack([np.eye(dc)] * H)
        Cux = np.zeros((H, dc, ds))
        cx = rng.normal(size=(H, ds))
        cu = rng.normal(size=(H, dc))
        d_seq = rng.normal(size=(H, ds)) * 0.1
        Vf = 2 * np.eye(ds)
        vf = rng.normal(size=ds)

        Ks, ks, _, _ = qp_backward(
            *map(jnp.asarray, (A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf)),
            reg=0.0,
        )
        dxs, dus = qp_forward(
            jnp.asarray(A_seq), jnp.asarray(B_seq), jnp.asarray(d_seq), Ks, ks
        )

        # Dense KKT: variables z = [dx_1..dx_H, du_0..du_{H-1}] (dx_0=0).
        nx = H * ds
        nu = H * dc
        Hm = np.zeros((nx + nu, nx + nu))
        g = np.zeros(nx + nu)
        for t in range(H):
            if t < H - 1:
                Hm[t * ds : (t + 1) * ds, t * ds : (t + 1) * ds] = Cxx[t + 1]
                g[t * ds : (t + 1) * ds] = cx[t + 1]
            else:
                Hm[t * ds : (t + 1) * ds, t * ds : (t + 1) * ds] = Vf
                g[t * ds : (t + 1) * ds] = vf
            Hm[nx + t * dc : nx + (t + 1) * dc, nx + t * dc : nx + (t + 1) * dc] = Cuu[t]
            g[nx + t * dc : nx + (t + 1) * dc] = cu[t]
        # Constraints: dx_{t+1} = A dx_t + B du_t + d_t
        C = np.zeros((nx, nx + nu))
        r = np.zeros(nx)
        for t in range(H):
            C[t * ds : (t + 1) * ds, t * ds : (t + 1) * ds] = -np.eye(ds)
            if t > 0:
                C[t * ds : (t + 1) * ds, (t - 1) * ds : t * ds] = A_seq[t]
            C[t * ds : (t + 1) * ds, nx + t * dc : nx + (t + 1) * dc] = B_seq[t]
            r[t * ds : (t + 1) * ds] = -d_seq[t]
        KKT = np.block(
            [[Hm, C.T], [C, np.zeros((nx, nx))]]
        )
        rhs = np.concatenate([-g, r])
        sol = np.linalg.solve(KKT, rhs)
        dx_dense = sol[:nx].reshape(H, ds)
        du_dense = sol[nx : nx + nu].reshape(H, dc)

        np.testing.assert_allclose(np.asarray(dxs[1:]), dx_dense, atol=1e-7)
        np.testing.assert_allclose(np.asarray(dus), du_dense, atol=1e-7)


class TestDirectTranscription:
    def test_dt_stabilizes_linear_system(self):
        """DT SQP on an exactly-linear model solves the LQR-like problem
        and stabilizes the plant."""
        system = ampc.System(["p", "v"], ["u"], dt=0.1)
        A_true = np.array([[1.0, 0.1], [0.0, 1.0]])
        B_true = np.array([[0.0], [0.1]])

        class Lin(ampc.Model):
            def traj_to_state(self, traj):
                return jnp.asarray(traj[-1].obs)

            def pred_core(self, params, s, u):
                return jnp.asarray(A_true) @ s + jnp.asarray(B_true) @ u

            @property
            def params(self):
                return {}

            @property
            def state_dim(self):
                return 2

        model = Lin(system)
        task = ampc.Task(system)
        task.set_cost(QuadCost(system, np.eye(2), 0.1 * np.eye(1), goal=np.zeros(2)))
        task.set_ctrl_bound("u", -10.0, 10.0)
        task.set_num_steps(60)
        con = DirectTranscriptionController(system, task, model, horizon=2)
        assert con.horizon == 20  # 2 s / 0.1 dt

        def dyn(x, u):
            return jnp.asarray(A_true) @ x + jnp.asarray(B_true) @ u

        traj = simulate(
            con, np.array([1.0, 0.0]), term_cond=task.term_cond,
            dynamics=dyn, max_steps=60,
        )
        final = np.asarray(traj.obs[-1])
        assert np.abs(final).max() < 0.05, f"final {final}"

    def test_set_guess_seeds_warm_start(self):
        """``set_guess`` (reference nmpc.py:263-266) installs a user
        knot-point guess into the controller state; omitted states are
        filled by rolling the model under the guessed controls."""
        system = ampc.System(["p", "v"], ["u"], dt=0.1)
        A_true = np.array([[1.0, 0.1], [0.0, 1.0]])
        B_true = np.array([[0.0], [0.1]])

        class Lin(ampc.Model):
            def traj_to_state(self, traj):
                return jnp.asarray(traj[-1].obs)

            def pred_core(self, params, s, u):
                return jnp.asarray(A_true) @ s + jnp.asarray(B_true) @ u

            @property
            def params(self):
                return {}

            @property
            def state_dim(self):
                return 2

        model = Lin(system)
        task = ampc.Task(system)
        task.set_cost(QuadCost(system, np.eye(2), 0.1 * np.eye(1), goal=np.zeros(2)))
        task.set_ctrl_bound("u", -10.0, 10.0)
        con = DirectTranscriptionController(system, task, model, horizon=1)
        H = con.horizon

        traj = ampc.from_arrays(
            system, np.array([[1.0, 0.0]]), np.array([[0.0]])
        )
        cstate = con.traj_to_state(traj)
        us = np.full((H, 1), 0.5)
        cstate2 = con.set_guess(cstate, us)
        np.testing.assert_allclose(np.asarray(cstate2["us_guess"]), us)
        # states filled by rolling the model from the current state
        x = np.array([1.0, 0.0])
        expect = [x]
        for t in range(H):
            x = A_true @ x + B_true @ us[t]
            expect.append(x)
        np.testing.assert_allclose(
            np.asarray(cstate2["xs_guess"]), np.array(expect), rtol=1e-6
        )
        # explicit xs_guess is taken verbatim
        xs = np.zeros((H + 1, 2))
        cstate3 = con.set_guess(cstate, us, xs_guess=xs)
        np.testing.assert_allclose(np.asarray(cstate3["xs_guess"]), xs)
        # other fields untouched
        np.testing.assert_allclose(
            np.asarray(cstate3["model_state"]), np.asarray(cstate["model_state"])
        )

    def test_dt_with_koopman_on_linear_plant(self):
        """Koopman + DT end-to-end (configs[3]): on a linear plant the
        identity-basis Koopman model is exact, so DT must stabilize."""
        system = ampc.System(["p", "v"], ["u"], dt=0.1)
        A_true = np.array([[1.0, 0.1], [0.05, 1.0]])  # unstable
        B_true = np.array([[0.0], [0.1]])

        def dyn(x, u):
            return jnp.asarray(A_true) @ x + jnp.asarray(B_true) @ u

        rng = np.random.default_rng(2)
        trajs = []
        for _ in range(10):
            x = rng.uniform(-0.5, 0.5, 2)
            obs, us = [], []
            for _ in range(30):
                u = rng.uniform(-1, 1, 1)
                obs.append(x)
                us.append(u)
                x = A_true @ x + B_true @ u
            trajs.append(ampc.from_arrays(system, np.array(obs), np.array(us)))
        model = Koopman(system, method="lstsq")
        model.train(trajs)

        task = ampc.Task(system)
        task.set_cost(QuadCost(system, np.eye(2), 0.1 * np.eye(1), goal=np.zeros(2)))
        task.set_ctrl_bound("u", -10.0, 10.0)
        task.set_num_steps(60)
        con = DirectTranscriptionController(system, task, model, horizon=2)
        traj = simulate(
            con, np.array([1.0, 0.0]), term_cond=task.term_cond,
            dynamics=dyn, max_steps=60,
        )
        final = np.asarray(traj.obs[-1])
        assert np.abs(final).max() < 0.05, f"final {final}"

    def test_dt_cartpole_true_dynamics(self, benchmark):
        """DT with the true dynamics as model holds the cartpole upright
        — isolates the SQP optimizer from model error."""
        from autompc_tpu.sysid.dummy import FunctionModel

        model = FunctionModel(benchmark.system, benchmark.dynamics)
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(
                benchmark.system,
                np.diag([50.0, 5.0, 1.0, 1.0]),
                0.1 * np.eye(1),
                goal=np.zeros(4),
            )
        )
        con = DirectTranscriptionController(
            benchmark.system, task, model, horizon=1
        )
        traj = simulate(
            con,
            np.array([0.2, 0.0, 0.0, 0.0]),
            term_cond=task.term_cond,
            dynamics=benchmark.dynamics,
            max_steps=100,
        )
        obs = np.asarray(traj.obs)
        assert np.abs(obs[-10:, 0]).max() < 0.1, f"thetas {obs[-10:, 0]}"

    def test_factory(self, benchmark, trajs):
        model = Koopman(benchmark.system, method="lstsq")
        model.train(trajs)
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(benchmark.system, np.eye(4), np.eye(1), goal=np.zeros(4))
        )
        factory = DirectTranscriptionControllerFactory(benchmark.system)
        cfg = factory.get_configuration_space().get_default_configuration()
        assert cfg["horizon"] == 10
        con = factory(cfg, task, model)
        assert con.horizon == 200  # 10 s / 0.05


class TestQPBackwardAssoc:
    @pytest.mark.parametrize("H,ds,dc", [(8, 3, 1), (21, 4, 2)])
    def test_matches_sequential_kkt(self, H, ds, dc):
        """Associative-scan trajectory-QP factorization (with defects +
        regularization) equals the sequential Riccati-with-defects."""
        from autompc_tpu.ops.trajqp import qp_backward, qp_backward_assoc

        rng = np.random.default_rng(H + ds)
        A_seq = jnp.asarray(rng.normal(size=(H, ds, ds)) * 0.3 + np.eye(ds))
        B_seq = jnp.asarray(rng.normal(size=(H, ds, dc)) * 0.4)
        Cxx = jnp.asarray(
            np.stack([np.diag(rng.uniform(0.1, 2.0, ds)) for _ in range(H)])
        )
        Cuu = jnp.asarray(
            np.stack([np.diag(rng.uniform(0.05, 1.0, dc)) for _ in range(H)])
        )
        Cux = jnp.zeros((H, dc, ds))
        cx = jnp.asarray(rng.normal(size=(H, ds)))
        cu = jnp.asarray(rng.normal(size=(H, dc)))
        d_seq = jnp.asarray(rng.normal(size=(H, ds)) * 0.2)
        Vf = jnp.asarray(np.diag(rng.uniform(0.5, 3.0, ds)))
        vf = jnp.asarray(rng.normal(size=ds))

        Ks_s, ks_s, l_s, q_s = qp_backward(
            A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf, reg=1e-6
        )
        Ks_a, ks_a, l_a, q_a = qp_backward_assoc(
            A_seq, B_seq, Cxx, Cuu, Cux, cx, cu, d_seq, Vf, vf, reg=1e-6
        )
        np.testing.assert_allclose(np.asarray(Ks_a), np.asarray(Ks_s),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ks_a), np.asarray(ks_s),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(float(l_a), float(l_s), rtol=1e-7)
        np.testing.assert_allclose(float(q_a), float(q_s), rtol=1e-7)

    def test_sqp_solver_assoc_backward_end_to_end(self):
        """make_sqp_solver(backward='assoc') reproduces the scan-KKT
        SQP solve on the cartpole DT problem."""
        from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
        from autompc_tpu.control.nmpc import make_sqp_solver
        from autompc_tpu.costs import QuadCost
        from autompc_tpu.sysid import SINDy

        b = CartpoleSwingupBenchmark()
        trajs = b.gen_trajs_batch(seed=42, n_trajs=30, traj_len=50)
        model = SINDy(b.system, method="lstsq", threshold=1e-3,
                      trig_basis=True, trig_freq=1, trig_interaction=True,
                      time_mode="discrete")
        model.train(trajs)
        cost = QuadCost(
            b.system, jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
            0.001 * jnp.eye(1), goal=jnp.zeros(4),
        )
        bounds = b.task.get_ctrl_bounds()
        common = dict(
            H=12, ds=4, dc=1, obsdim=4, dt=b.system.dt,
            ubounds=(bounds[:, 0], bounds[:, 1]), sqp_iters=5,
        )
        solve_s = jax.jit(make_sqp_solver(model.pred_core, cost, **common))
        solve_a = jax.jit(make_sqp_solver(
            model.pred_core, cost, backward="assoc", **common
        ))
        x0 = jnp.array([0.6, 0.0, 0.0, 0.0])
        xs_g = jnp.zeros((13, 4))
        us_g = jnp.zeros((12, 1))
        xs_s, us_s = solve_s(model.params, x0, xs_g, us_g)
        xs_a, us_a = solve_a(model.params, x0, xs_g, us_g)
        np.testing.assert_allclose(np.asarray(us_a), np.asarray(us_s),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(xs_a), np.asarray(xs_s),
                                   rtol=1e-6, atol=1e-8)
