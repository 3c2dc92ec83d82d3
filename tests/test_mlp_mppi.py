"""MLP + MPPI tests (BASELINE.json configs[2])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.control import MPPI, MPPIFactory
from autompc_tpu.costs import QuadCost
from autompc_tpu.sysid import MLP, MLPFactory
from autompc_tpu.utils import simulate


@pytest.fixture(scope="module")
def benchmark():
    return CartpoleSwingupBenchmark()


@pytest.fixture(scope="module")
def trajs(benchmark):
    return benchmark.gen_trajs_batch(seed=42, n_trajs=60, traj_len=80)


@pytest.fixture(scope="module")
def trained_mlp(benchmark, trajs):
    model = MLP(
        benchmark.system, n_hidden_layers=2, hidden_size=64,
        n_train_iters=40, n_batch=128, lr=1e-3,
    )
    model.train(trajs)
    return model


class TestMLP:
    def test_training_reduces_loss(self, trained_mlp):
        losses = np.asarray(trained_mlp._losses)
        assert losses[-1] < losses[0] * 0.5
        assert np.isfinite(losses).all()

    def test_holdout_accuracy(self, benchmark, trajs, trained_mlp):
        holdout = benchmark.gen_trajs_batch(seed=5, n_trajs=3, traj_len=40)[0]
        preds = trained_mlp.pred_batch(holdout.obs[:-1], holdout.ctrls[:-1])
        errs = np.asarray(preds) - np.asarray(holdout.obs[1:])
        deltas = np.abs(np.diff(np.asarray(holdout.obs), axis=0))
        assert np.abs(errs).mean() < 0.25 * deltas.mean()

    def test_pred_diff_matches_fd(self, trained_mlp):
        s = jnp.array([0.4, -0.1, 0.2, 0.05])
        u = jnp.array([2.0])
        _, jx, ju = trained_mlp.pred_diff(s, u)
        eps = 1e-6
        fd_u = (
            np.asarray(trained_mlp.pred(s, u + eps))
            - np.asarray(trained_mlp.pred(s, u - eps))
        ) / (2 * eps)
        np.testing.assert_allclose(np.asarray(ju[:, 0]), fd_u, atol=1e-4)
        assert jx.shape == (4, 4)

    def test_deterministic_given_seed(self, benchmark, trajs):
        m1 = MLP(benchmark.system, n_hidden_layers=1, hidden_size=16,
                 n_train_iters=3, seed=7)
        m2 = MLP(benchmark.system, n_hidden_layers=1, hidden_size=16,
                 n_train_iters=3, seed=7)
        m1.train(trajs)
        m2.train(trajs)
        s = jnp.zeros(4)
        u = jnp.ones(1)
        np.testing.assert_allclose(
            np.asarray(m1.pred(s, u)), np.asarray(m2.pred(s, u))
        )

    def test_parameters_roundtrip(self, benchmark, trained_mlp):
        m2 = MLP(benchmark.system, n_hidden_layers=2, hidden_size=64)
        m2.set_parameters(trained_mlp.get_parameters())
        s = jnp.array([0.1, 0.2, 0.3, 0.4])
        u = jnp.array([1.0])
        np.testing.assert_allclose(
            np.asarray(trained_mlp.pred(s, u)), np.asarray(m2.pred(s, u))
        )

    def test_factory_hidden_sizes(self, benchmark):
        factory = MLPFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        assert cfg["n_hidden_layers"] == "2"
        assert "hidden_size_2" in cfg and "hidden_size_3" not in cfg
        cfg["n_hidden_layers"] = "3"
        assert "hidden_size_3" in cfg
        model = factory(cfg, None, skip_train_model=True)
        assert len(model.hidden_sizes) == 3


class TestMPPI:
    def _task(self, benchmark):
        task = benchmark.task.copy()
        task.set_cost(
            QuadCost(
                benchmark.system,
                np.diag([10.0, 0.1, 0.01, 0.01]),
                0.001 * np.eye(1),
                np.diag([10.0, 0.1, 0.01, 0.01]),
                goal=np.zeros(4),
            )
        )
        return task

    def test_step_shapes_and_bounds(self, benchmark, trained_mlp):
        task = self._task(benchmark)
        con = MPPI(
            benchmark.system, task, trained_mlp,
            horizon=10, num_path=64, sigma=1.0, lmda=1.0,
        )
        seed_traj = ampc.zeros(benchmark.system, 1)
        cstate = con.traj_to_state(seed_traj)
        u, cstate2 = con.run(cstate, jnp.array([3.1, 0.0, 0.0, 0.0]))
        assert u.shape == (1,)
        assert float(jnp.abs(u[0])) <= 20.0 + 1e-6
        assert cstate2["act_sequence"].shape == (10, 1)
        # key advanced
        assert not np.array_equal(np.asarray(cstate["key"]), np.asarray(cstate2["key"]))

    def test_reproducible(self, benchmark, trained_mlp):
        task = self._task(benchmark)
        con = MPPI(benchmark.system, task, trained_mlp, horizon=8,
                   num_path=32, seed=3)
        obs = jnp.array([1.0, 0.0, 0.0, 0.0])
        s0 = con.traj_to_state(ampc.zeros(benchmark.system, 1))
        u1, _ = con.run(s0, obs)
        u2, _ = con.run(s0, obs)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2))

    def test_mppi_controls_cartpole_true_dynamics(self, benchmark):
        """MPPI with the *true* dynamics as model must swing up — isolates
        the optimizer from model error."""

        class TrueModel(ampc.Model):
            def __init__(self, system, dyn):
                super().__init__(system)
                self._dyn = dyn

            def traj_to_state(self, traj):
                return jnp.asarray(traj[-1].obs)

            def pred_core(self, params, state, ctrl):
                return self._dyn(state, ctrl)

            @property
            def params(self):
                return {}

            @property
            def state_dim(self):
                return self.system.obs_dim

        model = TrueModel(benchmark.system, benchmark.dynamics)
        task = self._task(benchmark)
        con = MPPI(
            benchmark.system, task, model,
            horizon=20, num_path=512, sigma=1.0, lmda=0.3, seed=0,
        )
        traj = simulate(
            con,
            benchmark.task.get_init_obs(),
            term_cond=benchmark.task.term_cond,
            dynamics=benchmark.dynamics,
            max_steps=200,
        )
        obs = np.asarray(traj.obs)
        # swings up to near-upright in the last quarter
        final_theta = np.abs(obs[-50:, 0])
        assert final_theta.min() < 0.3, f"min late |theta| {final_theta.min()}"

    def test_factory(self, benchmark, trained_mlp):
        factory = MPPIFactory(benchmark.system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        assert cfg["horizon"] == 20 and cfg["num_path"] == 200
        con = factory(cfg, self._task(benchmark), trained_mlp)
        assert con.H == 20


class TestAnalyticJacobian:
    """net_apply_jac's closed-form layer chain vs jax.jacfwd."""

    @pytest.mark.parametrize(
        "nonlin", ["relu", "tanh", "sigmoid", "selu"]
    )
    def test_net_jac_matches_jacfwd(self, nonlin):
        from autompc_tpu.sysid.mlp import (
            net_apply,
            net_apply_jac,
            net_init,
        )

        key = jax.random.PRNGKey(0)
        for sizes in ([7, 16, 5], [7, 16, 16, 16, 5], [7, 5]):
            key, k = jax.random.split(key)
            params = net_init(k, sizes)
            x = jax.random.normal(key, (sizes[0],))
            out, J = net_apply_jac(params, x, nonlin)
            out_ref = net_apply(params, x, nonlin)
            J_ref = jax.jacfwd(lambda z: net_apply(params, z, nonlin))(x)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(out_ref), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(J), np.asarray(J_ref), atol=1e-10,
                err_msg=f"{nonlin} {sizes}",
            )

    def test_pred_diff_core_matches_jacfwd(self, trained_mlp):
        params = trained_mlp.params
        s = jnp.array([0.4, -0.1, 0.2, 0.05])
        u = jnp.array([2.0])
        pred, Jx, Ju = trained_mlp.pred_diff_core(params, s, u)
        np.testing.assert_allclose(
            np.asarray(pred),
            np.asarray(trained_mlp.pred_core(params, s, u)),
            atol=1e-12,
        )
        Jx_ref = jax.jacfwd(
            lambda z: trained_mlp.pred_core(params, z, u)
        )(s)
        Ju_ref = jax.jacfwd(
            lambda z: trained_mlp.pred_core(params, s, z)
        )(u)
        np.testing.assert_allclose(np.asarray(Jx), np.asarray(Jx_ref),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(Ju), np.asarray(Ju_ref),
                                   atol=1e-10)

    @pytest.mark.slow
    def test_batched_solver_pred_diff_matches_jacfwd(
        self, benchmark, trained_mlp
    ):
        """make_batched_ilqr_solver(pred_diff=...) is lane-for-lane
        identical to the jacfwd formulation."""
        from autompc_tpu.control.ilqr import make_batched_ilqr_solver

        bounds = benchmark.task.get_ctrl_bounds()
        cost = QuadCost(
            benchmark.system,
            jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
            0.001 * jnp.eye(1),
            jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
            goal=jnp.zeros(4),
        )
        kw = dict(
            H=8, ds=4, dc=1, obsdim=4, dt=benchmark.system.dt,
            ubounds=(bounds[:, 0], bounds[:, 1]), max_iter=8,
            backward="scan",
        )
        sj = jax.jit(make_batched_ilqr_solver(
            trained_mlp.pred_core, cost, **kw
        ))
        sa = jax.jit(make_batched_ilqr_solver(
            trained_mlp.pred_core, cost,
            pred_diff=trained_mlp.pred_diff_core, **kw
        ))
        rng = np.random.default_rng(2)
        x0s = jnp.asarray(rng.uniform(-1, 1, (4, 4)))
        ug = jnp.zeros((4, 8, 1))
        out_j = sj(trained_mlp.params, x0s, ug)
        out_a = sa(trained_mlp.params, x0s, ug)
        np.testing.assert_array_equal(
            np.asarray(out_j[0]), np.asarray(out_a[0])
        )
        for a, v in zip(out_a[1:], out_j[1:]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(v), atol=1e-8
            )
