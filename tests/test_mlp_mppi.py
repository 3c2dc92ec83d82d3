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
