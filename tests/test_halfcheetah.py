"""Halfcheetah benchmark tests (planar multibody oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.benchmarks.halfcheetah import (
    HalfcheetahBenchmark,
    HalfcheetahCost,
    halfcheetah_dynamics,
)


@pytest.fixture(scope="module")
def benchmark():
    return HalfcheetahBenchmark()


class TestDynamics:
    def test_passive_settles(self, benchmark):
        x = jnp.asarray(benchmark.task.get_init_obs())
        step = jax.jit(lambda x: halfcheetah_dynamics(x, jnp.zeros(6)))
        for _ in range(150):
            x = step(x)
        assert bool(jnp.isfinite(x).all())
        # settles standing on the ground with little residual motion
        assert 0.3 < float(x[1]) < 0.9
        assert float(jnp.linalg.norm(x[9:])) < 5.0

    def test_random_controls_bounded(self, benchmark):
        x = jnp.asarray(benchmark.task.get_init_obs())
        key = jax.random.PRNGKey(0)
        step = jax.jit(halfcheetah_dynamics)
        for _ in range(100):
            key, k = jax.random.split(key)
            x = step(x, jax.random.uniform(k, (6,), minval=-1, maxval=1))
        assert bool(jnp.isfinite(x).all())
        assert abs(float(x[1])) < 3.0  # no launch into space

    def test_differentiable(self, benchmark):
        x = jnp.asarray(benchmark.task.get_init_obs())
        u = 0.1 * jnp.ones(6)
        jac = jax.jacfwd(lambda xx: halfcheetah_dynamics(xx, u))(x)
        assert jac.shape == (18, 18)
        assert bool(jnp.isfinite(jac).all())

    def test_actuation_moves_cheetah(self, benchmark):
        """Sustained asymmetric torques produce net horizontal motion."""
        x = jnp.asarray(benchmark.task.get_init_obs())
        step = jax.jit(halfcheetah_dynamics)
        key = jax.random.PRNGKey(3)
        for i in range(120):
            key, k = jax.random.split(key)
            u = jax.random.uniform(k, (6,), minval=-1, maxval=1)
            x = step(x, u)
        assert abs(float(x[0])) > 0.05


class TestBenchmark:
    def test_spec(self, benchmark):
        assert benchmark.system.obs_dim == 18
        assert benchmark.system.ctrl_dim == 6
        assert benchmark.task.get_num_steps() == 200
        bounds = benchmark.task.get_ctrl_bounds()
        np.testing.assert_array_equal(bounds[:, 0], -1.0)
        np.testing.assert_array_equal(bounds[:, 1], 1.0)

    def test_gen_trajs(self, benchmark):
        tb = benchmark.gen_trajs_batch(seed=0, n_trajs=3, traj_len=20)
        assert tb.obs.shape == (3, 20, 18)
        assert np.isfinite(np.asarray(tb.obs)).all()

    def test_cost_metric(self, benchmark):
        """Cost = 200 - (run reward + ctrl reward); forward motion is
        rewarded (halfcheetah.py:213-228 semantics)."""
        system = benchmark.system
        T = 10
        obs_fwd = np.zeros((T, 18))
        obs_fwd[:, 0] = np.linspace(0, 1.0, T)  # moves forward
        ctrls = np.zeros((T, 6))
        traj_fwd = ampc.from_arrays(system, obs_fwd, ctrls)
        traj_still = ampc.from_arrays(system, np.zeros((T, 18)), ctrls)
        cost = benchmark.task.get_cost()
        assert float(cost(traj_fwd)) < float(cost(traj_still))
        assert float(cost(traj_still)) == pytest.approx(200.0)

    def test_mlp_learns_dynamics(self, benchmark):
        """Sanity slice toward configs[4]: an MLP surrogate beats the
        persistence baseline on halfcheetah transitions."""
        from autompc_tpu.sysid import MLP

        tb = benchmark.gen_trajs_batch(seed=1, n_trajs=20, traj_len=40)
        model = MLP(benchmark.system, n_hidden_layers=2, hidden_size=64,
                    n_train_iters=30, n_batch=128)
        model.train(tb)
        holdout = benchmark.gen_trajs_batch(seed=9, n_trajs=2, traj_len=30)[0]
        preds = model.pred_batch(holdout.obs[:-1], holdout.ctrls[:-1])
        errs = np.abs(np.asarray(preds) - np.asarray(holdout.obs[1:]))
        deltas = np.abs(np.diff(np.asarray(holdout.obs), axis=0))
        assert errs.mean() < 0.8 * deltas.mean()


class TestHalfcheetahCostDecomposition:
    def test_stage_terminal_form_matches_call(self):
        """The telescoped stage/terminal decomposition equals the
        running-reward __call__ exactly on arbitrary trajectories
        starting at init_x."""
        import jax.numpy as jnp

        from autompc_tpu.benchmarks.halfcheetah import (
            HalfcheetahBenchmark,
            HalfcheetahCost,
        )
        from autompc_tpu.core.trajectory import Trajectory

        b = HalfcheetahBenchmark()
        cost = HalfcheetahCost(b.system, dt=0.05, init_x=0.3)
        rng = np.random.default_rng(3)
        T = 17
        obs = rng.normal(size=(T, 18))
        obs[0, 0] = 0.3  # rollouts start at init_x
        ctrls = rng.uniform(-1, 1, (T, 6))
        ctrls[-1] = 0.0  # trajectory convention: last ctrl row zero
        traj = Trajectory(b.system, T, jnp.asarray(obs), jnp.asarray(ctrls))

        direct = float(cost(traj))
        stage = sum(float(cost.eval_obs_cost(o)) for o in traj.obs)
        stage += sum(float(cost.eval_ctrl_cost(u)) for u in traj.ctrls)
        term = float(cost.eval_term_obs_cost(traj.obs[-1]))
        assert stage + term == pytest.approx(direct, rel=1e-9)

    def test_cost_is_diff(self):
        """The decomposition is differentiable (controllers can use
        jax.grad through it) and flags say so."""
        import jax
        import jax.numpy as jnp

        from autompc_tpu.benchmarks.halfcheetah import (
            HalfcheetahBenchmark,
            HalfcheetahCost,
        )

        b = HalfcheetahBenchmark()
        cost = HalfcheetahCost(b.system)
        assert cost.is_diff and cost.is_twice_diff and not cost.is_quad
        g = jax.grad(cost.eval_term_obs_cost)(jnp.ones(18))
        assert float(g[0]) == pytest.approx(-1.0 / 0.05)
        g2 = jax.grad(cost.eval_ctrl_cost)(jnp.ones(6))
        np.testing.assert_allclose(np.asarray(g2), 0.2)


def test_cached_tune_result_loads():
    """The shipped halfcheetah cached-tune asset loads and carries a
    below-saturation incumbent (cartpole_v2.py:146-153 analog)."""
    from autompc_tpu.benchmarks import HalfcheetahBenchmark

    b = HalfcheetahBenchmark()
    res = b.get_cached_tune_result()
    assert res["kind"] == "pipeline_tune_result"
    assert len(res["costs"]) == len(res["cfg_dicts"]) == 32
    assert res["inc_costs"][-1] == min(res["costs"])
    # saturation of the 200-R metric is 200 (standing still); the
    # incumbent must do better
    assert res["inc_costs"][-1] < 200.0
    assert any(k.startswith("_cost:") for k in res["inc_cfg"])


class TestContactSolve:
    """Physics sanity of the velocity-level PGS contact solve
    (_contact_impulse): complementarity, cone bound, stick/slide."""

    def test_no_impulse_above_ground(self):
        from autompc_tpu.benchmarks.halfcheetah import (
            _contact_impulse, _mass_matrix,
        )

        q = jnp.zeros(9).at[1].set(2.0)  # torso 2 m up: all gaps open
        qdot = jnp.zeros(9).at[1].set(-3.0)  # falling fast
        A = _mass_matrix(q)
        dv = _contact_impulse(q, qdot, A)
        np.testing.assert_allclose(np.asarray(dv), 0.0, atol=1e-12)

    def test_penetration_is_pushed_out(self, benchmark):
        # Drop from standing: after settling, feet do not sink through.
        from autompc_tpu.benchmarks.halfcheetah import _body_frames

        x = jnp.asarray(benchmark.task.get_init_obs())
        step = jax.jit(lambda x: halfcheetah_dynamics(x, jnp.zeros(6)))
        for _ in range(120):
            x = step(x)
        pts = _body_frames(x[:9])[2]
        # No contact point more than ~1 cm below ground (soft contact
        # allows slight steady-state penetration, not sinking).
        assert float(jnp.min(pts[:, 1])) > -0.01

    def test_friction_resists_slide(self, benchmark):
        # Settle, then push the whole body sideways: Coulomb friction
        # must decelerate the slide (no frictionless drift).
        x = jnp.asarray(benchmark.task.get_init_obs())
        step = jax.jit(lambda x: halfcheetah_dynamics(x, jnp.zeros(6)))
        for _ in range(80):
            x = step(x)
        x = x.at[9].set(1.5)  # 1.5 m/s horizontal root velocity
        v0 = float(x[9])
        for _ in range(10):
            x = step(x)
        assert float(x[9]) < 0.6 * v0
