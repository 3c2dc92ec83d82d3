"""Cost-layer tests, modeled on the reference test strategy
(reference: tests/test_costs.py — config-space names, factory matrix
values, GaussReg shapes, SumCost algebra/flags, exact summed values)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.costs import (
    BoxThresholdCost,
    GaussRegFactory,
    QuadCost,
    QuadCostFactory,
    SumCost,
    SumCostFactory,
    ThresholdCost,
)


@pytest.fixture
def system():
    return ampc.System(["x1", "x2"], ["u"], dt=0.05)


def make_quad(system, q=1.0, r=2.0, f=3.0, goal=None):
    n, m = system.obs_dim, system.ctrl_dim
    return QuadCost(
        system, q * np.eye(n), r * np.eye(m), f * np.eye(n), goal=goal
    )


class TestQuadCost:
    def test_values(self, system):
        cost = make_quad(system)
        obs = jnp.array([1.0, 2.0])
        ctrl = jnp.array([3.0])
        assert float(cost.eval_obs_cost(obs)) == pytest.approx(5.0)
        assert float(cost.eval_ctrl_cost(ctrl)) == pytest.approx(18.0)
        assert float(cost.eval_term_obs_cost(obs)) == pytest.approx(15.0)

    def test_goal_offset_everywhere(self, system):
        goal = np.array([1.0, 1.0])
        cost = make_quad(system, goal=goal)
        obs = jnp.array([2.0, 1.0])
        assert float(cost.eval_obs_cost(obs)) == pytest.approx(1.0)
        # Terminal diff must also be goal-offset (the reference drops the
        # offset there, cost.py:194-212 — we keep the correct math).
        c, g, H = cost.eval_term_obs_cost_hess(obs)
        assert float(c) == pytest.approx(3.0)
        np.testing.assert_allclose(np.asarray(g), [6.0, 0.0])
        np.testing.assert_allclose(np.asarray(H), 6.0 * np.eye(2))

    def test_diff_consistency(self, system):
        cost = make_quad(system, goal=np.array([0.5, -0.5]))
        obs = jnp.array([1.3, 0.7])
        c0 = cost.eval_obs_cost(obs)
        c1, jac = cost.eval_obs_cost_diff(obs)
        c2, jac2, hess = cost.eval_obs_cost_hess(obs)
        assert float(c0) == pytest.approx(float(c1)) == pytest.approx(float(c2))
        np.testing.assert_allclose(
            np.asarray(jac), np.asarray(jax.grad(cost.eval_obs_cost)(obs))
        )
        np.testing.assert_allclose(
            np.asarray(hess), np.asarray(jax.hessian(cost.eval_obs_cost)(obs))
        )

    def test_flags_and_matrices(self, system):
        cost = make_quad(system)
        assert cost.is_quad and cost.is_convex and cost.is_diff
        assert cost.is_twice_diff and cost.has_goal
        Q, R, F = cost.get_cost_matrices()
        np.testing.assert_array_equal(Q, np.eye(2))
        np.testing.assert_array_equal(R, 2 * np.eye(1))
        np.testing.assert_array_equal(F, 3 * np.eye(2))

    def test_traj_call(self, system):
        cost = make_quad(system)
        traj = ampc.from_arrays(system, np.ones((4, 2)), np.ones((4, 1)))
        # 4 * (2 + 2) + terminal 6
        assert float(cost(traj)) == pytest.approx(4 * 4 + 6.0)

    def test_shape_validation(self, system):
        with pytest.raises(ValueError):
            QuadCost(system, np.eye(3), np.eye(1))
        with pytest.raises(ValueError):
            QuadCost(system, np.eye(2), np.eye(2))


class TestThresholdCost:
    def test_values(self, system):
        cost = ThresholdCost(
            system, goal=np.zeros(2), obs_range=(0, 2), threshold=0.2
        )
        assert float(cost.eval_obs_cost(jnp.array([0.1, 0.1]))) == 0.0
        assert float(cost.eval_obs_cost(jnp.array([0.3, 0.0]))) == 1.0
        assert float(cost.eval_ctrl_cost(jnp.array([5.0]))) == 0.0
        assert float(cost.eval_term_obs_cost(jnp.array([9.0, 9.0]))) == 0.0

    def test_obs_range(self, system):
        cost = ThresholdCost(
            system, goal=np.zeros(2), obs_range=(0, 1), threshold=0.2
        )
        # second dim out of range is not checked
        assert float(cost.eval_obs_cost(jnp.array([0.0, 9.0]))) == 0.0

    def test_jit_and_vmap(self, system):
        cost = ThresholdCost(
            system, goal=np.zeros(2), obs_range=(0, 2), threshold=0.2
        )
        obs = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 0.3]])
        vals = jax.jit(jax.vmap(cost.eval_obs_cost))(obs)
        np.testing.assert_array_equal(np.asarray(vals), [0.0, 1.0, 1.0])


class TestBoxThresholdCost:
    def test_values(self, system):
        limits = np.array([[-1.0, 1.0], [-np.inf, np.inf]])
        cost = BoxThresholdCost(system, limits)
        assert float(cost.eval_obs_cost(jnp.array([0.5, 100.0]))) == 0.0
        assert float(cost.eval_obs_cost(jnp.array([1.5, 0.0]))) == 1.0
        assert not cost.has_goal
        cost2 = BoxThresholdCost(system, limits, goal=np.zeros(2))
        assert cost2.has_goal


class TestSumCost:
    def test_operator_and_values(self, system):
        c1 = make_quad(system, q=1.0, r=1.0, f=1.0)
        c2 = make_quad(system, q=2.0, r=2.0, f=2.0)
        s = c1 + c2
        assert isinstance(s, SumCost)
        obs = jnp.array([1.0, 1.0])
        ctrl = jnp.array([2.0])
        assert float(s.eval_obs_cost(obs)) == pytest.approx(
            float(c1.eval_obs_cost(obs)) + float(c2.eval_obs_cost(obs))
        )
        c, jac, hess = s.eval_obs_cost_hess(obs)
        np.testing.assert_allclose(np.asarray(hess), 6.0 * np.eye(2))
        Q, R, F = s.get_cost_matrices()
        np.testing.assert_allclose(Q, 3 * np.eye(2))

    def test_flag_conjunction(self, system):
        c1 = make_quad(system)
        thresh = ThresholdCost(
            system, goal=np.zeros(2), obs_range=(0, 2), threshold=0.2
        )
        s = c1 + thresh
        assert not s.is_quad
        assert not s.is_diff
        s2 = c1 + make_quad(system, q=5.0)
        assert s2.is_quad and s2.is_diff and s2.has_goal

    def test_mismatched_goals_not_quad(self, system):
        c1 = make_quad(system, goal=np.zeros(2))
        c2 = make_quad(system, goal=np.ones(2))
        s = c1 + c2
        assert not s.is_quad
        assert not s.has_goal

    def test_three_way_sum(self, system):
        costs = [make_quad(system, q=float(i + 1)) for i in range(3)]
        s = costs[0] + costs[1] + costs[2]
        assert len(s.costs) == 3
        obs = jnp.array([1.0, 0.0])
        assert float(s.eval_obs_cost(obs)) == pytest.approx(6.0)


class TestQuadCostFactory:
    def test_config_space_names(self, system):
        factory = QuadCostFactory(system)
        cs = factory.get_configuration_space()
        names = set(cs.get_hyperparameter_names())
        assert names == {"x1_Q", "x2_Q", "x1_F", "x2_F", "u_R"}

    def test_factory_to_matrices(self, system):
        task = ampc.Task(system)
        task.set_cost(QuadCost(system, np.eye(2), np.eye(1), goal=np.zeros(2)))
        factory = QuadCostFactory(system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        cfg["x1_Q"] = 10.0
        cfg["u_R"] = 0.1
        cost = factory(cfg, task, None)
        Q, R, F = cost.get_cost_matrices()
        assert Q[0, 0] == pytest.approx(10.0)
        assert Q[1, 1] == pytest.approx(1.0)
        assert R[0, 0] == pytest.approx(0.1)

    def test_nan_goal_dims_skipped(self, system):
        factory = QuadCostFactory(system, goal=np.array([0.0, np.nan]))
        cs = factory.get_configuration_space()
        names = set(cs.get_hyperparameter_names())
        assert names == {"x1_Q", "x1_F", "u_R"}
        cfg = cs.get_default_configuration()
        cost = factory(cfg, ampc.Task(system), None)
        Q, _, _ = cost.get_cost_matrices()
        assert Q[1, 1] == 0.0


class TestGaussRegFactory:
    def test_shapes_and_goal(self, system):
        rng = np.random.default_rng(42)
        trajs = [
            ampc.from_arrays(system, rng.normal(size=(50, 2)), rng.normal(size=(50, 1)))
            for _ in range(3)
        ]
        factory = GaussRegFactory(system)
        cs = factory.get_configuration_space()
        cfg = cs.get_default_configuration()
        cfg["reg_weight"] = 2.0
        cost = factory(cfg, ampc.Task(system), trajs)
        Q, R, F = cost.get_cost_matrices()
        assert Q.shape == (2, 2)
        np.testing.assert_array_equal(R, np.zeros((1, 1)))
        np.testing.assert_array_equal(F, np.zeros((2, 2)))
        X = np.concatenate([np.asarray(t.obs) for t in trajs])
        np.testing.assert_allclose(
            Q, 2.0 * np.linalg.inv(np.cov(X, rowvar=False)), rtol=1e-6
        )
        np.testing.assert_allclose(cost.get_goal(), X.mean(axis=0), rtol=1e-6)


class TestSumCostFactory:
    def test_prefixed_subspaces(self, system):
        f = QuadCostFactory(system) + GaussRegFactory(system)
        assert isinstance(f, SumCostFactory)
        cs = f.get_configuration_space()
        names = set(cs.get_hyperparameter_names())
        assert "_sum_0:x1_Q" in names
        assert "_sum_1:reg_weight" in names

    def test_instantiation(self, system):
        rng = np.random.default_rng(0)
        trajs = [
            ampc.from_arrays(system, rng.normal(size=(30, 2)), rng.normal(size=(30, 1)))
            for _ in range(2)
        ]
        task = ampc.Task(system)
        task.set_cost(QuadCost(system, np.eye(2), np.eye(1), goal=np.zeros(2)))
        f = QuadCostFactory(system) + GaussRegFactory(system)
        cs = f.get_configuration_space()
        cfg = cs.get_default_configuration()
        cfg["_sum_0:x1_Q"] = 7.0
        cost = f(cfg, task, trajs)
        assert isinstance(cost, SumCost)
        assert len(cost.costs) == 2
        Qs, _, _ = cost.costs[0].get_cost_matrices()
        assert Qs[0, 0] == pytest.approx(7.0)
