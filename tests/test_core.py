"""Core data model tests: System, Trajectory, TrajectoryBatch, Task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.core import TrajectoryBatch


@pytest.fixture
def system():
    return ampc.System(["x1", "x2"], ["u"], dt=0.05)


class TestSystem:
    def test_dims_and_labels(self, system):
        assert system.obs_dim == 2
        assert system.ctrl_dim == 1
        assert system.observations == ("x1", "x2")
        assert system.controls == ("u",)
        assert system.dt == 0.05

    def test_unique_labels_required(self):
        with pytest.raises(ValueError):
            ampc.System(["a", "a"], ["u"])
        with pytest.raises(ValueError):
            ampc.System(["a"], ["a"])

    def test_hashable_and_eq(self, system):
        s2 = ampc.System(["x1", "x2"], ["u"], dt=0.05)
        assert system == s2
        assert hash(system) == hash(s2)

    def test_late_dt_assignment(self):
        s = ampc.System(["a"], ["u"])
        s.dt = 0.1
        assert s.dt == 0.1
        with pytest.raises(AttributeError):
            s.dt = 0.2


class TestTrajectory:
    def test_zeros_and_indexing(self, system):
        traj = ampc.zeros(system, 10)
        assert len(traj) == 10
        assert traj.obs.shape == (10, 2)
        assert traj.ctrls.shape == (10, 1)
        step = traj[3]
        assert step.obs.shape == (2,)
        assert step.ctrl.shape == (1,)

    def test_label_indexing(self, system):
        traj = ampc.zeros(system, 5)
        traj = traj.set_obs(2, jnp.array([1.0, 2.0]))
        traj = traj.set_ctrl(2, jnp.array([3.0]))
        assert traj[2, "x1"] == 1.0
        assert traj[2, "x2"] == 2.0
        assert traj[2, "u"] == 3.0
        with pytest.raises(IndexError):
            traj[2, "bogus"]
        with pytest.raises(IndexError):
            traj[10]

    def test_slicing(self, system):
        traj = ampc.from_arrays(
            system, np.arange(20.0).reshape(10, 2), np.arange(10.0).reshape(10, 1)
        )
        sub = traj[2:5]
        assert len(sub) == 3
        np.testing.assert_array_equal(np.asarray(sub.obs), traj.obs[2:5])

    def test_extend(self, system):
        traj = ampc.zeros(system, 2)
        traj2 = ampc.extend(traj, [[1.0, 1.0]], [[0.5]])
        assert len(traj2) == 3
        assert traj2[2, "x1"] == 1.0

    def test_pytree(self, system):
        traj = ampc.zeros(system, 4)
        doubled = jax.tree_util.tree_map(lambda x: x * 2, traj)
        assert isinstance(doubled, ampc.Trajectory)
        assert doubled.size == 4

    def test_jit_through(self, system):
        traj = ampc.from_arrays(system, np.ones((6, 2)), np.ones((6, 1)))

        @jax.jit
        def total(tr):
            return jnp.sum(tr.obs) + jnp.sum(tr.ctrls)

        assert float(total(traj)) == 18.0


class TestTrajectoryBatch:
    def test_from_trajs_and_mask(self, system):
        t1 = ampc.from_arrays(system, np.ones((5, 2)), np.ones((5, 1)))
        t2 = ampc.from_arrays(system, 2 * np.ones((3, 2)), np.ones((3, 1)))
        tb = TrajectoryBatch.from_trajs([t1, t2])
        assert tb.num_trajs == 2
        assert tb.max_len == 5
        mask = np.asarray(tb.mask())
        assert mask.sum() == 8
        # Padded tail replicates last step
        np.testing.assert_array_equal(np.asarray(tb.obs[1, 3]), [2.0, 2.0])
        # Round trip
        back = tb[1]
        assert back.size == 3

    def test_step_mask(self, system):
        t1 = ampc.from_arrays(system, np.ones((4, 2)), np.ones((4, 1)))
        tb = TrajectoryBatch.from_trajs([t1])
        assert np.asarray(tb.step_mask()).sum() == 3


class TestTask:
    def test_bounds(self, system):
        task = ampc.Task(system)
        assert not task.are_ctrl_bounded()
        task.set_ctrl_bound("u", -2.0, 2.0)
        assert task.are_ctrl_bounded()
        np.testing.assert_array_equal(task.get_ctrl_bounds(), [[-2.0, 2.0]])
        task.set_obs_bound("x1", -1.0, 1.0)
        assert task.are_obs_bounded()

    def test_num_steps_term_cond(self, system):
        task = ampc.Task(system)
        task.set_num_steps(5)
        assert task.has_num_steps()
        assert task.get_num_steps() == 5
        assert not task.term_cond(ampc.zeros(system, 3))
        assert task.term_cond(ampc.zeros(system, 5))

    def test_init_obs(self, system):
        task = ampc.Task(system)
        assert task.get_init_obs() is None
        task.set_init_obs([1.0, 2.0])
        np.testing.assert_array_equal(task.get_init_obs(), [1.0, 2.0])
