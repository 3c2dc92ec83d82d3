"""Cross-dimension smoke fuzz: every controller runs on random linear
systems of varied obs/ctrl dimensionality (catches dc>1 and shape-edge
bugs the cartpole-centric tests never exercise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autompc_tpu as ampc
from autompc_tpu.control import (
    MPPI,
    DirectTranscriptionController,
    FiniteHorizonLQR,
    IterativeLQR,
)
from autompc_tpu.costs import QuadCost
from autompc_tpu.sysid.dummy import DummyLinear
from autompc_tpu.utils import simulate


def make_linear_system(n, m, seed):
    rng = np.random.default_rng(seed)
    system = ampc.System([f"x{i}" for i in range(n)], [f"u{i}" for i in range(m)],
                         dt=0.1)
    # Stable-ish A with reachable B.
    A = np.eye(n) + 0.1 * rng.normal(size=(n, n)) / np.sqrt(n)
    A *= 0.98 / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    B = 0.1 * rng.normal(size=(n, m))
    model = DummyLinear(system, A, B)
    task = ampc.Task(system)
    task.set_cost(QuadCost(system, np.eye(n), 0.1 * np.eye(m), goal=np.zeros(n)))
    task.set_ctrl_bounds(-5 * np.ones(m), 5 * np.ones(m))
    task.set_num_steps(15)

    def dyn(x, u):
        return jnp.asarray(A) @ x + jnp.asarray(B) @ u

    x0 = rng.uniform(-1, 1, n)
    return system, model, task, dyn, x0


DIMS = [(2, 1), (3, 2), (5, 3)]


@pytest.mark.parametrize("n,m", DIMS)
def test_lqr_all_dims(n, m):
    system, model, task, dyn, x0 = make_linear_system(n, m, seed=n * 10 + m)
    con = FiniteHorizonLQR(system, task, model, horizon=30)
    traj = simulate(con, x0, term_cond=task.term_cond, dynamics=dyn, max_steps=15)
    obs = np.asarray(traj.obs)
    assert np.isfinite(obs).all()
    assert np.linalg.norm(obs[-1]) < np.linalg.norm(obs[0]) + 1e-6


@pytest.mark.parametrize("n,m", DIMS)
def test_ilqr_all_dims(n, m):
    system, model, task, dyn, x0 = make_linear_system(n, m, seed=n * 10 + m)
    con = IterativeLQR(system, task, model, horizon=8)
    traj = simulate(con, x0, term_cond=task.term_cond, dynamics=dyn, max_steps=15)
    obs = np.asarray(traj.obs)
    assert np.isfinite(obs).all()
    assert np.linalg.norm(obs[-1]) < np.linalg.norm(obs[0])


@pytest.mark.parametrize("n,m", DIMS)
def test_mppi_all_dims(n, m):
    system, model, task, dyn, x0 = make_linear_system(n, m, seed=n * 10 + m)
    con = MPPI(system, task, model, horizon=8, num_path=64, sigma=1.0,
               lmda=0.5, seed=1)
    traj = simulate(con, x0, term_cond=task.term_cond, dynamics=dyn, max_steps=15)
    obs = np.asarray(traj.obs)
    assert np.isfinite(obs).all()


@pytest.mark.parametrize("n,m", [(2, 1), (3, 2)])
def test_dt_all_dims(n, m):
    system, model, task, dyn, x0 = make_linear_system(n, m, seed=n * 10 + m)
    con = DirectTranscriptionController(system, task, model, horizon=1)
    traj = simulate(con, x0, term_cond=task.term_cond, dynamics=dyn, max_steps=15)
    obs = np.asarray(traj.obs)
    assert np.isfinite(obs).all()
    assert np.linalg.norm(obs[-1]) < np.linalg.norm(obs[0])


def test_ilqr_reuse_feedback_path():
    """The cached-gain replay branch (reuse_feedback > 0,
    reference ilqr.py:285-290) runs and stabilizes."""
    system, model, task, dyn, x0 = make_linear_system(3, 1, seed=7)
    con = IterativeLQR(system, task, model, horizon=10, reuse_feedback=4)
    assert con.reuse_feedback == 4
    traj = simulate(con, x0, term_cond=task.term_cond, dynamics=dyn, max_steps=15)
    obs = np.asarray(traj.obs)
    assert np.isfinite(obs).all()
    assert np.linalg.norm(obs[-1]) < np.linalg.norm(obs[0])


def test_ilqr_reuse_feedback_clamped_to_horizon():
    system, model, task, dyn, x0 = make_linear_system(2, 1, seed=3)
    con = IterativeLQR(system, task, model, horizon=5, reuse_feedback=99)
    assert con.reuse_feedback == 5


@pytest.mark.parametrize("n,m", DIMS)
def test_quad_cost_batch_solver_all_dims(n, m):
    """Per-lane quad-cost batched + scheduled solvers across obs/ctrl
    dimensionality (dc>1 exercises the non-pallas backward and the
    vector control clipping)."""
    from autompc_tpu.control.ilqr import (
        make_batched_ilqr_solver,
        make_scheduled_ilqr_solver,
    )

    system, model, task, dyn, x0 = make_linear_system(n, m, seed=n * 10 + m)
    bounds = task.get_ctrl_bounds()
    kw = dict(
        H=8, ds=n, dc=m, obsdim=n, dt=system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]),
        backward="scan", max_iter=8,
        quad_cost_batch=True, quad_goal=np.zeros(n),
    )
    rng = np.random.default_rng(0)
    B = 5
    cps = dict(
        Qdiag=jnp.asarray(rng.uniform(0.1, 5, (B, n))),
        Rdiag=jnp.asarray(rng.uniform(0.01, 1, (B, m))),
        Fdiag=jnp.asarray(rng.uniform(0.1, 5, (B, n))),
    )
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, n)))
    ug = jnp.zeros((B, 8, m))
    batched = jax.jit(make_batched_ilqr_solver(model.pred_core, None, **kw))
    out_b = batched(model.params, x0s, ug, cps)
    assert np.isfinite(np.asarray(out_b[2])).all()
    sched = jax.jit(make_scheduled_ilqr_solver(
        model.pred_core, None, schedule=((3, 0.5),), **kw
    ))
    out_s = sched(model.params, x0s, ug, cps)
    for a, v in zip(out_s, out_b):
        np.testing.assert_allclose(
            np.asarray(a).astype(float), np.asarray(v).astype(float),
            atol=1e-8,
        )
