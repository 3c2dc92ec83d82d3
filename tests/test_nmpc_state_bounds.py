"""Direct-transcription observation box constraints.

The reference imposes task obs bounds as IPOPT decision-variable
bounds (autompc/control/nmpc.py:121-130: xlb/xub from
task.get_obs_bounds()). Our device SQP enforces them with an
augmented Lagrangian (control/nmpc.py:make_sqp_solver, ``xbounds``).
Pinned here against an independent constrained reference solve of the
SAME NLP: scipy SLSQP over the flat knot vector with explicit variable
bounds and defect equality constraints — the exact structure the
reference hands to IPOPT.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autompc_tpu.control.nmpc import make_sqp_solver
from autompc_tpu.costs import QuadCost
from autompc_tpu.core.system import System

# 1D double integrator, Euler at dt: the reference test fixture family
# (reference tests/test_pipeline.py:19-35 uses the same plant).
DT = 0.1
A = np.array([[1.0, DT], [0.0, 1.0]])
B = np.array([[0.0], [DT]])
H = 16
VEL_CAP = 0.45

Q = np.diag([4.0, 0.01])
R = np.array([[0.01]])
F = np.diag([40.0, 1.0])
GOAL = np.array([1.5, 0.0])
X0 = np.array([0.0, 0.0])
UB = 50.0


def pred_core(params, x, u):
    return jnp.asarray(A) @ x + jnp.asarray(B) @ u


def _make_solver(xbounds, sqp_iters=40):
    system = System(["pos", "vel"], ["acc"], dt=DT)
    cost = QuadCost(
        system, jnp.asarray(Q), jnp.asarray(R), jnp.asarray(F),
        goal=jnp.asarray(GOAL),
    )
    return jax.jit(make_sqp_solver(
        pred_core, cost, H=H, ds=2, dc=1, obsdim=2, dt=DT,
        ubounds=(jnp.array([-UB]), jnp.array([UB])),
        sqp_iters=sqp_iters, xbounds=xbounds,
    ))


def _solve_sqp(xbounds):
    solve = _make_solver(xbounds)
    xs_g = jnp.zeros((H + 1, 2)).at[0].set(jnp.asarray(X0))
    us_g = jnp.zeros((H, 1))
    xs, us = solve(None, jnp.asarray(X0), xs_g, us_g)
    return np.asarray(xs), np.asarray(us)


def _reference_slsqp(vel_cap):
    """The reference's NLP (nmpc.py:36-187): flat decision vector
    [x_0..x_H, u_0..u_{H-1}], variable bounds, defect equalities —
    solved by scipy SLSQP instead of IPOPT (not available here)."""
    from scipy.optimize import minimize

    nx = (H + 1) * 2

    def unpack(z):
        return z[:nx].reshape(H + 1, 2), z[nx:].reshape(H, 1)

    def objective(z):
        xs, us = unpack(z)
        dx = xs - GOAL
        oc = np.sum(np.einsum("ti,ij,tj->t", dx, Q, dx))
        cc = np.sum(np.einsum("ti,ij,tj->t", us, R, us))
        tc = dx[H] @ F @ dx[H]
        return DT * (oc + cc) + tc

    def defects(z):
        xs, us = unpack(z)
        return (xs[:H] @ A.T + us @ B.T - xs[1:]).ravel()

    bounds = []
    for i in range(H + 1):
        if i == 0:
            bounds += [(X0[0], X0[0]), (X0[1], X0[1])]
        else:
            bounds += [(-np.inf, np.inf), (-np.inf, vel_cap)]
    bounds += [(-UB, UB)] * H

    z0 = np.zeros(nx + H)
    z0[:nx] = np.tile(X0, H + 1)
    r = minimize(
        objective, z0, method="SLSQP", bounds=bounds,
        constraints={"type": "eq", "fun": defects},
        options={"maxiter": 400, "ftol": 1e-12},
    )
    assert r.success, r.message
    return unpack(r.x)


def test_unconstrained_solution_violates_cap():
    """Sanity: the bound in the constrained test is actually active."""
    xs, _ = _solve_sqp(None)
    assert xs[:, 1].max() > VEL_CAP + 0.05, (
        f"fixture too easy: peak vel {xs[:, 1].max():.3f} <= cap"
    )


def test_sqp_respects_obs_bounds_and_matches_slsqp():
    xbounds = (jnp.array([-np.inf, -np.inf]), jnp.array([np.inf, VEL_CAP]))
    xs, us = _solve_sqp(xbounds)
    # Feasibility: AL enforcement to ~1e-3 (IPOPT's own default
    # constraint tolerance is 1e-4 scaled).
    assert xs[1:, 1].max() <= VEL_CAP + 2e-3, (
        f"velocity cap violated: {xs[1:, 1].max():.5f} > {VEL_CAP}"
    )
    # Parity with the independent constrained solve.
    xs_ref, us_ref = _reference_slsqp(VEL_CAP)
    np.testing.assert_allclose(xs, xs_ref, atol=5e-3)
    np.testing.assert_allclose(us, us_ref, atol=5e-2)


def test_xbounds_none_path_unchanged():
    """xbounds=None must trace the identical unconstrained program."""
    xs_a, us_a = _solve_sqp(None)
    inf_b = (jnp.array([-np.inf, -np.inf]), jnp.array([np.inf, np.inf]))
    xs_b, us_b = _solve_sqp(inf_b)
    # Infinite bounds never activate: same solution as no bounds.
    np.testing.assert_allclose(us_a, us_b, rtol=1e-6, atol=1e-8)


def test_controller_applies_task_obs_bounds():
    """DirectTranscriptionController wires task obs bounds through to
    the solver (reference nmpc.py:121-130 semantics): closed-loop knot
    states respect the cap."""
    from autompc_tpu.control.nmpc import DirectTranscriptionController
    from autompc_tpu.core import trajectory as traj_mod
    from autompc_tpu.core.task import Task
    from autompc_tpu.sysid.dummy import DummyLinear

    system = System(["pos", "vel"], ["acc"], dt=DT)
    task = Task(system)
    task.set_ctrl_bounds(np.array([-UB]), np.array([UB]))
    task.set_obs_bound("vel", -np.inf, VEL_CAP)
    task.set_cost(QuadCost(
        system, jnp.asarray(Q), jnp.asarray(R), jnp.asarray(F),
        goal=jnp.asarray(GOAL),
    ))
    model = DummyLinear(system, jnp.asarray(A), jnp.asarray(B))
    ctrl = DirectTranscriptionController(
        system, task, model, horizon=H * DT
    )
    traj = traj_mod.zeros(system, 1)
    cstate = ctrl.traj_to_state(traj)
    obs = jnp.asarray(X0)
    for _ in range(3):
        u, cstate = ctrl.step(cstate, obs)
        obs = model.pred_core(model.params, obs, u)
    # The warm-started knot plan in the controller state must obey the cap.
    assert np.asarray(cstate["xs_guess"])[1:, 1].max() <= VEL_CAP + 5e-3


def test_dt_fanout_applies_task_obs_bounds():
    """DirectTranscriptionFanout wires task obs bounds into its SQP:
    an obs-bounded task's fan-out closed loop must score differently
    (and its plans feasibly) vs the same task unbounded when the bound
    binds."""
    import jax.numpy as jnp

    from autompc_tpu.core.task import Task
    from autompc_tpu.parallel.fanout import DirectTranscriptionFanout
    from autompc_tpu.sysid.dummy import DummyLinear

    system = System(["pos", "vel"], ["acc"], dt=DT)
    model = DummyLinear(system, jnp.asarray(A), jnp.asarray(B))

    def make_task(bounded):
        task = Task(system)
        task.set_ctrl_bounds(np.array([-UB]), np.array([UB]))
        if bounded:
            task.set_obs_bound("vel", -np.inf, VEL_CAP)
        task.set_cost(QuadCost(
            system, jnp.asarray(Q), jnp.asarray(R), jnp.asarray(F),
            goal=jnp.asarray(GOAL),
        ))
        task.set_init_obs(X0)
        task.set_num_steps(6)
        return task

    batch = {
        "Qdiag": jnp.asarray(np.tile(np.diag(Q), (2, 1))),
        "Rdiag": jnp.asarray(np.tile(np.diag(R), (2, 1))),
        "Fdiag": jnp.asarray(np.tile(np.diag(F), (2, 1))),
    }
    costs = {}
    for bounded in (False, True):
        fan = DirectTranscriptionFanout(
            system, make_task(bounded), model, model,
            horizon_knots=H, goal=GOAL,
        )
        costs[bounded] = np.asarray(fan(batch))
        assert np.all(np.isfinite(costs[bounded]))
    # The cap binds on this fixture (test_unconstrained_solution_
    # violates_cap), so the bounded fan-out must behave differently.
    assert not np.allclose(costs[True], costs[False])
