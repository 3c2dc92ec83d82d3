"""Horizon-sharded multiple-shooting DT (parallel/horizon.py).

The knot axis is sharded over an 8-device ``horizon`` mesh; the sharded
solve must reproduce the single-device SQP trajectory (same assoc
backward, same merit line search — the difference is purely layout +
the partitioner's collectives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autompc_tpu.benchmarks.cartpole import dt_cartpole_dynamics
from autompc_tpu.control.nmpc import make_sqp_solver
from autompc_tpu.core import System
from autompc_tpu.costs import QuadCost
from autompc_tpu.parallel.horizon import make_horizon_sharded_sqp_solver
from autompc_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow


def _setup(H):
    dt = 0.05
    system = System(["theta", "omega", "x", "dx"], ["u"], dt=dt)
    pred_core = lambda params, x, u: dt_cartpole_dynamics(x, u, dt)
    cost = QuadCost(
        system,
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        0.01 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        goal=jnp.zeros(4),
    )
    kw = dict(
        H=H, ds=4, dc=1, obsdim=4, dt=dt,
        ubounds=(jnp.array([-20.0]), jnp.array([20.0])),
        sqp_iters=5,
    )
    return pred_core, cost, kw


def test_horizon_sharded_sqp_matches_single_device():
    H = 16
    pred_core, cost, kw = _setup(H)
    ref_solve = jax.jit(
        make_sqp_solver(pred_core, cost, backward="assoc", **kw)
    )
    mesh = make_mesh(axis_names=("horizon",))
    sh_solve = make_horizon_sharded_sqp_solver(
        pred_core, cost, mesh=mesh, **kw
    )

    rng = np.random.default_rng(0)
    for trial in range(2):
        x0 = jnp.asarray(
            rng.uniform(-1, 1, 4) * np.array([2.0, 0.5, 0.5, 0.5])
        )
        xs_g = jnp.zeros((H + 1, 4)).at[0].set(x0)
        us_g = jnp.zeros((H, 1))
        xs_r, us_r = ref_solve({}, x0, xs_g, us_g)
        xs_s, us_s = sh_solve({}, x0, xs_g, us_g)
        np.testing.assert_allclose(
            np.asarray(xs_s), np.asarray(xs_r), rtol=1e-6, atol=1e-8,
            err_msg=f"trial {trial} states",
        )
        np.testing.assert_allclose(
            np.asarray(us_s), np.asarray(us_r), rtol=1e-6, atol=1e-8,
            err_msg=f"trial {trial} controls",
        )


def test_horizon_sharded_long_horizon_runs_and_descends():
    """H=2000 solve over the 8-device mesh: the sharded program
    compiles, runs, and reduces the merit function (a long-horizon
    swing-and-stabilize that a per-knot host NLP would not touch)."""
    H = 2000
    pred_core, cost, kw = _setup(H)
    kw["sqp_iters"] = 3
    mesh = make_mesh(axis_names=("horizon",))
    solve = make_horizon_sharded_sqp_solver(
        pred_core, cost, mesh=mesh, **kw
    )
    x0 = jnp.array([3.0, 0.0, 0.0, 0.0])
    xs_g = jnp.zeros((H + 1, 4)).at[0].set(x0)
    us_g = jnp.zeros((H, 1))
    xs, us = solve({}, x0, xs_g, us_g)
    xs = np.asarray(xs)
    us = np.asarray(us)
    assert np.isfinite(xs).all() and np.isfinite(us).all()
    # The solution must beat the zero-control guess on the objective.
    def objective(xs_, us_):
        oc = sum(float(cost.eval_obs_cost(jnp.asarray(x))) for x in xs_)
        cc = sum(float(cost.eval_ctrl_cost(jnp.asarray(u))) for u in us_)
        return 0.05 * (oc + cc)

    # Compare on a subsample for speed (the full objective is O(H)
    # host calls); subsampled stage costs are a faithful proxy.
    idx = np.arange(0, H, 50)
    obj_sol = np.sum(
        [float(cost.eval_obs_cost(jnp.asarray(xs[i]))) for i in idx]
    )
    obj_guess = len(idx) * float(
        cost.eval_obs_cost(jnp.asarray(x0))
    )
    assert obj_sol < obj_guess


def test_horizon_sharded_sqp_xbounds_matches_single_device():
    """Observation box constraints (the AL treatment added round 3,
    control/nmpc.py) under horizon sharding == single device: same
    multipliers schedule, same expansions, different layout."""
    H = 16
    pred_core, cost, kw = _setup(H)
    kw = dict(kw, sqp_iters=16)
    xb = (
        jnp.array([-jnp.inf, -0.12, -jnp.inf, -jnp.inf]),
        jnp.array([jnp.inf, 0.12, jnp.inf, jnp.inf]),
    )
    ref_solve = jax.jit(make_sqp_solver(
        pred_core, cost, backward="assoc", xbounds=xb, **kw
    ))
    mesh = make_mesh(axis_names=("horizon",))
    sh_solve = make_horizon_sharded_sqp_solver(
        pred_core, cost, mesh=mesh, xbounds=xb, **kw
    )
    unb_solve = jax.jit(make_sqp_solver(
        pred_core, cost, backward="assoc", **kw
    ))

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(
        rng.uniform(-1, 1, 4) * np.array([2.0, 0.5, 0.5, 0.5])
    )
    xs_g = jnp.zeros((H + 1, 4)).at[0].set(x0)
    us_g = jnp.zeros((H, 1))
    xs_u, _ = unb_solve({}, x0, xs_g, us_g)
    # The fixture only means something if the bound binds.
    assert float(jnp.max(jnp.abs(xs_u[1:, 1]))) > 0.15
    xs_r, us_r = ref_solve({}, x0, xs_g, us_g)
    xs_s, us_s = sh_solve({}, x0, xs_g, us_g)
    assert float(jnp.max(jnp.abs(np.asarray(xs_s)[1:, 1]))) < 0.12 + 5e-3
    # AL hinge boundaries can amplify layout reassociation on single
    # knife-edge elements (measured: one control element at 7e-8 abs);
    # slightly looser than the unconstrained parity test.
    np.testing.assert_allclose(
        np.asarray(xs_s), np.asarray(xs_r), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(us_s), np.asarray(us_r), rtol=1e-5, atol=1e-6,
    )
