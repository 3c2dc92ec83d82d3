"""Device-resident receding-horizon loop (control/receding.py).

Pins the one-dispatch closed loop against a host-driven loop calling the
same per-step solve — the scan/vmap wiring must not change any step's
result. The per-step solve itself is parity-pinned to the executed
reference implementation in test_reference_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autompc_tpu.benchmarks.cartpole import dt_cartpole_dynamics
from autompc_tpu.control.ilqr import make_ilqr_solver
from autompc_tpu.control.receding import make_receding_ilqr_loop
from autompc_tpu.core import System
from autompc_tpu.costs import QuadCost


def _setup():
    dt = 0.05
    system = System(["theta", "omega", "x", "dx"], ["u"], dt=dt)
    plant = lambda x, u: dt_cartpole_dynamics(x, u, dt)
    pred_core = lambda params, x, u: plant(x, u)
    cost = QuadCost(
        system,
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        0.01 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        goal=jnp.zeros(4),
    )
    ubounds = (jnp.array([-20.0]), jnp.array([20.0]))
    return system, plant, pred_core, cost, ubounds


@pytest.mark.parametrize("warm_start", [False, True])
def test_receding_loop_matches_host_loop(warm_start):
    system, plant, pred_core, cost, ubounds = _setup()
    H, n_steps, B = 10, 12, 2

    run = jax.jit(
        make_receding_ilqr_loop(
            pred_core, cost, plant,
            H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
            n_steps=n_steps, ubounds=ubounds, warm_start=warm_start,
        )
    )
    solve = jax.jit(
        make_ilqr_solver(
            pred_core, cost, H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
            ubounds=ubounds,
        )
    )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, 4)) * np.array([2.0, 0.5, 0.5, 0.5])
    )
    xs_dev, us_dev, nconv = run({}, x0s)

    for b in range(B):
        x = x0s[b]
        guess = jnp.zeros((H, 1))
        for t in range(n_steps):
            conv, xs_s, us_s, Ks, ks = solve({}, x, guess)
            u = us_s[0]
            np.testing.assert_allclose(
                np.asarray(us_dev[b, t]), np.asarray(u), rtol=1e-9,
                atol=1e-12, err_msg=f"lane {b} step {t} control",
            )
            x = plant(x, u)
            np.testing.assert_allclose(
                np.asarray(xs_dev[b, t + 1]), np.asarray(x), rtol=1e-9,
                atol=1e-12, err_msg=f"lane {b} step {t} state",
            )
            guess = (
                jnp.concatenate([us_s[1:], jnp.zeros((1, 1))])
                if warm_start
                else jnp.zeros((H, 1))
            )


class _TrueModel:
    """Minimal model stub whose prediction IS the plant (state = obs)."""

    params = {}

    def __init__(self, system, plant):
        self.system = system
        self.state_dim = system.obs_dim
        self._plant = plant

    def pred_core(self, params, x, u):
        return self._plant(x, u)


def test_receding_mppi_loop_matches_host_loop():
    """make_receding_mppi_loop == a host loop over the same per-step
    pieces (identical PRNG chain), lane for lane."""
    from autompc_tpu.control.mppi import MPPI
    from autompc_tpu.control.receding import make_receding_mppi_loop
    from autompc_tpu.core.task import Task

    system, plant, pred_core, cost, ubounds = _setup()
    model = _TrueModel(system, plant)
    task = Task(system)
    task.set_cost(cost)
    task.set_ctrl_bound("u", -20.0, 20.0)
    H, n_steps, B, n_path, seed = 6, 8, 2, 32, 3
    kwargs = dict(horizon=H, num_path=n_path, sigma=1.0, lmda=0.5)

    run = jax.jit(
        make_receding_mppi_loop(
            system, task, model, plant, n_steps=n_steps, seed=seed,
            **kwargs,
        )
    )
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, 4)) * np.array([2.0, 0.5, 0.5, 0.5])
    )
    xs_dev, us_dev = run(model.params, x0s)
    assert xs_dev.shape == (B, n_steps + 1, 4)
    assert us_dev.shape == (B, n_steps, 1)

    mppi = MPPI(system, task, model, **kwargs)
    for b in range(B):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), b)
        key, k0 = jax.random.split(key)
        seq = jnp.sqrt(mppi.sigma) * jax.random.normal(k0, (H, 1))
        x = x0s[b]
        for t in range(n_steps):
            seq = jnp.concatenate([seq[1:], seq[-1:]], axis=0)
            key, k_noise = jax.random.split(key)
            costs, eps = mppi._do_rollouts(model.params, x, seq, k_noise)
            seq = mppi._update_sequence(seq, costs, eps)
            u = seq[0] * mppi._ctrl_scale
            np.testing.assert_allclose(
                np.asarray(us_dev[b, t]), np.asarray(u), rtol=1e-6,
                atol=1e-9, err_msg=f"lane {b} step {t} control",
            )
            x = plant(x, u)
            np.testing.assert_allclose(
                np.asarray(xs_dev[b, t + 1]), np.asarray(x), rtol=1e-6,
                atol=1e-9, err_msg=f"lane {b} step {t} state",
            )


@pytest.mark.parametrize("warm_start", [False, True])
def test_receding_sqp_loop_matches_host_loop(warm_start):
    """make_receding_sqp_loop == a host loop over the same SQP solve
    with the same warm-start rule (reference nmpc.py:320-325)."""
    from autompc_tpu.control.nmpc import make_sqp_solver
    from autompc_tpu.control.receding import make_receding_sqp_loop

    system, plant, pred_core, cost, ubounds = _setup()
    H, n_steps, B = 6, 6, 2
    kw = dict(H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
              ubounds=ubounds, sqp_iters=4)

    run = jax.jit(
        make_receding_sqp_loop(
            pred_core, cost, plant, n_steps=n_steps,
            warm_start=warm_start, **kw,
        )
    )
    solve = jax.jit(make_sqp_solver(pred_core, cost, **kw))

    rng = np.random.default_rng(2)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, 4)) * np.array([1.0, 0.3, 0.3, 0.3])
    )
    xs_dev, us_dev = run({}, x0s)

    for b in range(B):
        x = x0s[b]
        xs_g = jnp.zeros((H + 1, 4))
        us_g = jnp.zeros((H, 1))
        for t in range(n_steps):
            xs_s, us_s = solve({}, x, xs_g.at[0].set(x), us_g)
            u = us_s[0]
            np.testing.assert_allclose(
                np.asarray(us_dev[b, t]), np.asarray(u), rtol=1e-7,
                atol=1e-10, err_msg=f"lane {b} step {t} control",
            )
            x = plant(x, u)
            np.testing.assert_allclose(
                np.asarray(xs_dev[b, t + 1]), np.asarray(x), rtol=1e-7,
                atol=1e-10, err_msg=f"lane {b} step {t} state",
            )
            if warm_start:
                xs_g = jnp.concatenate([xs_s[1:], xs_s[-1:]], axis=0)
                us_g = jnp.concatenate([us_s[1:], us_s[-1:]], axis=0)
            else:
                xs_g = jnp.zeros((H + 1, 4))
                us_g = jnp.zeros((H, 1))


def test_receding_loop_stabilizes_from_small_angle():
    """Closed-loop sanity: from a near-upright start the MPC loop must
    drive theta/omega inside the benchmark's 0.2 threshold."""
    system, plant, pred_core, cost, ubounds = _setup()
    run = jax.jit(
        make_receding_ilqr_loop(
            pred_core, cost, plant,
            H=20, ds=4, dc=1, obsdim=4, dt=system.dt,
            n_steps=60, ubounds=ubounds,
        )
    )
    x0s = jnp.array([[0.6, 0.0, 0.0, 0.0], [-0.5, 0.3, 0.2, 0.0]])
    xs, us, nconv = run({}, x0s)
    finals = np.asarray(xs[:, -1])
    assert np.all(np.abs(finals[:, 0]) < 0.2), finals
    assert np.all(np.abs(finals[:, 1]) < 0.2), finals
