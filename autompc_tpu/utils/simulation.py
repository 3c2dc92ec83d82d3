"""Closed-loop simulation driver.

Re-creates the reference ``simulate`` (reference:
autompc/utils/simulation.py:11-64) as a single fused ``lax.scan`` over the
episode: controller step + dynamics/surrogate prediction run entirely on
device, with no per-step host round trips. Trajectory layout matches the
reference: obs has one more valid row than ctrls, the final control row is
zero, and with a num-steps termination condition the returned trajectory
has exactly ``num_steps`` rows.

For custom (host-side) termination conditions or non-traceable dynamics
callables the driver falls back to a per-step Python loop around the
jitted controller step, preserving exact reference semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.trajectory import Trajectory, extend, zeros


def _steps_hint(term_cond, max_steps):
    """If the termination condition is the Task.set_num_steps marker
    (task.py:42-56), the episode length is known statically."""
    ns = getattr(term_cond, "_ampc_num_steps", None)
    if ns is not None:
        return min(max_steps, ns - 1)
    return None


def rollout_scan(step_fn, advance_fn, cstate0, init_obs, n_steps):
    """Pure closed-loop rollout: returns (obs[(n+1), n_obs], ctrls[n, m]).

    step_fn: (cstate, obs) -> (u, cstate)
    advance_fn: (obs, u) -> next_obs
    """

    def body(carry, _):
        cstate, obs = carry
        u, cstate = step_fn(cstate, obs)
        next_obs = advance_fn(obs, u)
        return (cstate, next_obs), (obs, u)

    (cstate, last_obs), (obs_seq, ctrl_seq) = jax.lax.scan(
        body, (cstate0, init_obs), None, length=n_steps
    )
    all_obs = jnp.concatenate([obs_seq, last_obs[None]], axis=0)
    return all_obs, ctrl_seq, cstate


def simulate(
    controller,
    init_obs,
    term_cond: Optional[Callable] = None,
    dynamics: Optional[Callable] = None,
    sim_model=None,
    max_steps: int = 10000,
    silent: bool = True,
) -> Trajectory:
    """Simulate a controller against a dynamics function or a surrogate
    model (reference API simulation.py:11-64).

    Parameters
    ----------
    controller : Controller
    init_obs : array of size system.obs_dim
    term_cond : Trajectory -> bool; if created by Task.set_num_steps the
        rollout compiles to one fixed-length scan.
    dynamics : (obs, ctrl) -> next_obs (jax-traceable for the scan path)
    sim_model : Model used when dynamics is None
    max_steps : maximum number of simulation steps
    """
    del silent  # no progress bars on device
    if dynamics is None and sim_model is None:
        raise ValueError("Must specify dynamics function or simulation model")

    system = controller.system
    init_obs = jnp.asarray(init_obs, dtype=jnp.result_type(float))
    seed_traj = zeros(system, 1).set_obs(0, init_obs)
    cstate0 = controller.traj_to_state(seed_traj)

    if dynamics is None:
        sim_params = sim_model.params
        simstate0 = sim_model.traj_to_state(seed_traj)

        def advance(carry_obs, u, simstate):
            new_simstate = sim_model.pred_core(sim_params, simstate, u)
            return new_simstate[: system.obs_dim], new_simstate

    n_fixed = _steps_hint(term_cond, max_steps)
    if term_cond is None:
        n_fixed = max_steps

    if n_fixed is not None:
        # --- fused scan path ---------------------------------------
        if dynamics is None:

            def body(carry, _):
                cstate, obs, simstate = carry
                u, cstate = controller.step(cstate, obs)
                next_obs, simstate = advance(obs, u, simstate)
                return (cstate, next_obs, simstate), (obs, u)

            carry0 = (cstate0, init_obs, simstate0)
        else:

            def body(carry, _):
                cstate, obs = carry
                u, cstate = controller.step(cstate, obs)
                next_obs = dynamics(obs, u)
                return (cstate, next_obs), (obs, u)

            carry0 = (cstate0, init_obs)

        try:
            carry, (obs_seq, ctrl_seq) = jax.lax.scan(
                body, carry0, None, length=n_fixed
            )
        except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
            return _simulate_python(
                controller, init_obs, term_cond, dynamics, sim_model, max_steps
            )
        last_obs = carry[1]
        all_obs = jnp.concatenate([obs_seq, last_obs[None]], axis=0)
        all_ctrls = jnp.concatenate(
            [ctrl_seq, jnp.zeros((1, system.ctrl_dim), dtype=ctrl_seq.dtype)], axis=0
        )
        return Trajectory(system, n_fixed + 1, all_obs, all_ctrls)

    # --- host-checked fallback (custom term_cond) -------------------
    return _simulate_python(
        controller, init_obs, term_cond, dynamics, sim_model, max_steps
    )


def _simulate_python(controller, init_obs, term_cond, dynamics, sim_model, max_steps):
    """Per-step loop with host termination checks; mirrors
    simulation.py:42-64 exactly."""
    system = controller.system
    sim_traj = zeros(system, 1).set_obs(0, jnp.asarray(init_obs))
    x = jnp.asarray(init_obs)
    cstate = controller.traj_to_state(sim_traj)
    if dynamics is None:
        sim_params = sim_model.params
        simstate = sim_model.traj_to_state(sim_traj)
        pred = jax.jit(sim_model.pred_core)

    step = jax.jit(controller.step)
    for _ in range(max_steps):
        u, cstate = step(cstate, sim_traj[-1].obs)
        if dynamics is None:
            simstate = pred(sim_params, simstate, u)
            x = simstate[: system.obs_dim]
        else:
            x = jnp.asarray(dynamics(np.asarray(x), np.asarray(u)))
        sim_traj = sim_traj.set_ctrl(-1, u)
        sim_traj = extend(
            sim_traj, x[None], jnp.zeros((1, system.ctrl_dim))
        )
        if term_cond is not None and term_cond(sim_traj):
            break
    return sim_traj
