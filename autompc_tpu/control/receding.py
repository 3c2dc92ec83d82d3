"""Device-resident receding-horizon MPC loop.

The reference runs MPC as a host loop — one ``controller.run`` call per
plant step, re-entering Python between steps
(autompc/utils/simulation.py:52-63, autompc/control/ilqr.py:267-295).
On TPU that shape is dispatch-bound: each step pays the host->device
round-trip (~25 ms over the axon tunnel; PERF.md), which both dwarfs the
per-step compute and hides it from measurement.

``make_receding_ilqr_loop`` instead compiles the WHOLE closed loop —
N plant steps, each containing a full iLQR solve — into one device
program (``lax.scan`` over steps, ``lax.while_loop`` inside the solve),
vmapped over a lane batch. This is simultaneously:

* the deployment shape (one dispatch per episode, not per step);
* the honest latency measurement (per-step cost = episode time / N,
  with the tunnel amortized away);
* the quality gate for the headline bench (closed-loop swing-up
  success rate + task cost can't silently degrade under kernel work).

Semantics per step mirror the reference controller's default path
(reuse_feedback=0, recompute every step, ilqr.py:267-295): solve from
the current plant state, apply ``us[0]`` (the reference's
``u0 + K0 @ (state - x0)`` with ``x0 == state`` exactly), advance the
true plant. ``warm_start=True`` seeds each solve with the previous
solution shifted one step (the reference uses a zero guess every
recompute; warm starting is the deployment norm — its DT controller
warm-starts the same way, nmpc.py:320-325 — and is the default here;
set False for step-exact reference parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ilqr import make_ilqr_solver


def make_receding_ilqr_loop(
    pred_core,
    cost,
    plant_step,
    H: int,
    ds: int,
    dc: int,
    obsdim: int,
    dt: float,
    n_steps: int,
    ubounds=None,
    warm_start: bool = True,
    max_iter: int = 50,
    **solver_kw,
):
    """Build ``run(params, x0s (B, ds)) -> (xs (B, n_steps+1, ds),
    us (B, n_steps, dc), n_converged (B,))``.

    ``pred_core(params, x, u)`` is the controller's (learned) model;
    ``plant_step(x, u)`` is the true dynamics the loop rolls forward —
    the surrogate-vs-truth split of the reference's ``simulate``
    (utils/simulation.py:54-58). ``n_converged`` counts plant steps
    whose inner solve reported convergence (a solver-health signal for
    the bench quality gate).
    """
    solve = make_ilqr_solver(
        pred_core,
        cost,
        H=H,
        ds=ds,
        dc=dc,
        obsdim=obsdim,
        dt=dt,
        ubounds=ubounds,
        max_iter=max_iter,
        **solver_kw,
    )

    def run_one(params, x0):
        def step(carry, _):
            x, uguess = carry
            converged, xs, us, Ks, ks = solve(params, x, uguess)
            u = us[0]
            x1 = plant_step(x, u)
            next_guess = (
                jnp.concatenate([us[1:], jnp.zeros((1, dc), us.dtype)])
                if warm_start
                else jnp.zeros((H, dc), us.dtype)
            )
            return (x1, next_guess), (x1, u, converged)

        (xT, _), (xs1, us, conv) = jax.lax.scan(
            step, (x0, jnp.zeros((H, dc), x0.dtype)), None, length=n_steps
        )
        xs = jnp.concatenate([x0[None], xs1], axis=0)
        return xs, us, jnp.sum(conv.astype(jnp.int32))

    def run(params, x0s):
        return jax.vmap(lambda x0: run_one(params, x0))(x0s)

    return run
