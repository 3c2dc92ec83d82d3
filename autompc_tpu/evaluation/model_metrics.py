"""Model accuracy metrics.

Re-creates the reference metrics (reference:
autompc/evaluation/model_metrics.py:133-231): k-step open-loop RMSE and
RMSMENS (root mean squared model error, normalized step-wise). The
k-step rollout is a ``lax.scan`` over the horizon with all start points
batched (the reference loops ``pred_batch`` per step from Python); the
whole metric jits.

The reference's ``get_model_rmsmens`` calls a nonexistent
``pred_parallel`` (model_metrics.py:223 — stale); here it is implemented
against the ``pred_batch`` semantics it intends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.trajectory import batch as traj_batch


def _kstep_rollout(model, traj, horizon):
    """Roll every start point of a trajectory ``horizon`` steps open-loop.
    Returns (pred_final, pred_prev) model-state arrays of shape
    (T - horizon, state_dim)."""
    params = model.params
    if hasattr(model, "traj_to_states"):
        states = model.traj_to_states(traj[: traj.size - horizon])
    else:
        states = jnp.asarray(traj.obs[: traj.size - horizon])
    ctrls = jnp.asarray(traj.ctrls)
    T = traj.size

    def step(carry, k):
        state, prev = carry
        u = jax.lax.dynamic_slice_in_dim(ctrls, k, T - horizon, axis=0)
        new = jax.vmap(lambda s, uu: model.pred_core(params, s, uu))(state, u)
        return (new, state), None

    (final, prev), _ = jax.lax.scan(
        step, (states, states), jnp.arange(horizon)
    )
    return final, prev


def get_model_rmse(model, trajs, horizon=1):
    """Unnormalized k-step RMSE (model_metrics.py:133-164 semantics,
    including the reference's obs_dim scaling of the mean)."""
    sqerrss = []
    for traj in trajs:
        final, _ = _kstep_rollout(model, traj, horizon)
        pred_obs = final[:, : model.system.obs_dim]
        actual = jnp.asarray(traj.obs[horizon:])
        sqerrss.append(np.asarray((pred_obs - actual) ** 2))
    sqerrs = np.concatenate(sqerrss)
    return float(np.sqrt(np.mean(sqerrs) * model.system.obs_dim))


def get_model_rmsmens(model, trajs, horizon=1):
    """RMSMENS (model_metrics.py:166-231): error between predicted and
    actual final-step *deltas*, normalized by the element-wise std of
    one-step deltas over the data."""
    dY = np.concatenate(
        [np.asarray(traj.obs[1:]) - np.asarray(traj.obs[:-1]) for traj in trajs]
    )
    dy_means = dY.mean(axis=0)
    dy_std = dY.std(axis=0)
    dy_std = np.where(dy_std > 1e-12, dy_std, 1.0)

    sqerrss = []
    n = model.system.obs_dim
    for traj in trajs:
        final, prev = _kstep_rollout(model, traj, horizon)
        pred_deltas = np.asarray(final[:, :n] - prev[:, :n])
        act_deltas = np.asarray(traj.obs[horizon:]) - np.asarray(
            traj.obs[horizon - 1 : traj.size - 1]
        )
        norm_pred = (pred_deltas - dy_means) / dy_std
        norm_act = (act_deltas - dy_means) / dy_std
        sqerrss.append((norm_pred - norm_act) ** 2)
    sqerrs = np.concatenate(sqerrss)
    return float(np.sqrt(np.mean(sqerrs)))


def get_model_rmse_batch(model, tb, horizon=1):
    """TrajectoryBatch fast path: one jitted computation over all
    trajectories (used by the tuner's inner loop)."""
    tb = traj_batch(tb)
    params = model.params
    n = model.system.obs_dim
    T = tb.max_len

    def per_traj(obs, ctrls, length):
        if hasattr(model, "traj_to_states"):
            from ..core.trajectory import Trajectory

            states = model.traj_to_states(
                Trajectory(model.system, T, obs, ctrls)
            )[: T - horizon]
        else:
            states = obs[: T - horizon]

        def step(state_k, k):
            state, _ = state_k
            u = jax.lax.dynamic_slice_in_dim(ctrls, k, T - horizon, axis=0)
            new = jax.vmap(lambda s, uu: model.pred_core(params, s, uu))(state, u)
            return (new, state), None

        (final, _), _ = jax.lax.scan(
            step, (states, states), jnp.arange(horizon)
        )
        errs = (final[:, :n] - obs[horizon:]) ** 2
        valid = (jnp.arange(T - horizon) + horizon) < length
        return jnp.sum(errs * valid[:, None]), jnp.sum(valid) * n

    sums, counts = jax.vmap(per_traj)(tb.obs, tb.ctrls, tb.lengths)
    return jnp.sqrt(jnp.sum(sums) / jnp.sum(counts) * n)
