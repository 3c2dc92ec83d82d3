"""Bucketed (shape-padded) batch training for shape-changing model
hyperparameters.

The reference tuner retrains one model per SMAC iteration
(reference: autompc/tuning/model_tuner.py:104-115 via
holdout_evaluator.py:112-121); hyperparameters like the ARX history
window change array shapes, which on TPU would mean one compiled
training program per candidate. This module removes that recompile
storm for ARX: every history candidate is padded to the maximum window
``kmax``, the padding is a per-candidate COLUMN MASK on the shared
feature matrix, and all candidates train through one vmapped masked
least-squares solve and score through one vmapped k-step-RMSE metric —
a single compiled program for the whole 1..kmax bucket, reused across
every ask() batch.

Exactness: zeroed feature columns contribute nothing to the residual
and the SVD minimum-norm solution zeroes their coefficients, so the
padded candidate's predictions equal the unpadded ARX(history=k)
model's (test-pinned).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.trajectory import batch as traj_batch
from ..ops.lstsq import masked_lstsq


def _arx_feature_col_mask(n, m, kmax, k):
    """0/1 mask over the padded ARX feature vector
    ``[obs, (obs, ctrl) x (kmax-1), 1, ctrl]`` keeping exactly the
    columns an ARX(history=k) model uses (sysid/arx.py state layout)."""
    f = 1 + kmax * (n + m)
    mask = np.zeros(f)
    mask[:n] = 1.0
    blk = n + m
    for i in range(1, k):
        mask[n + (i - 1) * blk : n + i * blk] = 1.0
    mask[-(1 + m):] = 1.0
    return mask


def make_arx_bucket_program(system, kmax: int, horizon: int = 1):
    """Build ``evaluate(train_tb_arrays, holdout_tb_arrays, col_masks)
    -> rmses`` — one jitted program that trains every column-masked ARX
    candidate and scores its k-step holdout RMSE.

    All candidates share the padded state layout of ARX(history=kmax):
    ``ds = n + (kmax-1)(n+m) + 1``; per-candidate companion matrices
    differ only in the coefficient rows.
    """
    from ..sysid.arx import ARX

    n, m = system.obs_dim, system.ctrl_dim
    arx = ARX(system, kmax)
    ds = arx.state_dim
    f = arx._fvec_size()
    blk = n + m

    # Fixed companion structure (sysid/arx.py:_assemble_companion), with
    # the coefficient rows left zero; filled per candidate inside jit.
    A_base = np.zeros((ds, ds))
    B_base = np.zeros((ds, m))
    A_base[-1, -1] = 1.0
    if kmax > 1:
        A_base[n : 2 * n, 0:n] = np.eye(n)
    for i in range(kmax - 2):
        A_base[
            (i + 1) * blk + n : (i + 2) * blk + n,
            i * blk + n : (i + 1) * blk + n,
        ] = np.eye(blk)
    if 2 * n + m <= ds:
        B_base[2 * n : 2 * n + m, :] = np.eye(m)
    A_base = jnp.asarray(A_base)
    B_base = jnp.asarray(B_base)

    def evaluate(train_obs, train_ctrls, train_mask,
                 hold_obs, hold_ctrls, hold_lengths, col_masks):
        """train_obs (Bt, T, n), train_ctrls (Bt, T, m), train_mask
        (Bt, T) valid-transition mask; hold_* the holdout batch;
        col_masks (C, f). Returns (C,) RMSEs."""
        feats = jax.vmap(arx._all_features)(train_obs, train_ctrls)
        targets = jnp.roll(train_obs, -1, axis=1)
        A_mat = feats.reshape(-1, f)
        y = targets.reshape(-1, n)
        rmask = train_mask.reshape(-1)

        def fit_one(cmask):
            coeffs = masked_lstsq(A_mat * cmask[None, :], y, rmask).T
            A = A_base.at[0:n, :].set(coeffs[:, :-m])
            B = B_base.at[0:n, :].set(coeffs[:, -m:])
            return A, B

        As, Bs = jax.vmap(fit_one)(col_masks)          # (C, ds, ds/m)

        T = hold_obs.shape[1]
        hold_states = jax.vmap(
            lambda o, c: arx._all_features(o, c)[:, : f - m]
        )(hold_obs, hold_ctrls)[:, : T - horizon]       # (Bh, T-h, ds)

        def rmse_one(A, B):
            def per_traj(states, obs, ctrls, length):
                def step(carry, k):
                    state, _ = carry
                    u = jax.lax.dynamic_slice_in_dim(
                        ctrls, k, T - horizon, axis=0
                    )
                    new = jnp.einsum("ij,tj->ti", A, state) + jnp.einsum(
                        "ij,tj->ti", B, u
                    )
                    return (new, state), None

                (final, _), _ = jax.lax.scan(
                    step, (states, states), jnp.arange(horizon)
                )
                errs = (final[:, :n] - obs[horizon:]) ** 2
                valid = (jnp.arange(T - horizon) + horizon) < length
                return jnp.sum(errs * valid[:, None]), jnp.sum(valid) * n

            sums, counts = jax.vmap(per_traj)(
                hold_states, hold_obs, hold_ctrls, hold_lengths
            )
            return jnp.sqrt(jnp.sum(sums) / jnp.sum(counts) * n)

        return jax.vmap(rmse_one)(As, Bs), As, Bs

    return jax.jit(evaluate)


class ARXBucketEvaluator:
    """Caches the jitted bucket program and the staged train/holdout
    arrays for a (training_set, holdout, horizon) triple; maps a list of
    history values to holdout RMSEs in one device call."""

    def __init__(self, system, training_set, holdout, kmax: int = 10,
                 horizon: int = 1):
        self.system = system
        self.kmax = int(kmax)
        self.horizon = int(horizon)
        self._program = make_arx_bucket_program(
            system, self.kmax, horizon=self.horizon
        )
        tb_train = traj_batch(training_set)
        tb_hold = traj_batch(holdout)
        self._train_args = (
            tb_train.obs, tb_train.ctrls, tb_train.step_mask(),
        )
        self._hold_args = (tb_hold.obs, tb_hold.ctrls, tb_hold.lengths)
        n, m = system.obs_dim, system.ctrl_dim
        self._masks = jnp.asarray(np.stack([
            _arx_feature_col_mask(n, m, self.kmax, k)
            for k in range(1, self.kmax + 1)
        ]))

    def __call__(self, ks):
        """ks: iterable of history values (1..kmax). Returns a list of
        float RMSEs aligned with ks."""
        ks = list(ks)
        col_masks = self._masks[jnp.asarray([k - 1 for k in ks])]
        rmses, _, _ = self._program(
            *self._train_args, *self._hold_args, col_masks
        )
        out = np.asarray(rmses)
        return [
            float(v) if np.isfinite(v) else float("inf") for v in out
        ]
