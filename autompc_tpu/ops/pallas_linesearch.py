"""Pallas TPU kernel: batched iLQR line-search rollouts.

The line search rolls all ``L`` step sizes of every batched solve
through the dynamics for the full horizon — the hot loop of the iLQR
solve once the backward pass runs as a kernel (ops/pallas_riccati.py).
This kernel keeps the rolling state **resident in VMEM** across the
horizon and evaluates the dynamics features inline:

* layout is lanes-last over the solve batch (TB = 128 lanes) with a
  block of alphas as sublanes; the (batch-blocks x alpha-blocks) grid
  keeps each program's VMEM footprint (notably the (H+1, ds, L_blk, TB)
  output window) inside the 16 MB budget;
* the model must be *linear in features* with per-scalar feature terms
  (discrete-time SINDy/Koopman form): the library's scalar term
  functions are traced directly over (L_blk, TB) slabs via a
  component-indexed virtual input, so one kernel generator serves every
  library configuration;
* any number of control dims: control clipping and the feedback law
  ``u_j = alpha k_j + ubar_j + K_j . (x - xbar)`` are fused into the
  same step, one register slab per control component.

Matches ``make_ilqr_solver``'s vmapped line search up to f32
reassociation (tests pin it against the scan path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _VecZ:
    """Component-indexed virtual input: term functions written against a
    scalar vector ``z`` (z[i] -> scalar) evaluate over (L_blk, TB)
    slabs."""

    def __init__(self, comps):
        self._comps = comps

    def __getitem__(self, i):
        return self._comps[i]


def _ls_kernel(term_fns, ds, dc, H, L_blk,
               x0_ref, xs_ref, us_ref, Ks_ref, ks_ref, coeffs_ref,
               alphas_ref, umin_ref, umax_ref,
               out_xs_ref, out_us_ref):
    """Block shapes (lanes last):
    x0 (ds, TB), xs (H, ds, TB), us (H, dc, TB), Ks (H, dc, ds, TB),
    ks (H, dc, TB), coeffs (ds, F) [SMEM], alphas (L, 1) [SMEM],
    umin/umax (dc, 1) [SMEM],
    outs: out_xs (H+1, L_blk, ds, TB), out_us (H, L_blk, dc, TB)."""
    TB = x0_ref.shape[-1]
    F = coeffs_ref.shape[1]
    l0 = pl.program_id(1) * L_blk
    alphas = [alphas_ref[l0 + l, 0] for l in range(L_blk)]

    # x state: list of ds arrays, each (L_blk, TB).
    x = [
        jnp.broadcast_to(x0_ref[i][None, :], (L_blk, TB)) for i in range(ds)
    ]
    for i in range(ds):
        out_xs_ref[0, :, i] = x[i]

    alpha_col = jnp.stack(alphas)[:, None]  # (L_blk, 1)
    umin = [umin_ref[j, 0] for j in range(dc)]
    umax = [umax_ref[j, 0] for j in range(dc)]

    def body(t, x_tuple):
        x = list(x_tuple)
        xbar = [xs_ref[t, i] for i in range(ds)]   # (TB,)

        # u_j = alpha*k_j + ubar_j + K_j.(x - xbar), clipped.
        dx = [x[i] - xbar[i][None, :] for i in range(ds)]
        u = []
        for j in range(dc):
            fb = sum(Ks_ref[t, j, i][None, :] * dx[i] for i in range(ds))
            uj = alpha_col * ks_ref[t, j][None, :] + us_ref[t, j][None, :] + fb
            u.append(jnp.clip(uj, umin[j], umax[j]))

        # Features over z = [x..., u...] as (L_blk, TB) slabs.
        z = _VecZ(x + u)
        theta = [fn(z) for fn in term_fns]  # F slabs

        def tree_sum(vals):
            # Balanced summation: sequential left-fold over ~55 f32
            # terms loses enough precision to visibly change iLQR
            # convergence rates vs the XLA scan path.
            while len(vals) > 1:
                nxt = [
                    vals[i] + vals[i + 1]
                    for i in range(0, len(vals) - 1, 2)
                ]
                if len(vals) % 2:
                    nxt.append(vals[-1])
                vals = nxt
            return vals[0]

        x_new = [
            tree_sum([coeffs_ref[i, k] * theta[k] for k in range(F)])
            for i in range(ds)
        ]

        for i in range(ds):
            out_xs_ref[t + 1, :, i] = x_new[i]
        for j in range(dc):
            out_us_ref[t, :, j] = u[j]
        return tuple(x_new)

    jax.lax.fori_loop(0, H, body, tuple(x))


@functools.partial(
    jax.jit, static_argnames=("term_fns", "block_b", "block_l", "interpret")
)
def pallas_sindy_line_search(
    term_fns, x0, xs, us, Ks, ks, coeffs, alphas, umin, umax,
    block_b: int = 128, block_l: int = 5, interpret: bool = False,
):
    """Batched line-search rollouts for a linear-in-features model.

    Parameters
    ----------
    term_fns : tuple of scalar term functions (FeatureLibrary._fns) —
        static (hashable) so each library compiles its own kernel
    x0 : (B, ds), xs : (B, H+1, ds), us : (B, H, dc),
    Ks : (B, H, dc, ds), ks : (B, H, dc), coeffs : (ds, F),
    alphas : (L,), umin/umax : scalars or (dc,) vectors
    block_b : lanes per program (TPU requires a multiple of 128 or the
        full batch)
    block_l : alphas per program (controls the VMEM output window)

    Returns (ls_xs (B, L, H+1, ds), ls_us (B, L, H, dc)).
    """
    B, Hp1, ds = xs.shape
    H = Hp1 - 1
    dc = us.shape[-1]
    L = alphas.shape[0]
    TB = min(block_b, B)
    if B % TB != 0:
        raise ValueError(f"batch {B} not divisible by block {TB}")
    L_blk = min(block_l, L)
    if L % L_blk != 0:
        raise ValueError(f"alphas {L} not divisible by block {L_blk}")

    x0T = jnp.transpose(x0, (1, 0))                    # (ds, B)
    xsT = jnp.transpose(xs[:, :H], (1, 2, 0))          # (H, ds, B)
    usT = jnp.transpose(us, (1, 2, 0))                 # (H, dc, B)
    KsT = jnp.transpose(Ks, (1, 2, 3, 0))              # (H, dc, ds, B)
    ksT = jnp.transpose(ks, (1, 2, 0))                 # (H, dc, B)
    alphas2 = alphas[:, None].astype(xs.dtype)
    umin2 = jnp.broadcast_to(
        jnp.asarray(umin, dtype=xs.dtype).reshape(-1, 1), (dc, 1)
    )
    umax2 = jnp.broadcast_to(
        jnp.asarray(umax, dtype=xs.dtype).reshape(-1, 1), (dc, 1)
    )

    kernel = functools.partial(_ls_kernel, term_fns, ds, dc, H, L_blk)
    grid = (B // TB, L // L_blk)

    def vspec(prefix):
        nd = len(prefix)
        return pl.BlockSpec(
            prefix + (TB,), lambda i, j, nd=nd: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    out_xsT, out_usT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec((ds,)), vspec((H, ds)), vspec((H, dc)),
            vspec((H, dc, ds)), vspec((H, dc)),
            sspec(coeffs.shape), sspec((L, 1)),
            sspec((dc, 1)), sspec((dc, 1)),
        ],
        out_specs=(
            # ds (== full dim) sits second-to-last so the Mosaic tiling
            # constraint (last two dims div (8,128) or full) is met with
            # a partial alpha block.
            pl.BlockSpec(
                (H + 1, L_blk, ds, TB),
                lambda i, j: (0, j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (H, L_blk, dc, TB),
                lambda i, j: (0, j, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H + 1, L, ds, B), xs.dtype),
            jax.ShapeDtypeStruct((H, L, dc, B), xs.dtype),
        ),
        interpret=interpret,
    )(x0T, xsT, usT, KsT, ksT, coeffs.astype(xs.dtype), alphas2,
      umin2, umax2)

    ls_xs = jnp.transpose(out_xsT, (3, 1, 0, 2))       # (B, L, H+1, ds)
    ls_us = jnp.transpose(out_usT, (3, 1, 0, 2))       # (B, L, H, dc)
    return ls_xs, ls_us
