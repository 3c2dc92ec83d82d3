"""Pallas TPU kernel: batched dynamics relinearization for
linear-in-features models.

Relinearizing the accepted trajectory is the single most expensive
phase of the batched iLQR iteration (tools/profile_ilqr_phases.py:
51% of the body at B=16384, H=200 — more than the backward pass and
line search combined). It is pure data-parallel work — Jacobians
``J(x_t, u_t) = coeffs @ dTheta/dz`` at every (lane, step) — but under
XLA both the jacfwd formulation and the analytic
``FeatureLibrary.jacobian`` einsum are layout-bound: every array
involved has a tiny trailing dim (ds=4, d=5), so the VPU runs at a few
percent of a 128-lane register.

This kernel computes the same Jacobians in the lanes-last layout of the
other iLQR kernels (ops/pallas_riccati.py, ops/pallas_linesearch.py):
each (i, d) Jacobian entry is a (TH, TB) slab of batch lanes x horizon
steps, so every op fills whole vector registers. Per-term gradients
come from ``jax.jvp`` of the library's scalar term functions with a
one-hot tangent per input component — terms that do not touch a
component contribute symbolic-zero tangents that never materialize, so
the sparsity of the basis (identity/trig/interaction terms each touch
1-2 components) is exploited at trace time for free.

There is no sequential dependence (unlike the backward pass), so the
grid tiles BOTH the batch and the horizon; any (B, H) divisible into
(TB, TH) blocks runs fully parallel across TPU cores.

Replaces the reference's per-model hand-written ``pred_diff_batch``
loops (autompc/sysid/sindy.py:226-244, autompc/sysid/arx.py:146-159)
on the solver hot path. Correctness is pinned to jacfwd by
tests/test_pallas_relin.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_linesearch import _tree_sum, _VecZ


def _relin_kernel(term_fns, grad_terms, ds, dc,
                  xs_ref, us_ref, coeffs_ref, jac_ref):
    """One (horizon-block, batch-block) tile. Shapes (lanes last):
    xs (TH, ds, TB), us (TH, dc, TB), coeffs (ds, F) [SMEM],
    out jac (TH, ds, d, TB) with d = ds + dc."""
    d = ds + dc
    F = coeffs_ref.shape[1]
    comps = [xs_ref[:, i] for i in range(ds)] + [
        us_ref[:, j] for j in range(dc)
    ]  # each (TH, TB)

    if grad_terms is not None:
        # Sparse analytic gradients (FeatureLibrary.grad_terms): for
        # each input component, evaluate ONLY the terms with a nonzero
        # partial — the repeated sin/cos subexpressions across terms
        # are structurally identical and CSE away. ~5x fewer slab ops
        # than jvp-per-direction at the cartpole trig library.
        z = _VecZ(comps)
        for dd in range(d):
            slabs = [
                (k, gfn(z))
                for k, entries in enumerate(grad_terms)
                for (ci, gfn) in entries
                if ci == dd
            ]
            for i in range(ds):
                vals = [coeffs_ref[i, k] * g for k, g in slabs]
                total = _tree_sum(vals) if vals else 0.0
                # Constant-gradient terms (identity basis) contribute
                # SMEM scalars; broadcast to the slab shape on write.
                jac_ref[:, i, dd] = jnp.broadcast_to(
                    jnp.asarray(total, comps[0].dtype), comps[0].shape
                )
        return

    for dd in range(d):

        def g(c, dd=dd):
            z = _VecZ([comps[k] if k != dd else c for k in range(d)])
            return tuple(fn(z) for fn in term_fns)

        # One-hot jvp with the OTHER components closed over: terms not
        # involving component dd differentiate to symbolic zeros that
        # never materialize, so the basis sparsity (identity/trig/
        # interaction terms touch 1-2 components) is exploited at trace
        # time. (A jax.linearize formulation that shares the primal
        # trace across directions measured 2x SLOWER: with every
        # component a tangent input, each direction pays the full dense
        # linear pass — sparsity beats primal reuse here, and Mosaic
        # CSEs the repeated primal sin/cos across directions anyway.)
        _, dtheta = jax.jvp(
            g, (comps[dd],), (jnp.ones_like(comps[dd]),)
        )
        for i in range(ds):
            jac_ref[:, i, dd] = _tree_sum(
                [coeffs_ref[i, k] * dtheta[k] for k in range(F)]
            )


def _pick_block_h(H: int, block_h: int) -> int:
    """Largest divisor of H that is <= block_h."""
    for th in range(min(block_h, H), 0, -1):
        if H % th == 0:
            return th
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "term_fns", "grad_terms", "block_b", "block_h", "interpret",
    ),
)
def pallas_feature_jacobians(
    term_fns, xs, us, coeffs, grad_terms=None,
    block_b: int = 1024, block_h: int = 8, interpret: bool = False,
):
    """Batched dynamics Jacobians for a linear-in-features model.

    Parameters
    ----------
    term_fns : tuple of scalar term functions (FeatureLibrary._fns) —
        static (hashable) so each library compiles its own kernel
    xs : (B, H+1, ds) or (B, H, ds) trajectory states (only the first H
        rows are linearization points)
    us : (B, H, dc) controls
    coeffs : (ds, F) model coefficients shared across lanes, or
        (B, ds, F) PER-LANE coefficients (joint tuning fan-out: one
        trained model per candidate lane; rides VMEM lanes-last, the
        kernel body is unchanged — each (i, k) read becomes a (TB,)
        lane vector that broadcasts against the (TH, TB) slabs)
    grad_terms : optional static tuple of per-term ((comp, grad_fn),
        ...) sparse analytic gradients (FeatureLibrary.grad_terms);
        when given, each Jacobian column evaluates only the nonzero
        partials instead of a jvp per direction (~1.7x at the
        cartpole trig library)
    block_b : lanes per program (multiple of 128, or the full batch).
        Bigger tiles amortize per-program overhead on the sequential
        TPU grid — measured at B=16384, H=200 (ms/call, sparse grads):
        128 lanes 24.0, 256 16.9, 512 13.6, 1024 **10.9**; past
        (1024, 8) the double-buffered output window exceeds scoped
        VMEM.
    block_h : horizon steps per program (rounded down to a divisor of H)

    Returns ``(Jx (B, H, ds, ds), Ju (B, H, ds, dc))`` matching
    ``jax.jacfwd`` of ``pred = coeffs @ theta([x, u])`` per point.
    """
    B, _, ds = xs.shape
    dc = us.shape[-1]
    H = us.shape[1]
    d = ds + dc
    TB = min(block_b, B)
    if B % TB != 0:
        raise ValueError(f"batch {B} not divisible by block {TB}")
    TH = _pick_block_h(H, block_h)

    xsT = jnp.transpose(xs[:, :H], (1, 2, 0))          # (H, ds, B)
    usT = jnp.transpose(us, (1, 2, 0))                 # (H, dc, B)

    kernel = functools.partial(_relin_kernel, term_fns, grad_terms, ds, dc)
    grid = (B // TB, H // TH)

    def vspec(mid):
        nd = len(mid)
        return pl.BlockSpec(
            (TH,) + mid + (TB,),
            lambda i, j, nd=nd: (j,) + (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    if coeffs.ndim == 3:
        # Per-lane coefficients: (ds, F, TB) VMEM blocks over the batch
        # grid axis (constant across the horizon axis).
        coeffs_in = jnp.transpose(coeffs, (1, 2, 0)).astype(xs.dtype)
        coeffs_spec = pl.BlockSpec(
            coeffs.shape[1:] + (TB,),
            lambda i, j: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        coeffs_in = coeffs.astype(xs.dtype)
        coeffs_spec = pl.BlockSpec(
            coeffs.shape, lambda i, j: (0, 0),
            memory_space=pltpu.SMEM,
        )

    jacT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec((ds,)),
            vspec((dc,)),
            coeffs_spec,
        ],
        out_specs=vspec((ds, d)),
        out_shape=jax.ShapeDtypeStruct((H, ds, d, B), xs.dtype),
        interpret=interpret,
    )(xsT, usT, coeffs_in)

    jac = jnp.transpose(jacT, (3, 0, 1, 2))            # (B, H, ds, d)
    return jac[..., :ds], jac[..., ds:]
