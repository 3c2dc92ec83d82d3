"""Pallas TPU kernel: batched iLQR line-search rollouts for MLP models.

The SINDy line-search kernel (ops/pallas_linesearch.py) keeps the whole
horizon window in VMEM — fine at cartpole dims, impossible at
halfcheetah scale (a (H, dc, ds, TB) feedback-gain window alone is
~11 MB). This kernel therefore uses the same time-streamed layout as
the general backward kernel (ops/pallas_riccati.py:
pallas_tvlqr_backward_general): a ``(batch-blocks, H)`` grid whose
second axis streams one time slice per cell through the double-buffered
Pallas pipeline, with the rolling state carried in VMEM scratch across
cells. Replaces the XLA-scan line search's ~H sequential micro-kernel
dispatches with one kernel launch.

Model semantics are exactly ``MLP.pred_core`` (sysid/mlp.py:284-289)
with the z-scoring FOLDED into the first/last layers
(``fold_mlp_params``), so the in-kernel network is a plain
``act(x W + b)`` stack and ``pred(x, u) = x + net([x; u])``.

All compute is lanes-last slab arithmetic — state components and
hidden units are (L, TB) slabs, weights are SMEM scalars — vectorizing
over (alphas x lanes) on the VPU, the same style as the rest of the
kernel family. Matches ``make_ilqr_solver``'s vmapped line search up to
f32 reassociation (test-pinned).

Reference hot path being replaced: autompc/control/ilqr.py:196-205 at
halfcheetah dims (18 obs / 6 ctrl, MLP dynamics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACT = {
    "relu": lambda a: jnp.maximum(a, 0.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "selu": jax.nn.selu,
}


def _tree_sum(vals):
    """Balanced summation (matches ops/pallas_linesearch.py — f32
    left-folds over many terms visibly shift knife-edge acceptance)."""
    vals = list(vals)
    while len(vals) > 1:
        nxt = [vals[i] + vals[i + 1] for i in range(0, len(vals) - 1, 2)]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def fold_mlp_params(params, nonlintype):
    """Fold the MLP's z-scoring into its first/last layers.

    ``MLP.pred_core`` computes ``x + (net((xu - m)/s) * dy_std +
    dy_means)``; with ``W1' = W1 / s[:, None]``, ``b1' = b1 - (m/s) W1``
    and ``W_L' = W_L * dy_std[None, :]``, ``b_L' = b_L * dy_std +
    dy_means`` the same function is a plain stack over raw ``[x; u]``.
    Returns a tuple of (W, b) pairs. (Pure jnp — folds at trace time
    inside the jitted solver body at negligible cost.)
    """
    net = params["net"]
    s = params["xu_std"]
    m = params["xu_means"]
    layers = [(jnp.asarray(la["W"]), jnp.asarray(la["b"])) for la in net]
    W1, b1 = layers[0]
    layers[0] = (W1 / s[:, None], b1 - (m / s) @ W1)
    WL, bL = layers[-1]
    layers[-1] = (
        WL * params["dy_std"][None, :],
        bL * params["dy_std"] + params["dy_means"],
    )
    del nonlintype  # semantics only; folding is activation-agnostic
    return tuple(layers)


def _mlp_ls_kernel(ds, dc, L, widths, nonlin,
                   x0_ref, xs_ref, us_ref, Ks_ref, ks_ref,
                   alphas_ref, umin_ref, umax_ref, *refs):
    """One (batch-block, t) grid cell.

    Per-cell shapes (lanes last): x0 (ds, TB), xs (1, ds, TB),
    us (1, dc, TB), Ks (1, dc, ds, TB), ks (1, dc, TB);
    alphas (L, 1), umin/umax (dc, 1) [SMEM]; then per layer W
    (n_in, n_out) + b (n_out, 1) [SMEM]; outs out_xs (1, L, ds, TB),
    out_us (1, L, dc, TB); scratch x_s (ds, L, TB)."""
    n_layers = len(widths) - 1
    w_refs = refs[: 2 * n_layers]
    out_xs_ref, out_us_ref = refs[2 * n_layers: 2 * n_layers + 2]
    x_s = refs[2 * n_layers + 2]
    act = _ACT[nonlin]
    TB = x0_ref.shape[-1]
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        for i in range(ds):
            x_s[i] = jnp.broadcast_to(x0_ref[i][None, :], (L, TB))

    x = [x_s[i] for i in range(ds)]
    alphas = [alphas_ref[l, 0] for l in range(L)]
    alpha_col = jnp.stack(alphas)[:, None]              # (L, 1)

    # Feedback law u_j = clip(alpha k_j + ubar_j + K_j . (x - xbar)).
    dx = [x[i] - xs_ref[0, i][None, :] for i in range(ds)]
    u = []
    for j in range(dc):
        fb = _tree_sum([Ks_ref[0, j, i][None, :] * dx[i]
                        for i in range(ds)])
        u_j = alpha_col * ks_ref[0, j][None, :] + us_ref[0, j][None, :] + fb
        u.append(jnp.clip(u_j, umin_ref[j, 0], umax_ref[j, 0]))

    # Plain MLP over [x; u] (z-scoring pre-folded into the weights).
    z = x + u                                            # ds + dc slabs
    for li in range(n_layers):
        W_ref = w_refs[2 * li]
        b_ref = w_refs[2 * li + 1]
        n_in, n_out = widths[li], widths[li + 1]
        h = []
        for k in range(n_out):
            acc = _tree_sum([W_ref[c, k] * z[c] for c in range(n_in)])
            acc = acc + b_ref[k, 0]
            h.append(acc if li == n_layers - 1 else act(acc))
        z = h
    x_new = [x[i] + z[i] for i in range(ds)]

    for i in range(ds):
        x_s[i] = x_new[i]
        out_xs_ref[0, :, i] = x_new[i]
    for j in range(dc):
        out_us_ref[0, :, j] = u[j]


def _mlp_ls_kernel_feat(ds, dc, L, widths, nonlin, precision,
                        x0_ref, xs_ref, us_ref, Ks_ref, ks_ref,
                        alphas_ref, umin_ref, umax_ref, *refs):
    """Feature-major MXU variant: SLAB data movement (lanes = batch,
    every streamed array dense — none of the mxu layout's 7x lane
    padding) with the per-hidden-unit VPU FMA loops replaced by real
    ``dot_general``s on TRANSPOSED weights: for each alpha, each layer
    is one (n_out, n_in) x (n_in, TB) matmul with the batch as the MXU
    N dimension. The state dim only pads SUBLANES (18 -> 24, 1.33x)
    instead of lanes (18 -> 128, 7.1x) — the fix for VERDICT r3 item 1.

    Weights arrive pre-split (W1x (ds, n_out), W1u (dc, n_out), then
    (W (n_in, n_out), b (n_out, 1)) per remaining layer) so the kernel
    never slices sublanes at unaligned offsets.

    Per-cell shapes: x0 (ds, TB), xs (1, ds, TB), us (1, dc, TB),
    Ks (1, dc, ds, TB), ks (1, dc, TB); alphas (L, 1), umin/umax
    (dc, 1) [SMEM]; outs out_xs (1, L, ds, TB), out_us (1, L, dc, TB);
    scratch x_s (L, ds, TB)."""
    n_layers = len(widths) - 1
    w_refs = refs[: 2 * n_layers + 1]          # W1x, W1u, b1, (W, b)*
    out_xs_ref, out_us_ref = refs[2 * n_layers + 1: 2 * n_layers + 3]
    x_s = refs[2 * n_layers + 3]
    act = _ACT[nonlin]
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        for l in range(L):
            x_s[l] = x0_ref[...]

    xbar = xs_ref[0]                           # (ds, TB)
    ubar = us_ref[0]                           # (dc, TB)
    kvec = ks_ref[0]                           # (dc, TB)
    K = Ks_ref[0]                              # (dc, ds, TB)
    W1x_ref, W1u_ref, b1_ref = w_refs[0], w_refs[1], w_refs[2]

    def mm(W_T, z):
        # (n_in, n_out) contracted with (n_in, TB) -> (n_out, TB).
        return jax.lax.dot_general(
            W_T, z, (((0,), (0,)), ((), ())),
            preferred_element_type=z.dtype,
            precision=precision,
        )

    for l in range(L):
        x = x_s[l]                             # (ds, TB)
        alpha = alphas_ref[l, 0]
        dx = x - xbar
        u_rows = []
        for j in range(dc):
            fb = jnp.sum(K[j] * dx, axis=0, keepdims=True)   # (1, TB)
            u_j = alpha * kvec[j][None, :] + ubar[j][None, :] + fb
            u_rows.append(jnp.clip(u_j, umin_ref[j, 0], umax_ref[j, 0]))
        u = jnp.concatenate(u_rows, axis=0)    # (dc, TB)

        a = mm(W1x_ref[...], x) + mm(W1u_ref[...], u) + b1_ref[...]
        h = a if n_layers == 1 else act(a)
        for li in range(1, n_layers):
            W_ref, b_ref = w_refs[2 * li + 1], w_refs[2 * li + 2]
            a = mm(W_ref[...], h) + b_ref[...]
            h = a if li == n_layers - 1 else act(a)
        x_new = x + h                          # (ds, TB)

        x_s[l] = x_new
        out_xs_ref[0, l] = x_new
        out_us_ref[0, l] = u


def _mlp_ls_kernel_feat3(ds, dc, L, widths, nonlin,
                         x0_ref, xs_ref, us_ref, Ks_ref, ks_ref,
                         alphas_ref, umin_ref, umax_ref, *refs):
    """bf16x3 variant of the feat kernel: Mosaic's dot_general lowers
    only DEFAULT and HIGHEST precisions, so the 3-pass f32 emulation
    (hi*hi + hi*lo + lo*hi, dropping the ~2^-16-scaled lo*lo term) is
    spelled out with bf16 operands and f32 accumulation — half the MXU
    passes of HIGHEST at ~2^-21 relative matmul error (vs bf16's 2^-8).
    Weight hi/lo splits are precomputed by the driver; activations
    split in-kernel (two cheap VPU ops per layer).

    Weight refs: W1x_hi, W1x_lo, W1u_hi, W1u_lo, b1, then
    (W_hi, W_lo, b) per remaining layer. Everything else matches
    _mlp_ls_kernel_feat."""
    n_layers = len(widths) - 1
    n_w = 5 + 3 * (n_layers - 1)
    w_refs = refs[:n_w]
    out_xs_ref, out_us_ref = refs[n_w: n_w + 2]
    x_s = refs[n_w + 2]
    act = _ACT[nonlin]
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        for l in range(L):
            x_s[l] = x0_ref[...]

    xbar = xs_ref[0]
    ubar = us_ref[0]
    kvec = ks_ref[0]
    K = Ks_ref[0]

    def d(A, B):
        return jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    def mm3(Whi, Wlo, z):
        z_hi = z.astype(jnp.bfloat16)
        z_lo = (z - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return d(Whi, z_hi) + (d(Whi, z_lo) + d(Wlo, z_hi))

    for l in range(L):
        x = x_s[l]
        alpha = alphas_ref[l, 0]
        dx = x - xbar
        u_rows = []
        for j in range(dc):
            fb = jnp.sum(K[j] * dx, axis=0, keepdims=True)
            u_j = alpha * kvec[j][None, :] + ubar[j][None, :] + fb
            u_rows.append(jnp.clip(u_j, umin_ref[j, 0], umax_ref[j, 0]))
        u = jnp.concatenate(u_rows, axis=0)

        a = (
            mm3(w_refs[0][...], w_refs[1][...], x)
            + mm3(w_refs[2][...], w_refs[3][...], u)
            + w_refs[4][...]
        )
        h = a if n_layers == 1 else act(a)
        for li in range(1, n_layers):
            base = 5 + 3 * (li - 1)
            a = mm3(
                w_refs[base][...], w_refs[base + 1][...], h
            ) + w_refs[base + 2][...]
            h = a if li == n_layers - 1 else act(a)
        x_new = x + h

        x_s[l] = x_new
        out_xs_ref[0, l] = x_new
        out_us_ref[0, l] = u


def _mlp_ls_kernel_mxu(ds, dc, L, widths, nonlin, precision,
                       x0_ref, xs_ref, us_ref, Ks_ref, ks_ref,
                       alphar_ref, umin_ref, umax_ref, *refs):
    """MXU-layout variant: rows = (alphas x lanes) flattened, lanes =
    feature dim, so the MLP layers run as real f32 ``dot_general``s on
    the MXU instead of per-hidden-unit VPU slab FMAs.

    Mosaic constraints shape the data movement: no lane-collapsing
    reshapes (only leading-dim merges/splits with the minor dim
    intact), no full-array SMEM loads — so the per-row alpha column
    arrives precomputed as an (R, 1) VMEM input, reductions keep dims,
    and outputs are written as (L, TB, d) leading-dim splits.

    Per-cell shapes (feature-minor): x0 (TB, ds), xs (1, TB, ds),
    us (1, TB, dc), Ks (1, TB, dc, ds), ks (1, TB, dc),
    alpha rows (R, 1); weights VMEM (n_in, n_out) + biases (1, n_out);
    outs out_xs (1, 1, L, TB, ds), out_us (1, 1, L, TB, dc);
    scratch x_s (R, ds)."""
    n_layers = len(widths) - 1
    w_refs = refs[: 2 * n_layers]
    out_xs_ref, out_us_ref = refs[2 * n_layers: 2 * n_layers + 2]
    x_s = refs[2 * n_layers + 2]
    act = _ACT[nonlin]
    TB = x0_ref.shape[0]
    R = L * TB
    t_idx = pl.program_id(1)

    def bcast(a):
        # (TB, d) -> (R, d): leading-dim broadcast + merge (minor dim
        # untouched — the Mosaic-supported reshape family).
        return jnp.broadcast_to(a[None], (L,) + a.shape).reshape(
            R, a.shape[-1]
        )

    @pl.when(t_idx == 0)
    def _init():
        x_s[...] = bcast(x0_ref[...])

    x = x_s[...]                                        # (R, ds)
    alpha_r = alphar_ref[...]                           # (R, 1)

    dx = x - bcast(xs_ref[0])
    ubar = bcast(us_ref[0])                             # (R, dc)
    kvec = bcast(ks_ref[0])                             # (R, dc)
    u_cols = []
    for j in range(dc):
        fb = jnp.sum(dx * bcast(Ks_ref[0, :, j, :]), axis=1,
                     keepdims=True)                     # (R, 1)
        u_j = alpha_r * kvec[:, j:j + 1] + ubar[:, j:j + 1] + fb
        u_cols.append(jnp.clip(u_j, umin_ref[j, 0], umax_ref[j, 0]))

    # First layer: split W1 into state and control rows so no lane
    # concatenation feeds the matmul — u contributes dc rank-1 updates.
    W1_ref, b1_ref = w_refs[0], w_refs[1]
    a1 = jax.lax.dot_general(
        x, W1_ref[:ds, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=precision,
    )
    for j in range(dc):
        a1 = a1 + u_cols[j] * W1_ref[ds + j, :][None, :]
    a1 = a1 + b1_ref[0][None, :]
    # A single-layer net's only layer IS the output layer — no
    # activation (matches pred_core / the slab kernel; ADVICE r3).
    h = a1 if n_layers == 1 else act(a1)
    for li in range(1, n_layers):
        W_ref, b_ref = w_refs[2 * li], w_refs[2 * li + 1]
        a = jax.lax.dot_general(
            h, W_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=h.dtype,
            precision=precision,
        ) + b_ref[0][None, :]
        h = a if li == n_layers - 1 else act(a)
    x_new = x + h

    x_s[...] = x_new
    out_xs_ref[0, 0] = x_new.reshape(L, TB, ds)
    U = jnp.concatenate(u_cols, axis=1)                 # (R, dc)
    out_us_ref[0, 0] = U.reshape(L, TB, dc)


@functools.partial(
    jax.jit,
    static_argnames=("nonlin", "block_b", "interpret", "layout",
                     "precision"),
)
def pallas_mlp_line_search(
    layers, nonlin, x0, xs, us, Ks, ks, alphas, umin, umax,
    block_b: int = 128, interpret: bool = False, layout: str = "slab",
    precision: str = "highest",
):
    """Batched line-search rollouts for an MLP dynamics model.

    Parameters
    ----------
    layers : tuple of (W (n_in, n_out), b (n_out,)) — the FOLDED stack
        from ``fold_mlp_params`` (z-scoring absorbed)
    nonlin : activation name (static)
    x0 (B, ds), xs (B, H+1, ds), us (B, H, dc), Ks (B, H, dc, ds),
    ks (B, H, dc), alphas (L,), umin/umax scalars or (dc,)
    layout : "slab" (VPU FMAs, dense), "mxu" (rows = alphas x lanes,
        feature-minor — 7x lane padding at small ds), or "feat" (slab
        data movement + transposed-weight MXU matmuls; the dense
        honest-f32 option, VERDICT r3 item 1)
    precision : matmul precision for the mxu/feat layouts — "highest"
        (6-pass f32), "default" (single bf16 pass), or "bf16x3" (feat
        only: manual 3-pass f32 emulation, ~2^-21 rel matmul error)

    Returns (ls_xs (B, L, H+1, ds), ls_us (B, L, H, dc)), matching
    ``jax.vmap(line_search_one)`` (control/ilqr.py) up to f32
    reassociation.
    """
    B, Hp1, ds = xs.shape
    H = Hp1 - 1
    dc = us.shape[-1]
    L = alphas.shape[0]
    TB = min(block_b, B)
    if B % TB != 0:
        raise ValueError(f"batch {B} not divisible by block {TB}")
    widths = tuple([ds + dc] + [b.shape[0] for _, b in layers])
    if widths[-1] != ds:
        raise ValueError(
            f"MLP output width {widths[-1]} != state dim {ds}"
        )

    # Mosaic lowers only DEFAULT and HIGHEST dot precisions; "bf16x3"
    # (feat layout only) is a manual 3-pass f32 emulation in-kernel.
    if precision == "bf16x3" and layout != "feat":
        raise ValueError("precision='bf16x3' requires layout='feat'")
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "bf16x3": jax.lax.Precision.HIGHEST,  # unused by feat3 kernel
    }[precision]
    if layout == "mxu":
        return _mlp_line_search_mxu(
            layers, nonlin, x0, xs, us, Ks, ks, alphas, umin, umax,
            widths, TB, interpret, prec,
        )
    if layout not in ("slab", "feat"):
        raise ValueError(f"unknown layout {layout!r}")

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
    w_ins = []
    w_specs = []

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if layout == "feat":
        # Transposed-weight MXU matmuls: first layer pre-split into
        # state/control row blocks (no unaligned sublane slicing
        # in-kernel), biases as (n_out, 1) lane-broadcast columns, all
        # in VMEM (they feed dot_general).
        W1, b1 = layers[0]

        def hi_lo(W):
            Whi = W.astype(jnp.bfloat16)
            return Whi, (W - Whi.astype(W.dtype)).astype(jnp.bfloat16)

        if precision == "bf16x3":
            w_ins = [
                *hi_lo(W1[:ds].astype(xs.dtype)),
                *hi_lo(W1[ds:].astype(xs.dtype)),
                b1.astype(xs.dtype).reshape(-1, 1),
            ]
            for W, b in layers[1:]:
                w_ins.extend(hi_lo(W.astype(xs.dtype)))
                w_ins.append(b.astype(xs.dtype).reshape(-1, 1))
            kernel = functools.partial(
                _mlp_ls_kernel_feat3, ds, dc, L, widths, nonlin
            )
        else:
            w_ins = [
                W1[:ds].astype(xs.dtype), W1[ds:].astype(xs.dtype),
                b1.astype(xs.dtype).reshape(-1, 1),
            ]
            for W, b in layers[1:]:
                w_ins.append(W.astype(xs.dtype))
                w_ins.append(b.astype(xs.dtype).reshape(-1, 1))
            kernel = functools.partial(
                _mlp_ls_kernel_feat, ds, dc, L, widths, nonlin, prec
            )
        w_specs = [wspec(w.shape) for w in w_ins]
    else:
        for W, b in layers:
            w_ins.append(W.astype(xs.dtype))
            w_ins.append(b.astype(xs.dtype).reshape(-1, 1))
        kernel = functools.partial(
            _mlp_ls_kernel, ds, dc, L, widths, nonlin
        )
    grid = (B // TB, H)

    def tspec(shape_mid):
        nd = len(shape_mid)
        return pl.BlockSpec(
            (1,) + shape_mid + (TB,),
            lambda b, t, nd=nd: (t,) + (0,) * nd + (b,),
            memory_space=pltpu.VMEM,
        )

    def cspec(shape_prefix):
        nd = len(shape_prefix)
        return pl.BlockSpec(
            shape_prefix + (TB,),
            lambda b, t, nd=nd: (0,) * nd + (b,),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    if layout != "feat":
        for W, b in layers:
            w_specs.append(sspec(W.shape))
            w_specs.append(sspec((b.shape[0], 1)))

    out_xsT, out_usT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            cspec((ds,)), tspec((ds,)), tspec((dc,)),
            tspec((dc, ds)), tspec((dc,)),
            sspec((L, 1)), sspec((dc, 1)), sspec((dc, 1)),
            *w_specs,
        ],
        out_specs=(
            tspec((L, ds)),
            tspec((L, dc)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, L, ds, B), xs.dtype),
            jax.ShapeDtypeStruct((H, L, dc, B), xs.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (L, ds, TB) if layout == "feat" else (ds, L, TB),
                xs.dtype,
            )
        ],
        interpret=interpret,
    )(x0T, xsT, usT, KsT, ksT, alphas2, umin2, umax2, *w_ins)

    ls_xs1 = jnp.transpose(out_xsT, (3, 1, 0, 2))      # (B, L, H, ds)
    ls_us = jnp.transpose(out_usT, (3, 1, 0, 2))       # (B, L, H, dc)
    x0_row = jnp.broadcast_to(x0[:, None, None, :], (B, L, 1, ds))
    ls_xs = jnp.concatenate([x0_row, ls_xs1], axis=2)  # (B, L, H+1, ds)
    return ls_xs, ls_us


def _mlp_line_search_mxu(layers, nonlin, x0, xs, us, Ks, ks, alphas,
                         umin, umax, widths, TB, interpret, precision):
    """Feature-minor driver for the MXU kernel (see
    _mlp_ls_kernel_mxu). Same contract as the slab layout."""
    B, Hp1, ds = xs.shape
    H = Hp1 - 1
    dc = us.shape[-1]
    L = alphas.shape[0]
    R = L * TB
    NB = B // TB

    xsT = jnp.transpose(xs[:, :H], (1, 0, 2))          # (H, B, ds)
    usT = jnp.transpose(us, (1, 0, 2))                 # (H, B, dc)
    KsT = jnp.transpose(Ks, (1, 0, 2, 3))              # (H, B, dc, ds)
    ksT = jnp.transpose(ks, (1, 0, 2))                 # (H, B, dc)
    # Per-row alpha column for the kernel's (alphas x lanes) row order.
    alpha_rows = jnp.broadcast_to(
        alphas.astype(xs.dtype)[:, None, None], (L, TB, 1)
    ).reshape(R, 1)
    umin2 = jnp.broadcast_to(
        jnp.asarray(umin, dtype=xs.dtype).reshape(-1, 1), (dc, 1)
    )
    umax2 = jnp.broadcast_to(
        jnp.asarray(umax, dtype=xs.dtype).reshape(-1, 1), (dc, 1)
    )
    w_ins = []
    for W, b in layers:
        w_ins.append(W.astype(xs.dtype))
        w_ins.append(b.astype(xs.dtype).reshape(1, -1))

    kernel = functools.partial(
        _mlp_ls_kernel_mxu, ds, dc, L, widths, nonlin, precision
    )
    grid = (NB, H)

    def tspec(shape_tail):
        nd = len(shape_tail)
        return pl.BlockSpec(
            (1, TB) + shape_tail[1:],
            lambda b, t: (t, b) + (0,) * (nd - 1),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_xsT, out_usT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, ds), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),      # x0
            tspec((TB, ds)), tspec((TB, dc)),
            tspec((TB, dc, ds)), tspec((TB, dc)),
            wspec((R, 1)), sspec((dc, 1)), sspec((dc, 1)),
            *[wspec(w.shape) for w in w_ins],
        ],
        out_specs=(
            pl.BlockSpec((1, 1, L, TB, ds),
                         lambda b, t: (t, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, TB, dc),
                         lambda b, t: (t, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((H, NB, L, TB, ds), xs.dtype),
            jax.ShapeDtypeStruct((H, NB, L, TB, dc), xs.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((R, ds), xs.dtype)],
        interpret=interpret,
    )(x0, xsT, usT, KsT, ksT, alpha_rows, umin2, umax2, *w_ins)

    # (H, NB, L, TB, d) -> (NB, TB, L, H, d) -> (B, L, H, d).
    ls_xs1 = jnp.transpose(out_xsT, (1, 3, 2, 0, 4)).reshape(
        B, L, H, ds
    )
    ls_us = jnp.transpose(out_usT, (1, 3, 2, 0, 4)).reshape(
        B, L, H, dc
    )
    x0_row = jnp.broadcast_to(x0[:, None, None, :], (B, L, 1, ds))
    ls_xs = jnp.concatenate([x0_row, ls_xs1], axis=2)
    return ls_xs, ls_us
