"""Compiled-on-TPU numerics check for every Pallas kernel family, with
a machine-checkable pass stamp (VERDICT r4 item 8).

Folds the manually-run tools (check_general_backward_tpu.py,
check_relin_accuracy.py) into ONE pass/fail artifact: each kernel runs
COMPILED on the real chip against an honest f32 reference
(highest-matmul-precision XLA scan / jacfwd), max relative errors are
compared to thresholds set ~10x above the measured-good values
(PERF.md: general backward 1.2e-4 at the cheetah shape; relin at f32
roundoff for bounded states), and tools/kernel_stamp.py records the
result keyed to a hash of the kernel sources.
tests/test_kernel_stamp.py keeps the suite red when the stamp is stale
or failed.

Run on the TPU host:  python tools/check_kernels_tpu.py  (~3 min warm)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kernel_stamp import write_stamp  # noqa: E402


def rel_err(a, b, floor=1e-3):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), floor)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    results, passed = {}, True

    def record(name, err, thresh):
        nonlocal passed
        ok = bool(err <= thresh)
        passed = passed and ok
        results[name] = {
            "max_rel_err": float(f"{err:.3e}"), "threshold": thresh,
            "pass": ok,
        }
        print(
            f"[{'PASS' if ok else 'FAIL'}] {name}: {err:.2e} "
            f"(thresh {thresh:.0e})",
            flush=True,
        )

    t_start = time.perf_counter()

    # ---- 1. general backward (cheetah shape) vs HIGHEST scan --------
    from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward_general
    from autompc_tpu.ops.riccati import tvlqr_backward_scan

    B, H, ds, dc = 512, 200, 18, 6
    rng = np.random.default_rng(0)
    Jx = jnp.asarray(rng.normal(size=(B, H, ds, ds)) * 0.1, jnp.float32)
    Ju = jnp.asarray(rng.normal(size=(B, H, ds, dc)) * 0.3, jnp.float32)
    Cxx = jnp.asarray(
        np.broadcast_to(np.eye(ds), (B, H, ds, ds)).copy(), jnp.float32
    )
    M = rng.normal(size=(B, H, dc, dc)) * 0.2
    Cuu = jnp.asarray(
        M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(dc), jnp.float32
    )
    cx = jnp.asarray(rng.normal(size=(B, H, ds)), jnp.float32)
    cu = jnp.asarray(rng.normal(size=(B, H, dc)), jnp.float32)
    Vn = jnp.asarray(
        np.broadcast_to(2 * np.eye(ds), (B, ds, ds)).copy(), jnp.float32
    )
    vn = jnp.asarray(rng.normal(size=(B, ds)), jnp.float32)
    args = (Jx, Ju, Cxx, Cuu, cx, cu, Vn, vn)
    out_p = pallas_tvlqr_backward_general(*args, block_b=256)
    with jax.default_matmul_precision("highest"):
        out_s = jax.jit(jax.vmap(tvlqr_backward_scan))(*args)
    jax.block_until_ready((out_p, out_s))
    record(
        "backward_general_B512_H200_ds18_dc6",
        max(rel_err(a, b) for a, b in zip(out_p, out_s)),
        2e-3,  # measured 1.2e-4 (PERF.md); 10x+ headroom
    )

    # ---- 2. cartpole SINDy relin kernel vs highest-precision jacfwd -
    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.ops.pallas_relin import pallas_feature_jacobians
    from autompc_tpu.sysid import SINDy

    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        b.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    params = model.params
    Br, Hr = 256, 8

    def jacfwd_ref(xs, us):
        def one(x, u):
            jx = jax.jacfwd(lambda s: model.pred_core(params, s, u))(x)
            ju = jax.jacfwd(lambda uu: model.pred_core(params, x, uu))(u)
            return jx, ju

        return jax.vmap(jax.vmap(one))(xs[:, :Hr], us)

    fns = tuple(model.library._fns)
    worst = 0.0
    for scale in (1.0, 3.0, 10.0):  # bounded-state regime (PERF.md:
        # Mosaic transcendentals at |x| >> 2pi diverge from XLA's —
        # known, documented, and outside the solver's operating range)
        xs = jnp.asarray(rng.uniform(-scale, scale, (Br, Hr + 1, 4)),
                         jnp.float32)
        us = jnp.asarray(rng.uniform(-20, 20, (Br, Hr, 1)), jnp.float32)
        Jx_p, Ju_p = pallas_feature_jacobians(
            fns, xs, us, model.coeffs, block_b=Br
        )
        with jax.default_matmul_precision("highest"):
            Jx_r, Ju_r = jax.jit(jacfwd_ref)(xs, us)
        jax.block_until_ready((Jx_p, Jx_r))
        worst = max(worst, rel_err(Jx_p, Jx_r), rel_err(Ju_p, Ju_r))
    record("relin_sindy_cartpole_bounded", worst, 1e-4)

    # ---- 3. wide backward (cast + reshape IO) vs the loop kernel ----
    from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward_quad_ll

    Bw, Hw = 4096, 200
    jac_p = jnp.asarray(
        rng.normal(0, 0.1, (Hw, 4 * 5, Bw)), jnp.float32
    )
    xsT = jnp.asarray(rng.normal(size=(Hw + 1, 4, Bw)), jnp.float32)
    usT = jnp.asarray(rng.normal(size=(Hw, Bw)), jnp.float32)
    Qd = jnp.ones((4, Bw)); Rd = jnp.ones((1, Bw)); Fd = jnp.ones((4, Bw))
    goal = np.zeros(4)
    act = jnp.asarray(rng.random(Bw) > 0.3)
    oK = jnp.asarray(rng.normal(size=(Hw, 4, Bw)), jnp.float32)
    ok_ = jnp.asarray(rng.normal(size=(Hw, Bw)), jnp.float32)
    carry = (act, oK, ok_)
    base = pallas_tvlqr_backward_quad_ll(
        jac_p, xsT, usT, Qd, Rd, Fd, goal, 0.05, 4,
        block_b=128, carry=carry, wide="off",
    )
    worst = 0.0
    for io in ("cast", "reshape"):
        wide = pallas_tvlqr_backward_quad_ll(
            jac_p, xsT, usT, Qd, Rd, Fd, goal, 0.05, 4,
            carry=carry, wide="on", wide_io=io,
        )
        jax.block_until_ready(wide)
        worst = max(
            worst, max(rel_err(w, r) for w, r in zip(wide, base))
        )
    record("backward_quad_wide_vs_loop_B4096", worst, 1e-4)

    # ---- 4. cheetah MLP line-search kernel (feat) vs f32 scan -------
    from autompc_tpu.benchmarks import HalfcheetahBenchmark
    from autompc_tpu.ops.pallas_mlp_linesearch import (
        fold_mlp_params,
        pallas_mlp_line_search,
    )
    from autompc_tpu.sysid.mlp import MLP

    hb = HalfcheetahBenchmark()
    mlp = MLP(hb.system, n_hidden_layers=2, hidden_size=64, seed=0)
    mparams = mlp.params
    layers = fold_mlp_params(mparams, mlp.nonlintype)
    Bm, Hm, dsm, dcm, Lm = 128, 50, 18, 6, 10
    x0m = jnp.asarray(rng.normal(0, 0.3, (Bm, dsm)), jnp.float32)
    xsm = jnp.asarray(rng.normal(0, 0.3, (Bm, Hm + 1, dsm)), jnp.float32)
    usm = jnp.asarray(rng.normal(0, 0.3, (Bm, Hm, dcm)), jnp.float32)
    Ksm = jnp.asarray(rng.normal(0, 0.1, (Bm, Hm, dcm, dsm)), jnp.float32)
    ksm = jnp.asarray(rng.normal(0, 0.3, (Bm, Hm, dcm)), jnp.float32)
    alphas = jnp.asarray(1.1 ** (-np.arange(Lm)), jnp.float32)

    def ref_ls(x0s, xs, us, Ks, ks):
        def one(x0, xs_l, us_l, Ks_l, ks_l):
            def rollout(alpha):
                def step(x, inp):
                    xbar, ubar, K, k = inp
                    u = jnp.clip(
                        alpha * k + ubar + K @ (x - xbar), -1.0, 1.0
                    )
                    x1 = mlp.pred_core(mparams, x, u)
                    return x1, (x1, u)

                _, (xs1, us1) = jax.lax.scan(
                    step, x0, (xs_l[:Hm], us_l, Ks_l, ks_l)
                )
                return jnp.concatenate([x0[None], xs1], axis=0), us1

            return jax.vmap(rollout)(alphas)

        return jax.vmap(one)(x0s, xs, us, Ks, ks)

    got_xs, got_us = pallas_mlp_line_search(
        layers, mlp.nonlintype, x0m, xsm, usm, Ksm, ksm, alphas,
        -1.0, 1.0, block_b=128, layout="feat", precision="highest",
    )
    with jax.default_matmul_precision("highest"):
        want_xs, want_us = jax.jit(ref_ls)(x0m, xsm, usm, Ksm, ksm)
    jax.block_until_ready((got_xs, want_xs))
    record(
        "mlp_ls_feat_B128_H50_cheetah_dims",
        max(rel_err(got_xs, want_xs), rel_err(got_us, want_us)),
        2e-3,  # 50-step recursion at f32; interpret-mode twin is exact
    )

    elapsed = time.perf_counter() - t_start
    write_stamp(results, passed)
    print(json.dumps({
        "metric": "kernels_tpu_numerics",
        "passed": passed,
        "elapsed_s": round(elapsed, 1),
        "results": results,
    }))
    if not passed:
        sys.exit(1)


if __name__ == "__main__":
    main()
