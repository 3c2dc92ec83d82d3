"""Absolute per-kernel roofline/MFU accounting (VERDICT r3 item 2).

Every PERF.md number so far is RELATIVE (vs XLA, vs a target, vs last
round). This tool measures each Pallas kernel at its bench shape and
compares against the CHIP: a documented flops+bytes model per kernel,
achieved TFLOP/s and GB/s, % of the peak for the engine the kernel
actually uses, and a bound-resource verdict.

Peaks (TPU v5e / v5litepod, public figures + structural estimates):
  * HBM bandwidth: 819 GB/s (public v5e spec).
  * MXU: 197 TFLOP/s bf16 (public). f32 matmuls run as bf16 passes:
    precision HIGHEST = 6 passes (~32.8 TFLOP/s f32), HIGH = 3
    (~65.7), DEFAULT = 1 (bf16 numerics).
  * VPU (vector unit, f32 FMAs): no public figure; structural estimate
    8 sublanes x 128 lanes x 2 (FMA) x 4 ops/cycle x 0.94 GHz
    ~= 7.7 TFLOP/s f32. Slab-kernel %-of-peak rows inherit this
    estimate's uncertainty (maybe 2x); the BOUND-RESOURCE verdicts do
    not flip within that band.

Bytes models count the kernel-visible streams (the lanes-last arrays
pallas_call reads/writes, with (8,128) tile padding on the trailing two
dims). The measured wrapper time ALSO pays XLA layout transposes into/
out of that layout, so achieved GB/s is a lower bound on what the
kernel core drives; a kernel whose measured time matches its stream-
bytes/819 GB/s is HBM-bound.

Usage: python tools/roofline.py            # all kernels, bench shapes
       ROOFLINE_KERNELS=mlp_feat,mlp_mxu python tools/roofline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_HBM = 819e9
PEAK_MXU_BF16 = 197e12
PEAK_VPU_F32 = 7.7e12


def _pad8(n):
    return -(-n // 8) * 8


def _pad128(n):
    return -(-n // 128) * 128


def padded_elems(*dims):
    """Element count of an array with TPU (8,128) tiling on the last
    two dims (f32)."""
    dims = list(dims)
    if len(dims) >= 2:
        dims[-2] = _pad8(dims[-2])
    dims[-1] = _pad128(dims[-1])
    out = 1
    for d in dims:
        out *= d
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autompc_tpu.utils.profiling import timeit_distinct

    rng = np.random.default_rng(0)
    results = []

    def run_case(name, fn, inputs, flops, bytes_, engine, peak_comp):
        t0 = time.perf_counter()
        out = fn(*inputs[0])
        jax.block_until_ready(out)
        print(f"[roofline] {name}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        per, _ = timeit_distinct(fn, inputs, silent=True)
        tflops = flops / per / 1e12
        gbs = bytes_ / per / 1e9
        comp_frac = (flops / peak_comp) / per
        bw_frac = (bytes_ / PEAK_HBM) / per
        # When neither roofline is within reach the kernel is bound by
        # something the flops/bytes model can't see — here, always the
        # serial H recursion (tiny per-step tiles, per-step latency
        # dominates). Say so instead of naming the larger tiny fraction.
        if max(comp_frac, bw_frac) < 0.15:
            bound = "serial-H latency"
        else:
            bound = "HBM-BW" if bw_frac >= comp_frac else engine
        row = {
            "kernel": name,
            "time_ms": round(per * 1e3, 3),
            "gflop": round(flops / 1e9, 2),
            "gbyte": round(bytes_ / 1e9, 3),
            "achieved_tflops": round(tflops, 2),
            "achieved_gb_s": round(gbs, 1),
            "pct_peak_compute": round(100 * comp_frac, 1),
            "pct_peak_hbm": round(100 * bw_frac, 1),
            "engine": engine,
            "bound": bound,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    want = os.environ.get(
        "ROOFLINE_KERNELS",
        "backward_quad,backward_general,fused_ls,relin,mlp_feat,mlp_mxu",
    ).split(",")
    # Batch for the cartpole-shape kernels (backward_quad, fused_ls,
    # relin). The headline program runs B=65536; at 4096 the serial-H
    # latency dominates and the roofline question is moot.
    RB = int(os.environ.get("ROOFLINE_B", "4096"))

    # ---- backward_quad: cartpole bench shape ------------------------
    if "backward_quad" in want:
        from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward_quad

        B, H, ds = RB, 200, 4
        Jx = jnp.asarray(rng.normal(0, 0.1, (B, H, ds, ds)), jnp.float32)
        Ju = jnp.asarray(rng.normal(0, 0.1, (B, H, ds, 1)), jnp.float32)
        xs = jnp.asarray(rng.normal(0, 1, (B, H + 1, ds)), jnp.float32)
        us = jnp.asarray(rng.normal(0, 1, (B, H, 1)), jnp.float32)
        Qd = jnp.ones((B, ds)); Rd = jnp.ones((B, 1)); Fd = jnp.ones((B, ds))
        goal = jnp.zeros(ds)
        fn = jax.jit(lambda *a: pallas_tvlqr_backward_quad(
            *a, goal, 0.05, ds, block_b=128
        ))
        ins = [
            (Jx + 0.001 * r, Ju, xs, us, Qd, Rd, Fd) for r in range(4)
        ]
        # Flops/lane-step (ds=4, dc=1, counted from the recursion):
        # JxT V Jx 256, JuT V (Ju|Jx) ~80, gain solve ~40, V'/v'
        # updates ~150 => ~520.
        flops = B * H * 520
        # Streams (lanes-last): jx (H,ds,ds,B) ju (H,ds,B) xs ((H+1),
        # ds,B) us (H,B) diags (ds|1,B) + outs Ks (H,ds,B) ks (H,B).
        bytes_ = 4 * (
            padded_elems(H, ds, ds, B) + padded_elems(H, ds, B)
            + padded_elems(H + 1, ds, B) + padded_elems(H, B)
            + 3 * padded_elems(ds, B)
            + padded_elems(H, ds, B) + padded_elems(H, B)
        )
        run_case(f"backward_quad B{B} H200", fn, ins, flops, bytes_,
                 "VPU-f32", PEAK_VPU_F32)

    # ---- backward_general: cheetah bench shape ----------------------
    if "backward_general" in want:
        from autompc_tpu.ops.pallas_riccati import (
            pallas_tvlqr_backward_general,
        )

        B, H, ds, dc = 1024, 200, 18, 6
        Jx = jnp.asarray(
            np.eye(ds)[None, None] + rng.normal(0, 0.03, (B, H, ds, ds)),
            jnp.float32,
        )
        Ju = jnp.asarray(rng.normal(0, 0.05, (B, H, ds, dc)), jnp.float32)
        Cxx = jnp.broadcast_to(
            2 * 0.05 * jnp.eye(ds), (B, H, ds, ds)
        ).astype(jnp.float32)
        Cuu = jnp.broadcast_to(
            2 * 0.01 * 0.05 * jnp.eye(dc), (B, H, dc, dc)
        ).astype(jnp.float32)
        cx = jnp.asarray(rng.normal(0, 0.1, (B, H, ds)), jnp.float32)
        cu = jnp.asarray(rng.normal(0, 0.01, (B, H, dc)), jnp.float32)
        Vn = jnp.broadcast_to(2 * jnp.eye(ds), (B, ds, ds)).astype(
            jnp.float32
        )
        vn = jnp.asarray(rng.normal(0, 0.1, (B, ds)), jnp.float32)
        fn = jax.jit(lambda *a: pallas_tvlqr_backward_general(
            *a, block_b=256
        ))
        ins = [(Jx + 0.0001 * r, Ju, Cxx, Cuu, cx, cu, Vn, vn)
               for r in range(4)]
        # ~41k flops/lane-step at (18, 6): JxTVJx 23.3k, JuTV(Ju|Jx)
        # 9.1k, 6x6 Cholesky+solves ~2.9k, KT Quu K + V'/v' ~5.2k.
        flops = B * H * 41000
        bytes_ = 4 * (
            2 * padded_elems(H, ds, ds, B)          # jx, cxx
            + padded_elems(H, ds, dc, B)            # ju
            + padded_elems(H, dc, dc, B)            # cuu
            + padded_elems(H, ds, B) + padded_elems(H, dc, B)  # cx cu
            + padded_elems(ds, ds, B) + padded_elems(ds, B)    # Vn vn
            + padded_elems(H, dc, ds, B) + padded_elems(H, dc, B)  # outs
        )
        run_case("backward_general B1024 H200 ds18", fn, ins, flops,
                 bytes_, "VPU-f32", PEAK_VPU_F32)

    # ---- fused line search: cartpole SINDy bench shape --------------
    if "fused_ls" in want:
        from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
        from autompc_tpu.ops.pallas_linesearch import (
            pallas_fused_line_search,
        )
        from autompc_tpu.sysid import SINDy

        benchmark = CartpoleSwingupBenchmark()
        trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50,
                                          traj_len=100)
        model = SINDy(
            benchmark.system, method="lstsq", threshold=1e-3,
            trig_basis=True, trig_freq=1, trig_interaction=True,
            time_mode="discrete",
        )
        model.train(trajs)
        live = np.flatnonzero(
            np.any(np.abs(np.asarray(model.coeffs)) > 0, axis=0)
        )
        fns_a = tuple(model.library._fns[int(i)] for i in live)
        gts_a = tuple(model.library.grad_terms[int(i)] for i in live)
        coeffs = jnp.asarray(model.coeffs)[:, live]
        B, H, ds, dc, L, F = RB, 200, 4, 1, 10, len(live)
        x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)), jnp.float32)
        xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)), jnp.float32)
        us = jnp.asarray(rng.uniform(-1, 1, (B, H, dc)), jnp.float32)
        Ks = jnp.asarray(rng.normal(0, 0.1, (B, H, dc, ds)), jnp.float32)
        ks = jnp.asarray(rng.normal(0, 0.1, (B, H, dc)), jnp.float32)
        alphas = (0.2 ** jnp.arange(L)).astype(jnp.float32)
        Q = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
        R = 0.001 * jnp.eye(1)
        obj0 = jnp.full((B,), 1e4, jnp.float32)
        lin = jnp.full((B,), -1.0, jnp.float32)
        quad = jnp.zeros((B,), jnp.float32)
        ks_small = jnp.zeros((B,), bool)
        fn = jax.jit(lambda x0, xs, us, Ks, ks: pallas_fused_line_search(
            fns_a, x0, xs, us, Ks, ks, coeffs, alphas,
            jnp.array([-20.0]), jnp.array([20.0]),
            Q, R, Q, jnp.zeros(4), 0.05, obj0, lin, quad, ks_small,
            grad_terms=gts_a, block_b=128,
        ))
        ins = [(x0 + 0.01 * r, xs, us, Ks, ks) for r in range(4)]
        # ~120 flops/lane-step-alpha (F=7 features ~30, coeff matvec
        # 56, feedback 12, in-register objective ~20) + the selected
        # re-roll with fused relin (~420/lane-step).
        flops = B * H * (L * 120 + 420)
        # Round-4 kernel IO: dense dc=1 streams (H, B) and the PACKED
        # jac output (H, ds*(ds+1), B) (ops/pallas_linesearch.py).
        bytes_ = 4 * (
            padded_elems(ds, B) + padded_elems(H, ds, B)
            + 3 * padded_elems(H, B)                # us, ks, out_us
            + padded_elems(H, ds, B)                # Ks (dc=1 dense)
            + padded_elems(H + 1, ds, B)            # out_xs
            + padded_elems(H, ds * (ds + 1), B)     # packed jac out
        )
        run_case(f"fused_ls B{B} H200 F{F}", fn, ins, flops, bytes_,
                 "VPU-f32", PEAK_VPU_F32)

        # ---- relin kernel at the same model -------------------------
        if "relin" in want:
            from autompc_tpu.ops.pallas_relin import (
                pallas_feature_jacobians,
            )

            fnr = jax.jit(lambda xs, us: pallas_feature_jacobians(
                fns_a, xs, us, coeffs, grad_terms=gts_a,
                block_b=1024, block_h=8,
            ))
            insr = [(xs + 0.01 * r, us) for r in range(4)]
            flops_r = B * H * 364  # sparse grads ~84 + matvecs ~280
            bytes_r = 4 * (
                padded_elems(H, ds, B) + padded_elems(H, dc, B)
                + padded_elems(H, ds, ds, B)
                + padded_elems(H, ds, dc, B)
            )
            run_case(f"relin B{B} H200 F{F}", fnr, insr, flops_r,
                     bytes_r, "VPU-f32", PEAK_VPU_F32)

    # ---- MLP line-search kernels: cheetah shape ---------------------
    if "mlp_feat" in want or "mlp_mxu" in want:
        from autompc_tpu.benchmarks import HalfcheetahBenchmark
        from autompc_tpu.ops.pallas_mlp_linesearch import (
            fold_mlp_params,
            pallas_mlp_line_search,
        )
        from autompc_tpu.sysid import MLP

        hc = HalfcheetahBenchmark()
        htr = hc.gen_trajs_batch(seed=0, n_trajs=24, traj_len=40)
        hmodel = MLP(hc.system, n_hidden_layers=2, hidden_size=64,
                     n_train_iters=2, n_batch=64)
        hmodel.train(htr)
        layers = fold_mlp_params(hmodel.params, hmodel.nonlintype)
        B, H, ds, dc, L = 1024, 200, 18, 6, 10
        x0 = jnp.asarray(rng.uniform(-0.1, 0.1, (B, ds)), jnp.float32)
        xs = jnp.asarray(rng.uniform(-0.2, 0.2, (B, H + 1, ds)),
                         jnp.float32)
        us = jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, dc)), jnp.float32)
        Ks = jnp.asarray(rng.normal(0, 0.05, (B, H, dc, ds)), jnp.float32)
        ks = jnp.asarray(rng.normal(0, 0.1, (B, H, dc)), jnp.float32)
        alphas = (0.2 ** jnp.arange(L)).astype(jnp.float32)
        bounds = hc.task.get_ctrl_bounds()
        widths = (ds + dc, 64, 64, ds)
        mlp_flops = 2 * sum(
            widths[i] * widths[i + 1] for i in range(len(widths) - 1)
        )
        flops = B * L * H * (mlp_flops + 2 * ds * dc + 4 * dc)
        for lay, prec, passes in (
            ("feat", "highest", 6), ("feat", "bf16x3", 3),
            ("mxu", "highest", 6),
        ):
            key = f"mlp_{lay}"
            if key not in want:
                continue
            fn = jax.jit(
                lambda x0, xs, us, Ks, ks, lay=lay, prec=prec:
                pallas_mlp_line_search(
                    layers, hmodel.nonlintype, x0, xs, us, Ks, ks,
                    alphas, bounds[:, 0], bounds[:, 1],
                    block_b=256 if lay == "feat" else 128,
                    layout=lay, precision=prec,
                )
            )
            ins = [(x0 + 0.001 * r, xs, us, Ks, ks) for r in range(4)]
            if lay == "feat":
                # dense slab streams (lanes = batch)
                bytes_ = 4 * (
                    padded_elems(ds, B) + padded_elems(H, ds, B)
                    + 2 * padded_elems(H, dc, B)
                    + padded_elems(H, dc, ds, B)
                    + padded_elems(H, L, ds, B)
                    + padded_elems(H, L, dc, B)
                )
            else:
                # feature-minor: every stream pads lanes to 128
                bytes_ = 4 * (
                    padded_elems(B, ds) + padded_elems(H, B, ds)
                    + 2 * padded_elems(H, B, dc)
                    + H * B * dc * _pad128(ds)
                    + H * L * B * _pad128(ds)
                    + H * L * B * _pad128(dc)
                )
            run_case(
                f"mlp_ls {lay}-{prec} B1024 H200", fn, ins, flops,
                bytes_, f"MXU-f32({passes}pass)",
                PEAK_MXU_BF16 / passes,
            )

    print("\n| kernel | ms | GFLOP | GB | TFLOP/s | GB/s | %comp | "
          "%HBM | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['kernel']} | {r['time_ms']} | {r['gflop']} | "
            f"{r['gbyte']} | {r['achieved_tflops']} | "
            f"{r['achieved_gb_s']} | {r['pct_peak_compute']} | "
            f"{r['pct_peak_hbm']} | {r['bound']} |"
        )


if __name__ == "__main__":
    main()
