"""Block-size sweep for the general (any ds, dc) Pallas backward kernel
at halfcheetah scale (ds=18, dc=6, H=200).

The round-2 cheetah headline (PERF.md: 700 solves/s at block 256) used
the first WORKING block size, not a measured optimum; this sweeps
``block_b`` for the full batched iLQR solve — the kernel streams time
steps through VMEM with a (TB, ds, ds+dc)-scale window per program, so
larger blocks trade grid-dispatch overhead against VMEM pressure
(block 512 exceeds the 16 MB scoped-vmem limit and is reported as an
error row, not a crash). Same workload shape as bench_extra.py's
cheetah row (reference: autompc/benchmarks/halfcheetah.py:258-271).

Usage (TPU):  PYTHONPATH=/root/repo:$PYTHONPATH python tools/sweep_hc_block.py
Env: SWEEP_BLOCKS="128,256,512", SWEEP_B (batch, default 1024),
SWEEP_REPS (default 3), SWEEP_ITERS (max_iter, default 50),
SWEEP_JAC=analytic|jacfwd (model Jacobian formulation, default
analytic — MLP.pred_diff_core's closed-form layer chain).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from autompc_tpu.benchmarks import HalfcheetahBenchmark
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import MLP

    hc = HalfcheetahBenchmark()
    hc_trajs = hc.gen_trajs_batch(seed=0, n_trajs=24, traj_len=40)
    model = MLP(hc.system, n_hidden_layers=2, hidden_size=64,
                n_train_iters=10, n_batch=64)
    model.train(hc_trajs)

    cost = QuadCost(
        hc.system, jnp.eye(18), 0.01 * jnp.eye(6), jnp.eye(18),
        goal=jnp.zeros(18),
    )
    bounds = hc.task.get_ctrl_bounds()
    B = int(os.environ.get("SWEEP_B", "1024"))
    H = 200
    reps = int(os.environ.get("SWEEP_REPS", "3"))
    jac_mode = os.environ.get("SWEEP_JAC", "analytic")
    blocks = [
        int(b) for b in os.environ.get(
            "SWEEP_BLOCKS", "128,256,512,1024"
        ).split(",")
    ]

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 18)), dtype=jnp.float32)
    ug = jnp.zeros((B, H, 6), dtype=jnp.float32)

    for blk in blocks:
        solve = jax.jit(make_batched_ilqr_solver(
            model.pred_core, cost,
            H=H, ds=18, dc=6, obsdim=18, dt=hc.system.dt,
            ubounds=(bounds[:, 0], bounds[:, 1]),
            backward="pallas",
            max_iter=int(os.environ.get("SWEEP_ITERS", "50")),
            block_b=blk,
            pred_diff=(
                model.pred_diff_core if jac_mode == "analytic" else None
            ),
        ))
        try:
            t0 = time.perf_counter()
            out = solve(model.params, x0s, ug)
            jax.block_until_ready(out)
            print(
                f"[sweep] block {blk} jac={jac_mode}: compile+run "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            start = time.perf_counter()
            for r in range(reps):
                # Distinct inputs per rep: the remote-execution layer
                # memoizes identical dispatches (utils/profiling.py).
                out = solve(model.params, x0s + 0.001 * (r + 1), ug)
                jax.block_until_ready(out)
            elapsed = time.perf_counter() - start
            print(json.dumps({
                "metric": "halfcheetah_ilqr_solves_per_s_per_chip",
                "block_b": blk,
                "jac": jac_mode,
                "batch": B,
                "value": round(B * reps / elapsed, 1),
                "unit": "solves/s",
                "converged_frac": round(
                    float(np.asarray(out[0]).mean()), 4
                ),
            }))
        except Exception as e:  # VMEM OOM past the kernel's roofline
            print(json.dumps({
                "metric": "halfcheetah_ilqr_solves_per_s_per_chip",
                "block_b": blk,
                "jac": jac_mode,
                "error": str(e).splitlines()[0][:160],
            }))


if __name__ == "__main__":
    main()
