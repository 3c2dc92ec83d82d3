"""Secondary benchmark harness: the non-headline north-star metrics.

- MPPI with 4096 sampled rollouts per control step (BASELINE.json):
  control-step latency and sampled-rollout throughput;
- per-MPC-step latency for iLQR and DirectTranscription vs the
  cartpole real-time budget (dt = 0.05 s).

Prints one JSON line per metric (bench.py remains the single-line
headline harness for the driver).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # 0.0: on the remote-compile tunnel even trivial ops pay a ~0.35s
    # round-trip; ~100 of them re-compile EVERY bench run when the
    # 1s threshold excludes them from the cache (measured 45s of a
    # warm run's 55s "compile").
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control import MPPI, DirectTranscriptionController, IterativeLQR
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import SINDy
    from autompc_tpu.core.trajectory import zeros as traj_zeros

    benchmark = CartpoleSwingupBenchmark()
    system = benchmark.system
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    task = benchmark.task.copy()
    task.set_cost(
        QuadCost(
            system,
            jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
            0.001 * jnp.eye(1),
            jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
            goal=jnp.zeros(4),
        )
    )
    obs = jnp.asarray(benchmark.task.get_init_obs())
    seed_traj = traj_zeros(system, 1)

    def step_latency(controller, reps=20):
        cstate = controller.traj_to_state(seed_traj)
        u, cstate = controller.run(cstate, obs)  # compile
        jax.block_until_ready(u)
        start = time.perf_counter()
        for _ in range(reps):
            u, cstate = controller.run(cstate, obs)
            jax.block_until_ready(u)
        return (time.perf_counter() - start) / reps

    results = []

    # --- MPPI at the 4096-rollout north star -----------------------
    num_path = int(os.environ.get("BENCH_MPPI_PATHS", "4096"))
    mppi = MPPI(
        system, task, model, horizon=20, num_path=num_path,
        sigma=1.0, lmda=0.3,
    )
    lat = step_latency(mppi)
    results.append(
        {
            "metric": "mppi_control_step_latency_ms",
            "num_path": num_path,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )
    results.append(
        {
            "metric": "mppi_sampled_rollouts_per_s",
            "value": round(num_path / lat, 1),
            "unit": "rollouts/s",
        }
    )

    # --- MPPI, DEVICE-RESIDENT closed loop --------------------------
    # Same correction as the iLQR device-resident row below: the host
    # loop's ~25 ms floor is the tunnel round-trip, not compute. One
    # dispatch runs the whole 200-step episode (control/receding.py:
    # make_receding_mppi_loop, host-loop parity-pinned in
    # tests/test_receding.py); per-step cost is honest compute.
    from autompc_tpu.control.receding import make_receding_mppi_loop

    n_steps_cl = 200
    run_mppi_cl = jax.jit(
        make_receding_mppi_loop(
            system, task, model, benchmark.dynamics,
            n_steps=n_steps_cl, horizon=20, num_path=num_path,
            sigma=1.0, lmda=0.3,
        )
    )
    x0_cl1 = jnp.asarray(benchmark.task.get_init_obs())[None, :]
    out = run_mppi_cl(model.params, x0_cl1)  # compile
    jax.block_until_ready(out)
    start = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run_mppi_cl(model.params, x0_cl1)
        jax.block_until_ready(out)
    lat = (time.perf_counter() - start) / reps / n_steps_cl
    results.append(
        {
            "metric": "mppi_closed_loop_per_step_latency_device_resident_ms",
            "num_path": num_path,
            "mpc_steps_per_dispatch": n_steps_cl,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )
    results.append(
        {
            "metric": "mppi_sampled_rollouts_per_s_device_resident",
            "value": round(num_path / lat, 1),
            "unit": "rollouts/s",
        }
    )

    # --- iLQR per-MPC-step latency ---------------------------------
    ilqr = IterativeLQR(system, task, model, horizon=20)
    lat = step_latency(ilqr, reps=10)
    results.append(
        {
            "metric": "ilqr_control_step_latency_ms",
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )

    # --- iLQR per-MPC-step latency, DEVICE-RESIDENT closed loop -----
    # The host-loop number above is tunnel-dominated (~25 ms dispatch
    # round-trip per step; PERF.md). The deployment shape runs the
    # whole episode as one device program (control/receding.py): 200
    # MPC steps in one dispatch, so per-step cost is compute, not
    # transport — the honest check against the dt=0.05 budget.
    from autompc_tpu.control.receding import make_receding_ilqr_loop

    n_steps = 200
    run_cl = jax.jit(
        make_receding_ilqr_loop(
            model.pred_core, task.get_cost(), benchmark.dynamics,
            H=20, ds=4, dc=1, obsdim=4, dt=system.dt,
            n_steps=n_steps,
            ubounds=(
                task.get_ctrl_bounds()[:, 0], task.get_ctrl_bounds()[:, 1]
            ),
        )
    )
    x0_cl = jnp.asarray(benchmark.task.get_init_obs())[None, :]
    out = run_cl(model.params, x0_cl)  # compile
    jax.block_until_ready(out)
    start = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = run_cl(model.params, x0_cl)
        jax.block_until_ready(out)
    lat = (time.perf_counter() - start) / reps / n_steps
    results.append(
        {
            "metric": "ilqr_closed_loop_per_step_latency_device_resident_ms",
            "mpc_steps_per_dispatch": n_steps,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )

    # --- DirectTranscription per-MPC-step latency ------------------
    dt_con = DirectTranscriptionController(system, task, model, horizon=1)
    lat = step_latency(dt_con, reps=10)
    results.append(
        {
            "metric": "dt_sqp_control_step_latency_ms",
            "knots": dt_con.horizon,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )

    # --- DirectTranscription, DEVICE-RESIDENT closed loop -----------
    # Completes the per-step compute story for all three controller
    # families (VERDICT r3 item 6): warm-started SQP solves in one
    # scan-per-episode dispatch (control/receding.py:
    # make_receding_sqp_loop, host-loop parity-pinned).
    from autompc_tpu.control.receding import make_receding_sqp_loop

    dt_knots = 20
    run_dt_cl = jax.jit(
        make_receding_sqp_loop(
            model.pred_core, task.get_cost(), benchmark.dynamics,
            H=dt_knots, ds=4, dc=1, obsdim=4, dt=system.dt,
            n_steps=n_steps_cl,
            ubounds=(
                task.get_ctrl_bounds()[:, 0], task.get_ctrl_bounds()[:, 1]
            ),
        )
    )
    out = run_dt_cl(model.params, x0_cl1)  # compile
    jax.block_until_ready(out)
    start = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run_dt_cl(model.params, x0_cl1)
        jax.block_until_ready(out)
    lat = (time.perf_counter() - start) / reps / n_steps_cl
    results.append(
        {
            "metric": "dt_sqp_closed_loop_per_step_latency_device_resident_ms",
            "knots": dt_knots,
            "mpc_steps_per_dispatch": n_steps_cl,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < system.dt,
        }
    )

    # --- halfcheetah-scale MPPI (18 obs / 6 ctrl, MLP model, the
    # true telescoped 200-R cost) ------------------------------------
    from autompc_tpu.benchmarks import HalfcheetahBenchmark
    from autompc_tpu.sysid import MLP

    hc = HalfcheetahBenchmark()
    hc_trajs = hc.gen_trajs_batch(seed=0, n_trajs=24, traj_len=40)
    hc_model = MLP(hc.system, n_hidden_layers=2, hidden_size=64,
                   n_train_iters=10, n_batch=64)
    hc_model.train(hc_trajs)
    hc_paths = int(os.environ.get("BENCH_HC_PATHS", "4096"))
    hc_mppi = MPPI(
        hc.system, hc.task, hc_model, horizon=20, num_path=hc_paths,
        sigma=0.5, lmda=0.5,
    )
    hc_obs = jnp.asarray(hc.task.get_init_obs())
    hc_seed = traj_zeros(hc.system, 1)
    cstate = hc_mppi.traj_to_state(hc_seed)
    u, cstate = hc_mppi.run(cstate, hc_obs)
    jax.block_until_ready(u)
    start = time.perf_counter()
    for _ in range(20):
        u, cstate = hc_mppi.run(cstate, hc_obs)
        jax.block_until_ready(u)
    lat = (time.perf_counter() - start) / 20
    results.append(
        {
            "metric": "halfcheetah_mppi_control_step_latency_ms",
            "num_path": hc_paths,
            "value": round(lat * 1e3, 3),
            "unit": "ms",
            "within_dt_budget": lat < hc.system.dt,
        }
    )

    # --- halfcheetah-scale batched iLQR (ds=18, dc=6, H=200) --------
    # The multi-control backward pass runs the general time-streamed
    # Pallas kernel (ops/pallas_riccati.py:
    # pallas_tvlqr_backward_general); BENCH_HC_ILQR_BACKWARD=scan
    # measures the XLA-scan backward for comparison. Reference
    # workload shape: autompc/benchmarks/halfcheetah.py:258-271.
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver

    hc_cost = QuadCost(
        hc.system,
        jnp.eye(18) * 1.0,
        jnp.eye(6) * 0.01,
        jnp.eye(18) * 1.0,
        goal=jnp.zeros(18),
    )
    hc_bounds = hc.task.get_ctrl_bounds()
    hc_B = int(os.environ.get("BENCH_HC_ILQR_B", "1024"))
    hc_H = int(os.environ.get("BENCH_HC_ILQR_H", "200"))
    hc_backward = os.environ.get("BENCH_HC_ILQR_BACKWARD", "pallas")
    hc_solver_kw = dict(
        H=hc_H, ds=18, dc=6, obsdim=18, dt=hc.system.dt,
        ubounds=(hc_bounds[:, 0], hc_bounds[:, 1]),
        backward=hc_backward,
        max_iter=int(os.environ.get("BENCH_HC_ILQR_ITERS", "50")),
        block_b=int(os.environ.get("BENCH_HC_ILQR_BLOCK", "256")),
        # Closed-form layer-chain Jacobians for the forward/relin
        # phases (sysid/mlp.py:net_apply_jac) instead of jacfwd's 24
        # tangent pushforwards; BENCH_HC_ILQR_JAC=jacfwd compares.
        pred_diff=(
            hc_model.pred_diff_core
            if os.environ.get("BENCH_HC_ILQR_JAC", "analytic") == "analytic"
            else None
        ),
        # BENCH_HC_ILQR_LS selects the line-search implementation.
        # Default "feat" (round 4): the dense-lane feat-layout MLP
        # rollout kernel at HIGHEST matmul precision — honest f32 AND
        # the fastest variant outright (interleaved 2026-08-21:
        # 2,208/s @ 99.6% converged vs the old bf16 XLA-scan default's
        # 1,939/s @ 93.8%; tools/ab_cheetah_ls.py), closing VERDICT r3
        # item 1. "scan" = bf16 XLA scan, "pallas" = the round-3 MXU
        # layout (7x lane padding; 1,450/s), "off" = scan.
        mlp_ls=(
            {
                "feat": dict(
                    nonlin=hc_model.nonlintype, layout="feat",
                    precision="highest", block_b=256,
                ),
                "pallas": dict(
                    nonlin=hc_model.nonlintype, layout="mxu",
                    block_b=128,
                ),
            }.get(os.environ.get("BENCH_HC_ILQR_LS", "feat"))
        ),
    )
    # Device-side converged-lane compaction (round 3): the cheetah
    # convergence histogram is long-tailed (median lane done by iter
    # 12, 84% by 20, tail to 50 — tools/profile_cheetah_phases.py /
    # VERDICT r2 item 3), so shrinking the live batch at static cuts
    # measured 2,024.6 vs 806.6 solves/s interleaved (2.5x) at
    # unchanged converged fraction (93.5% vs 93.1%). Cut fractions are
    # sized to the histogram: an earlier first cut (10:0.5) trips the
    # overflow branch — actives don't fit the bucket — and collapses
    # to 746/s. BENCH_HC_ILQR_SCHED=off restores the plain batch.
    hc_sched_env = os.environ.get(
        "BENCH_HC_ILQR_SCHED", "12:0.5,18:0.25,26:0.125,34:0.0625"
    )
    if hc_sched_env != "off":
        from autompc_tpu.control.ilqr import (
            make_scheduled_ilqr_solver,
            parse_schedule,
        )

        hc_solve = jax.jit(make_scheduled_ilqr_solver(
            hc_model.pred_core, hc_cost,
            schedule=parse_schedule(hc_sched_env), **hc_solver_kw,
        ))
    else:
        hc_solve = jax.jit(make_batched_ilqr_solver(
            hc_model.pred_core, hc_cost, **hc_solver_kw,
        ))
    rng_hc = np.random.default_rng(0)
    hc_x0s = jnp.asarray(
        rng_hc.uniform(-0.1, 0.1, (hc_B, 18)), dtype=jnp.float32
    )
    hc_ug = jnp.zeros((hc_B, hc_H, 6), dtype=jnp.float32)
    start = time.perf_counter()
    out = hc_solve(hc_model.params, hc_x0s, hc_ug)
    jax.block_until_ready(out)
    print(
        f"[bench_extra] cheetah iLQR compile+run: "
        f"{time.perf_counter() - start:.1f}s (B={hc_B}, "
        f"backward={hc_backward})",
        file=sys.stderr,
    )
    # timeit_distinct discipline (utils/profiling.py): distinct inputs
    # per rep, first rep excluded as warmup — the plain rep loop (one
    # of whose inputs repeated the warmup's) read 1,348 solves/s where
    # four interleaved clean measurements read 2,033/2,033 (and the
    # plain batch 807/807), so the loop's measurement noise exceeded
    # the day-to-day drift band.
    from autompc_tpu.utils.profiling import timeit_distinct

    reps = int(os.environ.get("BENCH_HC_ILQR_REPS", "4"))
    hc_inputs = [
        (hc_model.params, hc_x0s + 0.001 * (r + 1), hc_ug)
        for r in range(reps + 1)
    ]
    lat, out = timeit_distinct(hc_solve, hc_inputs, silent=True)
    results.append(
        {
            "metric": "halfcheetah_ilqr_solves_per_s_per_chip",
            "ds": 18, "dc": 6, "H": hc_H, "batch": hc_B,
            "backward": hc_backward,
            "compact_schedule": hc_sched_env,
            "converged_frac": round(
                float(np.asarray(out[0]).mean()), 3
            ),
            "value": round(hc_B / lat, 2),
            "unit": "solves/s",
        }
    )

    # --- cheetah closed-loop quality A/B + gate (VERDICT r3 item 1) --
    # The throughput default rides bf16 MXU matmuls (94.6% open-loop
    # converged vs 99.8-100% for honest f32). Whether that costs
    # anything in TASK metric was asserted, never measured: run the
    # SAME receding-horizon closed loop (MLP controller model, TRUE
    # planar-multibody cheetah plant, identical lanes) traced under
    # default (bf16) and forced-f32 matmul precision, and gate on the
    # relative difference in mean closed-loop task cost.
    if os.environ.get("BENCH_HC_QUALITY", "on") != "off":
        from autompc_tpu.control.receding import make_receding_ilqr_loop

        hcq_B = int(os.environ.get("BENCH_HC_QUALITY_B", "32"))
        hcq_steps = int(os.environ.get("BENCH_HC_QUALITY_STEPS", "200"))
        loop_kw = dict(
            H=20, ds=18, dc=6, obsdim=18, dt=hc.system.dt,
            n_steps=hcq_steps,
            ubounds=(hc_bounds[:, 0], hc_bounds[:, 1]),
            max_iter=20,
            pred_diff=hc_model.pred_diff_core,
        )
        run_bf16 = jax.jit(make_receding_ilqr_loop(
            hc_model.pred_core, hc_cost, hc.dynamics, **loop_kw
        ))
        inner_loop = make_receding_ilqr_loop(
            hc_model.pred_core, hc_cost, hc.dynamics, **loop_kw
        )

        def run_f32(p, x0s, _inner=inner_loop):
            # default_matmul_precision must wrap TRACING.
            with jax.default_matmul_precision("highest"):
                return _inner(p, x0s)

        run_f32 = jax.jit(run_f32)
        rng_q = np.random.default_rng(7)
        x0q = jnp.asarray(
            np.asarray(hc.task.get_init_obs())[None, :]
            + rng_q.uniform(-0.05, 0.05, (hcq_B, 18)),
            dtype=jnp.float32,
        )

        def episode_stats(run):
            xs_cl, us_cl, nconv = run(hc_model.params, x0q)
            xs_np, us_np = np.asarray(xs_cl), np.asarray(us_cl)
            # Synthesis-cost metric along the true-dynamics trajectory.
            task_cost = (
                np.sum(xs_np[:, :-1] ** 2, axis=(1, 2))
                + 0.01 * np.sum(us_np**2, axis=(1, 2))
                + np.sum(xs_np[:, -1] ** 2, axis=1)
            )
            # Benchmark metric 200 - R (telescoped run reward).
            metric = 200.0 - (
                -0.1 * np.sum(us_np**2, axis=(1, 2))
                + (xs_np[:, -1, 0] - xs_np[:, 0, 0]) / hc.system.dt
            )
            return (
                float(task_cost.mean()), float(metric.mean()),
                float(np.asarray(nconv).mean() / hcq_steps),
            )

        t0 = time.perf_counter()
        cost_b, metric_b, conv_b = episode_stats(run_bf16)
        cost_f, metric_f, conv_f = episode_stats(run_f32)
        tol = float(os.environ.get("BENCH_HC_QUALITY_TOL", "0.05"))
        rel = abs(cost_b - cost_f) / max(abs(cost_f), 1e-9)
        results.append(
            {
                "metric": "halfcheetah_closed_loop_quality_ab",
                "lanes": hcq_B, "mpc_steps": hcq_steps,
                "task_cost_bf16": round(cost_b, 2),
                "task_cost_f32": round(cost_f, 2),
                "metric_200mR_bf16": round(metric_b, 2),
                "metric_200mR_f32": round(metric_f, 2),
                "solver_converged_frac_bf16": round(conv_b, 4),
                "solver_converged_frac_f32": round(conv_f, 4),
                "rel_task_cost_diff": round(rel, 4),
                "gate_tol": tol,
                "quality_gate_pass": bool(rel <= tol),
                "value": round(rel, 4),
                "unit": "rel diff",
            }
        )
        print(
            f"[bench_extra] cheetah closed-loop A/B "
            f"({time.perf_counter() - t0:.1f}s): task cost bf16 "
            f"{cost_b:.1f} vs f32 {cost_f:.1f} (rel {rel:.4f}, "
            f"gate {'PASS' if rel <= tol else 'FAIL'})",
            file=sys.stderr,
        )

    # --- model-tuning throughput: bucketed ARX candidate scoring ----
    # (replaces SMAC's one-candidate-at-a-time model tuner; every
    # history candidate trains + scores in one device program,
    # tuning/bucketed.py)
    from autompc_tpu.tuning.bucketed import ARXBucketEvaluator

    tl = trajs.to_list()
    arx_eval = ARXBucketEvaluator(
        system, tl[:40], tl[40:], kmax=10, horizon=5
    )
    ks = list(range(1, 11))
    arx_eval(ks)  # compile
    start = time.perf_counter()
    reps = 10
    for _ in range(reps):
        arx_eval(ks)
    lat = (time.perf_counter() - start) / reps
    results.append(
        {
            "metric": "arx_bucket_train_and_score_configs_per_s",
            "value": round(len(ks) / lat, 1),
            "unit": "configs/s",
        }
    )

    # --- SVGP surrogate: train + batched prediction ------------------
    # (the reference delegates this to GPyTorch+CUDA, largegp.py)
    from autompc_tpu.sysid import ApproximateGPModel

    gp = ApproximateGPModel(
        system, niter=5, induce_count=64, batch_size=256, seed=0
    )
    start = time.perf_counter()
    gp.train(tl[:40])
    t_train = time.perf_counter() - start
    xs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4096, system.obs_dim))
    )
    us = jnp.zeros((4096, system.ctrl_dim))
    preds = gp.pred_batch(xs, us)  # compile
    jax.block_until_ready(preds)
    start = time.perf_counter()
    for _ in range(10):
        preds = gp.pred_batch(xs, us)
        jax.block_until_ready(preds)
    lat = (time.perf_counter() - start) / 10
    results.append(
        {
            "metric": "svgp_train_s_and_pred_throughput",
            "train_s": round(t_train, 2),
            "value": round(4096 / lat, 1),
            "unit": "preds/s",
        }
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
