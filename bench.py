"""Headline benchmark: full iLQR cartpole solves per second per chip.

Measures the BASELINE.json north-star metric — complete iLQR solves
(horizon H=200, the reference's full solver budget: <=50 iterations,
10-alpha line search, tolerance 1e-3; autompc/control/ilqr.py:100-101)
on the cartpole swing-up with a trained SINDy dynamics model, batched
via vmap on one chip.

Prints one JSON line:
    {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
vs_baseline is value / 1000 (the >=1000 solves/s/chip target; the
reference's own tooling publishes no throughput numbers, BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import logging

    import jax

    # Persistent compilation cache: the fused solver (incl. the two
    # Pallas kernels) takes ~10 min to compile cold on the remote-compile
    # path; cached runs start in seconds. Verified round 3: the cache
    # DOES hit across fresh processes on the axon remote-compile path
    # (probe: 1.34s cold -> 0.08s warm), and the container persists
    # across the builder->driver boundary — so tools/prewarm_bench.py
    # (run as a committed post-build step) makes the driver's run warm.
    # Surface hit/miss in stderr so a cold driver run is diagnosable
    # (hits log at WARNING under jax_log_compiles; misses under
    # jax_explain_cache_misses — jax._src.compiler:99-112).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # 0.0: on the remote-compile tunnel even trivial ops pay a ~0.35s
    # round-trip; ~100 of them re-compile EVERY bench run when the
    # 1s threshold excludes them from the cache (measured 45s of a
    # warm run's 55s "compile").
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Hit/miss lines log at DEBUG (jax._src.compiler:99-112); surface
    # ONLY the persistent-cache lines, not the per-op dispatch firehose
    # that jax_log_compiles would emit. Do NOT use
    # jax_explain_cache_misses for this: in jax 0.9.0 its tracing-miss
    # explanation machinery crashes with "not enough values to unpack"
    # while tracing the scheduled solver's while_loop (reproduced on
    # CPU; the flag alone flips success/failure).
    _clog = logging.getLogger("jax._src.compiler")
    _clog.setLevel(logging.DEBUG)
    _h = logging.StreamHandler(sys.stderr)
    _h.addFilter(lambda r: "cache" in r.getMessage().lower())
    _clog.addHandler(_h)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control.ilqr import make_ilqr_solver
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import SINDy

    benchmark = CartpoleSwingupBenchmark()
    system = benchmark.system

    # Train the flagship SINDy model (trig library recovers the true
    # cartpole dynamics structure).
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    params = model.params

    cost = QuadCost(
        system,
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        0.001 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        goal=jnp.zeros(4),
    )

    H = 200
    bounds = benchmark.task.get_ctrl_bounds()
    # Batch re-swept round 3 (fused kernels + compaction shift the
    # saturation point): 32,984 solves/s at B=16384, 37,576 at 32768,
    # 43,942 at 65536 (interleaved, 2026-08-21); 131072 exceeds HBM
    # (RESOURCE_EXHAUSTED), so 65536 is the single-chip roofline. The
    # first-ever run at a new batch shape can read low (one 13.7k
    # outlier at 65536's first execution; stable 43.9-46k after) — the
    # committed prewarm covers that.
    B = int(os.environ.get("BENCH_BATCH", "65536"))
    backward = os.environ.get("BENCH_BACKWARD", "pallas")
    if backward == "vmap":
        solve = make_ilqr_solver(
            model.pred_core, cost,
            H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
            ubounds=(bounds[:, 0], bounds[:, 1]),
        )
        batch_solve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0)))
    else:
        from autompc_tpu.control.ilqr import (
            make_batched_ilqr_solver,
            make_scheduled_ilqr_solver,
        )

        # BENCH_LS: "fused" (objective+acceptance inside the kernel,
        # only the selected trajectory reaches HBM — the default; wins
        # once feature masking shrinks the rollout compute, 37.6k vs
        # 33.0k solves/s), "pallas" (rollout kernel + XLA objective),
        # "off" (XLA scan).
        ls_mode = os.environ.get("BENCH_LS", "fused")
        feature_spec = (
            (model.library, "coeffs") if ls_mode in ("fused", "pallas")
            else None
        )
        solver_kw = dict(
            H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
            ubounds=(bounds[:, 0], bounds[:, 1]),
            backward=backward,
            feature_spec=feature_spec,
            fuse_ls=(ls_mode == "fused"),
            # Round-4 block sweep: under the in-kernel carry update the
            # fused kernel stages the old jac too, so block 256 exceeds
            # scoped VMEM (24.7M/16M) — 128 is the working optimum
            # (52.2k vs 44.5k batch-major, interleaved B=65536).
            block_b=int(os.environ.get("BENCH_BLOCK", "128")),
            # BENCH_RELIN: "auto" (Pallas relinearization kernel when
            # the line-search feature_spec is on — the heaviest phase,
            # tools/profile_ilqr_phases.py), "xla" (jacfwd).
            relin=os.environ.get("BENCH_RELIN", "auto"),
            relin_block_b=int(os.environ.get("BENCH_RELIN_BLOCK", "1024")),
            # BENCH_SPARSE=auto (default): the STLSQ fit leaves most
            # coefficient columns exactly zero (7 of 55 features on
            # this model); skip dead features inside the kernels. The
            # model is fixed for the whole bench, so the static mask
            # is sound. "off" keeps dense kernels.
            feature_mask=(
                tuple(
                    int(k) for k in np.flatnonzero(
                        np.any(np.abs(np.asarray(model.coeffs)) > 0, axis=0)
                    )
                )
                if os.environ.get("BENCH_SPARSE", "auto") != "off"
                and feature_spec is not None
                else None
            ),
            # One alpha-block per program (all 10 alphas as sublanes)
            # measured 8945 vs 8490 solves/s at the 5-alpha default.
            ls_block_l=int(os.environ.get("BENCH_LBLK", "10")),
            # BENCH_LL (round 4, default on): lanes-last packed carry —
            # the fused/backward kernels speak their native layout
            # across iterations instead of relayouting
            # (B,H,...)<->(H,...,B) every iteration (control/ilqr.py
            # lanes_last doc). Interleaved at B=65536: 49.3k vs 44.6k
            # solves/s at block 128; 51.9k at block 256 (the new
            # default pair). BENCH_LL=off restores the batch-major
            # carry.
            lanes_last=(os.environ.get("BENCH_LL", "on") == "on"),
            # BENCH_LSW=on: the WIDE split line search — measured a
            # wash (+1%; PERF.md negative-result note), kept opt-in.
            ls_wide=(os.environ.get("BENCH_LSW", "off") == "on"),
            # BENCH_JD=bf16: bfloat16 packed-jac carry (half the
            # backward's biggest stream; fits B=131072 in HBM). Gains
            # and trajectories stay f32; quality gate decides.
            jac_dtype=os.environ.get("BENCH_JD", "f32"),
        )
        # BENCH_SCHED: device-side converged-lane compaction (default):
        # the convergence histogram is long-tailed (median lane ~15
        # iters vs slowest ~50), so the solve shrinks the live batch at
        # static cut points — measured 1.90x vs the single-program
        # batch at B=4096 (8683 vs 4563 solves/s). "off" = plain batch.
        if os.environ.get("BENCH_SCHED", "on") != "off":
            from autompc_tpu.control.ilqr import parse_schedule

            # Re-tuned round 3 at the larger batch: the 5-cut
            # aggressive schedule beats the round-2 4-cut default
            # (interleaved at B=65536: 45,986/45,964 vs 43,895/43,942;
            # at B=32768: 39,443-40,748 vs 37,186-37,576). Earlier
            # first cuts than the ~35%-done point trip the overflow
            # branch and forfeit the win (measured on cartpole round 2
            # and again on cheetah round 3).
            schedule = parse_schedule(
                os.environ.get(
                    "BENCH_SCHEDULE",
                    "8:0.75,15:0.5,22:0.25,30:0.125,40:0.0625",
                )
            )
            if schedule:
                solver_kw["schedule"] = schedule
            batch_solve = jax.jit(
                make_scheduled_ilqr_solver(model.pred_core, cost, **solver_kw)
            )
        else:
            batch_solve = jax.jit(
                make_batched_ilqr_solver(model.pred_core, cost, **solver_kw)
            )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, 4)) * np.array([3.1, 1.0, 1.0, 1.0])
    )
    uguess = jnp.zeros((B, H, 1))

    # Warmup / compile.
    t0 = time.perf_counter()
    out = batch_solve(params, x0s, uguess)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(
        f"[bench] compile+first run: {compile_s:.1f}s (B={B})",
        file=sys.stderr,
    )

    conv = np.asarray(out[0])
    final_theta = np.abs(np.asarray(out[1])[:, -1, 0])
    print(
        f"[bench] quality: {conv.mean() * 100:.1f}% converged, "
        f"median |final theta| {np.median(final_theta):.3f} rad",
        file=sys.stderr,
    )

    # Steady-state warmup (round 4): the first timed loop after a
    # single warm run reads systematically low REGARDLESS of inputs
    # (measured back-to-back in one process: 46.7k -> 52.1k solves/s
    # for the IDENTICAL rep loop run twice — a device/tunnel ramp
    # effect, not a cache or input effect). Run a couple of untimed
    # executions so the timed loop measures steady state.
    for r in range(int(os.environ.get("BENCH_WARM_REPS", "2"))):
        out = batch_solve(params, x0s - 0.01 * (r + 1), uguess)
        jax.block_until_ready(out)

    # Distinct fresh draws per rep (the measurement discipline PERF.md
    # documents for every interleaved A/B): near-identical shifted
    # inputs re-run one specific draw's convergence histogram, which
    # can sit several percent off the distribution's mean at fixed
    # compaction cuts.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    x0_pool = [
        jnp.asarray(
            rng.uniform(-1, 1, (B, 4)) * np.array([3.1, 1.0, 1.0, 1.0])
        )
        for _ in range(reps)
    ]
    start = time.perf_counter()
    for x0r in x0_pool:
        out = batch_solve(params, x0r, uguess)
        jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    print(
        f"[bench] {reps} reps in {elapsed:.2f}s "
        f"({elapsed / reps:.3f}s per batched solve)",
        file=sys.stderr,
    )

    solves_per_s = B * reps / elapsed

    # ----- Quality gate (VERDICT round 1, item 3) --------------------
    # The headline counts open-loop solves; a perf "win" that degraded
    # solution quality would still look like a win. Gate it with the
    # receding-horizon closed loop — the deployment shape: 200 MPC
    # steps (H=20, the reference default horizon, recompute every
    # step) against the TRUE cartpole dynamics, one device dispatch
    # for the whole episode batch (control/receding.py). Reported:
    # swing-up success rate (final |theta|,|omega| < the benchmark's
    # 0.2 threshold) and mean task cost (the reference ThresholdCost
    # metric: steps with max|obs[0:3] - goal| > 0.2,
    # autompc/costs/thresh_cost.py:27-32, cartpole.py:51).
    quality = {
        "open_loop_converged_frac": round(float(conv.mean()), 4),
        "open_loop_median_final_theta_rad": round(
            float(np.median(final_theta)), 4
        ),
        # Compile-time observability (VERDICT r2 item 2c): a compile
        # regression or a cold persistent cache is visible in the
        # recorded JSON, not just in stderr.
        "compile_first_run_s": round(compile_s, 1),
        "bench_tier": os.environ.get("BENCH_TIER", "direct"),
        "bench_ls": os.environ.get("BENCH_LS", "fused"),
        # False when the persistent cache was not prewarmed for this
        # exact program (tools/prewarm_stamp.py) — a cold compile is
        # then expected and diagnosable from the recorded JSON alone.
        "prewarm_stamp_fresh": _prewarm_fresh(),
    }
    if os.environ.get("BENCH_QUALITY", "on") != "off":
        from autompc_tpu.control.receding import make_receding_ilqr_loop

        Bq = int(os.environ.get("BENCH_QUALITY_B", "256"))
        n_steps = 200
        run_cl = jax.jit(
            make_receding_ilqr_loop(
                model.pred_core, cost, benchmark.dynamics,
                H=20, ds=4, dc=1, obsdim=4, dt=system.dt,
                n_steps=n_steps, ubounds=(bounds[:, 0], bounds[:, 1]),
            )
        )
        x0q = jnp.asarray(
            rng.uniform(-1, 1, (Bq, 4)) * np.array([3.1, 1.0, 1.0, 1.0]),
            dtype=x0s.dtype,
        )
        t0 = time.perf_counter()
        xs_cl, us_cl, nconv = run_cl(params, x0q)
        jax.block_until_ready(xs_cl)
        t_cl = time.perf_counter() - t0
        fx = np.asarray(xs_cl)
        success = (np.abs(fx[:, -1, 0]) < 0.2) & (np.abs(fx[:, -1, 1]) < 0.2)
        task_cost = np.sum(
            np.max(np.abs(fx[:, 1:, 0:3]), axis=-1) > 0.2, axis=1
        )
        quality.update(
            closed_loop_success_rate=round(float(success.mean()), 4),
            closed_loop_mean_task_cost=round(float(task_cost.mean()), 2),
            closed_loop_solver_converged_frac=round(
                float(np.asarray(nconv).mean() / n_steps), 4
            ),
            closed_loop_lanes=Bq,
        )
        print(
            f"[bench] closed-loop quality (B={Bq}, 200 MPC steps, "
            f"{t_cl:.1f}s incl. compile): "
            f"{success.mean() * 100:.1f}% swing-up success, "
            f"mean task cost {task_cost.mean():.1f}",
            file=sys.stderr,
        )
        # HARD gate (round-2): a perf "win" that degrades closed-loop
        # swing-up success below the threshold marks the whole run as
        # failing quality — recorded in the JSON so the regression can't
        # hide, and (BENCH_QUALITY_STRICT=1) a nonzero exit for CI use.
        # Measured success at the committed configuration is ~93-97%;
        # the default floor 0.85 leaves seed headroom without letting a
        # real regression (e.g. a broken acceptance rule reads ~60%)
        # pass.
        gate_min = float(os.environ.get("BENCH_QUALITY_MIN", "0.85"))
        gate_pass = bool(success.mean() >= gate_min)
        quality.update(
            quality_gate_min_success=gate_min,
            quality_gate_pass=gate_pass,
        )
        if not gate_pass:
            print(
                f"[bench] QUALITY GATE FAILED: closed-loop success "
                f"{success.mean() * 100:.1f}% < floor {gate_min * 100:.0f}%",
                file=sys.stderr,
            )
            if os.environ.get("BENCH_QUALITY_STRICT") == "1":
                print(
                    json.dumps(
                        {
                            "metric":
                                "ilqr_cartpole_solves_per_s_per_chip_H200",
                            "value": round(solves_per_s, 2),
                            "unit": "solves/s",
                            "vs_baseline": round(solves_per_s / 1000.0, 3),
                            "quality": quality,
                        }
                    )
                )
                sys.exit(2)

    print(
        json.dumps(
            {
                "metric": "ilqr_cartpole_solves_per_s_per_chip_H200",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 1000.0, 3),
                "quality": quality,
            }
        )
    )


def _prewarm_fresh():
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools")
        )
        from prewarm_stamp import stamp_status

        fresh, _ = stamp_status()
        return bool(fresh)
    except Exception:
        return False


def _check_prewarm():
    """Loud staleness banner (VERDICT r3 item 8): a cold driver run must
    never silently pay the ~900s fused-solver compile again."""
    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools")
        )
        from prewarm_stamp import stamp_status

        fresh, reason = stamp_status()
    except Exception as e:  # probe must never break the bench
        fresh, reason = False, f"stamp probe failed: {e}"
    if not fresh:
        sys.stderr.write(
            "\n" + "!" * 70 + "\n"
            "[bench] PERSISTENT COMPILE CACHE IS NOT PREWARMED FOR THIS "
            f"PROGRAM\n[bench]   ({reason})\n"
            "[bench] tier 1 may pay a cold ~10-25 min compile; run\n"
            "[bench]     python tools/prewarm_bench.py\n"
            "[bench] after any change to the bench's traced program.\n"
            + "!" * 70 + "\n\n"
        )
    return fresh


def _watchdog():
    """The remote-compile service's latency for the dual-Pallas solver
    varies from ~2 to ~17 minutes (warm persistent cache: seconds).
    Round 2 fell from the fused configuration (~41k solves/s) all the
    way to backward-only (~5.7k) in ONE step when the 900s deadline
    tripped. Round 3: a staged ladder with per-tier deadlines —

      1. fused      (dual-Pallas LS+backward, default): full speed
      2. pallas     (Pallas rollout kernel + XLA objective, ~33k
                     solves/s per PERF.md, materially cheaper compile)
      3. off        (backward-kernel-only, ~2-3 min compile, in-process
                     so a result ALWAYS prints)

    Exactly one JSON line is printed either way. The committed
    tools/prewarm_bench.py post-build step populates the persistent
    cache with tier 1's exact program, so in the expected path tier 1
    starts warm and finishes in ~1-2 min total."""
    import subprocess

    _check_prewarm()
    tiers = [
        ("fused", {}, float(os.environ.get("BENCH_DEADLINE", "900"))),
        (
            "pallas",
            {"BENCH_LS": "pallas"},
            float(os.environ.get("BENCH_DEADLINE_T2", "480")),
        ),
    ]
    for name, overrides, deadline in tiers:
        env = dict(os.environ)
        env.update(overrides)
        env["BENCH_TIER"] = name
        try:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                timeout=deadline, capture_output=True, text=True, env=env,
            )
            sys.stderr.write(r.stderr)
            lines = [
                ln for ln in r.stdout.splitlines() if ln.startswith("{")
            ]
            if r.returncode == 0 and lines:
                print(lines[-1])
                return
            sys.stderr.write(
                f"[bench] tier '{name}' failed (rc={r.returncode}, "
                f"{time.perf_counter() - t0:.0f}s); trying next tier\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f"[bench] tier '{name}' deadline {deadline:.0f}s "
                "exceeded; trying next tier\n"
            )
    sys.stderr.write("[bench] final tier: backward-only kernels\n")
    os.environ["BENCH_LS"] = "off"
    os.environ["BENCH_TIER"] = "off"
    main()


if __name__ == "__main__":
    if "--inner" in sys.argv or os.environ.get("BENCH_NO_WATCHDOG"):
        main()
    else:
        _watchdog()
