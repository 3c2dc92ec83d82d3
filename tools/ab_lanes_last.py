"""Interleaved A/B of the lanes-last packed carry vs the batch-major
carry on the headline cartpole workload (round 4).

Both variants run the SAME kernels (fused line search with packed-jac
relinearization + diagonal-quad backward) under the same compaction
schedule; the only difference is the carry layout — lanes_last keeps
(H, ..., B) planes across iterations, batch-major relayouts every
kernel boundary. Distinct inputs per round, round-robin.

Usage:
    python tools/ab_lanes_last.py                 # B=4096
    AB_B=65536 AB_ROUNDS=4 python tools/ab_lanes_last.py
    AB_VARIANTS=ll python tools/ab_lanes_last.py  # subset
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control.ilqr import (
        make_scheduled_ilqr_solver,
        parse_schedule,
    )
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import SINDy

    B = int(os.environ.get("AB_B", "4096"))
    H = 200
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    sched = parse_schedule(os.environ.get(
        "AB_SCHED", "8:0.75,15:0.5,22:0.25,30:0.125,40:0.0625"
    ))

    benchmark = CartpoleSwingupBenchmark()
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        benchmark.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    cost = QuadCost(
        benchmark.system,
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        0.001 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        goal=jnp.zeros(4),
    )
    bounds = benchmark.task.get_ctrl_bounds()
    mask = tuple(
        int(k) for k in np.flatnonzero(
            np.any(np.abs(np.asarray(model.coeffs)) > 0, axis=0)
        )
    )
    base_kw = dict(
        H=H, ds=4, dc=1, obsdim=4, dt=benchmark.system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]),
        backward="pallas",
        feature_spec=(model.library, "coeffs"),
        fuse_ls=True,
        feature_mask=mask,
        block_b=int(os.environ.get("AB_BLOCK", "128")),
        ls_block_l=10,
        schedule=sched,
    )

    # Variants: bm (batch-major), ll (lanes-last), llw (lanes-last +
    # WIDE split line search), llc (lanes-last + cast-IO wide backward
    # — round 5; ll pins AMPC_BQ_WIDE_IO=reshape for the A/B), llb
    # (llc + bf16 packed-jac carry — half the backward's biggest
    # stream and the B=131072 HBM fit; control/ilqr.py jac_dtype).
    names = os.environ.get("AB_VARIANTS", "bm,ll").split(",")
    solvers = {}
    for name in names:
        kw = dict(
            base_kw,
            lanes_last=(name in ("ll", "llw", "llc", "llb")),
            ls_wide=(name == "llw"),
            jac_dtype="bf16" if name == "llb" else "f32",
        )
        solvers[name] = jax.jit(
            make_scheduled_ilqr_solver(model.pred_core, cost, **kw)
        )

    rng = np.random.default_rng(0)
    scale = np.array([3.1, 1.0, 1.0, 1.0])
    x0_pool = [
        jnp.asarray(rng.uniform(-1, 1, (B, 4)) * scale, jnp.float32)
        for _ in range(rounds + 1)
    ]
    ug = jnp.zeros((B, H, 1), jnp.float32)

    conv = {}
    for name, solve in solvers.items():
        # The wide backward reads AMPC_BQ_WIDE_IO at trace time, i.e.
        # at this first (warming) call.
        os.environ["AMPC_BQ_WIDE_IO"] = (
            "cast" if name in ("llc", "llb") else "reshape"
        )
        t0 = time.perf_counter()
        out = solve(model.params, x0_pool[0], ug)
        jax.block_until_ready(out)
        conv[name] = float(np.asarray(out[0]).mean())
        print(
            f"[ab] warm {name}: {time.perf_counter() - t0:.1f}s "
            f"(converged {conv[name] * 100:.1f}%)",
            flush=True,
        )

    times = {name: [] for name in solvers}
    for r in range(rounds):
        for name, solve in solvers.items():
            t0 = time.perf_counter()
            out = solve(model.params, x0_pool[r + 1], ug)
            jax.block_until_ready(out)
            times[name].append(time.perf_counter() - t0)

    for name in solvers:
        per = float(np.mean(times[name]))
        print(json.dumps({
            "variant": name,
            "solves_per_s": round(B / per, 1),
            "per_batch_s": round(per, 4),
            "converged_frac": round(conv[name], 4),
            "rounds": rounds, "B": B, "H": H,
        }))


if __name__ == "__main__":
    main()
