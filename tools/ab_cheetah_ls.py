"""Interleaved A/B of cheetah iLQR line-search configurations.

VERDICT r3 item 1: the committed cheetah default (XLA-scan line search,
bf16 MXU matmuls) reads ~2,030 solves/s at 94.6% converged while every
honest-f32 path reads 1,463-1,547 at 99.8-100%. The mxu-layout kernel's
7x lane padding (18 -> 128) was named as the addressable cause; the new
"feat" layout (ops/pallas_mlp_linesearch.py:_mlp_ls_kernel_feat) keeps
the slab layout's dense data movement and runs the layers as
transposed-weight MXU dot_generals.

This harness builds every variant ONCE, warms them all, then interleaves
distinct-input reps round-robin (the only measurement the tunnel's
day-to-day drift band doesn't swallow — PERF.md) and prints solves/s +
converged fraction per variant.

Usage:
    python tools/ab_cheetah_ls.py                       # default set
    AB_VARIANTS=scan,feat-highest python tools/ab_cheetah_ls.py
    AB_B=1024 AB_ROUNDS=4 AB_SCHED=... AB_FEAT_BLOCK=256 ...

Variants: scan (bf16 default), scan-highest (forced-f32 XLA),
mxu-highest (round-3 kernel), feat-highest / feat-bf16x3 (round-4
dense layout; bf16x3 = manual 3-pass f32 emulation), slab.
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

    from autompc_tpu.benchmarks import HalfcheetahBenchmark
    from autompc_tpu.control.ilqr import (
        make_scheduled_ilqr_solver,
        parse_schedule,
    )
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import MLP

    B = int(os.environ.get("AB_B", "1024"))
    H = int(os.environ.get("AB_H", "200"))
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    sched = parse_schedule(
        os.environ.get("AB_SCHED", "12:0.5,18:0.25,26:0.125,34:0.0625")
    )

    hc = HalfcheetahBenchmark()
    trajs = hc.gen_trajs_batch(seed=0, n_trajs=24, traj_len=40)
    model = MLP(hc.system, n_hidden_layers=2, hidden_size=64,
                n_train_iters=10, n_batch=64)
    model.train(trajs)
    params = model.params
    cost = QuadCost(
        hc.system, jnp.eye(18), 0.01 * jnp.eye(6), jnp.eye(18),
        goal=jnp.zeros(18),
    )
    bounds = hc.task.get_ctrl_bounds()
    base_kw = dict(
        H=H, ds=18, dc=6, obsdim=18, dt=hc.system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]),
        backward="pallas",
        max_iter=50,
        block_b=int(os.environ.get("AB_BLOCK", "256")),
        pred_diff=model.pred_diff_core,
    )
    feat_tb = int(os.environ.get("AB_FEAT_BLOCK", "256"))
    mxu_tb = int(os.environ.get("AB_MXU_BLOCK", "128"))

    def build(name):
        kw = dict(base_kw)
        if name == "scan":
            pass
        elif name == "scan-highest":
            # Whole-program forced f32: the context manager must wrap
            # TRACING (jit defers it to first call), so it lives inside
            # the jitted wrapper.
            inner = make_scheduled_ilqr_solver(
                model.pred_core, cost, schedule=sched, **kw
            )

            def solve_hp(p, x, u, _inner=inner):
                with jax.default_matmul_precision("highest"):
                    return _inner(p, x, u)

            return jax.jit(solve_hp)
        elif name.startswith(("mxu", "feat", "slab")):
            layout = name.split("-")[0]
            precision = name.split("-")[1] if "-" in name else "highest"
            kw["mlp_ls"] = dict(
                nonlin=model.nonlintype, layout=layout,
                precision=precision,
                block_b=feat_tb if layout == "feat" else mxu_tb,
            )
        else:
            raise ValueError(f"unknown variant {name!r}")
        return jax.jit(make_scheduled_ilqr_solver(
            model.pred_core, cost, schedule=sched, **kw
        ))

    names = os.environ.get(
        "AB_VARIANTS", "scan,feat-highest,feat-bf16x3,mxu-highest"
    ).split(",")
    solvers = {}
    for name in names:
        t0 = time.perf_counter()
        solvers[name] = build(name)
        print(f"[ab] built {name} ({time.perf_counter() - t0:.1f}s)",
              flush=True)

    rng = np.random.default_rng(0)
    x0_pool = [
        jnp.asarray(rng.uniform(-0.1, 0.1, (B, 18)), dtype=jnp.float32)
        for _ in range(rounds + 1)
    ]
    ug = jnp.zeros((B, H, 6), dtype=jnp.float32)

    # Warm every variant (compile + one execution, excluded).
    conv = {}
    for name, solve in solvers.items():
        t0 = time.perf_counter()
        out = solve(params, x0_pool[0], ug)
        jax.block_until_ready(out)
        conv[name] = float(np.asarray(out[0]).mean())
        print(
            f"[ab] warm {name}: {time.perf_counter() - t0:.1f}s "
            f"(converged {conv[name] * 100:.1f}%)",
            flush=True,
        )

    # Interleave: round-robin over variants, distinct input per round.
    times = {name: [] for name in solvers}
    for r in range(rounds):
        for name, solve in solvers.items():
            t0 = time.perf_counter()
            out = solve(params, x0_pool[r + 1], ug)
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
