"""Phase profile of the GP-candidate tuning fan-out (VERDICT r3 item 4).

The gp-mode bench_scaling row (649-651 evals/s) sits ~4x below the
fixed-SINDy-model row (2,616) with no profile explaining why. This tool
splits the fan-out's per-step batched iLQR body into phases at the
bench shapes (B=512 candidates, horizon 10, cartpole dims, SVGP M=100)
— the same method as tools/profile_cheetah_phases.py — and separately
times:

  * shared-SVGP training per induce_count bucket (the joint_gp tuner
    trains ONE SVGP per distinct induce_count; a wide sweep pays this
    per bucket — the What's-missing #1 scenario), at several M;
  * GP predictor primitives (cached-mean pred, jacfwd Jacobians) vs
    the SINDy equivalents, at rollout/relin shapes;
  * the solver-body phases: expansions / backward / linesearch /
    objective / relinearize / full body.

Usage:  python tools/profile_gp_fanout.py  [B=512] [H=10]
        PROFILE_GP_M=100 PROFILE_GP_TRAIN_MS=50,100,200
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver
    from autompc_tpu.sysid import SINDy
    from autompc_tpu.sysid.gp import ApproximateGPModel
    from autompc_tpu.utils.profiling import timeit_distinct

    benchmark = CartpoleSwingupBenchmark()
    system = benchmark.system
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    tlist = trajs.to_list()

    sindy = SINDy(
        system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    sindy.train(trajs)

    # --- bucket-training cost (the wide-sweep scenario) --------------
    M_default = int(os.environ.get("PROFILE_GP_M", "100"))
    train_ms = [
        int(m) for m in os.environ.get(
            "PROFILE_GP_TRAIN_MS", f"50,{M_default},200"
        ).split(",")
    ]
    train_times = {}
    for M in train_ms:
        gp_m = ApproximateGPModel(system, induce_count=M)
        t0 = time.perf_counter()
        gp_m.train(tlist, silent=True)
        train_times[M] = time.perf_counter() - t0
        print(f"[gp-profile] shared-SVGP train (M={M}): "
              f"{train_times[M]:.2f}s", flush=True)
        if M == M_default:
            gp = gp_m
    mean_train = float(np.mean(list(train_times.values())))
    print(
        f"[gp-profile] 16-distinct-induce_count sweep would pay "
        f"~{16 * mean_train:.0f}s of bucket training "
        f"(vs one {mean_train:.1f}s bucket when values repeat)",
        flush=True,
    )

    params = gp.params  # cached-mean-weights predictor
    ds, dc = 4, 1

    # --- predictor primitives at rollout/relin shapes ----------------
    rng = np.random.default_rng(0)
    n_pred = B * 10  # line search: B lanes x 10 alphas, per H step
    xs_p = jnp.asarray(rng.uniform(-1, 1, (n_pred, ds)), jnp.float32)
    us_p = jnp.asarray(rng.uniform(-1, 1, (n_pred, dc)), jnp.float32)

    def batch_pred(model_params, x, u, core):
        return jax.vmap(lambda a, b: core(model_params, a, b))(x, u)

    for name, core, p in (
        ("gp_pred", gp.pred_core, params),
        ("sindy_pred", sindy.pred_core, sindy.params),
    ):
        fn = jax.jit(lambda mp, x, u, core=core: batch_pred(mp, x, u, core))
        ins = [(p, xs_p + 0.01 * r, us_p) for r in range(4)]
        timeit_distinct(fn, ins, name=f"{name} ({n_pred} preds)")

    def batch_jac(model_params, x, u, core):
        def one(a, b):
            f = lambda xu: core(
                model_params, xu[:ds], xu[ds:]
            )
            J = jax.jacfwd(f)(jnp.concatenate([a, b]))
            return J[:, :ds], J[:, ds:]

        return jax.vmap(one)(x, u)

    n_jac = B * H
    xs_j = jnp.asarray(rng.uniform(-1, 1, (n_jac, ds)), jnp.float32)
    us_j = jnp.asarray(rng.uniform(-1, 1, (n_jac, dc)), jnp.float32)
    for name, core, p in (
        ("gp_jacfwd", gp.pred_core, params),
        ("sindy_jacfwd", sindy.pred_core, sindy.params),
    ):
        fn = jax.jit(lambda mp, x, u, core=core: batch_jac(mp, x, u, core))
        ins = [(p, xs_j + 0.01 * r, us_j) for r in range(4)]
        timeit_distinct(fn, ins, name=f"{name} ({n_jac} jacobians)")

    # --- solver-body phases at the fan-out shape ---------------------
    from autompc_tpu.costs import QuadCost

    cost = QuadCost(
        system,
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        0.001 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        goal=jnp.zeros(4),
    )
    bounds = benchmark.task.get_ctrl_bounds()
    on_tpu = jax.default_backend() == "tpu"
    solve, make_carry0, cond, make_body = make_batched_ilqr_solver(
        gp.pred_core, cost,
        H=H, ds=ds, dc=dc, obsdim=ds, dt=system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]),
        backward="pallas" if on_tpu else "scan",
        return_pieces=True,
    )
    body = make_body(params)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, ds)) * np.array([3.1, 1.0, 1.0, 1.0]),
        jnp.float32,
    )
    ug = jnp.zeros((B, H, dc), jnp.float32)
    carry = jax.jit(make_carry0)(params, x0s, ug)
    jbody = jax.jit(body)
    t0 = time.perf_counter()
    carry = jbody(carry)
    jax.block_until_ready(carry["obj"])
    print(f"[gp-profile] body compile+first: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    carries = [carry]
    for _ in range(4):
        carries.append(jbody(carries[-1]))
    jax.block_until_ready(carries[-1]["obj"])
    per_body, _ = timeit_distinct(
        jbody, [(c,) for c in carries], name=f"body (B={B}, H={H})"
    )

    # Full solve + whole-fanout eval for scale.
    jsolve = jax.jit(solve)
    ins = [(params, x0s + 0.01 * r, ug) for r in range(3)]
    per_solve, out = timeit_distinct(jsolve, ins, name="full solve")
    iters_hint = float(np.asarray(out[0]).mean())
    print(
        f"[gp-profile] per-step solve {per_solve * 1e3:.1f} ms "
        f"(converged frac {iters_hint:.3f}); a 50-step closed loop "
        f"=> {50 * per_solve:.2f}s/batch lower bound "
        f"=> {B / (50 * per_solve):.0f} evals/s upper bound",
        flush=True,
    )


if __name__ == "__main__":
    main()
