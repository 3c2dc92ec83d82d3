"""Per-phase timing of the batched iLQR body at HALFCHEETAH scale.

Same method as profile_ilqr_phases.py (cartpole/SINDy) but at the
multi-control MLP workload (ds=18, dc=6, H=200, 2x64 MLP — the
bench_extra.py halfcheetah_ilqr_solves_per_s_per_chip configuration):

    expansions   stage/terminal quadratic expansions (vmap)
    backward     Pallas general backward kernel (any (ds, dc))
    linesearch   XLA-scan 10-alpha MLP rollout (the phase VERDICT r2
                 item 3 names as the current bottleneck)
    objective    candidate objectives + acceptance/selection
    relinearize  analytic MLP layer-chain Jacobians on accepted traj
    body         one full while-loop iteration, for reference

Usage:  python tools/profile_cheetah_phases.py  [B=1024] [H=200]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import HalfcheetahBenchmark
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import MLP
    from autompc_tpu.utils.profiling import timeit_distinct

    hc = HalfcheetahBenchmark()
    system = hc.system
    trajs = hc.gen_trajs_batch(seed=0, n_trajs=24, traj_len=40)
    model = MLP(system, n_hidden_layers=2, hidden_size=64,
                n_train_iters=10, n_batch=64)
    model.train(trajs)
    params = model.params

    ds = dc = None  # set below
    ds, dc, obsdim, dt = 18, 6, 18, system.dt
    cost = QuadCost(
        system, jnp.eye(ds), 0.01 * jnp.eye(dc), jnp.eye(ds),
        goal=jnp.zeros(ds),
    )
    bounds = hc.task.get_ctrl_bounds()
    umin, umax = bounds[:, 0], bounds[:, 1]
    block_b = int(os.environ.get("BENCH_HC_ILQR_BLOCK", "256"))
    kw = dict(
        H=H, ds=ds, dc=dc, obsdim=obsdim, dt=dt,
        ubounds=(umin, umax),
        backward=os.environ.get("BENCH_HC_ILQR_BACKWARD", "pallas"),
        block_b=block_b,
        pred_diff=model.pred_diff_core,
        return_pieces=True,
    )
    solve, make_carry0, cond, make_body = make_batched_ilqr_solver(
        model.pred_core, cost, **kw
    )
    body = make_body(params)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.1, 0.1, (B, ds)), dtype=jnp.float32)
    uguess = jnp.zeros((B, H, dc), dtype=jnp.float32)

    print(f"[phase] building carry (B={B}, H={H}) ...", flush=True)
    carry = jax.jit(make_carry0)(params, x0s, uguess)
    jbody = jax.jit(body)
    t0 = time.perf_counter()
    carry = jbody(carry)
    jax.block_until_ready(carry["obj"])
    print(f"[phase] body compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)

    # ---- standalone phases on the live carry ------------------------
    from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward_general

    alphas = 0.2 ** jnp.arange(10)
    Qd = jnp.ones(ds)
    Rd = jnp.full(dc, 0.01)
    Fd = jnp.ones(ds)
    goal = jnp.zeros(ds)

    def expansions(xs, us):
        def term_one(x):
            Vn = 2.0 * jnp.diag(Fd)
            vn = 2.0 * Fd * (x - goal)
            return Vn, vn

        def one(x, u):
            Cxx = 2.0 * jnp.diag(Qd) * dt
            cx = 2.0 * Qd * (x - goal) * dt
            Cuu = 2.0 * jnp.diag(Rd) * dt
            cu = 2.0 * Rd * u * dt
            return Cxx, Cuu, cx, cu

        Vn, vn = jax.vmap(term_one)(xs[:, H])
        Cxx, Cuu, cx, cu = jax.vmap(jax.vmap(one))(xs[:, :H], us)
        return Vn, vn, Cxx, Cuu, cx, cu

    jexp = jax.jit(expansions)
    Vn, vn, Cxx, Cuu, cx, cu = jexp(carry["xs"], carry["us"])
    jax.block_until_ready(vn)

    def backward(Jx, Ju, Cxx, Cuu, cx, cu, Vn, vn):
        return pallas_tvlqr_backward_general(
            Jx, Ju, Cxx, Cuu, cx, cu, Vn, vn,
            block_b=block_b if B % block_b == 0 else B,
        )

    jback = jax.jit(backward)
    Ks, ks, lin_red, quad_red = jback(
        carry["Jx"], carry["Ju"], Cxx, Cuu, cx, cu, Vn, vn
    )
    jax.block_until_ready(ks)

    def clip_u(u):
        return jnp.clip(u, umin, umax)

    def line_search_one(x0, xs, us, Ks_l, ks_l):
        def rollout(alpha):
            def step(x, inp):
                xbar, ubar, K, k = inp
                u = clip_u(alpha * k + ubar + K @ (x - xbar))
                x1 = model.pred_core(params, x, u)
                return x1, (x1, u)

            _, (xs1, us1) = jax.lax.scan(step, x0, (xs[:H], us, Ks_l, ks_l))
            return jnp.concatenate([x0[None], xs1], axis=0), us1

        return jax.vmap(rollout)(alphas)

    def linesearch(x0s, xs, us, Ks, ks):
        return jax.vmap(line_search_one)(x0s, xs, us, Ks, ks)

    jls = jax.jit(linesearch)
    ls_xs, ls_us = jls(carry["x0s"], carry["xs"], carry["us"], Ks, ks)
    jax.block_until_ready(ls_us)

    def objective(obj0, ls_xs, ls_us, lin_red, quad_red, ks):
        def obj_one(xs, us):
            dx = xs[:H] - goal
            oc = jnp.sum(dx * dx * Qd[None, :])
            cc = jnp.sum(us * us * Rd[None, :])
            dxt = xs[H] - goal
            return dt * (oc + cc) + jnp.sum(dxt * dxt * Fd)

        new_objs = jax.vmap(jax.vmap(obj_one))(ls_xs, ls_us)
        ks_small = jnp.sqrt(jnp.sum(ks**2, axis=(1, 2))) < 1e-3
        expect = alphas[None, :] * lin_red[:, None] + (
            alphas[None, :] ** 2
        ) * quad_red[:, None] / 2
        ratios = jnp.where(
            jnp.abs(expect) > 1e-30,
            (obj0[:, None] - new_objs) / -expect, -jnp.inf,
        )
        accept = ratios > 0.3
        any_acc = jnp.any(accept, axis=1)
        first_acc = jnp.argmax(accept, axis=1)
        chosen = jnp.where(
            ks_small, 0,
            jnp.where(any_acc, first_acc, jnp.argmin(new_objs, axis=1)),
        )
        take = jax.vmap(lambda a, i: a[i])
        return take(ls_xs, chosen), take(ls_us, chosen), take(new_objs, chosen)

    jobj = jax.jit(objective)
    acc_xs, acc_us, acc_obj = jobj(
        carry["obj"], ls_xs, ls_us, lin_red, quad_red, ks
    )
    jax.block_until_ready(acc_obj)

    def relinearize(xs, us):
        def one(x, u):
            _, jx, ju = model.pred_diff_core(params, x, u)
            return jx, ju

        return jax.vmap(jax.vmap(one))(xs[:, :H], us)

    jrel = jax.jit(relinearize)
    Jx, Ju = jrel(acc_xs, acc_us)
    jax.block_until_ready(Ju)

    # timeit_distinct needs DISTINCT inputs per rep (the axon remote
    # layer memoizes repeated (program, input) dispatches); vary one
    # cheap argument per phase.
    reps = int(os.environ.get("PHASE_REPS", "6"))
    eps = [1e-6 * (r + 1) for r in range(reps)]
    rows = [
        ("expansions", jexp,
         [(carry["xs"] + e, carry["us"]) for e in eps]),
        ("backward", jback,
         [(carry["Jx"], carry["Ju"], Cxx, Cuu, cx + e, cu, Vn, vn)
          for e in eps]),
        ("linesearch", jls,
         [(carry["x0s"] + e, carry["xs"], carry["us"], Ks, ks)
          for e in eps]),
        ("objective", jobj,
         [(carry["obj"] + e, ls_xs, ls_us, lin_red, quad_red, ks)
          for e in eps]),
        ("relinearize", jrel, [(acc_xs + e, acc_us) for e in eps]),
        ("body", jbody,
         [(dict(carry, x0s=carry["x0s"] + e),) for e in eps]),
    ]
    print(f"[phase] B={B} H={H} ds={ds} dc={dc} reps={reps}")
    for name, fn, inputs in rows:
        ms, _ = timeit_distinct(fn, inputs, silent=True)
        print(f"[phase] {name:12s} {ms * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
