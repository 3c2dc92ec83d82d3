"""Per-phase timing of the batched iLQR solver body at the headline shape.

Builds the same solver configuration as bench.py, runs one real outer
iteration to get a representative carry, then times each phase of the
body as its own jitted program:

    expansions   terminal + stage cost expansions (vmap, elementwise)
    backward     Pallas batched TVLQR backward kernel
    linesearch   Pallas 10-alpha rollout kernel
    objective    candidate objectives + acceptance/selection (XLA)
    relinearize  dynamics Jacobians on the accepted trajectory
    body         the full body (one while_loop iteration), for reference

The phase sum exceeds the body slightly (phase boundaries materialize
arrays XLA would otherwise fuse); the ranking is what matters.

Usage:  python tools/profile_ilqr_phases.py  [B=16384] [H=200]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control.ilqr import make_batched_ilqr_solver
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.sysid import SINDy
    from autompc_tpu.utils.profiling import timeit_distinct  # noqa: F401

    benchmark = CartpoleSwingupBenchmark()
    system = benchmark.system
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
    bounds = benchmark.task.get_ctrl_bounds()
    # PHASE_SPARSE=off disables the static feature mask (bench.py's
    # BENCH_SPARSE; 7 of 55 features live on this model).
    if os.environ.get("PHASE_SPARSE", "auto") != "off":
        active = tuple(
            int(k) for k in np.flatnonzero(
                np.any(np.abs(np.asarray(model.coeffs)) > 0, axis=0)
            )
        )
    else:
        active = None
    kw = dict(
        H=H, ds=4, dc=1, obsdim=4, dt=system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]),
        backward="pallas",
        feature_spec=(model.library, "coeffs"),
        feature_mask=active,
        block_b=int(os.environ.get("BENCH_BLOCK", "128")),
        ls_block_l=int(os.environ.get("BENCH_LBLK", "10")),
        return_pieces=True,
    )
    solve, make_carry0, cond, make_body = make_batched_ilqr_solver(
        model.pred_core, cost, **kw
    )
    body = make_body(params)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-1, 1, (B, 4)) * np.array([3.1, 1.0, 1.0, 1.0])
    )
    uguess = jnp.zeros((B, H, 1))

    print(f"[phase] building carry (B={B}, H={H}) ...", flush=True)
    carry = jax.jit(make_carry0)(params, x0s, uguess)
    jbody = jax.jit(body)
    t0 = time.perf_counter()
    carry = jbody(carry)          # one real iteration -> representative
    jax.block_until_ready(carry["obj"])
    print(f"[phase] body compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)

    # ---- standalone phases on the live carry ------------------------
    from autompc_tpu.ops.pallas_linesearch import pallas_sindy_line_search
    from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward

    ds, dc, obsdim, dt = 4, 1, 4, system.dt
    library = model.library
    alphas = 0.2 ** jnp.arange(10)
    umin, umax = bounds[:, 0], bounds[:, 1]

    # Standalone phases use the same static feature filtering as the
    # solver (control/ilqr.py feature_mask).
    all_fns = tuple(library._fns)
    all_gts = library.grad_terms
    if active is not None:
        ph_fns = tuple(all_fns[k] for k in active)
        ph_gts = tuple(all_gts[k] for k in active)
        ph_coeffs = params["coeffs"][:, jnp.asarray(active)]
    else:
        ph_fns, ph_gts, ph_coeffs = all_fns, all_gts, params["coeffs"]

    def expansions(c):
        xs, us = c["xs"], c["us"]

        def term_one(x):
            _, tg, th = cost.eval_term_obs_cost_hess(x[:obsdim])
            Vn = jnp.zeros((ds, ds)).at[:obsdim, :obsdim].set(th)
            vn = jnp.zeros(ds).at[:obsdim].set(tg)
            return Vn, vn

        def one(x, u):
            _, qx, Qh = cost.eval_obs_cost_hess(x[:obsdim])
            _, ru, Rh = cost.eval_ctrl_cost_hess(u)
            Cxx = jnp.zeros((ds, ds)).at[:obsdim, :obsdim].set(Qh * dt)
            cx = jnp.zeros(ds).at[:obsdim].set(qx * dt)
            return Cxx, Rh * dt, cx, ru * dt

        Vn, vn = jax.vmap(term_one)(xs[:, H])
        Cxx, Cuu, cx, cu = jax.vmap(jax.vmap(one))(xs[:, :H], us)
        return Vn, vn, Cxx, Cuu, cx, cu

    jexp = jax.jit(expansions)
    Vn, vn, Cxx, Cuu, cx, cu = jexp(carry)
    jax.block_until_ready(vn)

    def backward(c, Cxx, Cuu, cx, cu, Vn, vn):
        return pallas_tvlqr_backward(
            c["Jx"], c["Ju"], Cxx, Cuu, cx, cu, Vn, vn,
            block_b=kw["block_b"] if B % kw["block_b"] == 0 else B,
        )

    jback = jax.jit(backward)
    Ks, ks, lin_red, quad_red = jback(carry, Cxx, Cuu, cx, cu, Vn, vn)
    jax.block_until_ready(ks)

    def linesearch(c, Ks, ks):
        return pallas_sindy_line_search(
            ph_fns, c["x0s"], c["xs"], c["us"], Ks, ks,
            ph_coeffs, alphas, umin, umax,
            block_b=kw["block_b"] if B % kw["block_b"] == 0 else B,
            block_l=kw["ls_block_l"],
        )

    jls = jax.jit(linesearch)
    ls_xs, ls_us = jls(carry, Ks, ks)
    jax.block_until_ready(ls_us)

    def objective(c, ls_xs, ls_us, lin_red, quad_red, ks):
        goal = jnp.zeros(obsdim)
        Qd = jnp.array([10.0, 0.1, 0.01, 0.01])
        Rd = jnp.array([0.001])
        Fd = Qd

        def obj_one(xs, us):
            dx = xs[:H, :obsdim] - goal
            oc = jnp.sum(dx * dx * Qd[None, :])
            cc = jnp.sum(us * us * Rd[None, :])
            dxt = xs[H, :obsdim] - goal
            return dt * (oc + cc) + jnp.sum(dxt * dxt * Fd)

        new_objs = jax.vmap(jax.vmap(obj_one))(ls_xs, ls_us)
        ks_small = jnp.sqrt(jnp.sum(ks**2, axis=(1, 2))) < 1e-3
        expect = alphas[None, :] * lin_red[:, None] + (
            alphas[None, :] ** 2
        ) * quad_red[:, None] / 2
        ratios = jnp.where(
            jnp.abs(expect) > 1e-30,
            (c["obj"][:, None] - new_objs) / -expect, -jnp.inf,
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
    new_xs, new_us, new_obj = jobj(carry, ls_xs, ls_us, lin_red, quad_red, ks)
    jax.block_until_ready(new_obj)

    def relinearize(xs, us):
        def one_traj(xs, us):
            def one(x, u):
                jx = jax.jacfwd(lambda s: model.pred_core(params, s, u))(x)
                ju = jax.jacfwd(lambda uu: model.pred_core(params, x, uu))(u)
                return jx, ju

            return jax.vmap(one)(xs[:H], us)

        return jax.vmap(one_traj)(xs, us)

    jrel = jax.jit(relinearize)
    Jx, Ju = jrel(new_xs, new_us)
    jax.block_until_ready(Ju)

    def relinearize_analytic(xs, us):
        z = jnp.concatenate([xs[:, :H], us], axis=-1)     # (B, H, ds+dc)
        Jth = library.jacobian(z)                          # (B, H, F, d)
        jac = jnp.einsum("bhfd,sf->bhsd", Jth, params["coeffs"])
        return jac[..., :ds], jac[..., ds:]

    jrel_an = jax.jit(relinearize_analytic)
    Jx_a, Ju_a = jrel_an(new_xs, new_us)
    jax.block_until_ready(Ju_a)
    err = float(jnp.max(jnp.abs(Jx_a - Jx)))
    print(f"[phase] analytic-vs-jacfwd Jacobian max |diff|: {err:.2e}")

    from autompc_tpu.ops.pallas_relin import pallas_feature_jacobians

    def relinearize_pallas(xs, us):
        return pallas_feature_jacobians(
            ph_fns, xs, us, ph_coeffs,
            block_b=kw["block_b"] if B % kw["block_b"] == 0 else B,
        )

    jrel_pl = jax.jit(relinearize_pallas)
    Jx_p, Ju_p = jrel_pl(new_xs, new_us)
    jax.block_until_ready(Ju_p)
    err = float(jnp.max(jnp.abs(Jx_p - Jx)))
    print(f"[phase] pallas-vs-jacfwd Jacobian max |diff|: {err:.2e}")

    def relinearize_pallas_sparse(xs, us):
        return pallas_feature_jacobians(
            ph_fns, xs, us, ph_coeffs,
            grad_terms=ph_gts,
            block_b=kw["block_b"] if B % kw["block_b"] == 0 else B,
        )

    jrel_sp = jax.jit(relinearize_pallas_sparse)
    Jx_s, Ju_s = jrel_sp(new_xs, new_us)
    jax.block_until_ready(Ju_s)
    err = float(jnp.max(jnp.abs(Jx_s - Jx)))
    print(f"[phase] pallas(sparse)-vs-jacfwd Jacobian max |diff|: {err:.2e}")

    # ---- timings -----------------------------------------------------
    # The remote-execution layer can memoize identical (program, input)
    # dispatches, so every rep must be a DISTINCT dispatch: perturb one
    # operand by a per-rep epsilon (a cheap elementwise add that cannot
    # change the phase's runtime, only its dispatch identity).
    from autompc_tpu.utils.profiling import timeit_distinct

    reps = int(os.environ.get("PHASE_REPS", "20"))
    epss = [jnp.float32(i) * jnp.float32(1e-6) for i in range(reps + 1)]
    results = {}

    def timed(name, fn, *big):
        # Big operands must be ARGUMENTS (closed-over arrays become
        # jaxpr constants and blow up the remote-compile request).
        results[name], _ = timeit_distinct(
            jax.jit(fn), [(e,) + big for e in epss], name=name,
            silent=True,
        )

    timed(
        "expansions",
        lambda e, c: jexp({**c, "xs": c["xs"] + e}),
        carry,
    )
    timed(
        "backward",
        lambda e, c, a, b, x, u, V, v: jback(c, a, b, x + e, u, V, v),
        carry, Cxx, Cuu, cx, cu, Vn, vn,
    )
    timed(
        "linesearch",
        lambda e, c, K, k: jls(c, K, k + e),
        carry, Ks, ks,
    )
    timed(
        "objective",
        lambda e, c, lx, lu, lr, qr, k: jobj(c, lx, lu, lr + e, qr, k),
        carry, ls_xs, ls_us, lin_red, quad_red, ks,
    )
    timed("relinearize", lambda e, xs_, us_: jrel(xs_ + e, us_),
          new_xs, new_us)
    timed("relin(analytic)", lambda e, xs_, us_: jrel_an(xs_ + e, us_),
          new_xs, new_us)
    timed("relin(pallas)", lambda e, xs_, us_: jrel_pl(xs_ + e, us_),
          new_xs, new_us)
    timed("relin(sparse)", lambda e, xs_, us_: jrel_sp(xs_ + e, us_),
          new_xs, new_us)
    timed(
        "body(full)",
        lambda e, c: jbody({**c, "xs": c["xs"] + e}),
        carry,
    )

    phase_sum = sum(
        v for k, v in results.items()
        if k not in (
            "body(full)", "relin(analytic)", "relin(pallas)",
            "relin(sparse)",
        )
    )
    print(f"\nPer-iteration phase timing (pipelined), B={B}, H={H}:")
    for k, v in results.items():
        print(f"  {k:<16} {v * 1e3:9.2f} ms   {100 * v / phase_sum:5.1f}%"
              " of phase sum")
    print(f"  {'phase sum':<16} {phase_sum * 1e3:9.2f} ms"
          "   (jacfwd relinearize variant)")


if __name__ == "__main__":
    main()
