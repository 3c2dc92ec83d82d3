"""Interleaved A/B of the WIDE streamed Riccati backward kernel.

Round-5 lever (VERDICT r4 item 2): the standalone WIDE backward sits at
~19.8 ms at B=65536 against a 2.75 ms stream-bytes floor — dependency-
chain latency, not HBM. S sublanes per slab = S/8 independent vreg
chains per op; T timesteps per grid cell bound the VMEM footprint
(S=32 at T=25 exceeds the 16 MB scoped limit, so wider S needs shorter
cells). This sweeps (S, T) pairs INTERLEAVED (every variant timed in
each round, distinct inputs per call) so tunnel/device drift cancels.

Measurement protocol (this tool found the hard way):
``jax.block_until_ready`` on the axon remote path does NOT wait for
queued device work (4 dispatches + block read 0.04 ms "per call" for a
~20 ms kernel). The only reliable sync is a device->host pull, so each
timed call returns reduced SCALARS and the loop pulls the last one:
the device executes its queue in order, so the pull waits for all K
computes; total/K amortizes the one ~27 ms pull RTT. Distinct inputs
per call come from an in-jit perturbation of one device-resident base
draw (the kernel has a fixed trip count — no convergence dependence —
so shifted inputs time identically to fresh draws; fresh 1.9 GB draws
per call would not fit K deep in HBM).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_wide_backward.py
    AB_VARIANTS="16:25,32:10,64:5" AB_B=65536 AB_ROUNDS=5 AB_INNER=8
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from autompc_tpu.ops import pallas_riccati as pr

    B = int(os.environ.get("AB_B", "65536"))
    H, ds, obsdim = 200, 4, 4
    dt = 0.05
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    K = int(os.environ.get("AB_INNER", "8"))
    # "S:T" or "S:T:mode" with mode in std|sym|probe (probe = the
    # diagnostic stream floor — wrong values, excluded from the check).
    def parse_variant(v):
        parts = v.split(":")
        return (int(parts[0]), int(parts[1]),
                parts[2] if len(parts) > 2 else "std")

    variants = [
        parse_variant(v)
        for v in os.environ.get(
            "AB_VARIANTS", "8:25,16:25,32:10,32:8,64:5"
        ).split(",")
    ]
    use_carry = os.environ.get("AB_CARRY", "1") != "0"

    # AB_PATH=4d: draw DIRECTLY in the kernel's (..., nl, 128) layout
    # and call the 4D core — zero relayouts anywhere in the timed call.
    path_4d = os.environ.get("AB_PATH", "3d") == "4d"
    nl = B // 128

    # One device-resident base draw; timed calls perturb jac_p in-jit.
    @jax.jit
    def _draw(key):
        ks = jax.random.split(key, 6)
        if path_4d:
            shp = lambda *pre: tuple(pre) + (nl, 128)
        else:
            shp = lambda *pre: tuple(pre) + (B,)
        jac_p = 0.1 * jax.random.normal(
            ks[0], shp(H, ds * (ds + 1)), jnp.float32
        )
        # AB_JAC=bf16: the half-stream bf16 jac carry
        # (control/ilqr.py jac_dtype) — the kernel upcasts on read.
        if os.environ.get("AB_JAC") == "bf16":
            jac_p = jac_p.astype(jnp.bfloat16)
        if path_4d:
            xsT = jax.random.normal(ks[1], shp(H, ds), jnp.float32)
            xterm = jax.random.normal(ks[1], shp(ds), jnp.float32)
        else:
            xsT = jax.random.normal(ks[1], shp(H + 1, ds), jnp.float32)
            xterm = None
        usT = jax.random.normal(ks[2], shp(H), jnp.float32)
        QdT = jnp.ones(shp(obsdim), jnp.float32)
        RdT = jnp.ones(shp(1), jnp.float32)
        FdT = jnp.ones(shp(obsdim), jnp.float32)
        args = [jac_p, xsT, usT, QdT, RdT, FdT]
        if path_4d:
            args.insert(2, xterm)
        if use_carry:
            if path_4d:
                act = (jax.random.uniform(ks[3], shp(1)) > 0.3).astype(
                    jnp.float32
                )
            else:
                act = jax.random.uniform(ks[3], (B,)) > 0.3
            oK = jax.random.normal(ks[4], shp(H, ds), jnp.float32)
            ok = jax.random.normal(ks[5], shp(H), jnp.float32)
            args += [act, oK, ok]
        return tuple(args)

    goal = np.zeros(obsdim)

    # mode "noop" skips the kernel entirely, measuring the harness's
    # own eps-add + reductions, so core time = variant - noop.
    def make_fn(S, T, mode="std", reduced=True):
        # _backward_quad_ll_wide reads AMPC_BQ_WIDE_S/T (and the step
        # mode) at TRACE time; a fresh jit wrapper per variant gives
        # each its own trace.
        def call(eps, *args):
            if mode == "noop":
                out = (args[0] + eps, args[1], args[2], args[3])
            elif path_4d:
                jac4, xs4, xterm, us4, QdT, RdT, FdT = args[:7]
                carry = tuple(args[7:]) if len(args) > 7 else None
                goal2 = jnp.zeros((obsdim, 1), jnp.float32)
                out = pr._backward_quad_ll_wide_4d(
                    jac4 + eps, xs4, xterm, us4, QdT, RdT, FdT, goal2,
                    dt, obsdim, False, carry,
                )
            else:
                jac_p, xsT, usT, QdT, RdT, FdT = args[:6]
                carry = tuple(args[6:]) if len(args) > 6 else None
                body = (
                    pr._backward_quad_ll_wide_cast
                    if os.environ.get("AB_PATH") == "cast"
                    else pr._backward_quad_ll_wide
                )
                out = body(
                    # Perturb in the jac's own dtype (a f32 eps would
                    # silently promote a bf16 jac back to f32).
                    jac_p + jnp.asarray(eps, jac_p.dtype),
                    xsT, usT, QdT, RdT, FdT, goal, dt,
                    obsdim, False, carry,
                )
            if reduced:
                return tuple(jnp.sum(o) for o in out)
            return out

        jitted = jax.jit(call)

        def run(*args):
            os.environ["AMPC_BQ_WIDE_S"] = str(S)
            os.environ["AMPC_BQ_WIDE_T"] = str(T)
            os.environ["AMPC_BQ_WIDE_STEP"] = mode
            return jitted(*args)

        return run

    fns = {v: make_fn(*v) for v in variants}
    base = _draw(jax.random.PRNGKey(7))
    float(jnp.sum(base[0]))  # materialize the draw

    # Compile + warm each variant once (env must be set during trace).
    for v, fn in list(fns.items()):
        t0 = time.perf_counter()
        try:
            out = fn(0.0, *base)
            _ = float(out[0])
            print(
                f"[ab] compile {v}: {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"[ab] variant {v} FAILED: {e}", file=sys.stderr)
            fns[v] = None

    # RTT floor for the scalar pull (subtracted per-call as rtt/K).
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(fns[variants[0]](0.0, *base)[0]) if fns[variants[0]] else 0
    rtt_probe = (time.perf_counter() - t0) / 3
    print(f"[ab] warm call+pull probe: {rtt_probe * 1e3:.1f} ms",
          file=sys.stderr)

    times = {v: [] for v in variants}
    for rnd in range(rounds):
        for v, fn in fns.items():
            if fn is None:
                continue
            _ = float(fn(0.0, *base)[0])  # steady-state warm, untimed
            t0 = time.perf_counter()
            last = None
            for j in range(K):
                last = fn(1e-3 * (rnd * K + j + 1), *base)
            _ = float(last[0])  # queue is in-order: waits for all K
            times[v].append((time.perf_counter() - t0) / K)

    # Cross-variant value check (full outputs, one perturbed input).
    full = {
        v: make_fn(*v, reduced=False)(1e-3, *base)
        for v in variants
        if fns[v] is not None and v[2] not in ("probe", "noop")
    }
    vs = list(full)
    ref = full[vs[0]]
    for v in vs[1:]:
        for a, b in zip(ref, full[v]):
            d = float(jnp.max(jnp.abs(
                jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)
            )))
            if d > 1e-4:
                print(f"[ab] WARNING {vs[0]} vs {v}: maxdiff {d:.2e}",
                      file=sys.stderr)

    print(f"\n B={B} H={H} carry={use_carry} rounds={rounds} K={K}")
    for v in variants:
        if not times[v]:
            continue
        ts = np.array(times[v]) * 1e3
        print(
            f"  S={v[0]:3d} T={v[1]:3d} {v[2]:5s}: {ts.mean():7.2f} "
            f"ms/call (min {ts.min():7.2f}, max {ts.max():7.2f})"
        )


if __name__ == "__main__":
    main()
