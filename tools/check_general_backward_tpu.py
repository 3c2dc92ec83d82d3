"""Compiled-on-TPU parity check for the general (any ds/dc) Pallas
backward kernel at the halfcheetah shape — the interpret-mode twin in
tests/test_pallas_riccati.py only covers small shapes (interpret
executes the ~20k-op cell body per grid cell in Python).

Run on the TPU host:  python tools/check_general_backward_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_args(B, H, ds, dc, dt, jnp):
    rng = np.random.default_rng(0)
    Jx = jnp.asarray(rng.normal(size=(B, H, ds, ds)) * 0.1, dt)
    Ju = jnp.asarray(rng.normal(size=(B, H, ds, dc)) * 0.3, dt)
    Cxx = jnp.asarray(np.broadcast_to(np.eye(ds), (B, H, ds, ds)).copy(), dt)
    M = rng.normal(size=(B, H, dc, dc)) * 0.2
    Cuu = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(dc), dt)
    cx = jnp.asarray(rng.normal(size=(B, H, ds)), dt)
    cu = jnp.asarray(rng.normal(size=(B, H, dc)), dt)
    Vn = jnp.asarray(np.broadcast_to(2 * np.eye(ds), (B, ds, ds)).copy(), dt)
    vn = jnp.asarray(rng.normal(size=(B, ds)), dt)
    return (Jx, Ju, Cxx, Cuu, cx, cu, Vn, vn)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward_general
    from autompc_tpu.ops.riccati import tvlqr_backward_scan

    names = ("Ks", "ks", "lin", "quad")

    # Shape sweep to localize any divergence: small -> halfcheetah.
    for (B, H, ds, dc, TB) in (
        (8, 2, 5, 3, 8),
        (8, 2, 18, 6, 8),
        (256, 20, 18, 6, 256),
        (256, 200, 18, 6, 256),
    ):
        args = make_args(B, H, ds, dc, jnp.float32, jnp)
        out_p = pallas_tvlqr_backward_general(*args, block_b=TB)
        # Default-precision scan hits bf16 MXU matmuls at ds=18; the
        # highest-precision scan is the honest f32 reference (same
        # finding as the round-1 relinearization kernel, PERF.md).
        with jax.default_matmul_precision("highest"):
            out_s = jax.jit(jax.vmap(tvlqr_backward_scan))(*args)
        out_d = jax.jit(jax.vmap(tvlqr_backward_scan))(*args)
        jax.block_until_ready((out_p, out_s, out_d))
        msgs = []
        for name, a, b, d in zip(names, out_p, out_s, out_d):
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            d = np.asarray(d, dtype=np.float64)
            rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
            rel_d = np.abs(d - b) / np.maximum(np.abs(b), 1e-3)
            msgs.append(
                f"{name} kernel {rel.max():.2e} / bf16scan {rel_d.max():.2e}"
            )
        print(f"sweep B={B} H={H} ds={ds} dc={dc}: " + ", ".join(msgs))

    B, H, ds, dc = 512, 200, 18, 6
    args = make_args(B, H, ds, dc, jnp.float32, jnp)

    import time

    t0 = time.perf_counter()
    out_p = pallas_tvlqr_backward_general(*args, block_b=256)
    jax.block_until_ready(out_p)
    print(f"kernel compile+run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    with jax.default_matmul_precision("highest"):
        out_s = jax.jit(jax.vmap(tvlqr_backward_scan))(*args)
    jax.block_until_ready(out_s)
    print(f"f32 scan compile+run: {time.perf_counter() - t0:.1f}s")

    for name, a, b in zip(names, out_p, out_s):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        denom = np.maximum(np.abs(b), 1e-3)
        rel = np.abs(a - b) / denom
        print(f"{name}: max rel err vs f32 scan {rel.max():.2e}")
        assert rel.max() < 5e-2, (name, rel.max())

    # Timing (kernel vs scan).
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(pallas_tvlqr_backward_general(
            *args, block_b=256
        ))
    tk = (time.perf_counter() - t0) / reps
    scan_j = jax.jit(jax.vmap(tvlqr_backward_scan))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(scan_j(*args))
    ts = (time.perf_counter() - t0) / reps
    print(
        f"backward pass (B={B}, H={H}, ds={ds}, dc={dc}): "
        f"kernel {tk * 1e3:.1f} ms vs scan {ts * 1e3:.1f} ms "
        f"({ts / tk:.2f}x)"
    )
    print("OK")


if __name__ == "__main__":
    main()
