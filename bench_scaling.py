"""Tuning-throughput scaling harness.

Measures the BASELINE.json north-star scaling metric: surrogate
closed-loop candidate evaluations per second as a function of mesh size
(near-linear 1 chip -> 1 host -> N hosts is the target). Each candidate
evaluation is a full iLQR synthesis + closed-loop surrogate rollout
(parallel/fanout.py), sharded over the mesh's ``config`` axis.

On a real pod this runs over the global device set (call
``jax.distributed.initialize()`` first). In CI it exercises the sharded
program over a virtual CPU mesh — note that virtual CPU devices share
one physical CPU's cores (XLA already multithreads single-device CPU
programs), so the CPU efficiency number validates correctness of the
sharded path, not speedup; real scaling requires real chips:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Prints one JSON line per mesh size plus a scaling-efficiency summary.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.parallel import QuadCostFanout, make_mesh
    from autompc_tpu.sysid import SINDy

    benchmark = CartpoleSwingupBenchmark()
    trajs = benchmark.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        benchmark.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)

    n_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    from autompc_tpu.control.ilqr import parse_schedule

    # Measured sweet spot on v5e (6.8x the vmap-formulation number at
    # the old batch 64): 512 candidates/device, 4-stage converged-lane
    # compaction inside the per-step solve, and (on TPU) the Pallas
    # Riccati-backward + line-search kernels.
    on_tpu = jax.default_backend() == "tpu"
    per_device = int(os.environ.get("SCALE_PER_DEVICE", "512"))
    compact = parse_schedule(
        os.environ.get("SCALE_COMPACT", "8:0.5,16:0.25,28:0.125,40:0.0625")
    )
    backward = os.environ.get(
        "SCALE_BACKWARD", "pallas" if on_tpu else "scan"
    )
    ls = os.environ.get("SCALE_LS", "pallas" if on_tpu else "")
    horizon = int(os.environ.get("SCALE_HORIZON", "10"))
    n_steps = int(os.environ.get("SCALE_STEPS", "50"))

    rng = np.random.default_rng(0)
    results = []
    for n_dev in sizes:
        mesh = make_mesh(n_devices=n_dev)
        # SCALE_COMPACT="15:0.5,30:0.25" sets the converged-lane
        # compaction schedule (empty string disables); SCALE_IMPL=vmap
        # selects the per-candidate vmapped formulation.
        fanout = QuadCostFanout(
            benchmark.system, benchmark.task, model, model,
            horizon=horizon, n_steps=n_steps, mesh=mesh,
            goal=np.zeros(4),
            impl=os.environ.get("SCALE_IMPL", "batched"),
            compact_schedule=compact,
            backward=backward,
            feature_spec=(
                (model.library, "coeffs") if ls == "pallas" else None
            ),
            warm_start=bool(os.environ.get("SCALE_WARM")),
        )
        B = per_device * n_dev
        batch = {
            "Qdiag": jnp.asarray(10 ** rng.uniform(-1, 1.5, (B, 4))),
            "Fdiag": jnp.asarray(10 ** rng.uniform(-1, 1.5, (B, 4))),
            "Rdiag": jnp.asarray(10 ** rng.uniform(-3, 0, (B, 1))),
        }
        out = fanout(batch)  # compile + warmup
        jax.block_until_ready(out)
        reps = 3
        start = time.perf_counter()
        for _ in range(reps):
            out = fanout(batch)
            jax.block_until_ready(out)
        elapsed = time.perf_counter() - start
        evals_per_s = B * reps / elapsed
        results.append((n_dev, evals_per_s))
        print(
            json.dumps(
                {
                    "metric": "surrogate_closed_loop_evals_per_s",
                    "n_devices": n_dev,
                    "value": round(evals_per_s, 2),
                    "unit": "evals/s",
                }
            )
        )

    if len(results) > 1:
        base_n, base_v = results[0]
        top_n, top_v = results[-1]
        eff = (top_v / base_v) / (top_n / base_n)
        print(
            json.dumps(
                {
                    "metric": "tuning_scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": f"fraction of linear ({base_n}->{top_n} devices)",
                }
            )
        )


if __name__ == "__main__":
    main()
