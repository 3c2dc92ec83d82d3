"""Block-size sweep for the Pallas relinearization kernel at the
headline shape. Usage: python tools/sweep_relin_blocks.py [B] [H]."""

import os
import sys

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
    from autompc_tpu.ops.pallas_relin import pallas_feature_jacobians
    from autompc_tpu.sysid import SINDy
    from autompc_tpu.utils.profiling import timeit_pipelined

    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        b.system, method="lstsq", threshold=1e-3, trig_basis=True,
        trig_freq=1, trig_interaction=True, time_mode="discrete",
    )
    model.train(trajs)
    fns = tuple(model.library._fns)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-3, 3, (B, H + 1, 4)))
    us = jnp.asarray(rng.uniform(-20, 20, (B, H, 1)))

    for tb in (128, 256, 512, 1024):
        for th in (8, 25, 50, 100, 200):
            t, _ = timeit_pipelined(
                lambda tb=tb, th=th: pallas_feature_jacobians(
                    fns, xs, us, model.coeffs, block_b=tb, block_h=th
                ),
                reps=int(os.environ.get("REPS", "10")),
                silent=True,
            )
            print(f"block_b={tb:>5} block_h={th:>4}: {t * 1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
