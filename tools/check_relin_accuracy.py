"""Where does the Pallas relin kernel disagree with jacfwd on TPU?

Hypothesis: Mosaic's f32 transcendentals lose accuracy at large
arguments (diverged line-search lanes reach |x| >> 2*pi), while
bounded states agree to f32 roundoff. Prints max |diff| as a function
of state magnitude.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.ops.pallas_relin import pallas_feature_jacobians
    from autompc_tpu.sysid import SINDy

    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=50, traj_len=100)
    model = SINDy(
        b.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    params = model.params

    B, H = 256, 8
    rng = np.random.default_rng(0)

    def jacfwd_ref(xs, us):
        def one(x, u):
            jx = jax.jacfwd(
                lambda s: model.pred_core(params, s, u)
            )(x)
            ju = jax.jacfwd(
                lambda uu: model.pred_core(params, x, uu)
            )(u)
            return jx, ju

        return jax.vmap(jax.vmap(one))(xs[:, :H], us)

    jref = jax.jit(jacfwd_ref)
    fns = tuple(model.library._fns)

    for scale in (1.0, 3.0, 10.0, 100.0, 1e4, 1e6):
        xs = jnp.asarray(rng.uniform(-scale, scale, (B, H + 1, 4)))
        us = jnp.asarray(rng.uniform(-20, 20, (B, H, 1)))
        Jx_p, Ju_p = pallas_feature_jacobians(
            fns, xs, us, model.coeffs, block_b=B
        )
        Jx_r, Ju_r = jref(xs, us)
        dx = float(jnp.max(jnp.abs(Jx_p - Jx_r)))
        du = float(jnp.max(jnp.abs(Ju_p - Ju_r)))
        print(f"scale={scale:>10.1e}  max|dJx|={dx:.3e}  max|dJu|={du:.3e}")


if __name__ == "__main__":
    main()
