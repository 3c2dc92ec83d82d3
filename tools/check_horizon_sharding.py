"""Per-device memory scaling evidence for the horizon-sharded DT.

Compiles the horizon-sharded SQP solve (parallel/horizon.py) at a long
horizon on a 1-device and an 8-device ``horizon`` mesh and reports
XLA's per-device memory analysis: with the knot axis genuinely
distributed, per-device temp memory must shrink toward 1/8 — the
property that lets an H too big for one chip's memory run at all.

    PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/check_horizon_sharding.py [H]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    import jax.numpy as jnp

    from autompc_tpu.benchmarks.cartpole import dt_cartpole_dynamics
    from autompc_tpu.core import System
    from autompc_tpu.costs import QuadCost
    from autompc_tpu.parallel.horizon import make_horizon_sharded_sqp_solver
    from autompc_tpu.parallel.mesh import make_mesh

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dt = 0.05
    system = System(["theta", "omega", "x", "dx"], ["u"], dt=dt)
    pred_core = lambda params, x, u: dt_cartpole_dynamics(x, u, dt)
    cost = QuadCost(
        system,
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        0.01 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.05, 0.05])),
        goal=jnp.zeros(4),
    )
    kw = dict(
        H=H, ds=4, dc=1, obsdim=4, dt=dt,
        ubounds=(jnp.array([-20.0]), jnp.array([20.0])), sqp_iters=3,
    )

    x0 = jnp.array([3.0, 0.0, 0.0, 0.0])
    xs_g = jnp.zeros((H + 1, 4)).at[0].set(x0)
    us_g = jnp.zeros((H, 1))

    stats = {}
    for n_dev in (1, len(jax.devices())):
        mesh = make_mesh(n_devices=n_dev, axis_names=("horizon",))
        solve = make_horizon_sharded_sqp_solver(
            pred_core, cost, mesh=mesh, **kw
        )
        compiled = solve.lower({}, x0, xs_g, us_g).compile()
        mem = compiled.memory_analysis()
        temp = int(mem.temp_size_in_bytes)
        stats[n_dev] = temp
        print(
            f"devices={n_dev}: per-device temp "
            f"{temp / 1e6:.1f} MB, args {mem.argument_size_in_bytes / 1e6:.2f} MB, "
            f"output {mem.output_size_in_bytes / 1e6:.2f} MB"
        )
    n = len(jax.devices())
    ratio = stats[1] / max(stats[n], 1)
    print(f"per-device temp memory ratio 1 -> {n} devices: {ratio:.2f}x")
    assert ratio > n / 2.5, (
        f"knot axis does not look distributed (ratio {ratio:.2f})"
    )
    print("OK")


if __name__ == "__main__":
    main()
