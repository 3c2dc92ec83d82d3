import time
import numpy as np
import jax, jax.numpy as jnp
from autompc_tpu.ops.pallas_riccati import pallas_tvlqr_backward
from autompc_tpu.ops.riccati import tvlqr_backward_scan

B, H, ds = 4096, 200, 4
rng = np.random.default_rng(0)
dt = jnp.float32
args = (
    jnp.asarray(rng.normal(size=(B,H,ds,ds))*0.3, dt),
    jnp.asarray(rng.normal(size=(B,H,ds,1)), dt),
    jnp.asarray(np.broadcast_to(np.eye(ds),(B,H,ds,ds)).copy(), dt),
    jnp.asarray(np.full((B,H,1,1),0.5), dt),
    jnp.asarray(rng.normal(size=(B,H,ds)), dt),
    jnp.asarray(rng.normal(size=(B,H,1)), dt),
    jnp.asarray(np.broadcast_to(2*np.eye(ds),(B,ds,ds)).copy(), dt),
    jnp.asarray(rng.normal(size=(B,ds)), dt),
)
pk = jax.jit(lambda *a: pallas_tvlqr_backward(*a, block_b=128))
sk = jax.jit(jax.vmap(lambda *a: tvlqr_backward_scan(*a, unroll=8)))
o1 = pk(*args); jax.block_until_ready(o1)
o2 = sk(*args); jax.block_until_ready(o2)
np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), rtol=5e-2, atol=1e-2)
print("numerics ok")
for name, f in [("pallas", pk), ("scan", sk)]:
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args); jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.2f} ms")
