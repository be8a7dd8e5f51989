import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, R, D = 256, 65, 1656
C = 245760

def kern(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[0, :]                                   # (T,)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    W = jnp.where(iota == idx[:, None], 1.0, 0.0).astype(jnp.float32)
    out_ref[:] = jnp.dot(W, tbl_ref[:], preferred_element_type=jnp.float32)

@jax.jit
def run(idx, tbl):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
        grid=(C // T,),
        in_specs=[pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, tbl)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, (1, C)), jnp.int32)
tbl = jnp.asarray(rng.random((R, D)), jnp.float32)
out = run(idx, tbl)
ref = np.asarray(tbl)[np.asarray(idx)[0]]
print("onehot-matmul ok:", np.array_equal(np.asarray(out), ref))
o = run(idx, tbl); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(20): o = run(idx, tbl)
jax.block_until_ready(o)
dt = (time.perf_counter()-t0)/20
print(f"time {dt*1e3:.3f} ms  ({C*R*D*2/dt/1e12:.1f} TF/s)")
