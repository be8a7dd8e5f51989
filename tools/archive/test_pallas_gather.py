import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROW, NG = 1760, 16
T = 512

def kern(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[:]                              # (T,)
    idx2 = jnp.broadcast_to(idx[:, None], (T, NG))
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx2, axis=0)

@jax.jit
def run(idx, tbl):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], NG), jnp.float32),
        grid=(idx.shape[0] // T,),
        in_specs=[pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
                  pl.BlockSpec((NROW, NG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, NG), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, tbl)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, NROW, 4096*60), jnp.int32)
tbl = jnp.asarray(rng.random((NROW, NG)), jnp.float32)
out = run(idx, tbl)
ref = np.asarray(tbl)[np.asarray(idx)]
print("take_along_axis in pallas ok:", np.allclose(out, ref))
o = run(idx, tbl); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(30): o = run(idx, tbl)
jax.block_until_ready(o)
print("time ms:", (time.perf_counter()-t0)/30*1e3)
