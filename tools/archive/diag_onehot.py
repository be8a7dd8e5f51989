import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, T, R, D = 2048, 256, 65, 1656

def kern(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    W = jnp.where(iota == idx[:, None], 1.0, 0.0).astype(jnp.float32)
    m = jnp.dot(W, tbl_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = m[:, :128]

@jax.jit
def run(idx, tbl):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        grid=(C // T,),
        in_specs=[pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, tbl)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, (1, C)), jnp.int32)
tbl = jnp.asarray(rng.random((R, D)), jnp.float32)
out = np.asarray(run(idx, tbl))
ref = np.asarray(tbl)[np.asarray(idx)[0], :128]
bad = ~np.isclose(out, ref)
print("mismatch fraction:", bad.mean())
rows_bad = bad.any(1)
print("bad rows:", rows_bad.sum(), "of", C, "first bad:", np.nonzero(rows_bad)[0][:10])
i = np.nonzero(rows_bad)[0][0] if rows_bad.any() else 0
print("sample row", i, "idx", np.asarray(idx)[0, i])
print("out:", out[i, :5]); print("ref:", ref[i, :5])
# which table row does out actually equal?
t = np.asarray(tbl)[:, :128]
d = np.abs(t - out[i]).sum(1)
print("closest row:", d.argmin(), "dist", d.min())
