import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# XLA matmul calibration
for (M, K, N, dt) in [(4096, 4096, 4096, jnp.bfloat16),
                      (4096, 4096, 4096, jnp.float32)]:
    a = jnp.ones((M, K), dt); b = jnp.ones((K, N), dt)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    o = f(a, b); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(50): o = f(a, b)
    jax.block_until_ready(o)
    dt_s = (time.perf_counter()-t0)/50
    print(f"XLA {np.dtype(dt).name} {M}^3: {dt_s*1e3:.3f} ms = {2*M*K*N/dt_s/1e12:.1f} TF/s")

# pallas one-hot with HIGHEST precision + full correctness
C, T, R, D = 245760, 256, 65, 1656
def kern(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    W = jnp.where(iota == idx[:, None], 1.0, 0.0).astype(jnp.float32)
    m = jnp.dot(W, tbl_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
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
print("precision HIGHEST exact:", np.array_equal(out, ref))
o = run(idx, tbl); jax.block_until_ready(o)
t0 = time.perf_counter()
for _ in range(200): o = run(idx, tbl)
jax.block_until_ready(o)
print(f"per-iter: {(time.perf_counter()-t0)/200*1e3:.4f} ms")
