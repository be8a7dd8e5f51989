import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chained XLA matmul: y depends on previous y
M = 4096
a0 = jnp.ones((M, M), jnp.float32) * 1e-3
@jax.jit
def mm(a):
    return jnp.dot(a, a0, preferred_element_type=jnp.float32) * 1e-3 + a0

a = mm(a0); jax.block_until_ready(a)
t0 = time.perf_counter()
for _ in range(20): a = mm(a)
jax.block_until_ready(a)
dt = (time.perf_counter()-t0)/20
print(f"chained f32 {M}^3: {dt*1e3:.3f} ms = {2*M**3/dt/1e12:.1f} TF/s")

ab = a0.astype(jnp.bfloat16)
@jax.jit
def mmb(a):
    return (jnp.dot(a, ab, preferred_element_type=jnp.float32) * 1e-3
            + ab.astype(jnp.float32)).astype(jnp.bfloat16)
b = mmb(ab); jax.block_until_ready(b)
t0 = time.perf_counter()
for _ in range(20): b = mmb(b)
jax.block_until_ready(b)
dt = (time.perf_counter()-t0)/20
print(f"chained bf16 {M}^3: {dt*1e3:.3f} ms = {2*M**3/dt/1e12:.1f} TF/s")

# chained one-hot pallas kernel
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
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        grid=(C // T,),
        in_specs=[pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, D), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, tbl)
    # chain: derive next idx from out
    nxt = (idx + (out[:, 0] > 10.0).sum().astype(jnp.int32)) % R
    return out, nxt

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, R, (1, C)), jnp.int32)
tbl = jnp.asarray(rng.random((R, D)), jnp.float32)
out, idx = run(idx, tbl); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(50): out, idx = run(idx, tbl)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/50
print(f"chained onehot f32-HI: {dt*1e3:.4f} ms = {C*R*D*2/dt/1e12:.1f} TF/s")
