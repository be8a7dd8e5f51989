import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 245760

def make(T, R, D, wdt, tdt):
    def kern(idx_ref, tbl_ref, out_ref, acc):
        idx = idx_ref[0, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
        W = jnp.where(iota == idx[:, None], 1.0, 0.0).astype(wdt)
        m = jnp.dot(W, tbl_ref[:], preferred_element_type=jnp.float32)
        # reduce in-kernel so output DMA is small (mimics real kernel)
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
            scratch_shapes=[pltpu.VMEM((T, 128), jnp.float32)],
        )(idx, tbl)
    return run

rng = np.random.default_rng(0)
for (T, R, D, wdt, tdt, tag) in [
    (256, 65, 1656, jnp.float32, jnp.float32, "f32 K=65"),
    (512, 65, 1656, jnp.float32, jnp.float32, "f32 K=65 T=512"),
    (256, 65, 1656, jnp.bfloat16, jnp.bfloat16, "bf16 K=65"),
    (512, 65, 1656, jnp.bfloat16, jnp.bfloat16, "bf16 K=65 T=512"),
    (512, 128, 1656, jnp.bfloat16, jnp.bfloat16, "bf16 K=128 T=512"),
    (1024, 65, 1656, jnp.bfloat16, jnp.bfloat16, "bf16 K=65 T=1024"),
]:
    idx = jnp.asarray(rng.integers(0, R, (1, C)), jnp.int32)
    tbl = jnp.asarray(rng.random((R, D)), tdt)
    run = make(T, R, D, wdt, tdt)
    o = run(idx, tbl); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(20): o = run(idx, tbl)
    jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/20
    print(f"{tag:18s} {dt*1e3:7.3f} ms  {C*R*D*2/dt/1e12:6.1f} TF/s")
