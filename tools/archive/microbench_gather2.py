import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp

B, L = 4096, 60
NROW, NG = 1760, 16
rng = np.random.default_rng(0)
idx2 = jnp.asarray(rng.integers(1, NROW-12, (B, L)), jnp.int32)
tbl = jnp.asarray(rng.random((NROW, NG)), jnp.float32)

def bench(f, *a, n=30):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

@jax.jit
def take2d(idx2, tbl):
    acc = 0.
    for o in range(16):
        acc = acc + jnp.take(tbl, idx2 + o, axis=0)
    return acc

@jax.jit
def take2d_clip(idx2, tbl):
    acc = 0.
    for o in range(16):
        acc = acc + jnp.take(tbl, jnp.clip(idx2 + o, 0, NROW-1), axis=0)
    return acc

@jax.jit
def take1d_reshape(idx2, tbl):
    idx1 = idx2.reshape(-1)
    acc = 0.
    for o in range(16):
        acc = acc + jnp.take(tbl, idx1 + o, axis=0)
    return acc.reshape(B, L, NG)

print("take2d        ", bench(take2d, idx2, tbl)*1e3, "ms")
print("take2d_clip   ", bench(take2d_clip, idx2, tbl)*1e3, "ms")
print("take1d_reshape", bench(take1d_reshape, idx2, tbl)*1e3, "ms")
