import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp

N = 4096 * 60          # B*L cells
NROW = 1760
NG = 16

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(1, NROW - 12, N), jnp.int32)
tbl = jnp.asarray(rng.random((NROW, NG)), jnp.float32)
tbl8 = jnp.asarray(rng.random((NROW, 8 * NG)), jnp.float32)
w = jnp.asarray(rng.random((N, 16)), jnp.float32)

def bench(f, *a, n=30):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n

# 1) 16 narrow gathers (current pattern)
@jax.jit
def narrow(idx, tbl):
    acc = 0.
    for o in range(16):
        acc = acc + jnp.take(tbl, idx + o, axis=0)
    return acc

# 2) one wide gather (8 taps stacked, 128 lanes)
@jax.jit
def wide(idx, tbl8):
    g = jnp.take(tbl8, idx, axis=0)          # (N, 128)
    return g.reshape(N, 8, NG).sum(1)

# 3) one-hot matmul (16 taps folded into W)
@jax.jit
def onehot(idx, tbl, w):
    iota = jax.lax.broadcasted_iota(jnp.int32, (N, NROW), 1)
    W = jnp.zeros((N, NROW), jnp.float32)
    for o in range(4):
        W = W + jnp.where(iota == (idx[:, None] + o), w[:, o:o+1], 0.)
    return W @ tbl

# 4) dynamic_slice-free segment trick: gather via take along flattened pairs
@jax.jit
def wide2(idx, tbl8):
    g0 = jnp.take(tbl8, idx, axis=0)
    g1 = jnp.take(tbl8, idx + 9, axis=0)
    return g0.reshape(N, 8, NG).sum(1) + g1.reshape(N, 8, NG).sum(1)

print("narrow16 ", bench(narrow, idx, tbl) * 1e3, "ms")
print("wide1    ", bench(wide, idx, tbl8) * 1e3, "ms")
print("wide2    ", bench(wide2, idx, tbl8) * 1e3, "ms")
print("onehot   ", bench(onehot, idx, tbl, w) * 1e3, "ms")
