import sys, pathlib, time, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
import rrtmg_lw_tpu.ops.taumol_pallas as tp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False,
                            taumol_impl="xla"))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc0 = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc0)

def bench(pt, tag):
    @jax.jit
    def step(sc, prof, eps):
        sc2 = sc._replace(fac00=sc.fac00 + eps)
        tg, fr = pt(sc2, prof)
        return tg, tg[0, 0, 0] * 1e-20
    eps = jnp.float32(0.0)
    tg, eps = step(sc0, prof, eps); jax.block_until_ready(tg)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N): tg, eps = step(sc0, prof, eps)
    jax.block_until_ready(tg)
    dt = (time.perf_counter()-t0)/N
    print(f"{tag:28s} {dt*1e3:8.2f} ms")

mode = os.environ.get("MODE", "hi512")
if mode == "hi512":
    pt = tp.PallasTaumol(model.ktables, model.static_np, tile=512)
    bench(pt, "HIGHEST T=512")
elif mode == "high256":
    orig = tp._dot
    tp._dot = lambda W, t: jnp.dot(W, t, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    pt = tp.PallasTaumol(model.ktables, model.static_np, tile=256)
    bench(pt, "DEFAULT(bf16) T=256")
    tp._dot = orig
elif mode == "mmonly":
    # skip band eval: patch _region_eval to return zeros fast
    orig = tp._region_eval
    def fake(spec, b, lower, ctx, k, dtype):
        T = ctx.sf["fac00"].shape[0]
        ng = tp.NG[b-1]
        z = ctx.M0[:, :ng] * 0.0
        return z, z
    tp._region_eval = fake
    pt = tp.PallasTaumol(model.ktables, model.static_np, tile=256)
    bench(pt, "matmuls-only T=256")
    tp._region_eval = orig
