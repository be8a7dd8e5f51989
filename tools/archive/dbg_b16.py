import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 16, 51
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)

c, l = 8, 49
jp = int(sc.jp[c, l]); jt = int(sc.jt[c, l]); jt1 = int(sc.jt1[c, l])
print("jp jt jt1", jp, jt, jt1, "laytrop", bool(sc.laytrop_mask[c, l]))
f00, f01, f10, f11 = (float(sc.fac00[c,l]), float(sc.fac01[c,l]),
                      float(sc.fac10[c,l]), float(sc.fac11[c,l]))
print("facs", f00, f01, f10, f11)
colch4 = float(sc.colch4[c, l]); print("colch4", colch4)

t = model.engine.tabs[16]
tbl = np.asarray(t["_abs"])  # fused
na = t["_na"]
base0 = ((jp-12)*5 + jt) * 1
base1 = ((jp-11)*5 + jt1) * 1
r0, r1 = na+base0, na+base1
print("rows", r0, r1, "nrow", tbl.shape[0])
g = 1  # second g of band16
eng = colch4*(f00*tbl[r0,g] + f10*tbl[r0+1,g]) + colch4*(f01*tbl[r1,g] + f11*tbl[r1+1,g])
print("engine-style:", eng)
# kernel-style: kt1 clamp at t=4
kb = np.asarray(model.ktables["b16"]["absb"]).reshape(47, 5, 1, 2)
p0, t0 = jp-12, jt
p1, t1 = jp-11, jt1
k0a = kb[p0, t0, 0, g]; k0b = kb[p0, min(t0+1,4), 0, g]
k1a = kb[p1, t1, 0, g]; k1b = kb[p1, min(t1+1,4), 0, g]
ker = colch4*(f00*k0a + f10*k0b) + colch4*(f01*k1a + f11*k1b)
print("kernel-style:", ker)
print("tbl[r0]", tbl[r0,g], "kb[p0,t0]", k0a)
print("tbl[r0+1]", tbl[r0+1,g], "kb[p0,t0+1]", k0b)
