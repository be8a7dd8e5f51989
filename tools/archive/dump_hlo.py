import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere

B, L = 4096, 60
model = make_model(LWConfig(icld=0, dtype="float32", use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
f = jax.jit(lambda s, p: model.engine(s, p))
txt = f.lower(sc, prof).compile().as_text()
open('/tmp/taumol_hlo.txt', 'w').write(txt)
import re, collections
ops = collections.Counter()
for line in txt.splitlines():
    m = re.search(r'= (\w+)\(', line)
    if m: ops[m.group(1)] += 1
for k, v in ops.most_common(20): print(k, v)
