"""Break down the cloudy blocked-path step: setcoef, taumol, planck,
cloud-coeff prep, RT kernel (clear vs cloudy)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp

REPO = pathlib.Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops import cldprop as cld_ops
from rrtmg_lw_tpu.ops import rtrn_pallas as rtp
from rrtmg_lw_tpu.ops.planck_pallas import planck_interp_blocked
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere, make_mcica_clouds

B, L, N = 4096, 60, 20
model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                            use_lut=False))
atm = make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32)
clouds = make_mcica_clouds(ncol=B, nlay=L, dtype=jnp.float32,
                           layout="blocked")
prof = jax.jit(lambda a: inatm(a, dtype=jnp.float32))(atm)
sc = jax.jit(lambda p: setcoef(p, model.static, istart=1, idrv=0))(prof)
jax.block_until_ready(sc)


def bench(tag, step, args):
    eps = jnp.zeros((), jnp.float32)
    out, eps = step(*args, eps)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out, eps = step(*args, eps)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{tag:28s} {dt*1e3:7.2f} ms")
    return out


@jax.jit
def s_setcoef(p, eps):
    s = setcoef(p._replace(tavel=p.tavel + eps), model.static,
                istart=1, idrv=0)
    return s, s.plankbnd[0, 0] * 1e-20


@jax.jit
def s_taumol(s, p, eps):
    tg, fr = model.engine.forward_blocked(
        s._replace(fac00=s.fac00 + eps), p)
    return tg, tg[0, 0, 0] * 1e-20


@jax.jit
def s_planck(p, eps):
    a = planck_interp_blocked(p.tavel.T + eps, model.static["totplnk"],
                              tile=512)
    b = planck_interp_blocked(p.tz.T + eps, model.static["totplnk"],
                              tile=512)
    return (a, b), a[0, 0, 0] * 1e-20


@jax.jit
def s_coeffs(c, eps):
    abi, abl, ok = cld_ops.cloud_optics_bands_blocked(
        c._replace(reicmc=c.reicmc + eps), model.static_np,
        iceflag=model.config.iceflag, liqflag=model.config.liqflag)
    return (abi, abl), abi[0, 0, 0] * 1e-20


bench("setcoef", s_setcoef, (prof,))
tgfr = bench("taumol blocked", s_taumol, (sc, prof))
taut, fracs = jax.jit(
    lambda s, p: model.engine.forward_blocked(s, p))(sc, prof)
pl_args = jax.jit(lambda p: (
    planck_interp_blocked(p.tavel.T, model.static["totplnk"], tile=512),
    planck_interp_blocked(p.tz.T, model.static["totplnk"], tile=512)))(prof)
bench("planck blocked", s_planck, (prof,))
abi_t, abl_t = bench("cloud band coeffs", s_coeffs, (clouds,))


def rt_run(tt, fr, cf, eps):
    return rtp.rt_random_overlap_pallas(
        tt, fr, pl_args[0], pl_args[1], sc.plankbnd + eps,
        sc.dplankbnd_dt, prof.semiss, prof.pwvcm, prof.pz,
        None, None, taua=prof.taua, cloudy=cf is not None,
        gate_thresh=0.5, static=model.static_np, idrv=0,
        heatfac_val=model.heatfac, istart=1, iend=16,
        native="blocked", clouds_blocked=False, planck_blocked=True,
        cloud_fields=cf)


@jax.jit
def s_rt_clear(tt, fr, eps):
    out = rtp.rt_random_overlap_pallas(
        tt, fr, pl_args[0], pl_args[1], sc.plankbnd + eps,
        sc.dplankbnd_dt, prof.semiss, prof.pwvcm, prof.pz,
        jnp.zeros_like(tt), jnp.zeros_like(tt), taua=prof.taua,
        cloudy=False, gate_thresh=2.0, static=model.static_np, idrv=0,
        heatfac_val=model.heatfac, istart=1, iend=16,
        native="blocked", clouds_blocked=True, planck_blocked=True)
    return out, out.totuflux[0, 0] * 1e-20


@jax.jit
def s_rt_cloudy(tt, fr, cf, eps):
    out = rt_run(tt, fr, cf, eps)
    return out, out.totuflux[0, 0] * 1e-20


bench("RT kernel clear", s_rt_clear, (taut, fracs))
cf = (clouds.cldfmc, clouds.ciwpmc, clouds.clwpmc, clouds.taucmc,
      abi_t, abl_t)
bench("RT kernel cloudy(fused)", s_rt_cloudy, (taut, fracs, cf))
