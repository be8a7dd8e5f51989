"""Cross-checks: vectorized JAX physics vs the scalar NumPy spec-oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_atmosphere
from oracle import rt as ort
from oracle import spec as osp

from rrtmg_lw_tpu.config import LWConfig
from rrtmg_lw_tpu.constants import heatfac
from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.models.radiation import RRTMGLW
from rrtmg_lw_tpu.ops.inatm import inatm
from rrtmg_lw_tpu.ops.setcoef import setcoef
from rrtmg_lw_tpu.ops.tables import build_lookup_tables
from rrtmg_lw_tpu.types import BandClouds, McicaClouds

NCOL, NLAY = 3, 51


@pytest.fixture(scope="module")
def setup():
    atm = make_atmosphere(ncol=NCOL, nlay=NLAY, seed=1)
    prof = inatm(atm)
    static = kt.load_static()
    ktab, _ = kt.load_ktables()
    model = RRTMGLW(LWConfig(icld=0))
    luts_np = build_lookup_tables()
    oracle_luts = dict(tau_tbl=luts_np.tau_tbl, exp_tbl=luts_np.exp_tbl,
                       tfn_tbl=luts_np.tfn_tbl, delwave=static["delwave"])
    return atm, prof, static, ktab, model, oracle_luts


def _oracle_sc(prof, static, c, istart=1, idrv=0):
    return osp.setcoef_1col(
        NLAY, np.asarray(prof.pavel[c]), np.asarray(prof.tavel[c]),
        np.asarray(prof.tz[c]), float(prof.tbound[c]),
        np.asarray(prof.semiss[c]), np.asarray(prof.coldry[c]),
        np.asarray(prof.wkl[c]).T, np.asarray(prof.wbrodl[c]),
        static, istart=istart, idrv=idrv)


def test_setcoef_matches_oracle(setup):
    atm, prof, static, ktab, model, _ = setup
    sc = setcoef(prof, model.static, istart=1, idrv=1)
    for c in range(NCOL):
        o = _oracle_sc(prof, static, c, idrv=1)
        assert int(sc.laytrop_mask[c].sum()) == o["laytrop"]
        np.testing.assert_array_equal(np.asarray(sc.jp[c]) + 1, o["jp"])
        np.testing.assert_array_equal(np.asarray(sc.jt[c]) + 1, o["jt"])
        np.testing.assert_array_equal(np.asarray(sc.jt1[c]) + 1, o["jt1"])
        np.testing.assert_array_equal(np.asarray(sc.indminor[c]) + 1,
                                      o["indminor"])
        np.testing.assert_array_equal(np.asarray(sc.indfor[c]) + 1,
                                      o["indfor"])
        for name in ("planklay", "plankbnd", "dplankbnd_dt", "colh2o",
                     "colco2", "colbrd", "fac00", "fac01", "fac10", "fac11",
                     "selffac", "forfac", "forfrac", "minorfrac",
                     "scaleminor", "scaleminorn2", "rat_h2oco2",
                     "rat_h2oco2_1"):
            np.testing.assert_allclose(
                np.asarray(getattr(sc, name)[c]), o[name], rtol=1e-14,
                err_msg=name)
        np.testing.assert_allclose(np.asarray(sc.planklev[c]),
                                   o["planklev"], rtol=1e-14)
        # lower-region-only quantities compared below laytrop
        lt = o["laytrop"]
        np.testing.assert_array_equal(
            np.asarray(sc.indself[c][:lt]) + 1, o["indself"][:lt])
        np.testing.assert_allclose(np.asarray(sc.selffrac[c][:lt]),
                                   o["selffrac"][:lt], rtol=1e-14)


def test_taumol_matches_oracle(setup):
    atm, prof, static, ktab, model, _ = setup
    sc, taut, fracs = model.optical_depth(prof)
    for c in range(NCOL):
        o = _oracle_sc(prof, static, c)
        tg, fr = osp.taumol_1col(
            NLAY, o, np.asarray(prof.pavel[c]), np.asarray(prof.wx[c]).T,
            np.asarray(prof.coldry[c]), ktab, static)
        np.testing.assert_allclose(np.asarray(taut[c]), tg, rtol=5e-13,
                                   atol=1e-300)
        np.testing.assert_allclose(np.asarray(fracs[c]), fr, rtol=5e-13)


def _mcica_clouds(seed=3):
    rng = np.random.default_rng(seed)
    shape = (NCOL, NLAY, 140)
    cldf = (rng.random(shape) < 0.3).astype(np.float64)
    # a cloud deck between layers 8 and 20
    mask = np.zeros((1, NLAY, 1))
    mask[:, 8:20] = 1.0
    cldf = cldf * mask
    ciwp = cldf * rng.uniform(0.0, 30.0, shape)
    clwp = cldf * rng.uniform(0.0, 20.0, shape)
    reic = np.full((NCOL, NLAY), 60.0)
    relq = np.full((NCOL, NLAY), 12.0)
    return McicaClouds(
        cldfmc=jnp.asarray(cldf), ciwpmc=jnp.asarray(ciwp),
        clwpmc=jnp.asarray(clwp), taucmc=jnp.zeros(shape),
        reicmc=jnp.asarray(reic), relqmc=jnp.asarray(relq))


def _run_oracle_rt(prof, static, ktab, oracle_luts, c, *, cldfmc=None,
                   taucmc=None, cldfrac=None, odcld_band=None, idrv=0,
                   mcica=True, maxrandom=False, cloud_bands=None):
    o = _oracle_sc(prof, static, c, idrv=idrv)
    tg, fr = osp.taumol_1col(
        NLAY, o, np.asarray(prof.pavel[c]), np.asarray(prof.wx[c]).T,
        np.asarray(prof.coldry[c]), ktab, static)
    ngb0 = np.asarray(static["ngb"]) - 1
    kw = dict(idrv=idrv, dplankbnd_dt=o["dplankbnd_dt"],
              cloud_bands=cloud_bands)
    if maxrandom:
        return ort.rtrnmr_1col(
            NLAY, np.asarray(prof.pz[c]), np.asarray(prof.semiss[c]), ngb0,
            cldfrac, odcld_band, o["planklay"], o["planklev"],
            o["plankbnd"], float(prof.pwvcm[c]), fr, tg, oracle_luts,
            heatfac(), **kw)
    return ort.rtrnmc_1col(
        NLAY, np.asarray(prof.pz[c]), np.asarray(prof.semiss[c]), ngb0,
        cldfmc, taucmc, o["planklay"], o["planklev"], o["plankbnd"],
        float(prof.pwvcm[c]), fr, tg, oracle_luts, heatfac(),
        cldfrac_lay=cldfrac, odcld_band=odcld_band, mcica=mcica, **kw)


def test_clearsky_rt_matches_oracle(setup):
    atm, prof, static, ktab, model, oracle_luts = setup
    model = RRTMGLW(LWConfig(icld=0, idrv=1))
    fx = jax.jit(lambda a: model(a, None))(atm)
    zero = np.zeros((140, NLAY))
    for c in range(NCOL):
        o = _run_oracle_rt(prof, static, ktab, oracle_luts, c,
                           cldfmc=zero, taucmc=zero, idrv=1)
        np.testing.assert_allclose(np.asarray(fx.uflx[c]), o["totuflux"],
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(fx.dflx[c]), o["totdflux"],
                                   rtol=1e-12, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fx.hr[c]), o["htr"],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fx.uflxc[c]), o["totuclfl"],
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(fx.duflx_dt[c]),
                                   o["dtotuflux_dt"], rtol=1e-12)


def test_mcica_rt_matches_oracle(setup):
    atm, prof, static, ktab, model, oracle_luts = setup
    clouds = _mcica_clouds()
    model = RRTMGLW(LWConfig(icld=2, imca=1, inflag=2, iceflag=3, liqflag=1))
    fx = jax.jit(lambda a, cl: model(a, cl))(atm, clouds)
    from rrtmg_lw_tpu.ops.cldprop import cldprmc
    taucmc, _ = cldprmc(clouds, static, inflag=2, iceflag=3, liqflag=1)
    for c in range(NCOL):
        o = _run_oracle_rt(
            prof, static, ktab, oracle_luts, c,
            cldfmc=np.asarray(clouds.cldfmc[c]).T,
            taucmc=np.asarray(taucmc[c]).T)
        np.testing.assert_allclose(np.asarray(fx.uflx[c]), o["totuflux"],
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(fx.dflx[c]), o["totdflux"],
                                   rtol=1e-12, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fx.hr[c]), o["htr"],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fx.dflxc[c]), o["totdclfl"],
                                   rtol=1e-12, atol=1e-10)


def _band_clouds(seed=5):
    rng = np.random.default_rng(seed)
    cldfrac = np.zeros((NCOL, NLAY))
    cldfrac[:, 6:12] = rng.uniform(0.2, 0.9, (NCOL, 6))
    cldfrac[:, 25:30] = rng.uniform(0.1, 1.0, (NCOL, 5))
    cldfrac[1, 27] = 0.0  # punch a hole: separates cloudy blocks
    ciwp = np.where(cldfrac > 0, 25.0, 0.0)
    clwp = np.where(cldfrac > 0, 15.0, 0.0)
    return BandClouds(
        cldfrac=jnp.asarray(cldfrac),
        tauc=jnp.zeros((NCOL, NLAY, 16)),
        ciwp=jnp.asarray(ciwp), clwp=jnp.asarray(clwp),
        reic=jnp.full((NCOL, NLAY), 70.0),
        relq=jnp.full((NCOL, NLAY), 10.0))


@pytest.mark.parametrize("icld", [1, 2])
def test_deterministic_cloud_rt_matches_oracle(setup, icld):
    atm, prof, static, ktab, model, oracle_luts = setup
    clouds = _band_clouds()
    model = RRTMGLW(LWConfig(icld=icld, imca=0, inflag=2, iceflag=3,
                             liqflag=1, idrv=1))
    fx = jax.jit(lambda a, cl: model(a, cl))(atm, clouds)
    from rrtmg_lw_tpu.ops.cldprop import cldprop
    taucloud, _ = cldprop(clouds, static, inflag=2, iceflag=3, liqflag=1)
    ngb0 = np.asarray(static["ngb"]) - 1
    for c in range(NCOL):
        od_g = np.asarray(taucloud[c])[:, ngb0]        # (L, 140)
        o = _run_oracle_rt(
            prof, static, ktab, oracle_luts, c,
            cldfrac=np.asarray(clouds.cldfrac[c]), odcld_band=od_g,
            mcica=False, maxrandom=(icld == 2), idrv=1)
        np.testing.assert_allclose(np.asarray(fx.uflx[c]), o["totuflux"],
                                   rtol=1e-12, err_msg=f"icld={icld} up")
        np.testing.assert_allclose(np.asarray(fx.dflx[c]), o["totdflux"],
                                   rtol=1e-12, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fx.hr[c]), o["htr"],
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(fx.duflx_dt[c]),
                                   o["dtotuflux_dt"], rtol=1e-12)


def _ec_band_clouds():
    """Cloud field exercising the runtime-ncbands semantics: a mixed
    ice+liquid layer, pure-ice layers BOTH before and after it (the
    running ncbands then depends on layer order), and a liquid-only
    layer.  Column 1 ends on a pure-ice layer (final ncbands=5 under
    iceflag=1), column 0 on a mixed layer (final 16)."""
    cldfrac = np.zeros((NCOL, NLAY))
    ciwp = np.zeros((NCOL, NLAY))
    clwp = np.zeros((NCOL, NLAY))
    for c in range(NCOL):
        cldfrac[c, 6] = 0.7; ciwp[c, 6] = 30.0              # pure ice
        cldfrac[c, 10] = 0.5; ciwp[c, 10] = 20.0; clwp[c, 10] = 12.0
        cldfrac[c, 14] = 0.9; clwp[c, 14] = 18.0            # liquid only
    # column 1: a pure-ice layer ABOVE the mixed one
    cldfrac[1, 20] = 0.6; ciwp[1, 20] = 25.0
    return BandClouds(
        cldfrac=jnp.asarray(cldfrac),
        tauc=jnp.zeros((NCOL, NLAY, 16)),
        ciwp=jnp.asarray(ciwp), clwp=jnp.asarray(clwp),
        reic=jnp.full((NCOL, NLAY), 70.0),
        relq=jnp.full((NCOL, NLAY), 10.0))


@pytest.mark.parametrize("icld", [1, 2])
@pytest.mark.parametrize("iceflag,liqflag",
                         [(1, 1), (1, 0), (0, 1), (0, 0), (3, 0)])
def test_runtime_ncbands_rt_matches_oracle(setup, icld, iceflag, liqflag):
    """Non-McICA configs where the reference's runtime ncbands/ipat
    cloud-band aliasing is live (iceflag 0/1 or liqflag 0,
    rrtmg_lw_cldprop.f90:173-295 + rtrn.f90:252,321-348): the model's
    prefolded expansion must match the oracle's independent scalar
    transcription of cldprop + the ipat/secdiff(cloud band) RT
    contract, including the layer-order dependence."""
    from oracle import cld as ocld
    from rrtmg_lw_tpu.ops.cldprop import cldprop_ncbands, \
        cloud_bands_static
    assert not cloud_bands_static(2, iceflag, liqflag)
    atm, prof, static, ktab, model, oracle_luts = setup
    clouds = _ec_band_clouds()
    model = RRTMGLW(LWConfig(icld=icld, imca=0, inflag=2,
                             iceflag=iceflag, liqflag=liqflag))
    fx = jax.jit(lambda a, cl: model(a, cl))(atm, clouds)

    tau_cb, ncb, _ = cldprop_ncbands(clouds, static, inflag=2,
                                     iceflag=iceflag, liqflag=liqflag)
    # the oracle RT consumes the model's own taut/fracs (bitwise
    # identical planck too): taumol independence is covered by
    # test_taumol_matches_oracle, and sharing the gas od keeps this
    # cloud-band-contract comparison bitwise-tight — a ~1 ulp taumol
    # difference otherwise flips tau_tbl quantizer cells (~1e-7 flux)
    sc, taut, fracs = model.optical_depth(prof)
    ngb0 = np.asarray(static["ngb"]) - 1
    for c in range(NCOL):
        ncb_o, tau_o = ocld.cldprop_1col(
            NLAY, 2, iceflag, liqflag, np.asarray(clouds.cldfrac[c]),
            np.asarray(clouds.tauc[c]).T, np.asarray(clouds.ciwp[c]),
            np.asarray(clouds.clwp[c]), np.asarray(clouds.reic[c]),
            np.asarray(clouds.relq[c]), static)
        assert int(ncb[c]) == ncb_o, f"col {c}"
        np.testing.assert_allclose(np.asarray(tau_cb[c]), tau_o,
                                   rtol=1e-12, atol=1e-300)
        common = (np.asarray(sc.planklay[c]), np.asarray(sc.planklev[c]),
                  np.asarray(sc.plankbnd[c]), float(prof.pwvcm[c]),
                  np.asarray(fracs[c]), np.asarray(taut[c]),
                  oracle_luts, heatfac())
        if icld == 2:
            o = ort.rtrnmr_1col(
                NLAY, np.asarray(prof.pz[c]), np.asarray(prof.semiss[c]),
                ngb0, np.asarray(clouds.cldfrac[c]), None, *common,
                cloud_bands=(tau_o, ncb_o))
        else:
            o = ort.rtrnmc_1col(
                NLAY, np.asarray(prof.pz[c]), np.asarray(prof.semiss[c]),
                ngb0, None, None, *common,
                cldfrac_lay=np.asarray(clouds.cldfrac[c]),
                mcica=False, cloud_bands=(tau_o, ncb_o))
        # tolerance: the model's in-jit taumol can differ from the
        # shared taut by fusion-order ulps, which the tau_tbl
        # quantizer can amplify to ~1e-7 W/m2; mapping errors in the
        # ncbands/ipat/secdiff contract are O(0.1-10) W/m2
        np.testing.assert_allclose(np.asarray(fx.uflx[c]), o["totuflux"],
                                   rtol=1e-6,
                                   err_msg=f"c{c} ice{iceflag}")
        np.testing.assert_allclose(np.asarray(fx.dflx[c]), o["totdflux"],
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fx.hr[c]), o["htr"],
                                   rtol=1e-4, atol=1e-5)
    if iceflag == 1 and liqflag == 1:
        # the layer-order quirk is live: the two columns' final
        # ncbands differ even though their layer compositions overlap
        # (column 0 ends on the liquid layer -> 16, column 1 on a
        # pure-ice layer -> 5)
        assert int(ncb[0]) == 16 and int(ncb[1]) == 5
