"""Value-level pinning of the column-mode CLI against the spec-oracle.

The structural golden tests (test_goldens_structural.py) check block
counts / pressures / headers only — they would stay green if the CLI
emitted physically wrong fluxes.  Here, for parsed reference decks, the
deck -> ColumnCase arrays are run independently through the scalar
NumPy oracle (tests/oracle, a literal transcription of the Fortran
rtrnmc/rtrnmr/setcoef/taumol) and the CLI's computed fluxes must match
to 1e-10; the *printed* text must then match the computed values at the
output format's own precision.  This catches input-processing, unit,
config-routing, batching/averaging and output-formatting bugs the
structural tests cannot (reference paths: rrtmg_lw.1col.f90:444-716,
incl. the idrv dtbound adjustment :587-610).
"""

import pathlib

import numpy as np
import pytest

from oracle import rt as ort
from oracle import spec as osp

from rrtmg_lw_tpu.constants import heatfac
from rrtmg_lw_tpu.data import ktables as kt
from rrtmg_lw_tpu.ops.tables import build_lookup_tables

REF = pathlib.Path("/root/reference/run_examples_std_atm")

pytestmark = [
    pytest.mark.skipif(not REF.exists(),
                       reason="reference mount absent"),
    pytest.mark.slow,  # per-deck value pins; quick-tier CLI coverage lives in test_goldens_values_synthetic
]


@pytest.fixture(scope="module")
def env():
    static = kt.load_static()
    ktab, _ = kt.load_ktables()
    luts_np = build_lookup_tables()
    luts = dict(tau_tbl=luts_np.tau_tbl, exp_tbl=luts_np.exp_tbl,
                tfn_tbl=luts_np.tfn_tbl, delwave=static["delwave"])
    return static, ktab, luts


def _parse(inp, cld=None, aer=None):
    from rrtmg_lw_tpu.io.column_input import read_input_rrtm
    return read_input_rrtm(REF / inp, cld_path=REF / cld if cld else None,
                           aer_path=REF / aer if aer else None)


def _oracle_spectral(case, static, ktab):
    """setcoef + taumol (+aerosol) from the parsed deck arrays."""
    L = case.nlayers
    o = osp.setcoef_1col(L, case.pavel, case.tavel, case.tz,
                         float(case.tbound), case.semiss, case.coldry,
                         case.wkl, case.wbrodl, static, istart=1,
                         idrv=case.idrv)
    tg, fr = osp.taumol_1col(L, o, case.pavel, case.wx, case.coldry,
                             ktab, static)
    ngb0 = np.asarray(static["ngb"]) - 1
    # taut(L, 140): grey per-band aerosol od expanded to g-points
    taut = tg + case.tauaer[:, ngb0]
    return o, taut, fr, ngb0


def _run_clear_oracle(case, env, **rt_kwargs):
    """Deck arrays -> oracle setcoef/taumol -> cloud-free rtrnmc."""
    static, ktab, luts = env
    o, taut, fr, ngb0 = _oracle_spectral(case, static, ktab)
    zero = np.zeros((case.nlayers, 140)).T
    if rt_kwargs.pop("idrv", 0):
        rt_kwargs.update(idrv=1, dplankbnd_dt=o["dplankbnd_dt"])
    return ort.rtrnmc_1col(
        case.nlayers, case.pz, case.semiss, ngb0, zero, zero,
        o["planklay"], o["planklev"], o["plankbnd"], float(case.pwvcm),
        fr, taut, luts, heatfac(), **rt_kwargs)


def _apply_dtbound(o_rt, case, pz):
    """Column-mode idrv adjustment (rrtmg_lw.1col.f90:587-610)."""
    uflx = o_rt["totuflux"] + o_rt["dtotuflux_dt"] * case.dtbound
    fnet = uflx - o_rt["totdflux"]
    dp = pz[:-1] - pz[1:]
    htr = heatfac() * (fnet[:-1] - fnet[1:]) / dp
    return uflx, htr


def _check_raw(raw, uflx, dflx, htr):
    np.testing.assert_allclose(raw["uflx"], uflx, rtol=1e-10)
    np.testing.assert_allclose(raw["dflx"], dflx, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(raw["fnet"], uflx - dflx, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(raw["htr"], htr, rtol=1e-7, atol=1e-9)


def _check_printed(blocks, raws, tmp_path):
    """The formatted OUTPUT_RRTM text must reproduce the computed
    values at the edit descriptors' printed precision."""
    from rrtmg_lw_tpu.io.column_output import write_output_rrtm
    from rrtmg_lw_tpu.io.golden import parse_output_rrtm
    out = tmp_path / "OUTPUT_RRTM"
    write_output_rrtm(out, blocks)
    parsed = parse_output_rrtm(out)
    assert len(parsed) == len(raws)
    for pb, raw in zip(parsed, raws):
        # OUTPUT_RRTM rows are TOA..surface; raws are surface..TOA
        np.testing.assert_allclose(pb.uflx[::-1], raw["uflx"],
                                   atol=5.1e-5, rtol=0)
        np.testing.assert_allclose(pb.dflx[::-1], raw["dflx"],
                                   atol=5.1e-5, rtol=0)
        # htr is printed at the layer's lower-boundary level row; the
        # TOA level row carries 0.0 in the reference format
        np.testing.assert_allclose(pb.htr[::-1][:-1], raw["htr"],
                                   atol=5.1e-4, rtol=0)


@pytest.mark.parametrize("deck", [
    "input_rrtm_MLS-clr",            # iout=99: total + 16 band blocks
    "input_rrtm_MLW-clr",            # RRTATM MODEL=3
    "input_rrtm_SAW-clr",            # MODEL=5
    "input_rrtm_TROP-clr",           # MODEL=1
    "input_rrtm_ICRCCM_sonde",       # user-supplied radiosonde levels
])
def test_clear_deck_values(env, tmp_path, deck):
    """Every clear reference deck, value-pinned against the oracle
    (MLS exercises iout=99: total block + every per-band block)."""
    from rrtmg_lw_tpu.cli import run_case
    case = _parse(deck)
    assert case.icld == 0 and case.imca == 0
    blocks, raws = run_case(case, return_raw=True)
    if deck == "input_rrtm_MLS-clr":
        assert len(raws) == 17                   # iout=99
    orc = _run_clear_oracle(case, env)
    _check_raw(raws[0], orc["totuflux"], orc["totdflux"], orc["htr"])
    _check_printed(blocks, raws, tmp_path)


def test_xsec_deck_values(env, tmp_path):
    """CFC/CCl4 cross sections (wx parse path, extra.f aliases)."""
    from rrtmg_lw_tpu.cli import run_case
    case = _parse("input_rrtm_MLS-clr-xsec")
    assert np.any(case.wx != 0.0)
    blocks, raws = run_case(case, return_raw=True)
    orc = _run_clear_oracle(case, env)
    _check_raw(raws[0], orc["totuflux"], orc["totdflux"], orc["htr"])
    _check_printed(blocks, raws, tmp_path)


def test_aerosol_deck_values(env, tmp_path):
    """IN_AER_RRTM grey per-band aerosol optical depths."""
    from rrtmg_lw_tpu.cli import run_case
    case = _parse("input_rrtm_MLS-clr-aer12", aer="in_aer_rrtm-aer12")
    assert np.any(case.tauaer != 0.0)
    blocks, raws = run_case(case, return_raw=True)
    orc = _run_clear_oracle(case, env)
    _check_raw(raws[0], orc["totuflux"], orc["totdflux"], orc["htr"])
    _check_printed(blocks, raws, tmp_path)


def test_idrv_deck_values(env, tmp_path):
    """idrv=1 + DTBOUND: the post-solve flux adjustment must match the
    oracle's derivative recursion applied the reference way."""
    from rrtmg_lw_tpu.cli import run_case
    case = _parse("input_rrtm_MLS-clr-idrv1")
    assert case.idrv == 1 and case.dtbound != 0.0
    blocks, raws = run_case(case, return_raw=True)
    orc = _run_clear_oracle(case, env, idrv=1)
    uflx, htr = _apply_dtbound(orc, case, case.pz)
    _check_raw(raws[0], uflx, orc["totdflux"], htr)
    _check_printed(blocks, raws, tmp_path)


def test_maxrandom_cloud_deck_values(env, tmp_path):
    """cld5 imca=0 icld=2: deterministic max-random overlap (rtrnmr)."""
    static, ktab, luts = env
    import jax.numpy as jnp
    from rrtmg_lw_tpu.cli import run_case
    from rrtmg_lw_tpu.ops.cldprop import cldprop
    from rrtmg_lw_tpu.types import BandClouds
    case = _parse("input_rrtm_MLS-cld-imca0-icld2", cld="in_cld_rrtm-cld5")
    assert case.icld == 2 and case.imca == 0
    blocks, raws = run_case(case, return_raw=True)
    o, taut, fr, ngb0 = _oracle_spectral(case, static, ktab)
    cld = case.clouds
    bc = BandClouds(
        cldfrac=jnp.asarray(cld.cldfrac[None]),
        tauc=jnp.asarray(cld.tauc.T[None]),
        ciwp=jnp.asarray(cld.ciwp[None]), clwp=jnp.asarray(cld.clwp[None]),
        reic=jnp.asarray(cld.rei[None]), relq=jnp.asarray(cld.rel[None]))
    taucloud, _ = cldprop(bc, static, inflag=cld.inflag,
                          iceflag=cld.iceflag, liqflag=cld.liqflag)
    od_g = np.asarray(taucloud[0])[:, ngb0]
    orc = ort.rtrnmr_1col(
        case.nlayers, case.pz, case.semiss, ngb0, cld.cldfrac, od_g,
        o["planklay"], o["planklev"], o["plankbnd"], float(case.pwvcm),
        fr, taut, luts, heatfac())
    _check_raw(raws[0], orc["totuflux"], orc["totdflux"], orc["htr"])
    _check_printed(blocks, raws, tmp_path)


@pytest.mark.parametrize("deck,cld,icld,idcor", [
    ("input_rrtm_MLS-cld-imca1-icld4-idcor0", "in_cld_rrtm-cld7", 4, 0),
    ("input_rrtm_MLS-cld-imca1-icld2", "in_cld_rrtm-cld5", 2, 0),
    ("input_rrtm_MLS-cld-imca1-icld5-idcor0", "in_cld_rrtm-cld7", 5, 0),
    ("input_rrtm_MLS-cld-imca1-icld5-idcor1", "in_cld_rrtm-cld7", 5, 1),
])
def test_mcica_deck_values_nmca2(env, tmp_path, deck, cld, icld, idcor):
    """Every McICA reference deck at nmca=2: the CLI's vectorized
    2-sample batch + mean must equal per-sample oracle runs averaged
    (covers overlap modes 2/4/5 and both decorrelation treatments)."""
    static, ktab, luts = env
    import jax.numpy as jnp
    from rrtmg_lw_tpu.cli import run_case
    from rrtmg_lw_tpu.ops import mcica
    from rrtmg_lw_tpu.ops.cldprop import cldprmc
    from rrtmg_lw_tpu.types import McicaClouds
    case = _parse(deck, cld=cld)
    assert case.imca == 1 and case.icld == icld and case.idcor == idcor
    nmca = 2
    blocks, raws = run_case(case, nmca=nmca, return_raw=True)
    o, taut, fr, ngb0 = _oracle_spectral(case, static, ktab)
    cld = case.clouds
    L = case.nlayers
    alpha = np.asarray(mcica.get_alpha(
        jnp.asarray(case.dz[None, :], jnp.float64), case.icld,
        idcor=case.idcor, decorr_con=case.decorr_con,
        lat=np.array([case.lat]), juldat=case.juldat,
        cldfrac=jnp.asarray(cld.cldfrac[None, :])))[0]
    acc = dict(uflx=0.0, dflx=0.0, htr=0.0)
    for s in range(nmca):
        gen = mcica.generate_stochastic_clouds_ref(
            L, case.icld, 1, case.pavel * 100.0, cld.cldfrac, cld.clwp,
            cld.ciwp, alpha, cld.tauc, changeseed=s + 1,
            ngb=static["ngb"])
        mc = McicaClouds(
            cldfmc=jnp.asarray(gen["cldfmc"].T[None]),
            ciwpmc=jnp.asarray(gen["ciwpmc"].T[None]),
            clwpmc=jnp.asarray(gen["clwpmc"].T[None]),
            taucmc=jnp.asarray(gen["taucmc"].T[None]),
            reicmc=jnp.asarray(cld.rei[None]),
            relqmc=jnp.asarray(cld.rel[None]))
        taucmc, _ = cldprmc(mc, static, inflag=cld.inflag,
                            iceflag=cld.iceflag, liqflag=cld.liqflag)
        orc = ort.rtrnmc_1col(
            L, case.pz, case.semiss, ngb0, gen["cldfmc"],
            np.asarray(taucmc[0]).T, o["planklay"], o["planklev"],
            o["plankbnd"], float(case.pwvcm), fr, taut, luts, heatfac())
        acc["uflx"] += orc["totuflux"] / nmca
        acc["dflx"] += orc["totdflux"] / nmca
        acc["htr"] += orc["htr"] / nmca
    _check_raw(raws[0], acc["uflx"], acc["dflx"], acc["htr"])
    _check_printed(blocks, raws, tmp_path)
