"""RRTATM atmosphere-builder tests.

Ground truths used here:
  * the committed golden output ``output_rrtm_ICRCCM_sonde`` — its level
    pressures are produced by the reference's RRTATM layering (the only
    shipped case with IATM=1), independent of the k-tables;
  * the MLS-clr deck's inline layer data, which AER generated with the
    same LBLATM lineage for MODEL=2 boundaries (validates the built-in
    atmosphere chain; species vmrs differ by deck provenance — the 1994
    deck used CO2=355 ppmv vs the AFGL profile's 330 — so only P/T and
    total-column quantities are compared).
"""

import pathlib
import re

import numpy as np
import pytest

from rrtmg_lw_tpu.io import rrtatm as R
from rrtmg_lw_tpu.io.column_input import read_input_rrtm

REF = pathlib.Path("/root/reference/run_examples_std_atm")


@pytest.fixture(scope="module")
def sonde_case():
    return read_input_rrtm(REF / "input_rrtm_ICRCCM_sonde")


def _golden_pressures(path):
    """Pressure column of an OUTPUT_RRTM flux table, level order 0..L."""
    rows = {}
    for line in pathlib.Path(path).read_text().splitlines():
        m = re.match(r"\s*(\d+)\s+([0-9.]+(?:[eE][+-]?\d+)?)\s+[0-9.]", line)
        if m:
            rows[int(m.group(1))] = float(m.group(2))
    return np.array([rows[k] for k in sorted(rows)])


def test_sonde_layering_matches_golden_pz(sonde_case):
    case = sonde_case
    assert case.nlayers == 31
    gold = _golden_pressures(REF / "output_rrtm_ICRCCM_sonde")
    assert len(gold) == 32
    # golden table prints 4 significant digits
    rel = np.abs(case.pz - gold) / gold
    assert rel.max() < 5e-4, rel.max()


def test_sonde_airmwt_quirk(sonde_case):
    # JCHAR='C' H2O is zeroed by the reference's uninitialized-AIRMWT
    # quirk (see io/rrtatm.py module docstring); above 30 km the deck
    # defaults to model 6 (JCHAR='6'), which stays nonzero
    below = sonde_case.altz[:-1] < 29.9
    assert np.all(sonde_case.wkl[0][below] == 0.0)
    assert sonde_case.wkl[0][~below].max() < 1e18
    assert sonde_case.pwvcm < 1e-3         # effectively dry column
    # CO2 in ppmv path is unaffected
    vmr = sonde_case.wkl[1] / sonde_case.coldry
    np.testing.assert_allclose(vmr[0], 3.614e-4, rtol=1e-3)


def test_sonde_physical_airmwt_gives_moisture():
    lines = (REF / "input_rrtm_ICRCCM_sonde").read_text().splitlines()
    # find the record-3.1 line (follows tbound record after '$' block)
    i = next(k for k, l in enumerate(lines) if l.startswith("$")) + 3
    res, _ = R.read_rrtatm(lines, i, airmwt=R.AIRMWT_PHYS)
    assert res.amount[0].sum() > 1e22      # precipitable water present
    # 6.49 g/kg at the surface -> vmr about 1.04e-2
    vmr = res.amount[0, 0] / res.wn2l[0]
    assert 0.008 < vmr < 0.013


def test_builtin_mls_matches_deck_layers():
    case = read_input_rrtm(REF / "input_rrtm_MLS-clr")
    prof = R.build_model_profile(2, nmol=7)
    res = R.vertical_path(prof, case.altz, h1=case.altz[0],
                          h2=case.altz[-1], nmol=7)
    assert res.nlayers == case.nlayers == 51
    np.testing.assert_allclose(res.pz, case.pz, rtol=1e-5)
    np.testing.assert_allclose(res.pavel, case.pavel, rtol=5e-5)
    np.testing.assert_allclose(res.tavel, case.tavel, rtol=5e-5)
    np.testing.assert_allclose(res.tz, case.tz, rtol=5e-5)
    np.testing.assert_allclose(res.wn2l, case.wbrodl, rtol=1e-3)
    # O3 column vmr (deck provenance matches AFGL for O3)
    drair = res.wn2l + res.amount[1:7].sum(axis=0)
    np.testing.assert_allclose(res.amount[2] / drair,
                               case.wkl[2] / case.coldry, rtol=2e-3)


def test_all_six_builtin_models_build():
    for m in range(1, 7):
        prof = R.build_model_profile(m, nmol=7)
        zbnd = np.arange(0.0, 51.0, 2.0)
        res = R.vertical_path(prof, zbnd, 0.0, 50.0, nmol=7)
        assert res.nlayers == len(zbnd) - 1
        assert np.all(np.diff(res.pz) < 0)
        assert np.all(res.amount >= 0)
        assert np.all(res.wn2l > 0)
        # surface pressure within a few mb of the AFGL table
        assert abs(res.pz[0] - prof.pm[0]) < 1.0
        # O2 about 20.9% everywhere
        vmr_o2 = res.amount[6] / (res.wn2l + res.amount[1:7].sum(axis=0))
        assert np.all((vmr_o2 > 0.200) & (vmr_o2 < 0.215))


def test_defalt_interpolation_at_grid_points():
    # 4-point Lagrange reproduces table values exactly at grid nodes
    std = R.load_std_atmos()
    junit = np.array([6] * 7)
    wmol = np.zeros(7)
    p, t = R.defalt(25.0, 6, 6, junit, wmol, 7)
    i = int(np.nonzero(std["alt"] == 25.0)[0][0])
    assert abs(p - std["pmdl"][5, i]) / p < 1e-12
    assert abs(t - std["tmdl"][5, i]) < 1e-10
    np.testing.assert_allclose(wmol, std["amol"][5, :7, i], rtol=1e-12)
    assert np.all(junit == 10)


def test_pressure_boundary_mode():
    # IBMAX<0 path: boundaries given in mb; check round trip through
    # _pbnd_to_zbnd at profile grid points is exact
    prof = R.build_model_profile(6, nmol=7)
    pbnd = prof.pm[[0, 5, 10, 20, 30]].copy()
    zbnd = R._pbnd_to_zbnd(pbnd, prof, ref_lat=45.0)
    np.testing.assert_allclose(zbnd, prof.zmdl[[0, 5, 10, 20, 30]],
                               atol=1e-10)
    res = R.vertical_path(prof, zbnd, zbnd[0], zbnd[-1], nmol=7)
    assert res.nlayers == 4
    np.testing.assert_allclose(res.pz, pbnd, rtol=1e-12)


def _autlay_deck(tmp_path, rec33a="", model=2, h1=0.0, h2=70.0):
    """A minimal IATM=1 deck with IBMAX=0 (AUTLAY) layering."""
    def put(line, col, text):
        # 1-based column placement
        line = line.ljust(col - 1 + len(text))
        return line[:col - 1] + text + line[col - 1 + len(text):]
    rec12 = ""
    rec12 = put(rec12, 50, "1")            # IATM
    rec12 = put(rec12, 88, "  0")          # IOUT
    rec31 = f"{model:5d}    2    0    1    1    7    0"
    rec32 = f"{h1:10.3f}{h2:10.3f}"
    deck = "\n".join(["$ AUTLAY test deck", rec12, "294.2",
                      rec31, rec32, rec33a, "%"]) + "\n"
    p = tmp_path / "INPUT_RRTM"
    p.write_text(deck)
    return p


def test_autlay_default_parameters(tmp_path):
    """IBMAX=0: boundaries generated by AUTLAY (rrtatm.f:5496-5605)
    must satisfy the two advertised invariants against the model grid
    — consecutive Voigt-halfwidth ratio <= AVTRAT and temperature span
    <= TDIFF(z) — and be rounded down to 0.1 km."""
    from rrtmg_lw_tpu.io.column_input import read_input_rrtm
    case = read_input_rrtm(_autlay_deck(tmp_path))
    assert case.nlayers > 10
    z = case.altz
    assert z[0] == 0.0 and z[-1] == 70.0
    assert np.all(np.diff(z) > 0)
    # interior boundaries land on the 0.1-km grid (ZROUND, :5544)
    interior = z[1:-1]
    np.testing.assert_allclose(interior, np.round(interior * 10) / 10,
                               atol=1e-9)

    prof = R.build_model_profile(2, nmol=7)
    avtrat, tdiff1, tdiff2, altd1, altd2 = 1.5, 5.0, 8.0, 0.0, 100.0
    av = np.array([R._halfwd(zz, 1.0, prof)[4] for zz in z])
    ratios = av[:-1] / av[1:]
    assert ratios.max() <= avtrat * 1.05, ratios.max()
    # temperature span between consecutive boundaries on the model grid
    for a, b in zip(z[:-1], z[1:]):
        tdiff = R.expint(tdiff1, tdiff2, (a - altd1) / (altd2 - altd1))
        sel = (prof.zmdl >= a) & (prof.zmdl <= b)
        ts = np.concatenate([[R._halfwd(a, 1.0, prof)[1]],
                             prof.tm[sel],
                             [R._halfwd(b, 1.0, prof)[1]]])
        assert ts.max() - ts.min() <= tdiff + 1.5, (a, b)


def test_autlay_tight_parameters_make_more_layers(tmp_path):
    """Stricter AVTRAT/TDIFF must refine the layering monotonically."""
    from rrtmg_lw_tpu.io.column_input import read_input_rrtm
    loose = read_input_rrtm(_autlay_deck(tmp_path))
    tight33a = f"{1.2:10.3f}{2.0:10.3f}{4.0:10.3f}"
    tight = read_input_rrtm(_autlay_deck(tmp_path, rec33a=tight33a))
    assert tight.nlayers > loose.nlayers
    # the tight run obeys its own ratio bound
    prof = R.build_model_profile(2, nmol=7)
    av = np.array([R._halfwd(zz, 1.0, prof)[4] for zz in tight.altz])
    assert (av[:-1] / av[1:]).max() <= 1.2 * 1.05


@pytest.mark.slow
def test_autlay_full_radiation_runs(tmp_path):
    """The AUTLAY deck must run end-to-end through the CLI solver."""
    from rrtmg_lw_tpu.cli import run_case
    from rrtmg_lw_tpu.io.column_input import read_input_rrtm
    case = read_input_rrtm(_autlay_deck(tmp_path))
    blocks, raws = run_case(case, return_raw=True)
    uflx = raws[0]["uflx"]
    assert np.all(np.isfinite(uflx)) and np.all(uflx > 0)
    # OLR below surface emission, downward flux ~0 at TOA
    assert raws[0]["uflx"][-1] < raws[0]["uflx"][0]
    assert raws[0]["dflx"][-1] < 1e-6


# ---------------------------------------------------------------------------
# XAMNTS — cross-section profiles with IATM=1 (rrtatm.f:6089-7004)
# ---------------------------------------------------------------------------

def _xsec_deck(tmp_path, xrecords, model=2, h1=0.0, h2=70.0):
    """IATM=1 IXSECT=1 deck with AUTLAY layering and the given 3.7+
    records appended."""
    def put(line, col, text):
        line = line.ljust(col - 1 + len(text))
        return line[:col - 1] + text + line[col - 1 + len(text):]
    rec12 = ""
    rec12 = put(rec12, 50, "1")            # IATM
    rec12 = put(rec12, 70, "1")            # IXSECT
    rec12 = put(rec12, 88, "  0")          # IOUT
    rec31 = f"{model:5d}    2    0    1    1    7    0"
    rec32 = f"{h1:10.3f}{h2:10.3f}"
    deck = "\n".join(["$ XAMNTS test deck", rec12, "294.2",
                      rec31, rec32, ""] + xrecords + ["%"]) + "\n"
    p = tmp_path / "INPUT_RRTM"
    p.write_text(deck)
    return p


def test_xamnts_standard_profile(tmp_path):
    """IPRFL=1: XMLATM standard profiles -> wx slots 1-4; an untracked
    master molecule (HNO3) parses but lands in no slot (ixtrans=0)."""
    recs = ["    5    1    0",
            "CCL4      CFC11     CFC12     CFC22     HNO3      "]
    case = read_input_rrtm(_xsec_deck(tmp_path, recs))
    assert case.wx is not None and case.wx.shape == (4, case.nlayers)
    assert np.all(case.wx > 0)             # all 4 slots filled
    # column totals (molec/cm2, wx carries 1e-20): vmr ~1e-4 ppmv over
    # ~2e25 total air -> ~1e13-1e14 molec/cm2 -> ~1e-7..1e-6 scaled
    tot = case.wx.sum(axis=1) * 1.0e20
    assert np.all(tot > 1e11) and np.all(tot < 1e16), tot
    # independent bound: column of x <= vmr_max*1e-6 * dry-air column
    std = R.load_std_atmos()
    coldry_tot = case.coldry.sum()
    for slot, master in ((0, 4), (1, 5), (2, 6), (3, 12)):
        vmr_max = std["amolx"][master - 1].max()
        assert tot[slot] <= vmr_max * 1.0e-6 * coldry_tot * 1.02


def test_xamnts_constant_vmr_matches_coldry(tmp_path):
    """IPRFL=0 with a constant-vmr user profile: the x amount must equal
    vmr*1e-6*coldry layer by layer (both integrate the dry-air density
    over the same path; quadrature interpolants differ slightly)."""
    vmr = 0.1                              # ppmv, constant
    zx = [0.0, 10.0, 30.0, 70.0, 100.0]
    recs = ["    1    0    0",
            "CCL4      ",
            f"{len(zx):5d}    0 constant-vmr profile"]
    for z in zx:
        recs.append(f"{z:10.3f}     A")
        recs.append(f"{vmr:10.3E}")
    case = read_input_rrtm(_xsec_deck(tmp_path, recs))
    got = case.wx[0] * 1.0e20
    want = vmr * 1.0e-6 * case.coldry
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_xamnts_pressure_grid_matches_altitude_grid(tmp_path):
    """IZORP=1 (pressure levels) must land close to the same profile
    entered on its equivalent altitude grid."""
    vmr = [0.3, 0.2, 0.1, 0.05]
    za = [0.0, 10.0, 30.0, 80.0]
    recs_a = ["    1    0    0", "CFC11     ",
              f"{4:5d}    0 altitude grid"]
    for z, c in zip(za, vmr):
        recs_a.append(f"{z:10.3f}     A")
        recs_a.append(f"{c:10.3E}")
    case_a = read_input_rrtm(_xsec_deck(tmp_path, recs_a))
    # equivalent pressures from the model-2 profile
    prof = R.build_model_profile(2, nmol=7)
    pa = [float(np.interp(z, prof.zmdl,
                          np.log(prof.pm))) for z in za]
    pa = np.exp(pa)
    recs_p = ["    1    0    0", "CFC11     ",
              f"{4:5d}    1 pressure grid"]
    for p, c in zip(pa, vmr):
        recs_p.append(f"{p:10.4f}     A")
        recs_p.append(f"{c:10.3E}")
    case_p = read_input_rrtm(_xsec_deck(tmp_path, recs_p))
    np.testing.assert_allclose(case_p.wx[1], case_a.wx[1], rtol=0.02)


def test_xamnts_jchar_1_uses_standard_profile(tmp_path):
    """JCHAR='1' on a user level pulls the XMLATM standard value
    (XTRACT), so an all-'1' profile must be within the standard
    profile's range, not the (bogus) 999 the deck supplies."""
    zx = [0.0, 20.0, 60.0, 100.0]
    recs = ["    1    0    0", "CFC12     ",
            f"{len(zx):5d}    0 jchar-1 profile"]
    for z in zx:
        recs.append(f"{z:10.3f}     1")
        recs.append(f"{999.0:10.3E}")
    case = read_input_rrtm(_xsec_deck(tmp_path, recs))
    std = R.load_std_atmos()
    vmr_max = std["amolx"][6 - 1].max()    # CFC12 = master 6
    tot = case.wx[2].sum() * 1.0e20
    assert 0 < tot <= vmr_max * 1.0e-6 * case.coldry.sum() * 1.02


def test_xamnts_unknown_name_raises(tmp_path):
    recs = ["    1    1    0", "KRYPTONITE"]
    with pytest.raises(ValueError, match="cross-section"):
        read_input_rrtm(_xsec_deck(tmp_path, recs))


@pytest.mark.slow
def test_xamnts_full_radiation_runs(tmp_path):
    """End-to-end CLI run with IATM=1 cross sections: fluxes finite and
    the x gases add absorption vs the same deck without them."""
    from rrtmg_lw_tpu.cli import run_case
    recs = ["    4    1    0",
            "CCL4      CFC11     CFC12     CFC22     "]
    case = read_input_rrtm(_xsec_deck(tmp_path, recs))
    _, raws = run_case(case, return_raw=True)
    assert np.all(np.isfinite(raws[0]["uflx"]))
    case0 = read_input_rrtm(_xsec_deck(tmp_path, recs))
    case0.wx = np.zeros_like(case0.wx)
    _, raws0 = run_case(case0, return_raw=True)
    # CFCs absorb: OLR must drop when they are present
    assert raws[0]["uflx"][-1] < raws0[0]["uflx"][-1]


def test_endpoints_above_profile_top_reduce_to_zmax(tmp_path):
    """H2 above the model top reduces to ZMAX (REDUCE,
    rrtatm.f:4306-4309): deck H2=120 with HSPACE=100 must run, topping
    out at 100 km."""
    case = read_input_rrtm(_autlay_deck(tmp_path, h2=120.0))
    assert case.altz[-1] == 100.0


def test_h1_not_below_h2_rejected(tmp_path):
    """FSCGEO rejects H1 >= H2 on the vertical path (rrtatm.f:4232)."""
    with pytest.raises(ValueError, match="H1"):
        read_input_rrtm(_autlay_deck(tmp_path, h1=70.0, h2=0.0))


def test_entire_path_above_top_rejected(tmp_path):
    with pytest.raises(ValueError, match="ZMAX"):
        read_input_rrtm(_autlay_deck(tmp_path, h1=101.0, h2=110.0))


def test_xamnts_16_names_wrap_records(tmp_path):
    """Record 3.7.1 format reversion: 7 names on the first record, then
    at most 8 per continuation record (extra.f:70-75) — a 16-molecule
    selection spans three records."""
    names = ["CCL4", "CFC11", "CFC12", "CFC22", "HNO3", "N2O5", "CF4",
             "CLONO2", "HNO4", "CFC113", "CFC114", "CFC115", "CCL4",
             "CFC11", "CFC12", "CFC22"]
    rec1 = "".join(f"{n:<10}" for n in names[:7])
    rec2 = "".join(f"{n:<10}" for n in names[7:15])
    rec3 = f"{names[15]:<10}"
    recs = [f"{16:5d}    1    0", rec1, rec2, rec3]
    case = read_input_rrtm(_xsec_deck(tmp_path, recs))
    # later duplicates overwrite the same wx slot with the same values
    assert np.all(case.wx > 0)


def test_column_mass_matches_hydrostatics():
    """Independent physics check of the AMERGE/ALAYER/FPACK quadrature:
    the total air column must equal the hydrostatic estimate
    dp/(m_air*g) within ~1% (quadrature and profile interpolants are
    exponential, not exact hydrostatic)."""
    prof = R.build_model_profile(2, nmol=7)
    zbnd = np.arange(0.0, 71.0, 2.0)
    res = R.vertical_path(prof, zbnd, 0.0, 70.0, nmol=7)
    n_col = res.rhosum.sum()                      # molec/cm2
    dp_pa = (res.pz[0] - res.pz[-1]) * 100.0      # mb -> Pa
    m_air = 28.964e-3                             # kg/mol
    n_hyd = dp_pa / (m_air * 9.80665) * 6.02214e23 / 1.0e4
    np.testing.assert_allclose(n_col, n_hyd, rtol=0.01)
