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
