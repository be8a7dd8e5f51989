"""Column-mode IO: input parsing, output formatting, CLI round trip."""

import pathlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/run_examples_std_atm")

from rrtmg_lw_tpu.io import (read_in_aer_rrtm, read_in_cld_rrtm,
                             read_input_rrtm)
from rrtmg_lw_tpu.io.column_output import format_flux_table
from rrtmg_lw_tpu.io.fortran_format import fmt_f
from rrtmg_lw_tpu.io.golden import parse_output_rrtm


def test_parse_mls_clr():
    case = read_input_rrtm(REF / "input_rrtm_MLS-clr")
    assert case.nlayers == 51
    assert case.iout == 99 and case.iatm == 0 and case.icld == 0
    assert case.tbound == pytest.approx(294.2)
    assert case.pz[0] == pytest.approx(1013.0)
    assert case.pz[-1] == pytest.approx(0.067)
    # wkl was mixing ratio -> converted to molec/cm2 via coldry
    assert case.wkl[0, 0] > 1e20
    assert np.all(case.semiss == 1.0)
    # golden pressures == parsed pz
    gold = parse_output_rrtm(REF / "output_rrtm_MLS-clr")[0]
    np.testing.assert_allclose(sorted(case.pz), sorted(gold.pz), rtol=5e-4)


def test_parse_idrv_and_emissivity():
    case = read_input_rrtm(REF / "input_rrtm_MLS-clr-idrv1")
    assert case.idrv == 1
    assert case.dtbound != 0.0


def test_parse_xsec():
    case = read_input_rrtm(REF / "input_rrtm_MLS-clr-xsec")
    assert case.ixsect == 1
    assert case.wx.shape[0] == 4
    assert case.wx.max() > 0          # ccl4/cfc columns present


def test_parse_cld_decks():
    cld5 = read_in_cld_rrtm(REF / "in_cld_rrtm-cld5")
    assert (cld5.inflag, cld5.iceflag, cld5.liqflag) == (2, 3, 1)
    assert cld5.cldfrac.max() > 0
    case = read_input_rrtm(REF / "input_rrtm_MLS-cld-imca0-icld2",
                           cld_path=REF / "in_cld_rrtm-cld5")
    assert case.icld == 2 and case.imca == 0
    c = case.clouds
    # inflag=2: cwp split into ice/liquid by fice
    lay = np.nonzero(c.cldfrac)[0]
    assert len(lay) > 0
    assert np.all(c.ciwp[lay] + c.clwp[lay] > 0)


def test_parse_aer():
    aod = read_in_aer_rrtm(REF / "in_aer_rrtm-aer12")
    assert (aod > 0).any()
    assert np.count_nonzero(aod.any(axis=1)) == 12     # 12 layers


def test_parse_exp_ran_records():
    case = read_input_rrtm(REF / "input_rrtm_MLS-cld-imca1-icld5-idcor1",
                           cld_path=REF / "in_cld_rrtm-cld7")
    assert case.icld == 5 and case.idcor == 1
    assert case.juldat > 0


def test_fmt_f_fortran_quirks():
    assert fmt_f(0.067, 6, 5) == ".06700"
    assert fmt_f(-0.5, 6, 4) == "-.5000"
    assert fmt_f(281.5358, 8, 4) == "281.5358"
    assert fmt_f(1013.0, 6, 1) == "1013.0"


def test_flux_table_format_matches_reference_layout():
    gold_lines = (REF / "output_rrtm_MLS-clr").read_text().splitlines()
    gold = parse_output_rrtm(REF / "output_rrtm_MLS-clr")[0]
    L = len(gold.pz) - 1
    htr = gold.htr[::-1][:-1][::-1]   # per-layer (drop TOA zero), asc
    blk = format_flux_table(1, 16, 1, gold.pz[::-1], gold.uflx[::-1],
                            gold.dflx[::-1], gold.fnet[::-1],
                            np.asarray(gold.htr[::-1][:L]))
    ours = blk.splitlines()
    # header rows byte-identical
    assert ours[0] == gold_lines[0]
    assert ours[1] == gold_lines[1]
    assert ours[2] == gold_lines[2]
    # first data row identical (round-trip through our formatter)
    assert ours[3] == gold_lines[3]


def test_cli_clear_sky_roundtrip(tmp_path):
    from rrtmg_lw_tpu.cli import run_case
    case = read_input_rrtm(REF / "input_rrtm_MLS-clr")
    case.iout = 0                      # single full-spectrum block
    blocks = run_case(case)
    assert len(blocks) == 1
    out = tmp_path / "OUTPUT_RRTM"
    out.write_text(blocks[0])
    parsed = parse_output_rrtm(out)
    assert len(parsed) == 1
    gold = parse_output_rrtm(REF / "output_rrtm_MLS-clr")[0]
    np.testing.assert_allclose(parsed[0].pz, gold.pz, rtol=5e-4)
    assert np.isfinite(parsed[0].uflx).all()
    assert parsed[0].dflx[0] == 0.0    # TOA downward flux is zero
