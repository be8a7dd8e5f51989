"""Roundtrip: reference-schema rrtmg_lw.nc -> load_netcdf_original_tables.

Writes a synthetic netCDF file following the variable names / index
order of src/rrtmg_lw_read_nc.f90 (dims from rrlw_ncpar.f90:31-44),
filled with the deterministic synthetic original tables, and asserts
the loader reproduces them exactly — validating the index conventions
the real-data conversion will rely on.  Both the NetCDF3 (scipy) and
HDF5 (h5py fallback) container paths are exercised.
"""

import numpy as np
import pytest

from rrtmg_lw_tpu.data import ktables as kt


def _fill_nc_arrays(orig):
    """Invert load_netcdf_original_tables' slicing into dense arrays."""
    MG, NB = kt.MG, kt.NBANDS
    nab = len(kt._NC_ABSORBERS)
    v = {
        "KeySpeciesAbsorptionCoefficientsLowerAtmos":
            np.zeros((1, NB, MG, 13, 5, 9)),
        "KeySpeciesAbsorptionCoefficientsUpperAtmos":
            np.zeros((1, NB, MG, 47, 5, 5)),
        "H20SelfAbsorptionCoefficients": np.zeros((1, NB, MG, 10)),
        "H20ForeignAbsorptionCoefficients": np.zeros((1, NB, MG, 4)),
        "PlanckFractionLowerAtmos": np.zeros((1, NB, 9, MG)),
        "PlanckFractionUpperAtmos": np.zeros((1, NB, 5, MG)),
        "AbsorptionCoefficientsLowerAtmos":
            np.zeros((1, NB, nab, MG, 19, 9)),
        "AbsorptionCoefficientsUpperAtmos":
            np.zeros((1, NB, nab, MG, 19, 5)),
    }
    for b in range(1, NB + 1):
        t = orig[b]
        i = b - 1
        ka = t["kao"]
        if b in kt.KEY2_LOWER:
            v["KeySpeciesAbsorptionCoefficientsLowerAtmos"][
                0, i, :, :, :, :9] = ka.transpose(3, 2, 1, 0)
        else:
            v["KeySpeciesAbsorptionCoefficientsLowerAtmos"][
                0, i, :, :, :, 0] = ka.transpose(2, 1, 0)
        if "kbo" in t:
            kb = t["kbo"]
            if b in kt.KEY2_UPPER:
                v["KeySpeciesAbsorptionCoefficientsUpperAtmos"][
                    0, i, :, :, :, :5] = kb.transpose(3, 2, 1, 0)
            else:
                v["KeySpeciesAbsorptionCoefficientsUpperAtmos"][
                    0, i, :, :, :, 0] = kb.transpose(2, 1, 0)
        v["H20SelfAbsorptionCoefficients"][0, i] = t["selfrefo"].T
        v["H20ForeignAbsorptionCoefficients"][0, i] = t["forrefo"].T
        fa = t["fracrefao"]
        if b in kt.FRACA_ETA:
            v["PlanckFractionLowerAtmos"][0, i, :9] = fa.T
        else:
            v["PlanckFractionLowerAtmos"][0, i, 0] = fa
        if "fracrefbo" in t:
            fb = t["fracrefbo"]
            if b in kt.FRACB_ETA:
                v["PlanckFractionUpperAtmos"][0, i, :5] = fb.T
            else:
                v["PlanckFractionUpperAtmos"][0, i, 0] = fb
        for gas, kind in kt.MINOR_LOWER.get(b, []):
            ab = kt._NC_ABSORBERS.index(kt._MINOR_NC_GAS[gas])
            m = t[f"kao_m{gas}"]
            if kind == "eta":
                v["AbsorptionCoefficientsLowerAtmos"][
                    0, i, ab, :, :, :9] = m.transpose(2, 1, 0)
            else:
                v["AbsorptionCoefficientsLowerAtmos"][
                    0, i, ab, :, :, 0] = m.T
        for gas, kind in kt.MINOR_UPPER.get(b, []):
            ab = kt._NC_ABSORBERS.index(kt._MINOR_NC_GAS[gas])
            m = t[f"kbo_m{gas}"]
            if kind == "eta5":
                v["AbsorptionCoefficientsUpperAtmos"][
                    0, i, ab, :, :, :5] = m.transpose(2, 1, 0)
            else:
                v["AbsorptionCoefficientsUpperAtmos"][
                    0, i, ab, :, :, 0] = m.T
        for name in kt.CFC_VECS.get(b, []):
            gasnc = {"ccl4": "CCL4", "cfc11adj": "CFC11",
                     "cfc12": "CFC12", "cfc22adj": "CFC22"}[name]
            ab = kt._NC_ABSORBERS.index(gasnc)
            v["AbsorptionCoefficientsLowerAtmos"][
                0, i, ab, :, 0, 0] = t[f"{name}o"]
    return v


def _assert_roundtrip(orig, loaded):
    for b in range(1, kt.NBANDS + 1):
        for name, arr in orig[b].items():
            got = loaded[b][name]
            np.testing.assert_array_equal(
                got, np.asarray(arr, np.float64),
                err_msg=f"band {b} {name}")


@pytest.fixture(scope="module")
def orig():
    return kt.synthetic_original_tables()


def test_netcdf3_roundtrip(tmp_path_factory, orig):
    from scipy.io import netcdf_file
    v = _fill_nc_arrays(orig)
    path = tmp_path_factory.mktemp("nc") / "rrtmg_lw.nc"
    f = netcdf_file(str(path), "w")
    dims = {}

    def dim(n):
        if n not in dims:
            f.createDimension(f"d{n}_{len(dims)}", n)
            dims[n] = f"d{n}_{len(dims) - 1}"
        return dims[n]

    for name, arr in v.items():
        dnames = []
        for k, n in enumerate(arr.shape):
            dn = f"{name}_d{k}"
            f.createDimension(dn, n)
            dnames.append(dn)
        var = f.createVariable(name, "d", tuple(dnames))
        var[:] = arr
    f.close()
    _assert_roundtrip(orig, kt.load_netcdf_original_tables(path))


def test_hdf5_fallback_roundtrip(tmp_path_factory, orig):
    h5py = pytest.importorskip("h5py")
    v = _fill_nc_arrays(orig)
    path = tmp_path_factory.mktemp("h5") / "rrtmg_lw.nc"
    with h5py.File(str(path), "w") as f:
        for name, arr in v.items():
            f.create_dataset(name, data=arr)
    _assert_roundtrip(orig, kt.load_netcdf_original_tables(path))


def _fortran_vals(a, per_line=4):
    toks = [f"{v:.17e}_rb".replace("e", "E") for v in
            np.asarray(a).flatten(order="F")]
    lines = []
    for i in range(0, len(toks), per_line):
        lines.append("     & " + ", ".join(toks[i:i + per_line]))
    return " , &\n".join(lines)


def test_fortran_k_g_roundtrip(tmp_path_factory, orig):
    """Synthetic rrtmg_lw_k_g.f90 in the reference's assignment styles
    (whole-array reshape + per-slice constructors) -> loader."""
    chunks = []
    for b in range(1, kt.NBANDS + 1):
        chunks.append(f"      subroutine lw_kgb{b:02d}\n")
        for j, (name, arr) in enumerate(sorted(orig[b].items())):
            a = np.asarray(arr, np.float64)
            if j % 2 == 0 and a.ndim > 1:
                # whole-array reshape form
                dims = ",".join(str(n) for n in a.shape)
                chunks.append(
                    f"      {name} = reshape((/ &\n"
                    f"{_fortran_vals(a)} /), (/{dims}/))\n")
            elif a.ndim > 1:
                # per-last-index slice constructors (kbo jp dim is
                # declared 13:59 but slicing the LAST axis avoids it)
                colon = ",".join(":" for _ in range(a.ndim - 1))
                for g in range(a.shape[-1]):
                    chunks.append(
                        f"      {name}({colon},{g + 1}) = (/ &\n"
                        f"{_fortran_vals(a[..., g])} /)\n")
            else:
                chunks.append(
                    f"      {name}(:) = (/ &\n{_fortran_vals(a)} /)\n")
        chunks.append(f"      end subroutine lw_kgb{b:02d}\n\n")
    path = tmp_path_factory.mktemp("kg") / "rrtmg_lw_k_g.f90"
    path.write_text("".join(chunks))

    loaded = kt.load_fortran_original_tables(path)
    _assert_roundtrip(orig, loaded)
