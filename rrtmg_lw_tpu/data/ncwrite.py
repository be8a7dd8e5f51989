"""Writer for the reference ``rrtmg_lw.nc`` k-data schema.

Transcribed LITERALLY from the Fortran netCDF reader
``src/rrtmg_lw_read_nc.f90`` (per-band ``nf90_get_var`` start/count
lists) with dimension sizes from ``modules/rrlw_ncpar.f90:31-44`` —
deliberately NOT from this package's own loader
(:func:`rrtmg_lw_tpu.data.ktables.load_netcdf_original_tables`), so the
pair can cross-check each other: tests/test_kdata_crosscheck.py encodes
one synthetic table set through this writer and through the independent
k_g.f90 text writer (:mod:`.kgwrite`) and asserts both loaders decode
to identical packed assets.  A silent misreading of the Fortran index
order in either loader breaks that equality.

Encoding model (how the writer mirrors the Fortran): each netCDF
variable is built as a numpy array whose axes follow the Fortran
``count=`` dimension order exactly — e.g.
``KeySpeciesAbsorptionCoefficientsLowerAtmos`` has
``count = (/keylower,Tdiff,plower,numGPoints,1,1/)``
(rrtmg_lw_read_nc.f90:197-199 band 3 form), so the build array is
``(keylower, Tdiff, plower, GPoint, band, GPointSet)``; since the
module arrays it fills are declared with those same leading dims
(``kao(9,5,13,no3)``, modules/rrlw_kg03.f90), the canonical in-repo
arrays assign directly with no permutation.  The file then stores the
reversed (C-order) axes, which is what nf90_put_var of a
column-major array produces.
"""

from __future__ import annotations

import numpy as np

from .ktables import (CFC_VECS, FRACA_ETA, FRACB_ETA, HAS_KBO, KEY2_LOWER,
                      KEY2_UPPER, MG, MINOR_LOWER, MINOR_UPPER, NBANDS)

# rrlw_ncpar.f90:31-44
DIMS = dict(keylower=9, keyupper=5, Tdiff=5, plower=13, pupper=47,
            Tself=10, Tforeign=4, T=19, band=16, GPoint=16, GPointSet=2,
            Absorber=12)

# rrlw_ncpar.f90:14-27 AbsorberNames (1-based Fortran index order)
ABSORBER_NAMES = ["N2", "CCL4", "CFC11", "CFC12", "CFC22", "H2O",
                  "CO2", "O3", "N2O", "CO", "CH4", "O2"]

# getAbsorberIndex('<NAME>') calls in each lw_kgbNN subroutine
_GAS_NAME = {"n2": "N2", "n2o": "N2O", "o3": "O3", "co2": "CO2",
             "co": "CO", "o2": "O2"}
_CFC_NAME = {"ccl4": "CCL4", "cfc11adj": "CFC11", "cfc12": "CFC12",
             "cfc22adj": "CFC22"}

# Fortran dimension order of each variable, i.e. the count= lists
_VAR_FDIMS = {
    "PlanckFractionLowerAtmos": ("GPoint", "keylower", "band",
                                 "GPointSet"),
    "PlanckFractionUpperAtmos": ("GPoint", "keyupper", "band",
                                 "GPointSet"),
    "KeySpeciesAbsorptionCoefficientsLowerAtmos":
        ("keylower", "Tdiff", "plower", "GPoint", "band", "GPointSet"),
    "KeySpeciesAbsorptionCoefficientsUpperAtmos":
        ("keyupper", "Tdiff", "pupper", "GPoint", "band", "GPointSet"),
    "H20SelfAbsorptionCoefficients": ("Tself", "GPoint", "band",
                                      "GPointSet"),
    "H20ForeignAbsorptionCoefficients": ("Tforeign", "GPoint", "band",
                                         "GPointSet"),
    "AbsorptionCoefficientsLowerAtmos":
        ("keylower", "T", "GPoint", "Absorber", "band", "GPointSet"),
    "AbsorptionCoefficientsUpperAtmos":
        ("keyupper", "T", "GPoint", "Absorber", "band", "GPointSet"),
}


def _ab(name: str) -> int:
    """0-based slot of getAbsorberIndex(name) (1-based in Fortran)."""
    return ABSORBER_NAMES.index(name)


def build_variables(orig: dict) -> dict:
    """Fortran-dim-order arrays for every variable, filled per band.

    ``orig``: band -> dict of canonical original arrays
    (:func:`~rrtmg_lw_tpu.data.ktables.original_shapes` layout, which
    equals the rrlw_kgNN declaration layout).
    """
    v = {name: np.zeros(tuple(DIMS[d] for d in fd))
         for name, fd in _VAR_FDIMS.items()}
    g1 = 0          # gPointSetNumber = 1 throughout the reader
    for b in range(1, NBANDS + 1):
        t = orig[b]
        bi = b - 1

        # Planck fractions: count (G, keylower|1, 1, 1) /
        # (G, keyupper|1, 1, 1)
        pfl = v["PlanckFractionLowerAtmos"]
        if b in FRACA_ETA:                       # count (G, keylower,..)
            pfl[:MG, :9, bi, g1] = t["fracrefao"]
        else:                                    # count (G, 1, ..)
            pfl[:MG, 0, bi, g1] = t["fracrefao"]
        if "fracrefbo" in t:
            pfu = v["PlanckFractionUpperAtmos"]
            if b in FRACB_ETA:
                pfu[:MG, :5, bi, g1] = t["fracrefbo"]
            else:
                pfu[:MG, 0, bi, g1] = t["fracrefbo"]

        # key species: count (keylower|1, Tdiff, plower, G, 1, 1)
        kl = v["KeySpeciesAbsorptionCoefficientsLowerAtmos"]
        if b in KEY2_LOWER:
            kl[:9, :5, :13, :MG, bi, g1] = t["kao"]
        else:
            kl[0, :5, :13, :MG, bi, g1] = t["kao"]
        if b in HAS_KBO:
            ku = v["KeySpeciesAbsorptionCoefficientsUpperAtmos"]
            if b in KEY2_UPPER:
                ku[:5, :5, :47, :MG, bi, g1] = t["kbo"]
            else:
                ku[0, :5, :47, :MG, bi, g1] = t["kbo"]

        # continua: count (Tself, G, 1, 1) / (Tforeign, G, 1, 1)
        v["H20SelfAbsorptionCoefficients"][:10, :MG, bi, g1] = \
            t["selfrefo"]
        v["H20ForeignAbsorptionCoefficients"][:4, :MG, bi, g1] = \
            t["forrefo"]

        # minor gases: count (keylower|1, T, G, 1, 1, 1) lower /
        # (keyupper|1, T, G, 1, 1, 1) upper, start dim4 = absorber
        al = v["AbsorptionCoefficientsLowerAtmos"]
        for gas, kind in MINOR_LOWER.get(b, []):
            ab = _ab(_GAS_NAME[gas])
            if kind == "eta":
                al[:9, :19, :MG, ab, bi, g1] = t[f"kao_m{gas}"]
            else:
                al[0, :19, :MG, ab, bi, g1] = t[f"kao_m{gas}"]
        au = v["AbsorptionCoefficientsUpperAtmos"]
        for gas, kind in MINOR_UPPER.get(b, []):
            ab = _ab(_GAS_NAME[gas])
            if kind == "eta5":
                au[:5, :19, :MG, ab, bi, g1] = t[f"kbo_m{gas}"]
            else:
                au[0, :19, :MG, ab, bi, g1] = t[f"kbo_m{gas}"]

        # CFC / CCl4 vectors: count (1, 1, G, 1, 1, 1) in the LOWER
        # minor variable (rrtmg_lw_read_nc.f90 lw_kgb05/06/08)
        for name in CFC_VECS.get(b, []):
            ab = _ab(_CFC_NAME[name])
            al[0, 0, :MG, ab, bi, g1] = t[f"{name}o"]
    return v


def write_netcdf(path, orig: dict) -> None:
    """Write a NetCDF3 file laid out like the public ``rrtmg_lw.nc``.

    A variable built in Fortran dimension order is stored with the axes
    reversed (netCDF files are C-order; the Fortran reader sees the
    reversed list, so its count= order is the file's dims reversed).
    """
    from scipy.io import netcdf_file
    vars_f = build_variables(orig)
    f = netcdf_file(str(path), "w")
    for d, n in DIMS.items():
        f.createDimension(d, n)
    for name, fdims in _VAR_FDIMS.items():
        cdims = tuple(reversed(fdims))
        var = f.createVariable(name, "d", cdims)
        var[:] = vars_f[name].transpose(
            tuple(reversed(range(len(fdims)))))
    f.close()
