"""Absorption-coefficient (k-distribution) tables for the 16 LW bands.

The reference stores the original 256-g-point tables in
``src/rrtmg_lw_k_g.f90`` (Fortran DATA) or ``data/rrtmg_lw.nc`` (netCDF),
reduces them once at init to 140 g-points (``rrtmg_lw_init.f90:385-2034``),
and the taumol kernels then index flat ``absa(65*nspa, ng)`` /
``absb(235*nspb, ng)`` views (``rrtmg_lw_taumol.f90:189-190``).

Neither data blob is present in this environment (see
``/root/reference/.MISSING_LARGE_BLOBS``), so this module provides

  * the exact shape registry recovered from ``modules/rrlw_kg01..16.f90``,
  * the exact 256->140 reduction (weights per ``rrtmg_lw_init.f90:149-173``,
    combination per the ``cmbgbN`` pattern at ``:417-492``; Planck fractions
    summed unweighted per ``:481-492``),
  * loaders for the real data: netCDF (schema from
    ``src/rrtmg_lw_read_nc.f90`` + ``modules/rrlw_ncpar.f90:31-44``) via
    scipy, and
  * a deterministic, physically-plausible *synthetic* table generator so
    the full pipeline runs end-to-end until the real data is installed.
    Synthetic tables are smooth in (T, p, eta) and positive; they exercise
    every code path (index arithmetic, eta interpolation, minor gases,
    CFCs) but do NOT reproduce the reference golden fluxes.

Engine storage layout (g-point ALWAYS the last axis):

  absa      (65*nspa, ng)   row = ((jp-1)*5 + (jt-1))*nspa + (js-1), 0-based
  absb      (235*nspb', ng) row = ((jp-13)*5 + (jt-1))*nspb + (js-1)
  selfref   (10, ng)
  forref    (4, ng)
  minor 'flat' tables  (19, ng)         indexed by indminor
  minor 'eta'  tables  (19, 9|5, ng)    indexed by [indminor, j_eta]
  fracrefa / fracrefb  (ng,) flat or (9|5, ng) indexed by jpl
  cfc vectors          (ng,)
"""

from __future__ import annotations

import pathlib

import numpy as np

_ASSET_DIR = pathlib.Path(__file__).resolve().parents[1] / "assets"

NBANDS = 16
MG = 16
NGPT = 140

# Reduced g-points per band (parrrtm.f90:44-59)
NG = (10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2)
NGS = tuple(np.cumsum((0,) + NG).tolist())  # cumulative, NGS[b-1] = start of band b
# Number of eta (binary species parameter) columns (rrtmg_lw_init.f90:227-228)
NSPA = (1, 1, 9, 9, 9, 1, 9, 1, 9, 1, 1, 9, 9, 1, 9, 9)
NSPB = (1, 1, 5, 5, 5, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0, 0)

# Bands with a kbo table at all (modules/rrlw_kgNN.f90 declarations).
HAS_KBO = frozenset({1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 14, 16})
# 2-key-species bands, lower/upper atmosphere
KEY2_LOWER = frozenset({3, 4, 5, 7, 9, 12, 13, 15, 16})
KEY2_UPPER = frozenset({3, 4, 5})

# Minor-gas continuum tables: band -> [(gas, kind)] where kind is
# 'flat' = (19, ng) in indminor, 'eta' = (9, 19, ng), 'eta5' = (5, 19, ng).
MINOR_LOWER = {
    1: [("n2", "flat")],
    3: [("n2o", "eta")],
    5: [("o3", "eta")],
    6: [("co2", "flat")],
    7: [("co2", "eta")],
    8: [("co2", "flat"), ("n2o", "flat"), ("o3", "flat")],
    9: [("n2o", "eta")],
    11: [("o2", "flat")],
    13: [("co2", "eta"), ("co", "eta")],
    15: [("n2", "eta")],
}
MINOR_UPPER = {
    1: [("n2", "flat")],
    3: [("n2o", "eta5")],
    7: [("co2", "flat")],
    8: [("co2", "flat"), ("n2o", "flat")],
    9: [("n2o", "flat")],
    11: [("o2", "flat")],
    13: [("o3", "flat")],
}
# Cross-section (CFC/CCl4) per-g vectors: band -> names (rrlw_kg05/06/08)
CFC_VECS = {5: ["ccl4"], 6: ["cfc11adj", "cfc12"], 8: ["cfc12", "cfc22adj"]}
# Planck fraction layout: eta-dependent in 2-key-lower bands (fracrefa) and
# 2-key-upper bands (fracrefb); flat elsewhere.
FRACA_ETA = KEY2_LOWER
FRACB_ETA = KEY2_UPPER


def reduction_weights(wt: np.ndarray, ngc: np.ndarray, ngm: np.ndarray,
                      ngn: np.ndarray) -> np.ndarray:
    """rwgt(256): per-band weights for combining original g-points.

    Mirrors rrtmg_lw_init.f90:149-173.
    """
    rwgt = np.ones(NBANDS * MG, dtype=np.float64)
    igcsm = 0
    for ibnd in range(NBANDS):
        if ngc[ibnd] < MG:
            iprsm = 0
            wtsm = np.zeros(MG)
            for igc in range(ngc[ibnd]):
                wtsum = 0.0
                for _ in range(ngn[igcsm]):
                    wtsum += wt[iprsm]
                    iprsm += 1
                wtsm[igc] = wtsum
                igcsm += 1
            for ig in range(MG):
                ind = ibnd * MG + ig
                rwgt[ind] = wt[ig] / wtsm[ngm[ind] - 1]
        else:
            igcsm += MG
    return rwgt


class GReduction:
    """The exact 256->140 g-point reduction (cmbgbN pattern)."""

    def __init__(self, static: dict):
        self.wt = np.asarray(static["wt"], dtype=np.float64)
        self.ngc = np.asarray(static["ngc"])
        self.ngs = np.asarray(static["ngs"])
        self.ngm = np.asarray(static["ngm"])
        self.ngn = np.asarray(static["ngn"])
        self.rwgt = reduction_weights(self.wt, self.ngc, self.ngm, self.ngn)
        # group membership: for band b, for reduced point igc, the list of
        # original g indices (0-based within band)
        self.groups = []
        for b in range(NBANDS):
            start = 0 if b == 0 else int(self.ngs[b - 1])
            glist, ipr = [], 0
            for igc in range(int(self.ngc[b])):
                n = int(self.ngn[start + igc])
                glist.append(list(range(ipr, ipr + n)))
                ipr += n
            assert ipr == MG
            self.groups.append(glist)

    def reduce_k(self, band: int, arr: np.ndarray) -> np.ndarray:
        """Weighted reduction over the last (g) axis, as cmbgbN does for
        k-coefficients, continuum tables and cfc vectors."""
        w = self.rwgt[(band - 1) * MG:band * MG]
        out = [ (arr[..., g] * w[g]).sum(axis=-1) for g in self.groups[band - 1] ]
        return np.stack(out, axis=-1)

    def reduce_frac(self, band: int, arr: np.ndarray) -> np.ndarray:
        """Unweighted sum over groups (Planck fractions, init.f90:481-492)."""
        out = [arr[..., g].sum(axis=-1) for g in self.groups[band - 1]]
        return np.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Original-table shape registry (g axis last; Fortran dim order preserved)
# ---------------------------------------------------------------------------

def original_shapes(band: int) -> dict:
    """Shapes of the ORIGINAL (256-g) arrays for a band, g axis last."""
    b = band
    shp = {}
    if b in KEY2_LOWER:
        shp["kao"] = (9, 5, 13, MG)      # [js, jt, jp, g]
    else:
        shp["kao"] = (5, 13, MG)         # [jt, jp, g]
    if b in HAS_KBO:
        if b in KEY2_UPPER:
            shp["kbo"] = (5, 5, 47, MG)  # [js, jt, jp(13:59), g]
        else:
            shp["kbo"] = (5, 47, MG)
    shp["selfrefo"] = (10, MG)
    shp["forrefo"] = (4, MG)
    for gas, kind in MINOR_LOWER.get(b, []):
        shp[f"kao_m{gas}"] = (9, 19, MG) if kind == "eta" else (19, MG)
    for gas, kind in MINOR_UPPER.get(b, []):
        shp[f"kbo_m{gas}"] = (5, 19, MG) if kind == "eta5" else (19, MG)
    shp["fracrefao"] = (MG, 9) if b in FRACA_ETA else (MG,)
    if b in HAS_KBO or b == 13:          # band 13 has fracrefbo (flat) too
        shp["fracrefbo"] = (MG, 5) if b in FRACB_ETA else (MG,)
    for name in CFC_VECS.get(b, []):
        shp[f"{name}o"] = (MG,)
    return shp


# ---------------------------------------------------------------------------
# Synthetic original tables (deterministic; placeholder until real data)
# ---------------------------------------------------------------------------

def _smooth(rng: np.random.Generator, shape, ln_mean, ln_sigma):
    """Positive array, log-smooth along every non-g axis."""
    x = rng.standard_normal(shape)
    # smooth along each leading axis with a short moving average
    for ax in range(len(shape) - 1):
        k = np.ones(3) / 3.0
        x = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, x)
    return np.exp(ln_mean + ln_sigma * x)


def synthetic_original_tables(seed: int = 20260816) -> dict:
    """Deterministic synthetic stand-ins for the missing k_g data blobs.

    Per-band dict of original arrays matching :func:`original_shapes`.
    """
    static = load_static()
    wt = static["wt"]
    out = {}
    for b in range(1, NBANDS + 1):
        rng = np.random.default_rng(seed + 1000 * b)
        tabs = {}
        for name, shape in original_shapes(b).items():
            if name.startswith("fracref"):
                base = wt[:MG].reshape((MG,) + (1,) * (len(shape) - 1))
                v = base * (1.0 + 0.3 * rng.random(shape))
                v = v / v.sum(axis=0, keepdims=True)  # sum over g == 1
                tabs[name] = v
            elif name.startswith(("kao_m", "kbo_m")):
                tabs[name] = _smooth(rng, shape, np.log(5e-8), 0.6)
            elif name == "selfrefo":
                tabs[name] = _smooth(rng, shape, np.log(2e-2), 0.5)
            elif name == "forrefo":
                tabs[name] = _smooth(rng, shape, np.log(5e-3), 0.5)
            elif name in ("kao", "kbo"):
                tabs[name] = _smooth(rng, shape, np.log(3e-4), 1.0)
            else:  # cfc vectors
                tabs[name] = _smooth(rng, shape, np.log(1e-4), 0.4)
        out[b] = tabs
    return out


# ---------------------------------------------------------------------------
# Real-data loaders
# ---------------------------------------------------------------------------

_NC_ABSORBERS = ["N2", "CCL4", "CFC11", "CFC12", "CFC22", "H2O", "CO2",
                 "O3", "N2O", "CO", "CH4", "O2"]
_MINOR_NC_GAS = {"n2": "N2", "n2o": "N2O", "o3": "O3", "co2": "CO2",
                 "co": "CO", "o2": "O2"}


def load_netcdf_original_tables(path) -> dict:
    """Read the ORIGINAL 256-g tables from the public ``rrtmg_lw.nc``.

    Variable names / index order per ``src/rrtmg_lw_read_nc.f90`` with
    dimension sizes from ``modules/rrlw_ncpar.f90:31-44``.  netCDF stores
    C-order, so the Fortran count ``(keylower,Tdiff,plower,G,band,gpset)``
    reads ``var[gpset-1, band-1, :G, :plower, :Tdiff, :keylower]``.
    gPointSetNumber = 1 throughout.
    """
    try:
        # NetCDF3 classic (the format the reference's makefiles use)
        from scipy.io import netcdf_file
        f = netcdf_file(str(path), "r", mmap=False)
        v = {k: np.asarray(val[:], dtype=np.float64).copy()
             for k, val in f.variables.items()}
        f.close()
    except Exception:
        # NetCDF4/HDF5 container fallback
        import h5py
        with h5py.File(str(path), "r") as f:
            v = {k: np.asarray(f[k][...], dtype=np.float64)
                 for k in f.keys()}

    def key_lower(b, nkey):
        # -> [js, jt, jp, g]
        a = v["KeySpeciesAbsorptionCoefficientsLowerAtmos"][0, b - 1]
        return a[:MG, :13, :5, :nkey].transpose(3, 2, 1, 0)

    def key_upper(b, nkey):
        a = v["KeySpeciesAbsorptionCoefficientsUpperAtmos"][0, b - 1]
        return a[:MG, :47, :5, :nkey].transpose(3, 2, 1, 0)

    def minor(which, b, gas, nkey):
        name = ("AbsorptionCoefficientsLowerAtmos" if which == "a"
                else "AbsorptionCoefficientsUpperAtmos")
        ab = _NC_ABSORBERS.index(_MINOR_NC_GAS[gas])
        a = v[name][0, b - 1, ab]          # [g?, ...] C-order trailing dims
        # Fortran count (nkey, T, G) -> C [G, T, nkey]
        return a[:MG, :19, :nkey].transpose(2, 1, 0)

    out = {}
    for b in range(1, NBANDS + 1):
        tabs = {}
        nspa, nspb = NSPA[b - 1], NSPB[b - 1]
        ka = key_lower(b, max(nspa, 1))
        tabs["kao"] = ka if b in KEY2_LOWER else ka[0]
        if b in HAS_KBO:
            kb = key_upper(b, max(nspb, 1))
            tabs["kbo"] = kb if b in KEY2_UPPER else kb[0]
        tabs["selfrefo"] = (
            v["H20SelfAbsorptionCoefficients"][0, b - 1][:MG, :10].T)
        tabs["forrefo"] = (
            v["H20ForeignAbsorptionCoefficients"][0, b - 1][:MG, :4].T)
        fa = v["PlanckFractionLowerAtmos"][0, b - 1]
        tabs["fracrefao"] = (fa[:9, :MG].T if b in FRACA_ETA
                             else fa[0, :MG])
        if b in HAS_KBO or b == 13:
            fb = v["PlanckFractionUpperAtmos"][0, b - 1]
            tabs["fracrefbo"] = (fb[:5, :MG].T if b in FRACB_ETA
                                 else fb[0, :MG])
        for gas, kind in MINOR_LOWER.get(b, []):
            m = minor("a", b, gas, 9 if kind == "eta" else 1)
            tabs[f"kao_m{gas}"] = m if kind == "eta" else m[0]
        for gas, kind in MINOR_UPPER.get(b, []):
            m = minor("b", b, gas, 5 if kind == "eta5" else 1)
            tabs[f"kbo_m{gas}"] = m if kind == "eta5" else m[0]
        # CFC / CCl4 vectors live in the minor-gas variables too
        for name in CFC_VECS.get(b, []):
            gasnc = {"ccl4": "CCL4", "cfc11adj": "CFC11", "cfc12": "CFC12",
                     "cfc22adj": "CFC22"}[name]
            ab = _NC_ABSORBERS.index(gasnc)
            a = v["AbsorptionCoefficientsLowerAtmos"][0, b - 1, ab]
            tabs[f"{name}o"] = a[:MG, 0, 0]
        out[b] = tabs
    return out


# ---------------------------------------------------------------------------
# Packing to the engine layout
# ---------------------------------------------------------------------------

def pack_band(band: int, orig: dict, red: GReduction) -> dict:
    """Reduce a band's original tables to 140-g and pack for the engine."""
    b = band
    ng = NG[b - 1]
    out = {}

    kao = red.reduce_k(b, orig["kao"])
    if b in KEY2_LOWER:  # [js, jt, jp, g] -> rows ((jp*5+jt)*9+js)
        out["absa"] = np.ascontiguousarray(
            kao.transpose(2, 1, 0, 3).reshape(65 * 9, ng))
    else:
        out["absa"] = np.ascontiguousarray(
            kao.transpose(1, 0, 2).reshape(65, ng))

    if b in HAS_KBO:
        kbo = red.reduce_k(b, orig["kbo"])
        if b in KEY2_UPPER:
            out["absb"] = np.ascontiguousarray(
                kbo.transpose(2, 1, 0, 3).reshape(235 * 5, ng))
        else:
            out["absb"] = np.ascontiguousarray(
                kbo.transpose(1, 0, 2).reshape(235, ng))

    out["selfref"] = red.reduce_k(b, orig["selfrefo"])
    out["forref"] = red.reduce_k(b, orig["forrefo"])

    for gas, kind in MINOR_LOWER.get(b, []):
        m = red.reduce_k(b, orig[f"kao_m{gas}"])
        out[f"ka_m{gas}"] = (np.ascontiguousarray(m.transpose(1, 0, 2))
                             if kind == "eta" else m)  # (19,9,ng) or (19,ng)
    for gas, kind in MINOR_UPPER.get(b, []):
        m = red.reduce_k(b, orig[f"kbo_m{gas}"])
        out[f"kb_m{gas}"] = (np.ascontiguousarray(m.transpose(1, 0, 2))
                             if kind == "eta5" else m)

    fa = orig["fracrefao"]
    if b in FRACA_ETA:   # (MG, 9) -> reduce over g -> (9, ng)
        out["fracrefa"] = np.ascontiguousarray(red.reduce_frac(b, fa.T))
    else:
        out["fracrefa"] = red.reduce_frac(b, fa)
    if "fracrefbo" in orig:
        fb = orig["fracrefbo"]
        if b in FRACB_ETA:  # (MG, 5) -> (5, ng)
            out["fracrefb"] = np.ascontiguousarray(red.reduce_frac(b, fb.T))
        else:
            out["fracrefb"] = red.reduce_frac(b, fb)

    for name in CFC_VECS.get(b, []):
        out[name] = red.reduce_k(b, orig[f"{name}o"])
    return out


def pack_all(orig_all: dict, red: GReduction) -> dict:
    """{'b01': {...}, ..., 'b16': {...}} engine-layout k-tables."""
    return {f"b{b:02d}": pack_band(b, orig_all[b], red)
            for b in range(1, NBANDS + 1)}


# ---------------------------------------------------------------------------
# Asset IO
# ---------------------------------------------------------------------------

_static_cache = None


def load_static() -> dict:
    """The in-source static tables (Planck, ref atmosphere, cloud optics...)."""
    global _static_cache
    if _static_cache is None:
        with np.load(_ASSET_DIR / "static_tables.npz") as z:
            _static_cache = {k: z[k] for k in z.files}
    return _static_cache


def save_ktables(packed: dict, path):
    flat = {}
    for bk, tabs in packed.items():
        for name, arr in tabs.items():
            flat[f"{bk}/{name}"] = arr
    np.savez_compressed(path, **flat)


def load_ktables(path=None, *, synthetic_ok: bool = True) -> tuple[dict, bool]:
    """Load packed k-tables. Returns (tables, is_real_data).

    Resolution order: explicit ``path`` -> assets/ktables_real.npz ->
    assets/ktables_synthetic.npz -> generate synthetic in-memory.
    """
    if path is not None:
        path = pathlib.Path(path)
        return _load_npz(path), True
    real = _ASSET_DIR / "ktables_real.npz"
    if real.exists():
        return _load_npz(real), True
    synth = _ASSET_DIR / "ktables_synthetic.npz"
    if synth.exists():
        return _load_npz(synth), False
    if not synthetic_ok:
        raise FileNotFoundError("no k-table asset found")
    red = GReduction(load_static())
    packed = pack_all(synthetic_original_tables(), red)
    return packed, False


def _load_npz(path) -> dict:
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            bk, name = key.split("/", 1)
            out.setdefault(bk, {})[name] = z[key]
    return out


def build_synthetic_asset():
    red = GReduction(load_static())
    packed = pack_all(synthetic_original_tables(), red)
    save_ktables(packed, _ASSET_DIR / "ktables_synthetic.npz")
    return packed


def build_real_asset_from_netcdf(nc_path):
    """Convert the public rrtmg_lw.nc (when available) to the engine asset."""
    red = GReduction(load_static())
    packed = pack_all(load_netcdf_original_tables(nc_path), red)
    save_ktables(packed, _ASSET_DIR / "ktables_real.npz")
    return packed


def load_fortran_original_tables(path) -> dict:
    """Read the ORIGINAL 256-g tables from the public
    ``rrtmg_lw_k_g.f90`` (Fortran source form, KGSRC=dat).

    Each ``lw_kgbNN`` subroutine fills its band's rrlw_kgNN module
    arrays with array-constructor / reshape assignments
    (declarations: modules/rrlw_kg01..16.f90 — e.g. kao(9,5,13,no3),
    kbo(5,5,13:59,no3), selfrefo(10,noN), ka_mXX(9,19,noN)).  The text
    is split into per-subroutine sections because the same variable
    names (kao, kbo, ...) recur in every band's module.
    """
    import re as _re

    from .fparse import FortranArrays, strip_fortran

    text = strip_fortran(pathlib.Path(path).read_text())
    parts = _re.split(r"subroutine\s+lw_kgb(\d+)", text,
                      flags=_re.IGNORECASE)
    out = {}
    for i in range(1, len(parts) - 1, 2):
        b = int(parts[i])
        if not (1 <= b <= NBANDS) or b in out:
            continue
        body = parts[i + 1]
        fa = FortranArrays()
        shapes = original_shapes(b)
        for name, shp in shapes.items():
            bounds = [(1, n) for n in shp]
            if name == "kbo":            # jp dim declared 13:59
                bounds[-2] = (13, 59)
            fa.declare(name, bounds)
        fa.fill_from(body)
        out[b] = {name: fa.get(name) for name in shapes}
    missing = [b for b in range(1, NBANDS + 1) if b not in out]
    if missing:
        raise ValueError(f"k_g source missing bands {missing}")
    return out


def build_real_asset_from_k_g(f90_path):
    """Convert the public rrtmg_lw_k_g.f90 to the engine asset."""
    red = GReduction(load_static())
    packed = pack_all(load_fortran_original_tables(f90_path), red)
    save_ktables(packed, _ASSET_DIR / "ktables_real.npz")
    return packed
