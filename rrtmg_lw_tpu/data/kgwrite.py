"""Writer for ``rrtmg_lw_k_g.f90``-style Fortran source k-data.

Emits per-band ``lw_kgbNN`` subroutines whose array assignments use the
public file's free-form styles (array-constructor slices and
whole-array ``reshape`` — the forms :mod:`.fparse` documents):

    selfrefo(:, 1) = (/ v, v, ... /)            ! per-last-index slice
    kao(:,:,JP,:) = reshape((/ ... /), (/9,5,16/))
    kao = reshape((/ ... /), (/5,13,16/))       ! whole array
    kbo(:,:,13,:) = ...                         ! 13:59 jp lower bound

Value streams are COLUMN-MAJOR (Fortran array-constructor / reshape
semantics).  This is the second independent encoder for
tests/test_kdata_crosscheck.py: the same canonical tables written here
and through :mod:`.ncwrite` must decode identically through
``load_fortran_original_tables`` / ``load_netcdf_original_tables``
(declaration layouts per modules/rrlw_kg01..16.f90).

Precision: 17 significant digits so a float64 round-trips exactly and
the cross-check can assert bitwise equality (the real AER file carries
fewer digits; exactness there comes from using its digits verbatim).
"""

from __future__ import annotations

import numpy as np

from .ktables import (HAS_KBO, KEY2_LOWER, KEY2_UPPER, MINOR_LOWER,
                      MINOR_UPPER, NBANDS, original_shapes)


def _vals(a: np.ndarray, per_line: int = 3) -> str:
    """Fortran array-constructor body: column-major element stream."""
    flat = np.asarray(a).flatten(order="F")
    toks = [f"{x:.17e}_rb" for x in flat]
    lines = []
    for i in range(0, len(toks), per_line):
        lines.append(", ".join(toks[i:i + per_line]))
    return (", &\n      ".join(lines))


def _slice_stmt(name: str, index: str, a: np.ndarray) -> str:
    if a.ndim > 1:
        shp = ",".join(str(n) for n in a.shape)
        return (f"      {name}({index}) = reshape((/ &\n"
                f"      {_vals(a)} /), (/{shp}/))\n")
    return f"      {name}({index}) = (/ &\n      {_vals(a)} /)\n"


def _whole_stmt(name: str, a: np.ndarray) -> str:
    shp = ",".join(str(n) for n in a.shape)
    return (f"      {name} = reshape((/ &\n"
            f"      {_vals(a)} /), (/{shp}/))\n")


def band_subroutine(b: int, tabs: dict) -> str:
    """One ``lw_kgbNN`` subroutine body in the public file's styles."""
    out = [f"      subroutine lw_kgb{b:02d}\n",
           f"      use rrlw_kg{b:02d}\n",
           "      implicit none\n\n"]

    # key-species tables: per-jp slices for 2-key bands (exercising the
    # explicit index path incl. kbo's 13:59 lower bound), whole-array
    # reshape for 1-key bands
    kao = tabs["kao"]
    if b in KEY2_LOWER:                       # kao(9,5,13,MG)
        for jp in range(13):
            out.append(_slice_stmt("kao", f":,:,{jp + 1},:",
                                   kao[:, :, jp, :]))
    else:                                     # kao(5,13,MG)
        out.append(_whole_stmt("kao", kao))
    if b in HAS_KBO:
        kbo = tabs["kbo"]
        if b in KEY2_UPPER:                   # kbo(5,5,13:59,MG)
            for jp in range(47):
                out.append(_slice_stmt("kbo", f":,:,{jp + 13},:",
                                       kbo[:, :, jp, :]))
        else:                                 # kbo(5,13:59,MG)
            out.append(_whole_stmt("kbo", kbo))

    # continua: per-g slices
    for g in range(tabs["selfrefo"].shape[1]):
        out.append(_slice_stmt("selfrefo", f":,{g + 1}",
                               tabs["selfrefo"][:, g]))
    for g in range(tabs["forrefo"].shape[1]):
        out.append(_slice_stmt("forrefo", f":,{g + 1}",
                               tabs["forrefo"][:, g]))

    # minor-gas tables: whole-array reshape
    for gas, kind in MINOR_LOWER.get(b, []):
        out.append(_whole_stmt(f"kao_m{gas}", tabs[f"kao_m{gas}"]))
    for gas, kind in MINOR_UPPER.get(b, []):
        out.append(_whole_stmt(f"kbo_m{gas}", tabs[f"kbo_m{gas}"]))

    # Planck fractions: eta bands per-eta-column slices, flat whole
    for name in ("fracrefao", "fracrefbo"):
        if name not in tabs:
            continue
        a = tabs[name]
        if a.ndim == 2:                        # (MG, 9|5)
            for j in range(a.shape[1]):
                out.append(_slice_stmt(name, f":,{j + 1}", a[:, j]))
        else:
            out.append(f"      {name}(:) = (/ &\n      {_vals(a)} /)\n")

    # CFC / CCl4 vectors
    for name, a in tabs.items():
        if name.endswith("o") and a.ndim == 1 \
                and name.startswith(("ccl4", "cfc")):
            out.append(f"      {name}(:) = (/ &\n      {_vals(a)} /)\n")

    out.append(f"      end subroutine lw_kgb{b:02d}\n\n")
    return "".join(out)


def write_k_g(path, orig: dict) -> None:
    """Write all 16 ``lw_kgbNN`` subroutines to ``path``."""
    chunks = ["! rrtmg_lw_k_g.f90-style data file "
              "(see rrtmg_lw_tpu.data.kgwrite)\n\n"]
    for b in range(1, NBANDS + 1):
        missing = set(original_shapes(b)) - set(orig[b])
        if missing:
            raise ValueError(f"band {b}: missing tables {missing}")
        chunks.append(band_subroutine(b, orig[b]))
    with open(path, "w") as f:
        f.write("".join(chunks))
