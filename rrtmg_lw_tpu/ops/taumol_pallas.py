"""Pallas TPU kernel for taumol: gather-free optical depth evaluation.

The XLA reference engine (taumol.py) expresses the reference's k-table
lookups (rrtmg_lw_taumol.f90:299-3164) as row gathers, which XLA:TPU
executes with layout-conversion copies that dominate runtime (measured
~320 ms for 245k cells on a v5e chip, ~98% of the whole pipeline).

This kernel removes every gather by exploiting the index structure
``row = (jp*5 + jt)*nspa + js`` (rrtmg_lw_taumol.f90:563-564):

  * the (jp, jt) pair indexes only 65 (lower) / 235 (upper) slots, so
    ``k(jp, jt)`` becomes a selection matmul on the MXU against a fused
    all-bands table whose rows hold eta columns x g-points per band;
    the fac00/fac10 (and fac01/fac11) pressure-temperature
    interpolation weights are FOLDED INTO the selection matrix — each W
    column carries the two temperature taps of one pressure slot as
    weighted entries, so the two-tap fma per eta column collapses into
    the matmul (rrtmg_lw_taumol.f90:565-573).  In the blocked kernel
    (layer-pure tiles) a data-dependent 64-row pressure WINDOW makes
    the contraction exactly nsplit_w*64 = 128 (the MXU otherwise pads
    K to 256/512); window indices arrive by scalar prefetch and
    PallasTaumol.window_ok flags the (physically absurd) inputs whose
    per-tile jp spread exceeds the window;
  * chi_mls / self / foreign / minor selections fuse into ONE
    block-diagonal "aux" matmul per region, with the continuum and
    minor temperature-interpolation weights folded into the W entries
    (single-tap tables; the per-band fma chains collapse into the dot);
  * the eta (js) taps and the Planck-fraction eta interpolation are
    compare-select sums on the VPU.

Layout: everything is computed TRANSPOSED — (g, cells) with the cell
tile in the 128-lane dimension — so the hundreds of per-band vector
ops run at full lane utilization (g-per-band is 2..16, which would
waste 8x as lanes).  Per-band slices of the matmul results are padded
to 8-row chunks so every sublane slice is aligned.  Everything for a
tile of T cells stays in VMEM; HBM traffic is the packed per-cell
scalars in and (140, T) taug/fracs blocks out.

setcoef (rrtmg_lw_setcoef.f90:256-434) is FUSED into the kernel: the
inputs are 15 raw profile rows (pavel/tavel/coldry/wbrodl/wkl/wx) plus
the two discrete log(pavel)-derived values (jp, laytrop) from XLA, and
every interpolation index/fraction/column amount is recomputed in VMEM
(see the F_FIELDS comment for the exactness argument).  This removes
the 37-row packed-scalar HBM round trip, the XLA-side one-hot
tref/chi selection matmuls and most of the pack transpose/concat glue
(~1.5 ms/step at B=16k), while the SetcoefOut-consuming API stays
unchanged — the unused XLA setcoef outputs dead-code eliminate under
jit.

Numerics: tables and fac weights ship as nsplit/nsplit_w-level bf16
decompositions summed in f32 on the MXU.  At the default 2 levels the
effective table precision is ~2^-17 relative (measured max 7.6e-6) —
far inside the 0.5 W/m2 flux budget; at 3 levels the kernel matches
the XLA engine to f32 rounding.  The f64 XLA engine remains the
golden-parity reference.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Profile, SetcoefOut
from .taumol import (BAND_SPECS, NG, NSPA, NSPB, _GAS_CHI, _eta_params,
                     _spec_weights, Adj, RegionSpec)

NBANDS = 16
GOFS = tuple(int(x) for x in np.cumsum((0,) + NG))

# setcoef is FUSED into this kernel (rrtmg_lw_setcoef.f90:256-434): the
# inputs are the raw per-cell profile rows; every interpolation
# index/fraction/column the reference's setcoef produced is recomputed
# on the fly in VMEM.  Only ``jp`` and the laytrop mask ship from XLA —
# they derive from log(pavel), and a transcendental may differ by an
# ulp between Mosaic and XLA, which would flip these *discrete* values
# at bin boundaries.  Everything else is rational arithmetic on shipped
# inputs (identical IEEE results), or derives from table rows selected
# by an exact one-hot matmul (Precision.HIGHEST reproduces f32
# bit-exactly), so jt/indfor/indself/indminor match the XLA setcoef
# bit-for-bit.
F_FIELDS = ("pavel", "tavel", "coldry", "wbrodl",
            "wkl0", "wkl1", "wkl2", "wkl3", "wkl4", "wkl5", "wkl6",
            "wx0", "wx1", "wx2", "wx3")
I_FIELDS = ("jp",)
NSF = len(F_FIELDS)
NSI = len(I_FIELDS) + 1          # + laytrop mask
STPFAC = 296.0 / 1013.0


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


class RegionTables(NamedTuple):
    keyT: np.ndarray         # (Dk, R) transposed fused key table
    prefT: np.ndarray        # (P, 8) [preflog, tref, chi h2o/co2/o3/n2o/ch4]
    chiT: np.ndarray         # (8, P) chi_mls rows indexed by pressure
    selfT: np.ndarray        # (Ds, 10) or None
    forT: np.ndarray         # (Df, 4) or None
    minorT: np.ndarray       # (Dm, 19) or None
    fracT: np.ndarray        # (Dfr, 9|5)
    cfcT: np.ndarray         # (Dc, 1) or None
    key_ofs: dict            # band -> (row offset, chunk stride)
    self_ofs: dict           # band -> (offset, stride)
    for_ofs: dict
    minor_ofs: dict          # (band, table) -> (offset, stride, nk)
    frac_ofs: dict           # band -> (offset, nrow_eta or 0)
    cfc_ofs: dict            # (band, vec) -> offset
    const_kb: dict           # band -> (2, ng) constant absb rows (nspb=0)


def build_region_tables(ktables: dict, static: dict, lower: bool,
                        dtype=np.float32) -> RegionTables:
    P = 13 if lower else 47
    R = P * 5
    chi = np.asarray(static["chi_mls"], np.float64)      # (7, 59)

    key_rows, key_ofs = [], {}
    self_rows, self_ofs = [], {}
    for_rows, for_ofs = [], {}
    minor_rows, minor_ofs = [], {}
    frac_rows_l, frac_ofs = [], {}
    cfc_rows, cfc_ofs = [], {}
    const_kb = {}
    frac_w = 9 if lower else 5

    def add_chunks(dst, chunks, ng):
        """Append ng-row chunks each padded to 8 rows; return offset."""
        ofs = sum(c.shape[0] for c in dst)
        stride = _pad8(ng)
        for c in chunks:
            padded = np.zeros((stride,) + c.shape[1:])
            padded[:ng] = c
            dst.append(padded)
        return ofs, stride

    for bs in BAND_SPECS:
        b = bs.band
        spec = bs.lower if lower else bs.upper
        t = ktables[f"b{b:02d}"]
        ng = NG[b - 1]
        if spec.key1 is not None and not spec.zero:
            nsp = (NSPA if lower else NSPB)[b - 1]
            if nsp == 0:
                # reference quirk (rrlw_wvn nspb(16)=0,
                # rrtmg_lw_taumol.f90:195-196): ind0=ind1=1 for every
                # upper layer, so taug always taps absb rows 1/2 —
                # two compile-time constant rows, no selection
                kb = np.asarray(t["absb"], np.float64).reshape(-1, ng)
                const_kb[b] = kb[0:2, :]
            else:
                k = np.asarray(t["absa" if lower else "absb"],
                               np.float64).reshape(P, 5, nsp, ng)
                # single tap per eta column: the t+1 temperature tap
                # is a second weighted entry in the fac-folded
                # selection W, not a duplicated table copy
                chunks = [k[:, :, s, :].transpose(2, 0, 1).reshape(ng, R)
                          for s in range(nsp)]
                key_ofs[b] = add_chunks(key_rows, chunks, ng)
        if spec.tauself and not spec.zero:
            s = np.asarray(t["selfref"], np.float64)      # (10, ng)
            self_ofs[b] = add_chunks(self_rows, [s.T], ng)
        if spec.taufor and not spec.zero:
            f = np.asarray(t["forref"], np.float64)       # (4, ng)
            for_ofs[b] = add_chunks(for_rows, [f.T], ng)
        for m in spec.minors:
            tab = np.asarray(t[m.table], np.float64)
            if tab.ndim == 2:
                tab = tab[:, None, :]                     # (19, 1, ng)
            nk = tab.shape[1]
            chunks = [tab[:, kk, :].T for kk in range(nk)]  # (ng, 19)
            ofs, stride = add_chunks(minor_rows, chunks, ng)
            minor_ofs[(b, m.table)] = (ofs, stride, nk)
        if not spec.zero:
            ftab = np.asarray(t[spec.frac], np.float64)
            if spec.frac_eta is not None:
                blk = np.zeros((ng, frac_w))
                blk[:, :ftab.shape[0]] = ftab.T
                frac_ofs[b] = (add_chunks(frac_rows_l, [blk], ng)[0],
                               ftab.shape[0])
            else:
                blk = np.broadcast_to(ftab[:, None], (ng, frac_w)).copy()
                frac_ofs[b] = (add_chunks(frac_rows_l, [blk], ng)[0], 0)
        for wx_i, vec in spec.cfcs:
            v = np.asarray(t[vec], np.float64)[:, None]   # (ng, 1)
            cfc_ofs[(b, vec)] = add_chunks(cfc_rows, [v], ng)[0]

    # chi_mls(gas, jp+1) as its own pressure-indexed table: the key W
    # now carries fac weights, so chi needs a separate unweighted
    # one-hot selection over the P pressure slots.  The kernel selects
    # column r1//5, which is jp+1 (lower) / jp-11 (upper) for the
    # 0-based jp, so column p must hold chi_mls[:, p] (lower) /
    # chi_mls[:, p+12] (upper) to land on the reference's
    # chi_mls(gas, jp(lay)+1) (1-based; taumol.f90:548 et al.)
    pcol = np.arange(P)
    chi_idx = np.clip(pcol if lower else (pcol + 12), 0, 58)
    chi_pad = np.zeros((8, P))
    chi_pad[:7] = chi[:, chi_idx]                         # (7, P)

    # fused-setcoef row table: preflog/tref for the fp/ft pressure-
    # temperature weights plus the chi rows the rat_* reference-ratio
    # pairs divide (setcoef.f90:272-294, 308-313).  Column p holds
    # global row p (lower) / p+12 (upper): the kernel selects columns
    # jp and jp+1 (0-based global jp; upper-local p = jp-12) with an
    # EXACT one-hot matmul, so jt = int(3 + (tavel-tref(jp))/15)
    # reproduces the XLA setcoef bit-for-bit.
    pref_idx = np.clip(pcol if lower else (pcol + 12), 0, 58)
    preflog = np.asarray(static["preflog"], np.float64)   # (59,)
    tref = np.asarray(static["tref"], np.float64)         # (59,)
    pref_pad = np.zeros((P, 8))                           # (P, cols)
    pref_pad[:, 0] = preflog[pref_idx]
    pref_pad[:, 1] = tref[pref_idx]
    # chi cols for the rats: h2o, co2, o3, n2o, ch4 (gas-1 = 0,1,2,3,5)
    for j, g in enumerate((0, 1, 2, 3, 5)):
        pref_pad[:, 2 + j] = chi[g, pref_idx]

    def pack(rows):
        return (np.concatenate(rows, axis=0).astype(dtype)
                if rows else None)

    return RegionTables(
        keyT=pack(key_rows), prefT=pref_pad.astype(dtype),
        chiT=chi_pad.astype(dtype),
        selfT=pack(self_rows), forT=pack(for_rows),
        minorT=pack(minor_rows), fracT=pack(frac_rows_l),
        cfcT=pack(cfc_rows),
        key_ofs=key_ofs, self_ofs=self_ofs, for_ofs=for_ofs,
        minor_ofs=minor_ofs, frac_ofs=frac_ofs, cfc_ofs=cfc_ofs,
        const_kb=const_kb)


def _onehot_T(r, R, dtype):
    """(R, T) one-hot from r (1, T)."""
    T = r.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
    return jnp.where(iota == r, 1.0, 0.0).astype(dtype)


# bf16 decomposition depths.  Each level adds ~8 mantissa bits:
# 2 levels reproduce the f32 tables/facs to ~2^-17 relative (measured
# max 7.6e-6 on the key tables — far below the 0.5 W/m2 physics budget
# and comparable to accumulated f32 rounding elsewhere); 3 levels are
# f32-exact.  Defaults favor speed (NSPLIT 3->2 measured 12.8->9.1 ms
# on a v5e at B*L=245k); pass nsplit=nsplit_w=3 to PallasTaumol for
# strict-parity work.  The f64 XLA engine remains the golden-parity
# reference either way.
NSPLIT = 2
NSPLIT_W = 2

# The key-table contraction dimension is nsplit_w * R where R is the
# full (jp, jt) row space (65 lower / 235 upper) — the MXU pads that to
# the next 128 multiple (256 / 512), wasting 2-4x of the dominant
# matmul.  Since cells arrive layer-major, each tile's jp values span a
# narrow pressure range: a WINDOW-row window (chosen per tile from the
# data, at WSTEP-row granularity) makes the contraction exactly
# nsplit_w * WINDOW = 128.  WINDOW = 64 covers an ~11-pressure-slot jp
# spread inside one tile (a >10x pressure ratio across columns of one
# layer — far beyond any physical batch); wider inputs clamp to the
# window edge and are flagged by PallasTaumol.window_ok.
WINDOW = 64
WSTEP = 8

# ---------------------------------------------------------------------------
# logu16 spectral storage codec (RRTMG_SPEC_DTYPE=logu16, round 5)
#
# The taug/fracs HBM round trip to the RT kernel is 2.3 GB/step at
# B=16k — the dominant HBM term.  bf16 halves it but its 2^-8 relative
# step measured 0.142 W/m2 flux error (9x the 3.1e-5 on-chip parity
# tolerance, SPEC_DTYPE_AB round 4).  A log-quantized uint16 gives a
# UNIFORM 3.4e-4 relative step over od in [1e-9, 4] (the full
# flux-relevant range: od < 1e-9 is transmission-invisible; max
# synthetic/deck taug measured 1.93): ~12x finer than bf16, projected
# ~1e-2 W/m2 -> measured on-chip before any default change.  Code 0 is
# the exact-zero / below-floor sentinel; fracs (in [0, 1)) use plain
# linear uint16 (1.5e-5 absolute step).  Encode adds one log per
# element in the taumol kernel, decode one exp per element in the RT
# kernel (~1.3 ps/elem measured on v5e — the VPU has fast
# transcendentals); both are fused into existing passes.
# ---------------------------------------------------------------------------
SPEC_LOG_LO = float(np.log(1e-9))
SPEC_LOG_HI = float(np.log(4.0))
_SPEC_LOG_SCALE = 65534.0 / (SPEC_LOG_HI - SPEC_LOG_LO)


def _to_u16(x_f32):
    # Mosaic has no f32<->u16 cast; route through int32 (exact for
    # values in [0, 65535])
    return x_f32.astype(jnp.int32).astype(jnp.uint16)


def _u16_to_f32(u):
    return u.astype(jnp.int32).astype(jnp.float32)


def spec_encode_taug(x):
    """f32 taug (>= ~-1e-9; tiny negatives from corradj cancellation
    clamp to the zero sentinel — od clamps at 0 downstream anyway)."""
    pos = x > 1e-9
    e = jnp.log(jnp.maximum(x, 1e-9))
    u = jnp.clip(jnp.round((e - SPEC_LOG_LO) * _SPEC_LOG_SCALE),
                 0.0, 65534.0) + 1.0
    return _to_u16(jnp.where(pos, u, 0.0))


def spec_decode_taug(u):
    uf = _u16_to_f32(u)        # compare in f32: Mosaic has no u16 cmp
    v = jnp.exp(SPEC_LOG_LO + uf * (1.0 / _SPEC_LOG_SCALE)
                - (1.0 / _SPEC_LOG_SCALE))
    return jnp.where(uf == 0.0, 0.0, v)


def spec_encode_frac(f):
    return _to_u16(jnp.round(jnp.clip(f, 0.0, 1.0) * 65535.0))


def spec_decode_frac(u):
    return _u16_to_f32(u) * (1.0 / 65535.0)


def spec_load_taut(x):
    """Storage-dtype -> f32 upcast/decode for blocked taut reads."""
    if x.dtype == jnp.uint16:
        return spec_decode_taug(x)
    return x.astype(jnp.float32)


def spec_load_frac(x):
    if x.dtype == jnp.uint16:
        return spec_decode_frac(x)
    return x.astype(jnp.float32)

# Candidate cell tiles for the blocked (layer-pure) kernel, largest
# first: wide tiles amortize the fused-setcoef prologue's small-row
# VPU ops and the per-grid-step fixed costs (see blocked_tile()).
BLOCKED_TILES = (2048, 1024, 512, 256, 128)


def _expand_windows(keyT_split: np.ndarray, R: int, window: int,
                    wstep: int, nsplit_w: int):
    """(D, R) split table -> (D, nwin * nsplit_w * window) where block
    w holds columns [w*wstep, w*wstep+window) tiled nsplit_w times (the
    fac-weight bf16 levels contract against identical table copies)."""
    D = keyT_split.shape[0]
    nwin = max(1, -(-(R - window) // wstep) + 1)
    Rpad = (nwin - 1) * wstep + window
    full = np.zeros((D, Rpad), keyT_split.dtype)
    full[:, :R] = keyT_split
    blocks = [np.tile(full[:, w * wstep: w * wstep + window],
                      (1, nsplit_w)) for w in range(nwin)]
    return np.concatenate(blocks, axis=1), nwin


def _split(tbl: np.ndarray, nsplit: int = NSPLIT) -> np.ndarray:
    """bf16 decomposition, rows concatenated: (nsplit*D, C) bf16.

    Mosaic only offers DEFAULT (one bf16 pass) or HIGHEST (six passes)
    MXU precision; bf16 components summed in f32 reproduce the f32
    table to ~2^-(9*nsplit) relative at a fraction of the HIGHEST pass
    count."""
    x = tbl.astype(np.float32)
    parts = []
    for _ in range(nsplit):
        p = x.astype(jnp.bfloat16)
        x = x - np.asarray(p, np.float32)
        parts.append(np.asarray(p))
    return np.concatenate(parts, axis=0)


def _dot(tbls, W, nsplit: int = NSPLIT):
    """Selection matmul against a split bf16 table (nsplit*D, C)."""
    D = tbls.shape[0] // nsplit
    M = jnp.dot(tbls, W.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    acc = M[:D]
    for s in range(1, nsplit):
        acc = acc + M[s * D:(s + 1) * D]
    return acc


def _fac_w(r, fac_a, fac_b, R, dtype, base=None):
    """Fac-folded selection W (R, T): fac_a at clipped row r and fac_b
    at the t+1-clamped tap row of the same pressure slot — the
    reference's two temperature taps (rrtmg_lw_taumol.f90:563-573) as
    one weighted two-entry column.  When t == 4 both entries land on
    the same row and sum (the clamped tap equals the base tap there,
    matching the old duplicated-table k[:, (1,2,3,4,4)] semantics).

    With ``base`` the rows are relative to a WINDOW-row pressure
    window starting at that (data-dependent) table row: R is then the
    window size and out-of-window rows clamp to its edges (they only
    occur for inputs whose per-tile jp spread exceeds ~11 reference
    pressure slots — surfaced by PallasTaumol.window_ok)."""
    p = r // 5
    rb = p * 5 + jnp.minimum(r - p * 5 + 1, 4)
    if base is not None:
        r = jnp.clip(r - base, 0, R - 1)
        rb = jnp.clip(rb - base, 0, R - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, r.shape[1]), 0)
    W = (jnp.where(iota == r, fac_a, 0.0)
         + jnp.where(iota == rb, fac_b, 0.0))
    return W.astype(jnp.float32)


def _dot_facw(tbls_tiled, W, nsplit: int = NSPLIT,
              nsplit_w: int = NSPLIT_W):
    """_dot with a non-binary f32 W: nsplit_w-level bf16 decomposition
    of the fac weights, contracted in ONE matmul against a column-tiled
    table (D, nsplit_w*R) so the MXU sees a single large dot instead of
    nsplit_w serialized small ones."""
    levels = []
    rem = W
    for _ in range(nsplit_w):
        w = rem.astype(jnp.bfloat16)
        rem = rem - w.astype(jnp.float32)
        levels.append(w)
    return _dot(tbls_tiled, jnp.concatenate(levels, axis=0), nsplit)


def _dot_facw2(tbls_tiled, W0, W1, nsplit: int = NSPLIT,
               nsplit_w: int = NSPLIT_W):
    """Both key selections (the (jp,jt) and (jp+1,jt1) taps) in ONE
    matmul: lane-concatenated [W0 | W1] doubles N instead of issuing
    two dependent dots, halving fixed per-dot latency on the MXU."""
    T = W0.shape[1]
    M = _dot_facw(tbls_tiled, jnp.concatenate([W0, W1], axis=1),
                  nsplit, nsplit_w)
    return M[:, :T], M[:, T:]


def _aux_W(meta, rchi, sf, si, dtype):
    """The fused chi/self/foreign/minor aux-selection W (Kc, T): the
    one-hot blocks concatenate along K against the block-diagonal aux
    table, with the continuum/minor temperature-interpolation weights
    FOLDED into the entries (lo tap fac*(1-frac), clamped hi tap
    fac*frac).  Shared by the Pallas kernel and the differentiable
    XLA twin (forward_xla) so both contract the identical W."""
    Dtot, Kc = meta["_shape"]
    T = rchi.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Kc, T), 0)
    one = jnp.ones((1, T), dtype)
    taps = {
        "chiT": (rchi // 5, one, None, None, None),
        "selfT": (si["indself"], sf["selffac"],
                  sf["selffrac"], 9, None),
        "forT": (si["indfor"], sf["forfac"],
                 sf["forfrac"], 3, None),
        "minorT": (si["indminor"], one, sf["minorfrac"],
                   18, None),
    }
    W = jnp.zeros((Kc, T), jnp.float32)
    for name, (idx, fac, frac, hi_max, _) in taps.items():
        if name not in meta:
            continue
        _, _, c0 = meta[name]
        if frac is None:
            W = W + jnp.where(iota == c0 + idx, 1.0, 0.0)
        else:
            lo_w = fac * (1.0 - frac)
            hi_w = fac * frac
            hi = jnp.minimum(idx + 1, hi_max)
            W = (W + jnp.where(iota == c0 + idx, lo_w, 0.0)
                 + jnp.where(iota == c0 + hi, hi_w, 0.0))
    return W


class _Ctx(NamedTuple):
    sf: dict                 # name -> (1, T) float row
    si: dict                 # name -> (1, T) int row
    M0: jnp.ndarray          # (Dk, T) fac00/fac10-weighted key taps
    M1: jnp.ndarray          # (Dk, T) fac01/fac11-weighted key taps
    Mchi: jnp.ndarray        # (8, T) chi_mls at the (jp+1) slot
    Ms: jnp.ndarray          # (Ds, T) self at indself
    Mf: jnp.ndarray          # (Df, T) foreign at indfor
    Mm: jnp.ndarray          # (Dm, T) minor at indminor
    Fr: object               # fracT ref
    Cf: object               # cfcT ref
    tabs: RegionTables


def _col(ctx: _Ctx, gas: str):
    return ctx.sf["col" + gas]


def _adjusted_col(ctx: _Ctx, adj: Adj, dtype):
    colgas = _col(ctx, adj.gas)
    chi_gas = colgas / ctx.sf["coldry"]
    if adj.chi_const is not None:
        chiref = jnp.full_like(chi_gas, adj.chi_const)
    else:
        m = _GAS_CHI[adj.gas] - 1
        chiref = ctx.Mchi[m: m + 1, :]
    ratio = 1.0e20 * chi_gas / chiref
    # double-where (same guard as TaumolEngine._adjusted_col): the
    # fractional power's VJP is inf at a clamped 0 base, and inf*0 =
    # NaN would leak through a single where/maximum into every
    # d(tau)/d(input) when forward_xla is differentiated.  Primal
    # unchanged: every Adj has threshold >= base, so the taken branch
    # strictly satisfies ratio - base > 0.
    excess = jnp.where(ratio > adj.threshold, ratio - adj.base, 1.0)
    adjfac = adj.base + excess ** adj.expnt
    adjcol = adjfac * chiref * ctx.sf["coldry"] * 1.0e-20
    return jnp.where(ratio > adj.threshold, adjcol, colgas)


def _eta_weights(js0, fs, specparm, nsp, two_key_low, dtype):
    """Per-eta-column weights ws[s] (list of (1, T) rows)."""
    if nsp == 1:
        return [jnp.ones_like(fs)]
    if two_key_low:
        w = _spec_weights(specparm, fs, dtype)
        offs = (-1, 0, 1, 2)
    else:
        w = (1.0 - fs, fs)
        offs = (0, 1)
    ws = []
    for s in range(nsp):
        acc = jnp.zeros_like(fs)
        for o, wo in zip(offs, w):
            acc = acc + jnp.where(js0 + o == s, wo, 0.0)
        ws.append(acc)
    return ws


def _region_eval(spec: RegionSpec, b: int, lower: bool, ctx: _Ctx,
                 chi_np: np.ndarray, dtype):
    """taug, fracs (ng, T) for one band region (transposed layout)."""
    ng = NG[b - 1]
    T = ctx.sf["fac00"].shape[1]
    zero = jnp.zeros((ng, T), dtype)
    if spec.zero:
        return zero, zero

    sf = ctx.sf
    taug = zero
    nsp = (NSPA if lower else NSPB)[b - 1]
    nspc = max(nsp, 1)
    scale = 8.0 if lower else 4.0
    tabs = ctx.tabs

    if spec.key1 is not None:
        colk1 = _col(ctx, spec.key1)
        if spec.key2 is not None:
            rat0 = sf["rat_" + spec.rat]
            rat1 = sf["rat_" + spec.rat + "_1"]
            colk2 = _col(ctx, spec.key2)
            speccomb, specparm, js0, fs = _eta_params(colk1, colk2,
                                                      rat0, scale)
            speccomb1, specparm1, js1, fs1 = _eta_params(colk1, colk2,
                                                         rat1, scale)
        else:
            speccomb = speccomb1 = colk1
            js0 = js1 = jnp.zeros_like(ctx.si["jp"])
            fs = fs1 = jnp.zeros_like(colk1)
            specparm = specparm1 = jnp.full_like(colk1, 0.5)

        if not lower and nsp == 0:
            # nspb=0 quirk: ind0=ind1=1 always (taumol.f90:195-202 for
            # band 16), so the key term is two constant absb rows
            # weighted by the summed temperature factors.  ng is 2;
            # the rows inline as scalars (pallas_call rejects captured
            # array constants in the kernel closure)
            kb = tabs.const_kb[b]
            w0 = sf["fac00"] + sf["fac01"]               # (1, T)
            w1 = sf["fac10"] + sf["fac11"]
            taug = speccomb * jnp.concatenate(
                [w0 * float(kb[0, g]) + w1 * float(kb[1, g])
                 for g in range(ng)], axis=0)
        else:
            two_low = lower and spec.key2 is not None
            ws0 = _eta_weights(js0, fs, specparm, nspc, two_low, dtype)
            ws1 = _eta_weights(js1, fs1, specparm1, nspc, two_low,
                               dtype)

            # fac00*k(jt) + fac10*k(jt+1) already summed inside M0
            # (and fac01/fac11 inside M1) by the fac-folded selection W
            ofs, stride = tabs.key_ofs[b]
            acc0 = jnp.zeros((ng, T), dtype)
            acc1 = jnp.zeros((ng, T), dtype)
            for s in range(nspc):
                r0 = ofs + s * stride
                acc0 = acc0 + ws0[s] * ctx.M0[r0: r0 + ng, :]
                acc1 = acc1 + ws1[s] * ctx.M1[r0: r0 + ng, :]
            taug = speccomb * acc0 + speccomb1 * acc1

    if spec.tauself:
        o, _ = tabs.self_ofs[b]
        # selffac/selffrac pre-folded into the aux W
        taug = taug + ctx.Ms[o: o + ng, :]
    if spec.taufor:
        o, _ = tabs.for_ofs[b]
        taug = taug + ctx.Mf[o: o + ng, :]

    for m in spec.minors:
        if m.col.startswith("adj_"):
            colm = _adjusted_col(ctx, m.adj, dtype)
        elif m.col == "scale_n2":
            colm = sf["colbrd"] * sf["scaleminorn2"]
        elif m.col == "scale_o2":
            colm = sf["colo2"] * sf["scaleminor"]
        elif m.col == "scale_brd":
            colm = sf["colbrd"] * sf["scaleminor"]
        else:
            colm = _col(ctx, m.col[3:])
        o, stride, nk = tabs.minor_ofs[(b, m.table)]
        if m.kind == "flat":
            # minorfrac pre-folded into the aux W
            absm = ctx.Mm[o: o + ng, :]
        else:
            g1, g2, plev = m.refrat
            refrat = float(chi_np[_GAS_CHI[g1] - 1, plev - 1]
                           / chi_np[_GAS_CHI[g2] - 1, plev - 1])
            _, _, jm0, fm = _eta_params(_col(ctx, g1), _col(ctx, g2),
                                        jnp.asarray(refrat, dtype), scale)
            jm0 = jnp.clip(jm0, 0, nk - 2)
            a1 = jnp.zeros((ng, T), dtype)
            for k in range(nk - 1):
                sel = jm0 == k
                m0 = ctx.Mm[o + k * stride: o + k * stride + ng, :]
                m1 = ctx.Mm[o + (k + 1) * stride:
                            o + (k + 1) * stride + ng, :]
                a1 = a1 + jnp.where(sel, m0 + fm * (m1 - m0), 0.0)
            absm = a1
        taug = taug + colm * absm

    for wx_i, vec in spec.cfcs:
        o = tabs.cfc_ofs[(b, vec)]
        taug = taug + sf[f"wx{wx_i - 1}"] * ctx.Cf[o: o + ng, :]

    if spec.corradj == "b1l":
        pp = sf["pavel"]
        taug = jnp.where(pp < 250.0,
                         1.0 - 0.15 * (250.0 - pp) / 154.4, 1.0) * taug
    elif spec.corradj == "b1u":
        taug = (1.0 - 0.15 * (sf["pavel"] / 95.6)) * taug
    elif spec.corradj == "b2":
        taug = (1.0 - 0.05 * (sf["pavel"] - 100.0) / 900.0) * taug

    if spec.postscale:
        giota = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)
        fac = jnp.ones((ng, 1), dtype)
        for g1b, v in spec.postscale.items():
            fac = jnp.where(giota == g1b - 1, jnp.asarray(v, dtype), fac)
        taug = taug * fac

    fofs, frows = tabs.frac_ofs[b]
    if spec.frac_eta is not None:
        g1, g2, plev = spec.frac_eta
        refrat = float(chi_np[_GAS_CHI[g1] - 1, plev - 1]
                       / chi_np[_GAS_CHI[g2] - 1, plev - 1])
        _, _, jpl0, fpl = _eta_params(_col(ctx, g1), _col(ctx, g2),
                                      jnp.asarray(refrat, dtype), scale)
        jpl0 = jnp.clip(jpl0, 0, frows - 2)
        flo = jnp.zeros((ng, T), dtype)
        fhi = jnp.zeros((ng, T), dtype)
        for s in range(frows - 1):
            sel = jpl0 == s
            Fs = ctx.Fr[fofs: fofs + ng, s: s + 1]
            Fs1 = ctx.Fr[fofs: fofs + ng, s + 1: s + 2]
            flo = flo + jnp.where(sel, Fs, 0.0)
            fhi = fhi + jnp.where(sel, Fs1, 0.0)
        fracs = flo + fpl * (fhi - flo)
    else:
        fracs = jnp.broadcast_to(ctx.Fr[fofs: fofs + ng, 0:1], (ng, T))
    return taug, fracs


class PallasTaumol:
    """Drop-in replacement for TaumolEngine.__call__ on TPU (f32).

    Reverse-mode autodiff is supported via custom_vjp: the forward runs
    this kernel; the backward differentiates the XLA engine (identical
    math at f32, so primal/cotangent consistency holds).
    """

    def __init__(self, ktables: dict, static: dict, dtype=jnp.float32,
                 tile: int = 256, interpret: bool = False,
                 nsplit: int = NSPLIT, nsplit_w: int = NSPLIT_W,
                 window: int = WINDOW):
        if jnp.dtype(dtype) != jnp.float32:
            raise ValueError("PallasTaumol supports float32 only")
        from .taumol import TaumolEngine
        self._xla_engine = TaumolEngine(ktables, static,
                                        dtype=jnp.float32)
        self.dtype = jnp.float32
        self.tile = tile
        self.interpret = interpret
        # HBM storage dtype for the taug/fracs round trip to the RT
        # kernel (blocked path only).  The write+read is 2.3 GB of the
        # ~2.6 GB/step minimum HBM traffic at B=16k; bf16/f16 halve
        # it at reduced precision (A/B via tools/spec_dtype_ab.py —
        # parity gates whether it ever becomes a default)
        _spec_dtypes = {"": jnp.float32, "f32": jnp.float32,
                        "bf16": jnp.bfloat16, "f16": jnp.float16,
                        "logu16": jnp.uint16}
        _sdt = os.environ.get("RRTMG_SPEC_DTYPE", "")
        if _sdt not in _spec_dtypes:
            raise ValueError(
                f"RRTMG_SPEC_DTYPE={_sdt!r} is not a valid spectral "
                f"storage dtype; allowed values: '' (default f32), "
                f"'f32', 'bf16', 'f16', 'logu16'")
        self.spec_dtype = _spec_dtypes[_sdt]
        self.nsplit = nsplit
        self.nsplit_w = nsplit_w
        self.window = window
        self.low = build_region_tables(ktables, static, lower=True)
        self.up = build_region_tables(ktables, static, lower=False)
        self.chi_np = np.asarray(static["chi_mls"], np.float64)
        # matmul'd tables (key/chi/self/for/minor) ship as nsplit-way
        # bf16 splits; directly-sliced tables (frac/cfc) stay f32
        self._packed = []
        # the flat kernel (arbitrary-batch path; tiles may straddle
        # layers) always contracts the full key row space; the blocked
        # kernel (layer-pure tiles) additionally gets a windowed key
        # table variant (same bf16 values, overlapping column windows)
        self._nwin = {}
        self._packed_win = []
        # chi/self/foreign/minor selections fuse into ONE
        # block-diagonal "aux" matmul per region (their one-hot W
        # blocks concatenate along K): 4 small MXU dots -> 1
        self._aux_meta = {}
        for reg, R, P in ((self.low, 65, 13), (self.up, 235, 47)):
            t = None if reg.keyT is None else _split(reg.keyT, nsplit)
            tw = t
            if t is not None:
                if window:
                    tw, nwin = _expand_windows(t, R, window, WSTEP,
                                               nsplit_w)
                    self._nwin[R] = nwin
                # column-tiled for the single-dot contraction
                t = np.tile(t, (1, nsplit_w))
                if not window:
                    tw = t
            elif window:
                self._nwin[R] = 1
            self._packed.append(t)
            self._packed_win.append(tw)

            meta = {}
            r = c = 0
            parts = []
            for name in ("chiT", "selfT", "forT", "minorT"):
                tab = getattr(reg, name)
                if tab is None:
                    continue
                K = P if name == "chiT" else \
                    {"selfT": 10, "forT": 4, "minorT": 19}[name]
                meta[name] = (r, tab.shape[0], c)
                parts.append((tab, r, c, K))
                r += tab.shape[0]
                c += K
            C = np.zeros((r, c), np.float32)
            for tab, r0, c0, K in parts:
                C[r0:r0 + tab.shape[0], c0:c0 + K] = tab
            meta["_shape"] = (r, c)
            self._aux_meta[R] = meta
            # column-tiled: the weighted W ships as nsplit_w bf16
            # levels contracted in one dot (same scheme as keyT)
            aux = np.tile(_split(C, nsplit), (1, nsplit_w))
            self._packed.append(aux)
            self._packed_win.append(aux)

            for name in ("fracT", "cfcT", "prefT"):
                tab = getattr(reg, name)
                self._packed.append(tab)
                self._packed_win.append(tab)
        self._tables_dev = tuple(jnp.asarray(t) for t in self._packed
                                 if t is not None)
        self._tables_dev_win = tuple(jnp.asarray(t)
                                     for t in self._packed_win
                                     if t is not None)
        self._kernel = self._build()
        self._blocked_cache = {}
        self._call = self._build_vjp()

    # ------------------------------------------------------------------
    def _build_vjp(self):
        @jax.custom_vjp
        def call_native(sc, prof):
            return self._forward_native(sc, prof)

        def fwd(sc, prof):
            return self._forward_native(sc, prof), (sc, prof)

        def bwd(res, ct):
            # Default: the in-kernel-vjp Pallas backward (VMEM-
            # resident, ~fwd-kernel cost structure).  Fallbacks
            # (RRTMG_TAUMOL_BWD): "twin" = column-chunked vjp of the
            # differentiable XLA restatement of the kernel math
            # (forward_xla); "engine" = vjp of the f64-parity gather
            # engine (the original path: 345 ms fwd replay at B=4096).
            mode = os.environ.get("RRTMG_TAUMOL_BWD", "pallas")
            if mode == "engine":
                sc, prof = res

                def f(s, p):
                    tg, fr = self._xla_engine(s, p)
                    return (jnp.transpose(tg, (2, 1, 0)),
                            jnp.transpose(fr, (2, 1, 0)))

                _, vjp = jax.vjp(f, sc, prof)
                return vjp(ct)
            if mode == "twin":
                return self._bwd_xla_chunked(res, ct, ct_axis=2)
            return self._bwd_pallas(res, ct, blocked=False)

        call_native.defvjp(fwd, bwd)
        self._call_native = call_native

        @jax.custom_vjp
        def call_blocked(sc, prof):
            return self._forward_blocked(sc, prof)

        def fwd_b(sc, prof):
            return self._forward_blocked(sc, prof), (sc, prof)

        def bwd_b(res, ct):
            mode = os.environ.get("RRTMG_TAUMOL_BWD", "pallas")
            if mode == "engine":
                sc, prof = res

                def f(s, p):
                    tg, fr = self._xla_engine(s, p)      # (B, L, 140)
                    pads = ((0, 0), (0, 4), (0, 0))

                    def to_blocked(x):
                        return jnp.pad(jnp.transpose(x, (1, 2, 0)),
                                       pads)
                    return to_blocked(tg), to_blocked(fr)

                _, vjp = jax.vjp(f, sc, prof)
                return vjp(ct)
            if mode == "twin":
                return self._bwd_xla_chunked(res, ct, ct_axis=2,
                                             blocked=True)
            return self._bwd_pallas(res, ct, blocked=True)

        call_blocked.defvjp(fwd_b, bwd_b)
        self._call_blocked = call_blocked

        def call(sc, prof):
            tg, fr = call_native(sc, prof)
            return (jnp.transpose(tg, (2, 1, 0)),
                    jnp.transpose(fr, (2, 1, 0)))

        return call

    # ------------------------------------------------------------------
    def _build(self, blocked: bool = False, T: int = 0,
               bwd: bool = False):
        T = T or self.tile
        low, up = self.low, self.up
        chi_np = self.chi_np
        dtype = self.dtype
        ns, nw = self.nsplit, self.nsplit_w
        GP = _pad8(140)            # blocked-mode g rows (RT kernel layout)

        if blocked:
            def _enc(arr, which):
                if self.spec_dtype == jnp.uint16:     # logu16 codec
                    return (spec_encode_taug(arr) if which == "tg"
                            else spec_encode_frac(arr))
                return arr.astype(self.spec_dtype)

            def read_out(ref, which="tg"):
                x = ref[0, :140, :]
                if x.dtype == jnp.uint16:
                    return (spec_decode_taug(x) if which == "tg"
                            else spec_decode_frac(x))
                return x.astype(jnp.float32)

            def write_out(ref, arr, which="tg"):      # arr (140, T)
                arr = _enc(arr, which)
                ref[0, :, :] = jnp.concatenate(
                    [arr, jnp.zeros((GP - 140, arr.shape[1]),
                                    arr.dtype)], axis=0)
        else:
            def read_out(ref, which="tg"):
                return ref[:]

            def write_out(ref, arr, which="tg"):
                ref[:] = arr

        win = self.window if blocked else None

        aux_meta = self._aux_meta

        def make_do(scf, jp, lm_row, keyl_ref, auxl_ref, fracl_ref,
                    cfcl_ref, prefl_ref, keyu_ref, auxu_ref, fracu_ref,
                    cfcu_ref, prefu_ref, base_l, base_u):
            """Per-tile band evaluation.  ``scf`` may be the (NSF, T)
            VMEM ref (forward kernel: rows load lazily, exactly the
            pre-refactor code) or a (NSF, T) VALUE — in which case the
            function is PURE in it, which is what the backward kernel
            exploits: jax.vjp over this very function, in VMEM, with
            the table refs loaded primal-only.  Returns do(lower) ->
            (taug, fracs) (140, T)."""
            fin = {name: scf[i: i + 1, :]
                   for i, name in enumerate(F_FIELDS)}
            lm = lm_row > 0

            # ---- fused setcoef, region-independent rows ----
            # (rrtmg_lw_setcoef.f90:256-367; expressions transcribed
            # op-for-op from ops/setcoef.py so the traced f32 graphs
            # and results match the XLA implementation bit-for-bit)
            pavel, tavel = fin["pavel"], fin["tavel"]
            coldry, wbrodl = fin["coldry"], fin["wbrodl"]
            wkl0 = fin["wkl0"]
            plog = jnp.log(pavel)
            water = wkl0 / coldry
            scalefac = pavel * STPFAC / tavel
            forfac0 = scalefac / (1.0 + water)
            fac_lo = (332.0 - tavel) / 36.0
            indfor_lo = jnp.clip(fac_lo.astype(jnp.int32), 1, 2)
            forfrac_lo = fac_lo - indfor_lo.astype(dtype)
            fac_hi = (tavel - 188.0) / 36.0
            indfor = jnp.where(lm, indfor_lo, 3)
            forfrac = jnp.where(lm, forfrac_lo, fac_hi - 1.0)
            fself = (tavel - 188.0) / 7.2
            indself = jnp.clip(fself.astype(jnp.int32) - 7, 1, 9)
            selffrac = fself - (indself + 7).astype(dtype)
            scaleminor = pavel / tavel
            scaleminorn2 = scaleminor * (wbrodl / (coldry + wkl0))
            fminor = (tavel - 180.8) / 7.2
            indminor = jnp.clip(fminor.astype(jnp.int32), 1, 18)
            minorfrac = fminor - indminor.astype(dtype)

            colh2o = 1.0e-20 * wkl0

            def col_subst(w):
                c = 1.0e-20 * w
                return jnp.where(c == 0.0, 1.0e-32 * coldry, c)

            sf_common = dict(
                colh2o=colh2o, colco2=col_subst(fin["wkl1"]),
                colo3=col_subst(fin["wkl2"]),
                coln2o=col_subst(fin["wkl3"]),
                colco=col_subst(fin["wkl4"]),
                colch4=col_subst(fin["wkl5"]),
                colo2=1.0e-20 * fin["wkl6"],
                colbrd=1.0e-20 * wbrodl,
                selffac=colh2o * (water * forfac0),
                selffrac=selffrac, forfac=colh2o * forfac0,
                forfrac=forfrac, minorfrac=minorfrac,
                scaleminor=scaleminor, scaleminorn2=scaleminorn2,
                pavel=pavel, coldry=coldry,
                wx0=fin["wx0"], wx1=fin["wx1"], wx2=fin["wx2"],
                wx3=fin["wx3"])
            si_common = dict(jp=jp, indself=indself - 1,
                             indfor=indfor - 1, indminor=indminor - 1)

            def region_ctx(pref_ref, P, upper_ofs):
                """Fused-setcoef per-region rows: tref/preflog/chi at
                the jp and jp+1 taps via masked sublane sums — EXACT
                (one nonzero product per lane, so the f32 value is
                untouched and jt = int(3 + (tavel-tref)/15) matches the
                XLA setcoef bit-for-bit) — then the fac pressure-
                temperature weights and the rat_* reference ratios
                (setcoef.f90:268-313)."""
                # clip keeps out-of-region cells of mixed tiles on a
                # real row (finite garbage, discarded by the lm merge)
                jp_loc = jnp.clip(jp - upper_ofs, 0, P - 2)
                Tl = jp.shape[1]
                iota = jax.lax.broadcasted_iota(jnp.int32, (P, Tl), 0)
                Wa = (iota == jp_loc).astype(dtype)          # (P, T)
                Wb_ = (iota == jp_loc + 1).astype(dtype)

                def sel(Wm, c):
                    return jnp.sum(Wm * pref_ref[:P, c:c + 1],
                                   axis=0, keepdims=True)

                A = [sel(Wa, c) for c in range(7)]
                Bb = [sel(Wb_, c) for c in range(7)]
                tref_jp, tref_jp1 = A[1], Bb[1]
                fp = 5.0 * (A[0] - plog)
                tj = (tavel - tref_jp) / 15.0
                jt = jnp.clip((3.0 + tj).astype(jnp.int32), 1, 4)
                ft = tj - (jt - 3).astype(dtype)
                tj1 = (tavel - tref_jp1) / 15.0
                jt1 = jnp.clip((3.0 + tj1).astype(jnp.int32), 1, 4)
                ft1 = tj1 - (jt1 - 3).astype(dtype)
                compfp = 1.0 - fp
                sf = dict(
                    sf_common,
                    fac00=compfp * (1.0 - ft), fac10=compfp * ft,
                    fac01=fp * (1.0 - ft1), fac11=fp * ft1,
                    rat_h2oco2=A[2] / A[3], rat_h2oco2_1=Bb[2] / Bb[3],
                    rat_h2oo3=A[2] / A[4], rat_h2oo3_1=Bb[2] / Bb[4],
                    rat_h2on2o=A[2] / A[5], rat_h2on2o_1=Bb[2] / Bb[5],
                    rat_h2och4=A[2] / A[6], rat_h2och4_1=Bb[2] / Bb[6],
                    rat_n2oco2=A[5] / A[3], rat_n2oco2_1=Bb[5] / Bb[3],
                    rat_o3co2=A[4] / A[3], rat_o3co2_1=Bb[4] / Bb[3])
                si = dict(si_common, jt=jt - 1, jt1=jt1 - 1)
                return sf, si

            def aux_dot(aux_ref, meta, rchi, sf, si):
                """Fused chi/self/foreign/minor selection: one MXU dot
                replaces four (W build shared with the XLA twin — see
                _aux_W)."""
                W = _aux_W(meta, rchi, sf, si, dtype)
                M = _dot_facw(aux_ref[:], W, ns, nw)

                def sl(name):
                    if name not in meta:
                        return None
                    r0, D, _ = meta[name]
                    return M[r0: r0 + D]
                return sl

            def do(lower):
                if lower:
                    sf, si = region_ctx(prefl_ref, 13, 0)
                    jt, jt1 = si["jt"], si["jt1"]
                    r0r = jnp.clip(jp * 5 + jt, 0, 64)
                    r1r = jnp.clip((jp + 1) * 5 + jt1, 0, 64)
                    key_ref, aux_ref = keyl_ref, auxl_ref
                    frac_ref, cfc_ref = fracl_ref, cfcl_ref
                    R, base, meta, reg = 65, base_l, aux_meta[65], low
                else:
                    sf, si = region_ctx(prefu_ref, 47, 12)
                    jt, jt1 = si["jt"], si["jt1"]
                    r0r = jnp.clip((jp - 12) * 5 + jt, 0, 234)
                    r1r = jnp.clip((jp - 11) * 5 + jt1, 0, 234)
                    key_ref, aux_ref = keyu_ref, auxu_ref
                    frac_ref, cfc_ref = fracu_ref, cfcu_ref
                    R, base, meta, reg = 235, base_u, aux_meta[235], up
                if key_ref is not None:
                    if win:
                        W0 = _fac_w(r0r, sf["fac00"], sf["fac10"],
                                    win, dtype, base)
                        W1 = _fac_w(r1r, sf["fac01"], sf["fac11"],
                                    win, dtype, base)
                    else:
                        W0 = _fac_w(r0r, sf["fac00"], sf["fac10"],
                                    R, dtype)
                        W1 = _fac_w(r1r, sf["fac01"], sf["fac11"],
                                    R, dtype)
                    M0, M1 = _dot_facw2(key_ref[:], W0, W1, ns, nw)
                else:
                    M0 = M1 = None
                sl = aux_dot(aux_ref, meta, r1r, sf, si)
                ctx = _Ctx(
                    sf, si, M0, M1,
                    sl("chiT"), sl("selfT"), sl("forT"), sl("minorT"),
                    frac_ref[:] if frac_ref is not None else None,
                    cfc_ref[:] if cfc_ref is not None else None,
                    reg)
                taug_parts, frac_parts = [], []
                for bs in BAND_SPECS:
                    spec = bs.lower if lower else bs.upper
                    tg, fr = _region_eval(spec, bs.band, lower, ctx,
                                          chi_np, dtype)
                    taug_parts.append(tg)
                    frac_parts.append(fr)
                return (jnp.concatenate(taug_parts, axis=0),
                        jnp.concatenate(frac_parts, axis=0))

            return do

        def kernel(wb_ref, scf_ref, sci_ref, keyl_ref, auxl_ref,
                   fracl_ref, cfcl_ref, prefl_ref, keyu_ref, auxu_ref,
                   fracu_ref, cfcu_ref, prefu_ref, taug_ref, fracs_ref):
            jp = sci_ref[0:1, :]                         # (1, T) int
            lm_row = sci_ref[1:2, :]                     # (1, T) int
            lm = lm_row > 0
            if win:
                # hoisted out of pl.when (program_id is not lowerable
                # inside a cond branch in interpret mode)
                pid = pl.program_id(0)
                base_l = wb_ref[0, pid] * WSTEP
                base_u = wb_ref[1, pid] * WSTEP
            else:
                base_l = base_u = None

            do = make_do(scf_ref, jp, lm_row, keyl_ref, auxl_ref,
                         fracl_ref, cfcl_ref, prefl_ref, keyu_ref,
                         auxu_ref, fracu_ref, cfcu_ref, prefu_ref,
                         base_l, base_u)

            # Cells arrive layer-major, so a tile is usually entirely
            # below or entirely above laytrop: evaluate each region only
            # when the tile contains cells in it (both run on the few
            # boundary-straddling tiles; the lm merge keeps mixed tiles
            # exact).
            any_lower = jnp.max(lm_row) > 0
            any_upper = jnp.min(lm_row) < 1

            @pl.when(any_lower)
            def _lower():
                tl, fl = do(True)
                write_out(taug_ref, tl, "tg")
                write_out(fracs_ref, fl, "fr")

            @pl.when(any_upper)
            def _upper():
                tu_all, fu_all = do(False)
                # pure-upper tiles never wrote taug_ref; lm is all-false
                # there so the where never selects the unwritten buffer
                # (with the logu16 codec the lower half round-trips
                # decode->encode: exact on its own grid points)
                write_out(taug_ref,
                          jnp.where(lm, read_out(taug_ref, "tg"),
                                    tu_all), "tg")
                write_out(fracs_ref,
                          jnp.where(lm, read_out(fracs_ref, "fr"),
                                    fu_all), "fr")

        def kernel_bwd(wb_ref, scf_ref, sci_ref, keyl_ref, auxl_ref,
                       fracl_ref, cfcl_ref, prefl_ref, keyu_ref,
                       auxu_ref, fracu_ref, cfcu_ref, prefu_ref,
                       ct_tg_ref, ct_fr_ref, ctf_ref):
            """Backward: cotangents of (taug, fracs) -> cotangent of
            the NSF packed profile rows, computed by jax.vjp OVER THE
            SAME per-tile function the forward kernel runs — entirely
            in VMEM (VERDICT r4 #1: the XLA twin's whole-batch vjp was
            HBM-bound at ~390 ms for B=4096; this kernel's fwd+bwd
            tile math is the forward kernel's cost structure x ~3).
            sc cotangents are identically zero: the kernel's only sc
            dependence is the discrete jp/laytrop pair (see F_FIELDS);
            every continuous dependence enters through the fused
            setcoef recomputation from the profile rows, so d(taug)/
            d(profile) here IS the total derivative."""
            jp = sci_ref[0:1, :]
            lm_row = sci_ref[1:2, :]
            lm = lm_row > 0
            if win:
                pid = pl.program_id(0)
                base_l = wb_ref[0, pid] * WSTEP
                base_u = wb_ref[1, pid] * WSTEP
            else:
                base_l = base_u = None

            scf0 = scf_ref[:]
            if blocked:
                ct = (ct_tg_ref[0, :140, :].astype(jnp.float32),
                      ct_fr_ref[0, :140, :].astype(jnp.float32))
            else:
                ct = (ct_tg_ref[:].astype(jnp.float32),
                      ct_fr_ref[:].astype(jnp.float32))

            any_lower = jnp.max(lm_row) > 0
            any_upper = jnp.min(lm_row) < 1

            def region_ct(lower):
                def g(scf):
                    do = make_do(scf, jp, lm_row, keyl_ref, auxl_ref,
                                 fracl_ref, cfcl_ref, prefl_ref,
                                 keyu_ref, auxu_ref, fracu_ref,
                                 cfcu_ref, prefu_ref, base_l, base_u)
                    return do(lower)
                _, vjp = jax.vjp(g, scf0)
                (cs,) = vjp(ct)
                return cs

            @pl.when(any_lower)
            def _bl():
                ctf_ref[:] = jnp.where(lm, region_ct(True), 0.0)

            @pl.when(any_upper)
            def _bu():
                # pure-upper tiles never wrote ctf_ref; lm is all-false
                # there so the where never selects the unwritten buffer
                ctf_ref[:] = jnp.where(lm, ctf_ref[:], region_ct(False))

        tables = self._packed_win if (blocked and self.window) \
            else self._packed
        live = [t is not None for t in tables]
        kern = kernel_bwd if bwd else kernel
        n_extra = 2 if bwd else 0

        def kernel_adapter(*refs):
            if win:
                wb_ref, scf_ref, sci_ref, *refs = refs
            else:
                scf_ref, sci_ref, *refs = refs
                wb_ref = None
            it = iter(refs[:sum(live)])
            full = [next(it) if ok else None for ok in live]
            out_refs = refs[sum(live):]
            kern(wb_ref, scf_ref, sci_ref, *full, *out_refs)

        # index_map arity: +1 trailing scalar-prefetch ref with windows
        if win:
            row_map = lambda i, wb: (0, i)
            const_map = lambda i, wb: (0, 0)
        else:
            row_map = lambda i: (0, i)
            const_map = lambda i: (0, 0)

        def tab_specs():
            specs = []
            for pos, t in enumerate(tables):
                if t is None:
                    continue
                if win and pos in (0, 5):          # keyT lower/upper
                    r = 0 if pos == 0 else 1
                    imap = (lambda rr: lambda i, wb: (0, wb[rr, i]))(r)
                    specs.append(pl.BlockSpec((t.shape[0], nw * win),
                                              imap,
                                              memory_space=pltpu.VMEM))
                else:
                    specs.append(pl.BlockSpec(t.shape, const_map,
                                              memory_space=pltpu.VMEM))
            return specs

        in_specs = [
            pl.BlockSpec((NSF, T), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((NSI, T), row_map, memory_space=pltpu.VMEM),
        ] + tab_specs()

        def call(grid, out_shape, out_specs, wb, scf, sci, tabs,
                 extra=(), extra_specs=()):
            kw = dict(compiler_params=pltpu.CompilerParams(
                          vmem_limit_bytes=100 * 1024 * 1024),
                      interpret=self.interpret)
            specs = in_specs + list(extra_specs)
            if win:
                return pl.pallas_call(
                    kernel_adapter,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1, grid=(grid,),
                        in_specs=specs, out_specs=out_specs),
                    out_shape=out_shape, **kw,
                )(wb, scf, sci, *tabs, *extra)
            return pl.pallas_call(
                kernel_adapter, grid=(grid,), in_specs=specs,
                out_specs=out_specs, out_shape=out_shape, **kw,
            )(scf, sci, *tabs, *extra)

        if blocked:
            # output in the RT sweep kernel's (L, G_pad, B) block layout:
            # grid step i covers layer i // (B//T), columns (i % (B//T))*T
            if bwd:
                @functools.partial(jax.jit, static_argnums=(0, 1))
                def run(L, B, wb, scf, sci, ct_tg, ct_fr, *tabs):
                    nbt = B // T
                    if win:
                        omap = lambda i, wb: (i // nbt, 0, i % nbt)
                    else:
                        omap = lambda i: (i // nbt, 0, i % nbt)
                    cspec = pl.BlockSpec((1, GP, T), omap,
                                         memory_space=pltpu.VMEM)
                    ctf_spec = pl.BlockSpec((NSF, T), row_map,
                                            memory_space=pltpu.VMEM)
                    return call(
                        L * nbt,
                        jax.ShapeDtypeStruct((NSF, L * B), jnp.float32),
                        ctf_spec, wb, scf, sci, tabs,
                        extra=(ct_tg, ct_fr),
                        extra_specs=(cspec, cspec))

                return run

            @functools.partial(jax.jit, static_argnums=(0, 1))
            def run(L, B, wb, scf, sci, *tabs):
                nbt = B // T
                if win:
                    omap = lambda i, wb: (i // nbt, 0, i % nbt)
                else:
                    omap = lambda i: (i // nbt, 0, i % nbt)
                ospec = pl.BlockSpec((1, GP, T), omap,
                                     memory_space=pltpu.VMEM)
                sdt = self.spec_dtype
                return call(
                    L * nbt,
                    (jax.ShapeDtypeStruct((L, GP, B), sdt),
                     jax.ShapeDtypeStruct((L, GP, B), sdt)),
                    (ospec, ospec), wb, scf, sci, tabs)

            return run

        if bwd:
            @functools.partial(jax.jit, static_argnums=(0,))
            def run(C, scf, sci, ct_tg, ct_fr, *tabs):
                cspec = pl.BlockSpec((140, T), row_map,
                                     memory_space=pltpu.VMEM)
                ctf_spec = pl.BlockSpec((NSF, T), row_map,
                                        memory_space=pltpu.VMEM)
                return call(
                    C // T,
                    jax.ShapeDtypeStruct((NSF, C), jnp.float32),
                    ctf_spec, None, scf, sci, tabs,
                    extra=(ct_tg, ct_fr), extra_specs=(cspec, cspec))

            return run

        @functools.partial(jax.jit, static_argnums=(0,))
        def run(C, scf, sci, *tabs):
            ospec = pl.BlockSpec((140, T), row_map,
                                 memory_space=pltpu.VMEM)
            return call(
                C // T,
                (jax.ShapeDtypeStruct((140, C), jnp.float32),
                 jax.ShapeDtypeStruct((140, C), jnp.float32)),
                (ospec, ospec), None, scf, sci, tabs)

        return run

    # ------------------------------------------------------------------
    def __call__(self, sc: SetcoefOut, prof: Profile):
        return self._call(sc, prof)

    def forward_native(self, sc: SetcoefOut, prof: Profile):
        """taug, fracs in the kernel's native (G, L, B) layout — no
        relayout pass; consumed directly by the Pallas RT sweep."""
        return self._call_native(sc, prof)

    def blocked_tile(self, B: int):
        """Cell tile the blocked launch will use: the largest of
        BLOCKED_TILES dividing B (bigger tiles amortize the fused
        setcoef prologue and per-tile fixed costs — measured on a v5e
        at B=16k: 13.0/10.7/9.7/8.9/8.7 ms for 128/256/512/1024/2048),
        or None when none divides (caller falls back to the flat
        kernel).  RRTMG_TAUMOL_TILE overrides at trace time."""
        env = os.environ.get("RRTMG_TAUMOL_TILE")
        if env:
            t = int(env)
            return t if B % t == 0 else None
        for t in BLOCKED_TILES + (self.tile,):
            if B % t == 0:
                return t
        return None

    def supports_blocked(self, B: int, L: int) -> bool:
        return self.blocked_tile(B) is not None

    def forward_blocked(self, sc: SetcoefOut, prof: Profile):
        """taug, fracs already in the RT sweep kernel's padded
        (L, G_pad=144, B) block layout — the two Pallas kernels
        exchange data through HBM with zero relayout/pad passes.
        Requires B % tile == 0 (each cell tile within one layer)."""
        return self._call_blocked(sc, prof)

    def _window_meta(self, jp_flat, lm_flat, T):
        """Per-tile pressure-window block indices wb (2, ntiles) int32
        + per-tile fits flags (ntiles,).  Derived from the same clipped
        row indices the kernel uses; pure-region tiles get neutral
        fills so mixed tiles don't widen the other region's window."""
        win = self.window
        jp = jp_flat.reshape(-1, T)
        lm = lm_flat.reshape(-1, T) > 0
        pminl = jnp.clip(jnp.min(jnp.where(lm, jp, 12), axis=1), 0, 12)
        pmaxl = jnp.clip(jnp.max(jnp.where(lm, jp, 0), axis=1) + 1,
                         0, 12)
        wl = jnp.clip((pminl * 5) // WSTEP, 0, self._nwin[65] - 1)
        fitl = (pmaxl * 5 + 4) < wl * WSTEP + win
        pminu = jnp.clip(jnp.min(jnp.where(lm, 58, jp), axis=1) - 12,
                         0, 46)
        pmaxu = jnp.clip(jnp.max(jnp.where(lm, 12, jp), axis=1) - 11,
                         0, 46)
        wu = jnp.clip((pminu * 5) // WSTEP, 0, self._nwin[235] - 1)
        fitu = (pmaxu * 5 + 4) < wu * WSTEP + win
        wb = jnp.stack([wl, wu]).astype(jnp.int32)
        return wb, jnp.logical_and(fitl, fitu)

    def window_ok(self, sc: SetcoefOut):
        """Per-column bool diagnostic (B,): True when every tile
        touching the column fits the WINDOW-row pressure window (kernel
        results are exact); False where selection rows were
        edge-clamped (only possible for batches whose per-layer
        pressure spread exceeds ~11 reference slots).  Cells are
        layer-major (tiles are layer-pure column runs), so the per-tile
        flags expand to cells and reduce over layers."""
        if not self.window:
            return None
        B, L = sc.jp.shape
        T = self.blocked_tile(B)
        if T is None:
            return None
        C = sc.jp.size
        pad = (-C) % T

        def iv(x):
            v = x.T.reshape(-1).astype(jnp.int32)
            return jnp.pad(v, (0, pad), mode="edge") if pad else v

        _, fit = self._window_meta(
            iv(sc.jp), iv(sc.laytrop_mask.astype(jnp.int32)), T)
        per_cell = jnp.repeat(fit, T)[:C].reshape(L, B)
        return jnp.all(per_cell, axis=0)

    def _wb(self, sci, ntiles, T):
        if self.window:
            return self._window_meta(sci[0], sci[len(I_FIELDS)], T)[0]
        return jnp.zeros((2, ntiles), jnp.int32)

    def _blocked_kernel(self, T):
        if T not in self._blocked_cache:
            self._blocked_cache[T] = self._build(blocked=True, T=T)
        return self._blocked_cache[T]

    def _bwd_kernel(self, blocked, T):
        key = ("bwd", blocked, T)
        if key not in self._blocked_cache:
            self._blocked_cache[key] = self._build(blocked=blocked,
                                                   T=T, bwd=True)
        return self._blocked_cache[key]

    def _bwd_pallas(self, res, ct, blocked):
        """custom_vjp backward via the in-kernel-vjp Pallas kernel
        (see kernel_bwd in _build).  Returns (ct_sc, ct_prof); ct_sc
        is zero by construction — the kernel's continuous dependence
        on the atmosphere enters exclusively through the fused-setcoef
        recomputation from the packed profile rows (sc contributes
        only the discrete jp/laytrop values), so the profile cotangent
        is the total derivative."""
        if self.spec_dtype != jnp.float32:
            raise NotImplementedError(
                "autodiff through reduced spectral storage "
                "(RRTMG_SPEC_DTYPE) is unsupported: quantized "
                "taug/fracs have no usable cotangent — unset the "
                "knob for training runs")
        sc, prof = res
        B, L = sc.jp.shape
        C = B * L
        ct_tg, ct_fr = ct
        if blocked:
            T = self.blocked_tile(B)
            # the vjp roughly triples live VMEM per tile; cap the
            # backward tile (BLOCKED_TILES are powers of two, so 512
            # divides B whenever a larger tile did)
            Tb = min(T, 512)
            scf, sci = self._pack(sc, prof, pad=0)
            wb = self._wb(sci, C // Tb, Tb)
            tabs = self._tables_dev_win if self.window \
                else self._tables_dev
            ctf = self._bwd_kernel(True, Tb)(L, B, wb, scf, sci,
                                             ct_tg, ct_fr, *tabs)
        else:
            T = self.tile
            Cp = ((C + T - 1) // T) * T
            pad = Cp - C
            scf, sci = self._pack(sc, prof, pad=pad)

            def fl(x):                     # (140, L, B) -> (140, Cp)
                y = x.reshape(140, C)
                return jnp.pad(y, ((0, 0), (0, pad))) if pad else y

            ctf = self._bwd_kernel(False, T)(Cp, scf, sci, fl(ct_tg),
                                             fl(ct_fr),
                                             *self._tables_dev)
            ctf = ctf[:, :C]

        def uf(i):                         # packed row -> (B, L)
            return ctf[i].reshape(L, B).T

        g = {name: uf(i) for i, name in enumerate(F_FIELDS)}
        wkl = jnp.stack([g[f"wkl{i}"] for i in range(7)], axis=-1)
        wx = jnp.stack([g[f"wx{i}"] for i in range(4)], axis=-1)
        ct_prof = Profile(
            pavel=g["pavel"], tavel=g["tavel"],
            pz=jnp.zeros_like(prof.pz), tz=jnp.zeros_like(prof.tz),
            tbound=jnp.zeros_like(prof.tbound),
            semiss=jnp.zeros_like(prof.semiss),
            coldry=g["coldry"], wkl=wkl, wbrodl=g["wbrodl"], wx=wx,
            pwvcm=jnp.zeros_like(prof.pwvcm),
            taua=jnp.zeros_like(prof.taua),
            dtbound=(None if prof.dtbound is None
                     else jnp.zeros_like(prof.dtbound)))

        def ct_zero(x):
            if x is None:
                return None
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
                return jnp.zeros_like(x)
            return np.zeros(jnp.shape(x), jax.dtypes.float0)

        ct_sc = SetcoefOut(*(ct_zero(x) for x in sc))
        return ct_sc, ct_prof

    def _forward_blocked(self, sc: SetcoefOut, prof: Profile):
        B, L = sc.jp.shape
        T = self.blocked_tile(B)
        if T is None:
            raise ValueError("blocked layout needs a tile dividing B")
        scf, sci = self._pack(sc, prof, pad=0)
        wb = self._wb(sci, B * L // T, T)
        return self._blocked_kernel(T)(L, B, wb, scf, sci,
                                       *self._tables_dev_win)

    def _forward_native(self, sc: SetcoefOut, prof: Profile):
        taug, fracs = self._forward_flat(sc, prof)
        B, L = sc.jp.shape
        return (taug[:, :B * L].reshape(140, L, B),
                fracs[:, :B * L].reshape(140, L, B))

    def _forward(self, sc: SetcoefOut, prof: Profile):
        taug, fracs = self._forward_native(sc, prof)
        return (jnp.transpose(taug, (2, 1, 0)),
                jnp.transpose(fracs, (2, 1, 0)))

    def _pack(self, sc: SetcoefOut, prof: Profile, pad: int):
        # layer-major cell order: tiles become laytrop-pure (all cells
        # of a tile in the same region) so the kernel can skip the
        # unused region's evaluation entirely
        def fvec(x):
            v = x.T.reshape(-1).astype(self.dtype)
            return jnp.pad(v, (0, pad)) if pad else v

        def ivec(x):
            # edge-pad so tail-pad cells mirror a real cell: the
            # window metadata (per-tile jp min/max) must not see
            # fabricated jp=0 cells
            v = x.T.reshape(-1).astype(jnp.int32)
            return jnp.pad(v, (0, pad), mode="edge") if pad else v

        cols = [fvec(prof.pavel), fvec(prof.tavel), fvec(prof.coldry),
                fvec(prof.wbrodl)]
        for i in range(7):
            cols.append(fvec(prof.wkl[..., i]))
        for i in range(4):
            cols.append(fvec(prof.wx[..., i]))
        scf = jnp.stack(cols)
        # only the discrete log(pavel)-derived values ship from XLA
        # (setcoef fusion; see the F_FIELDS comment)
        ints = [ivec(sc.jp), ivec(sc.laytrop_mask.astype(jnp.int32))]
        sci = jnp.stack(ints)
        return scf, sci

    def _forward_flat(self, sc: SetcoefOut, prof: Profile):
        B, L = sc.jp.shape
        C = B * L
        T = self.tile
        Cp = ((C + T - 1) // T) * T
        scf, sci = self._pack(sc, prof, pad=Cp - C)
        return self._kernel(Cp, scf, sci, *self._tables_dev)

    # ------------------------------------------------------------------
    # Differentiable XLA twin (the custom_vjp backward path)
    # ------------------------------------------------------------------
    def _bwd_xla_chunked(self, res, ct, ct_axis, blocked=False):
        """vjp of forward_xla in column chunks (see ops/_vjp_chunk.py:
        whole-batch residuals measured 43 GB at B=4096; chunking
        bounds them to one chunk)."""
        from ._vjp_chunk import chunkable, chunked_vjp, pick_nchunk
        sc, prof = res
        B, L = sc.jp.shape

        if blocked:
            def f(s, p):
                tg, fr = self.forward_xla(s, p)          # (140, L, B)
                pads = ((0, 0), (0, 4), (0, 0))

                def to_blocked(x):
                    return jnp.pad(jnp.transpose(x, (1, 0, 2)), pads)
                return to_blocked(tg), to_blocked(fr)
        else:
            f = self.forward_xla

        axes_sc = SetcoefOut(*(None if x is None else 0 for x in sc))
        axes_prof = Profile(*(None if x is None else 0 for x in prof))
        args = (sc, prof)
        args_axes = (axes_sc, axes_prof)
        ct_axes = (ct_axis, ct_axis)
        nch = pick_nchunk(B, L)
        if nch > 1 and not (chunkable(args, args_axes, B)
                            and chunkable(ct, ct_axes, B)):
            nch = 1
        return chunked_vjp(f, args, ct, args_axes, ct_axes, nch)

    def _xla_tabs(self):
        """jnp handles onto the flat packed tables, by region.  Built
        EAGERLY (outside any trace) — jnp.asarray inside a jit trace
        would cache constant tracers that leak into later traces."""
        if not hasattr(self, "_xla_tabs_cache"):
            p = self._packed

            def j(t):
                return None if t is None else jnp.asarray(t)
            with jax.ensure_compile_time_eval():
                self._xla_tabs_cache = {
                    True: (j(p[0]), j(p[1]), j(p[2]), j(p[3])),
                    False: (j(p[5]), j(p[6]), j(p[7]), j(p[8])),
                }
        return self._xla_tabs_cache

    def forward_xla(self, sc: SetcoefOut, prof: Profile):
        """(taug, fracs) in the native (140, L, B) layout, computed in
        plain XLA from the SAME packed split-bf16 tables and selection
        math as the Pallas kernel (shared helpers: _fac_w, _dot_facw2,
        _aux_W, _region_eval) — but fully differentiable by JAX
        autodiff: every table selection is a one-hot MXU contraction
        whose VJP is the transposed matmul; there are no per-cell
        gathers (whose VJP would be scatters).

        This is the custom_vjp BACKWARD path (VERDICT r4 #1): the
        gather-based f64-parity engine measured 345 ms forward at
        B=4096 x nlay=60 on a v5e, putting the grad step at 394 ms —
        ~116x the 3.3 ms forward device time.  The twin replaces it
        for vjp purposes only; the kernel remains the forward and the
        engine remains the golden-parity reference.  Both atmosphere
        regions evaluate densely and merge on the laytrop mask (the
        kernel instead skips regions per layer-pure tile; dense
        evaluation costs ~2x the kernel FLOPs — still ~2 orders below
        the gather path)."""
        dtype = jnp.float32
        B, L = sc.jp.shape

        def r(x):
            return x.T.reshape(1, -1).astype(dtype)

        def ri(x):
            return x.T.reshape(1, -1).astype(jnp.int32)

        sf = dict(
            colh2o=r(sc.colh2o), colco2=r(sc.colco2),
            colo3=r(sc.colo3), coln2o=r(sc.coln2o), colco=r(sc.colco),
            colch4=r(sc.colch4), colo2=r(sc.colo2),
            colbrd=r(sc.colbrd), selffac=r(sc.selffac),
            selffrac=r(sc.selffrac), forfac=r(sc.forfac),
            forfrac=r(sc.forfrac), minorfrac=r(sc.minorfrac),
            scaleminor=r(sc.scaleminor),
            scaleminorn2=r(sc.scaleminorn2),
            pavel=r(prof.pavel), coldry=r(prof.coldry),
            fac00=r(sc.fac00), fac10=r(sc.fac10),
            fac01=r(sc.fac01), fac11=r(sc.fac11),
            **{f"wx{i}": r(prof.wx[..., i]) for i in range(4)},
            **{name: r(getattr(sc, name)) for name in (
                "rat_h2oco2", "rat_h2oco2_1", "rat_h2oo3",
                "rat_h2oo3_1", "rat_h2on2o", "rat_h2on2o_1",
                "rat_h2och4", "rat_h2och4_1", "rat_n2oco2",
                "rat_n2oco2_1", "rat_o3co2", "rat_o3co2_1")})
        si = dict(jp=ri(sc.jp), jt=ri(sc.jt), jt1=ri(sc.jt1),
                  indself=ri(sc.indself), indfor=ri(sc.indfor),
                  indminor=ri(sc.indminor))

        tabs = self._xla_tabs()
        outs = {}
        for lower in (True, False):
            key_t, aux_t, frac_t, cfc_t = tabs[lower]
            reg = self.low if lower else self.up
            R = 65 if lower else 235
            jp, jt, jt1 = si["jp"], si["jt"], si["jt1"]
            if lower:
                r0 = jnp.clip(jp * 5 + jt, 0, R - 1)
                r1 = jnp.clip((jp + 1) * 5 + jt1, 0, R - 1)
            else:
                r0 = jnp.clip((jp - 12) * 5 + jt, 0, R - 1)
                r1 = jnp.clip((jp - 11) * 5 + jt1, 0, R - 1)
            if key_t is not None:
                W0 = _fac_w(r0, sf["fac00"], sf["fac10"], R, dtype)
                W1 = _fac_w(r1, sf["fac01"], sf["fac11"], R, dtype)
                M0, M1 = _dot_facw2(key_t, W0, W1, self.nsplit,
                                    self.nsplit_w)
            else:
                M0 = M1 = None
            meta = self._aux_meta[R]
            Maux = _dot_facw(aux_t, _aux_W(meta, r1, sf, si, dtype),
                             self.nsplit, self.nsplit_w)

            def sl(name, Maux=Maux, meta=meta):
                if name not in meta:
                    return None
                o, D, _ = meta[name]
                return Maux[o: o + D]

            ctx = _Ctx(sf, si, M0, M1, sl("chiT"), sl("selfT"),
                       sl("forT"), sl("minorT"), frac_t, cfc_t, reg)
            taug_parts, frac_parts = [], []
            for bs in BAND_SPECS:
                spec = bs.lower if lower else bs.upper
                tg, fr = _region_eval(spec, bs.band, lower, ctx,
                                      self.chi_np, dtype)
                taug_parts.append(tg)
                frac_parts.append(fr)
            outs[lower] = (jnp.concatenate(taug_parts, axis=0),
                           jnp.concatenate(frac_parts, axis=0))

        lm = ri(sc.laytrop_mask.astype(jnp.int32)) > 0       # (1, T)
        taug = jnp.where(lm, outs[True][0], outs[False][0])
        fracs = jnp.where(lm, outs[True][1], outs[False][1])
        return (taug.reshape(140, L, B), fracs.reshape(140, L, B))
