"""Pallas TPU kernel for the setcoef Planck-table interpolation.

The XLA one-hot path (setcoef._interp_rows_onehot) materializes a
(B*L, 181) f32 weight matrix in HBM (~178 MB at B=4096, L=60) just to
contract it down to (B, L, 16) — that round-trip is most of setcoef's
~2 ms/step.  Here the weight tile lives only in VMEM: grid over
(level, column-tile), build a BINARY (181, 2T) one-hot selecting both
interpolation taps as lane-concatenated columns (exact in bf16 at one
level), contract against the resident truncated-3-level-split totplnk
table on the MXU (exact f32 row reconstruction), apply the
interpolation fma post-dot in f32, and emit the result directly in
the RT sweep kernel's (L, 16, B) blocked layout (which also removes
that kernel's `_prep` relayout for the Planck arrays).

Index semantics match rrtmg_lw_setcoef.f90:173-206 via
setcoef._planck_index: ind = int(T-159) clamped to [1, 180],
frac = T - 159 - ind (frac may leave [0, 1) when clamped — the weights
then extrapolate, exactly like the reference).

Wired into radiation.from_profile's blocked RT path: planck_blocked =
(planklay_t, planklev_t) feed rt_fluxes_pallas in place of the
_prep'd setcoef outputs; setcoef's XLA planck arrays then dead-code
eliminate under jit.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROWS = 181
KPAD = 184          # 181 padded to a sublane multiple


def _pad_to(n, m):
    return -(-n // m) * m


@functools.lru_cache(maxsize=8)
def _build(T, interpret):
    def kernel(tbl_ref, temp_ref, out_ref):
        t = temp_ref[0]                                   # (1, T)
        ind = jnp.clip((t - 159.0).astype(jnp.int32), 1, 180)
        frac = t - 159.0 - ind.astype(jnp.float32)
        # BINARY one-hot W selecting both interpolation taps as
        # lane-concatenated columns (cols [0,T) tap ind-1, cols [T,2T)
        # tap ind): exact in bf16 at a single level, so the f32 table
        # rows reconstruct EXACTLY from the 3-level table split
        # (3x8 mantissa bits cover f32; the split subtractions are
        # exact), and the interpolation fma runs post-dot in f32 —
        # fewer VPU passes than building a fraction-weighted W and
        # splitting it to bf16, and BITWISE equal to the XLA
        # _interp_planck instead of ~2^-17
        iota = jax.lax.broadcasted_iota(jnp.int32, (KPAD, 2 * T), 0)
        taps = jnp.concatenate([ind - 1, ind], axis=1)    # (1, 2T)
        W = (iota == taps).astype(jnp.bfloat16)
        M = jnp.dot(tbl_ref[:], W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        v0 = M[:16, :T] + M[16:32, :T] + M[32:, :T]
        v1 = M[:16, T:] + M[16:32, T:] + M[32:, T:]
        out_ref[0] = v0 + frac * (v1 - v0)

    def run(tbl16, temp_t):                               # (48,KPAD),(L,B)
        L, B = temp_t.shape
        nb = B // T
        # (L*nb, 1, T): Mosaic requires the last two block dims to be
        # (8k, 128k)-aligned or equal to the array dims; a (1, T) row
        # block over a (., 1, T) array satisfies that exactly
        temp3 = temp_t.reshape(L * nb, 1, T)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 16, B), jnp.float32),
            grid=(L, nb),
            in_specs=[
                pl.BlockSpec((48, KPAD), lambda l, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda l, i: (l * nb + i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 16, T), lambda l, i: (l, 0, i),
                                   memory_space=pltpu.VMEM),
            interpret=bool(interpret),
        )(tbl16, temp3)

    return run


def planck_interp_blocked(temp_t, totplnk, *, tile=512, interpret=False):
    """(L, B) layer/level temperatures -> (L, 16, B) Planck sources.

    totplnk: (181, 16) table (static).  B must be a multiple of
    ``tile`` (callers pad columns; the batched pipeline already runs
    on tile-aligned B).
    """
    L, B = temp_t.shape
    tile = int(os.environ.get("RRTMG_PLANCK_TILE", tile))  # A/B knob
    tile = min(tile, B)
    if B % tile:
        raise ValueError("planck_interp_blocked needs tile | B")
    t32 = np.pad(np.asarray(totplnk, np.float32).T,
                 ((0, 0), (0, KPAD - NROWS)))
    # 3-level TRUNCATED bf16 split: each level holds a disjoint 8-bit
    # mantissa field (truncation = zeroing the low half of the f32
    # word, exactly representable in bf16), so the residual after 3
    # levels is zero and the f32 sums reassemble the original value
    # bit-for-bit (round-to-nearest splits leave a 1-ulp tail in ~1%
    # of entries)
    levels, rem = [], t32.astype(np.float32)
    for _ in range(3):
        p32 = (rem.view(np.uint32) & 0xFFFF0000).view(np.float32)
        rem = rem - p32
        # the real invariant: the truncated level must survive the
        # bf16 round trip bit-for-bit (a value below the bf16
        # subnormal floor would round to zero while rem was already
        # reduced — rem-exactness alone would not catch that)
        lvl16 = p32.astype(jnp.bfloat16)
        assert np.array_equal(np.asarray(lvl16, np.float32), p32)
        levels.append(lvl16)
    assert not rem.any()
    assert np.array_equal(
        sum(np.asarray(p, np.float32) for p in levels), t32)
    tbl2 = jnp.asarray(np.concatenate(
        [np.asarray(p) for p in levels], axis=0))        # (48, KPAD)
    run = _build(int(tile), bool(interpret))
    tbl_f32 = jnp.asarray(np.asarray(totplnk, np.float32))  # (181, 16)

    # reverse mode: d planck / d T is exactly the interpolation slope
    # v1 - v0 (frac = T - 159 - ind has unit derivative, including on
    # the clamp branches, which extrapolate with the same slope)
    @jax.custom_vjp
    def interp(temp32):
        return run(tbl2, temp32)

    def fwd(temp32):
        return interp(temp32), temp32

    def bwd(temp32, ct):                                 # ct (L, 16, B)
        # per-cell row gathers are catastrophic on TPU (PERF_NOTES
        # fact 1); select the slope row with a one-hot matmul instead
        # (181-row space, HIGHEST keeps the exact f32 slope)
        ind = jnp.clip((temp32 - 159.0).astype(jnp.int32), 1, 180)
        dtbl = tbl_f32[1:] - tbl_f32[:-1]                # (180, 16)
        flat = ind.reshape(-1, 1) - 1                    # (L*B, 1)
        iota = jax.lax.broadcasted_iota(jnp.int32,
                                        (flat.shape[0], 180), 1)
        onehot = (iota == flat).astype(jnp.float32)
        slope = jnp.dot(onehot, dtbl,
                        precision=jax.lax.Precision.HIGHEST
                        ).reshape(temp32.shape + (dtbl.shape[1],))
        return (jnp.einsum("lkb,lbk->lb", ct, slope),)

    interp.defvjp(fwd, bwd)
    return interp(temp_t.astype(jnp.float32))
