"""Pallas TPU kernel for the setcoef Planck-table interpolation.

The XLA one-hot path (setcoef._interp_rows_onehot) materializes a
(B*L, 181) f32 weight matrix in HBM (~178 MB at B=4096, L=60) just to
contract it down to (B, L, 16) — that round-trip is most of setcoef's
~2 ms/step.  Here the weight tile lives only in VMEM: grid over
(level, column-tile), build the (181, T) two-tap interpolation weights
on the VPU, contract against the resident (16, 181) totplnk table on
the MXU, and emit the result directly in the RT sweep kernel's
(L, 16, B) blocked layout (which also removes that kernel's `_prep`
relayout for the Planck arrays).

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
        iota = jax.lax.broadcasted_iota(jnp.int32, (KPAD, T), 0)
        # W carries the f32 interpolation fractions: 2-level bf16
        # split, lane-concatenated against the row-stacked 2-level
        # table split — ONE MXU pass (vs 6 with Precision.HIGHEST)
        # reproduces the f32 contraction to ~2^-17 relative
        W = jnp.where(iota == ind - 1, 1.0 - frac,
                      jnp.where(iota == ind, frac, 0.0))
        w1 = W.astype(jnp.bfloat16)
        w2 = (W - w1.astype(jnp.float32)).astype(jnp.bfloat16)
        M = jnp.dot(tbl_ref[:], jnp.concatenate([w1, w2], axis=1),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        out_ref[0] = (M[:16, :T] + M[:16, T:]
                      + M[16:, :T] + M[16:, T:])

    def run(tbl16, temp_t):                               # (16,KPAD),(L,B)
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
                pl.BlockSpec((32, KPAD), lambda l, i: (0, 0),
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
    t1 = t32.astype(np.float32).astype(jnp.bfloat16)
    t2 = (t32 - np.asarray(t1, np.float32)).astype(jnp.bfloat16)
    tbl2 = jnp.asarray(np.concatenate(
        [np.asarray(t1), np.asarray(t2)], axis=0))       # (32, KPAD)
    run = _build(int(tile), bool(interpret))
    return run(tbl2, temp_t.astype(jnp.float32))
