"""Column-chunked VJP evaluation for per-column stage functions.

The taumol and RT stages are exactly per-column (no cross-column
coupling — the reference processes columns in a serial loop,
rrtmg_lw_rad.f90:486), so their VJPs decompose over the column axis.
Evaluating the whole-batch vjp at once materializes every
linearization residual for the full batch (measured 43 GB at
B=4096 x nlay=60 for the taumol twin — HBM is 16 GB); evaluating it in
column chunks under ``lax.map`` (a scan) keeps only one chunk's
residuals live at a time, trading nothing but a little scheduling
freedom.  Chunking is EXACT: the same primal math runs per chunk.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import tree_util as jtu

# target live cells (columns x layers) per chunk.  Measured on a v5e
# (16 GB HBM, nlay=60): 245,760 cells (B=4096) fits unchunked and runs
# fastest (87 ms grad step vs 137 ms split 8 ways — lax.map serializes
# chunks, so chunk only to avoid OOM); 491,520 cells exceeds HBM by
# ~1.2 GB.  The RT scan-transpose residuals (~8 stacked (B, L, G)
# arrays) are the footprint driver.
DEFAULT_CHUNK_CELLS = 245760


def pick_nchunk(B: int, L: int, target_cells: int | None = None) -> int:
    """Smallest divisor of B whose chunk is <= target_cells cells."""
    if target_cells is None:
        target_cells = int(os.environ.get("RRTMG_GRAD_CHUNK_CELLS",
                                          DEFAULT_CHUNK_CELLS))
    if target_cells <= 0:                      # disabled
        return 1
    want = max(1, -(-B * L // target_cells))
    for nc in range(want, B + 1):
        if B % nc == 0:
            return nc
    return 1


def chunkable(args, args_axes, B: int) -> bool:
    """True when every leaf really has length B on its column axis
    (layout padding would silently misalign chunks)."""
    ok = [True]

    def check(x, a):
        if np.shape(x)[a] != B:
            ok[0] = False
        return None

    jtu.tree_map(check, args, args_axes)
    return ok[0]


def chunked_vjp(f, args, ct, args_axes, ct_axes, nchunk: int):
    """VJP of ``f(*args)`` with cotangent ``ct``, evaluated in
    ``nchunk`` column chunks.

    ``args_axes`` / ``ct_axes``: pytrees matching args/ct whose leaves
    give each array's column-axis index.  Every leaf's column axis
    must be divisible by nchunk (use ``chunkable``/nchunk=1 when
    padding breaks that).  Integer-dtype leaves are chunked as primal
    data but excluded from differentiation; their cotangents come back
    as float0 zeros, exactly as ``jax.vjp`` would return them.
    """
    if nchunk <= 1:
        _, vjp = jax.vjp(f, *args)
        return vjp(ct)

    leaves, treedef = jtu.tree_flatten(args)
    axes = treedef.flatten_up_to(args_axes)
    diff = [jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
            for x in leaves]

    def split(x, a):
        # (..., B@a, ...) -> (nchunk, ..., Bc@a, ...): the chunked
        # column axis stays at its original position inside each chunk
        y = jnp.moveaxis(jnp.asarray(x), a, 0)
        y = y.reshape((nchunk, y.shape[0] // nchunk) + y.shape[1:])
        return jnp.moveaxis(y, 1, a + 1)

    xs_leaves = [split(x, a) for x, a in zip(leaves, axes)]
    ct_x = jtu.tree_map(split, ct, ct_axes)

    def one(xs):
        leaves_c, ct_c = xs

        def g(*dl):
            it = iter(dl)
            full = [next(it) if d else x
                    for x, d in zip(leaves_c, diff)]
            return f(*jtu.tree_unflatten(treedef, full))

        _, vjp = jax.vjp(g, *[x for x, d in zip(leaves_c, diff) if d])
        gs = iter(vjp(ct_c))
        # integer leaves: dummy scalars through the map (their real
        # cotangent is a full-shape float0 zero, attached afterwards)
        return tuple(next(gs) if d else jnp.zeros((), jnp.float32)
                     for d in diff)

    stacked = jax.lax.map(one, (tuple(xs_leaves), ct_x))

    def unsplit(x, a):
        y = jnp.moveaxis(x, 0, a)              # (..., nc, Bc, ...)
        return y.reshape(y.shape[:a] + (-1,) + y.shape[a + 2:])

    outs = []
    for x0, g, a, d in zip(leaves, stacked, axes, diff):
        if d:
            outs.append(unsplit(g, a))
        else:
            outs.append(np.zeros(np.shape(x0), jax.dtypes.float0))
    return jtu.tree_unflatten(treedef, outs)
