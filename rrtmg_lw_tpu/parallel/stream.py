"""Host->device input streaming with double buffering.

The reference reads one column at a time from text files
(rrtmg_lw.1col.f90:447); the GCM mode receives arrays by argument.  At
TPU scale the input pipeline must overlap H2D copies with compute:
``prefetch`` keeps ``depth`` batches in flight (jax.device_put with a
NamedSharding is asynchronous), so the radiation step never waits on
PCIe/DCN.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import jax

from .mesh import shardings_for


def prefetch(batches: Iterable, mesh, depth: int = 2,
             sharding=None) -> Iterator:
    """Yield device-resident batches, keeping ``depth`` transfers in
    flight ahead of the consumer.  Shardings are layout-aware per
    sub-tree (blocked/compact cloud arrays carry columns on their
    last axis — see mesh.shardings_for)."""
    if sharding is not None:
        put = lambda tree: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)
    else:
        def put(tree):
            sh = shardings_for(tree, mesh)
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, s), tree, sh)
    queue = collections.deque()
    it = iter(batches)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        ready = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield ready


def run_epoch(step_fn: Callable, batches: Iterable, mesh,
              depth: int = 2, callback: Optional[Callable] = None):
    """Drive step_fn over a stream of host batches with prefetch."""
    out = None
    for dev_batch in prefetch(batches, mesh, depth=depth):
        # splat only plain tuples: NamedTuple batches (Atmosphere,
        # cloud pytrees) are single arguments
        splat = (isinstance(dev_batch, tuple)
                 and not hasattr(dev_batch, "_fields"))
        out = step_fn(*dev_batch) if splat else step_fn(dev_batch)
        if callback is not None:
            callback(out)
    return out
