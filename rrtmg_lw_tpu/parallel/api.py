"""pjit'd radiation steps over a device mesh.

Replaces the reference's serial ``do iplon = 1, ncol`` column loop
(rrtmg_lw_rad.f90:486) with a single XLA program partitioned by GSPMD:
inputs/outputs sharded over ``columns``, the (B, L, 140) spectral
intermediates optionally sharded over ``spec`` (the band-weighted flux
reduction then becomes an automatic psum over ``spec`` riding ICI).
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import SPEC, batch_sharding, spec_sharding


def make_sharded_step(model, mesh, donate: bool = False):
    """jit-compile ``model(atm, clouds) -> Fluxes`` over the mesh.

    Any pytree whose leaves carry columns on axis 0 works as input; the
    output Fluxes are sharded the same way.
    """
    bs = batch_sharding(mesh)
    model.spec_constraint = (
        spec_sharding(mesh) if mesh.shape[SPEC] > 1 else None)

    def step(atm, clouds=None):
        return model(atm, clouds)

    return jax.jit(step, in_shardings=bs, out_shardings=bs,
                   donate_argnums=(0,) if donate else ())


def make_sharded_grad_step(model, mesh, loss_fn=None):
    """Differentiable radiation: grad of a scalar flux objective w.r.t.
    the atmospheric state (new capability — the reference is
    forward-only).  Default objective: mean total-sky heating rate
    squared (exercises the full backward pass through taumol + scans).
    """
    bs = batch_sharding(mesh)
    model.spec_constraint = (
        spec_sharding(mesh) if mesh.shape[SPEC] > 1 else None)
    if loss_fn is None:
        def loss_fn(fl):
            return (fl.hr ** 2).mean() + (fl.uflx[:, -1] ** 2).mean()

    def step(atm, clouds=None):
        def obj(a):
            return loss_fn(model(a, clouds))
        loss, g = jax.value_and_grad(obj)(atm)
        return loss, g

    return jax.jit(step, in_shardings=bs,
                   out_shardings=(None, bs))
