"""Sustained streaming run (VERDICT r2 #3; BASELINE.json configs[4]).

Streams >= 1M columns of host-generated GCM batches through the
radiation step with double-buffered H2D prefetch
(parallel/stream.prefetch) on the real chip, and writes
STREAM_r{N}.json with sustained columns/s + H2D/compute overlap
efficiency.  This replaces the reference's serial per-column loop
(rrtmg_lw_rad.f90:486) + host-side sub-column generator
(mcica_subcol_gen_lw.f90:133) at production scale.

Four pipeline designs are measured:

  host-mask:  the McICA sub-column mask is generated on the HOST and
              shipped at g-resolution (compact layout) — the
              reference's dataflow (mcica_subcol_gen_lw runs before
              rrtmg_lw), ~14-18 KB/column over the interconnect.
  host-mask-wire: same dataflow, compressed: bit-packed mask (8 g
              per byte) + uint16 profile codes (parallel/wire) —
              ~3 KB/column; for GCM hosts that generate their own
              sub-columns (the reference contract takes cldfmcl as
              input, rrtmg_lw_rad.f90:117).
  device-gen: the host ships only (B, L) cloud profiles and the
              stochastic mask is generated ON DEVICE inside the same
              jit step (ops/mcica threefry path) — the TPU-native
              dataflow, ~5 KB/column.  Constant-zero aerosol od stays
              device-resident instead of re-shipping per step.
  device-gen-wire: device-gen with uint16 wire codes everywhere —
              ~1.1 KB/column; the production default.

Overlap efficiency = (t_put_total + t_comp_total - t_wall)
                     / min(t_put_total, t_comp_total), clipped to
[0, 1]: 1.0 means the smaller of H2D/compute was fully hidden behind
the larger.

Usage: python tools/stream_bench.py [--ncol 16384] [--steps 64]
       [--round 3] [--quick]  (quick: tiny CPU smoke of the harness)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def cloud_profiles(ncol, nlay, seed):
    """(B, L) cloud profile fields for the device-side generator."""
    from rrtmg_lw_tpu.utils.synthetic import make_cloud_profile_fields
    return make_cloud_profile_fields(ncol, nlay, seed)


def tree_bytes(tree):
    import jax
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "nbytes"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=16384)
    ap.add_argument("--nlay", type=int, default=60)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--host-mask-steps", type=int, default=16,
                    help="steps for the (heavier) host-mask phase")
    ap.add_argument("--nbatch", type=int, default=8,
                    help="distinct host batches cycled")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="CPU smoke: tiny shapes, validates the harness")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.ncol, args.steps = 256, 4
        args.host_mask_steps, args.nbatch = 2, 2
    jax.config.update("jax_compilation_cache_dir",
                      str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from rrtmg_lw_tpu import LWConfig, make_model
    from rrtmg_lw_tpu import parallel as par
    from rrtmg_lw_tpu.ops.mcica import mcica_subcol_lw_compact
    from rrtmg_lw_tpu.types import Atmosphere
    from rrtmg_lw_tpu.utils.profiling import ThroughputMeter
    from rrtmg_lw_tpu.utils.synthetic import (make_atmosphere,
                                              make_mcica_clouds)

    B, L, K = args.ncol, args.nlay, args.nbatch
    platform = jax.default_backend()
    mesh = par.make_mesh(jax.devices())
    model = make_model(LWConfig(icld=2, imca=1, dtype="float32",
                                use_lut=False))
    step = par.make_sharded_step(model, mesh)
    results = {}

    def put(tree):
        from rrtmg_lw_tpu.parallel.mesh import shardings_for
        sh = shardings_for(tree, mesh)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), tree, sh)

    def run_phase(name, batches_host, step_fn, nsteps, cols_per_step):
        # blocking H2D time for one batch
        t0 = time.perf_counter()
        b0 = put(batches_host[0])
        jax.block_until_ready(b0)
        t_put = time.perf_counter() - t0
        for _ in range(2):
            t0 = time.perf_counter()
            bx = put(batches_host[1 % len(batches_host)])
            jax.block_until_ready(bx)
            t_put = min(t_put, time.perf_counter() - t0)
        nbytes = tree_bytes(batches_host[0])

        # pure-compute step time, device-resident (chained via step idx)
        out = step_fn(b0, 0)
        jax.block_until_ready(out.uflx)
        t0 = time.perf_counter()
        nrep = 10 if platform == "tpu" else 2
        for i in range(nrep):
            out = step_fn(b0, i + 1)
        jax.block_until_ready(out.uflx)
        t_comp = (time.perf_counter() - t0) / nrep

        # sustained stream with prefetch.  The first prefetched batch
        # runs OUTSIDE the clock: any retrace/compile triggered by the
        # prefetch-placed avals lands there instead of inside the
        # timed window (a single remote compile is ~20 min on axon and
        # silently dominated an early version of this measurement).
        from rrtmg_lw_tpu.parallel.stream import prefetch

        def host_iter():
            for i in range(nsteps + 1):
                yield batches_host[i % len(batches_host)]

        meter = ThroughputMeter()
        stream = prefetch(host_iter(), mesh, depth=args.depth)
        warm = step_fn(next(stream), 0)
        jax.block_until_ready(warm.uflx)
        t0 = time.perf_counter()
        i = 0
        last = None
        step_s = []
        for dev_batch in stream:
            ts = time.perf_counter()
            with meter.step(ncols=cols_per_step) as h:
                h["result"] = step_fn(dev_batch, i)
                last = h["result"]
            i += 1
            step_s.append(round(time.perf_counter() - ts, 3))
        jax.block_until_ready(last.uflx)
        t_wall = time.perf_counter() - t0

        # sustained H2D-only pass over the same batch sequence: the
        # tunnel's burst rate (first put) can be >10x its sustained
        # rate, so the overlap metric must compare the streamed wall
        # against the SUSTAINED transfer cost, not the burst one
        t0 = time.perf_counter()
        for i in range(nsteps):
            jax.block_until_ready(put(batches_host[i % len(batches_host)]))
        t_put_seq = time.perf_counter() - t0

        tot_comp = nsteps * t_comp
        denom = min(t_put_seq, tot_comp)
        overlap = ((t_put_seq + tot_comp - t_wall) / denom
                   if denom > 0 else 0.0)
        # compute utilization: fraction of the streamed wall the device
        # spent computing.  overlap 1.0 with low compute_util means the
        # pipeline is H2D-bound and mostly idle on compute — report both
        # so "perfect overlap" can't read as "compute-saturated".
        compute_util = tot_comp / t_wall if t_wall > 0 else 0.0
        row = dict(
            design=name, ncol=B, nlay=L, steps=nsteps,
            total_columns=nsteps * cols_per_step,
            step_s=step_s,
            h2d_bytes_per_batch=int(nbytes),
            h2d_kb_per_col=round(nbytes / B / 1024, 2),
            h2d_burst_s_per_batch=round(t_put, 4),
            h2d_burst_mb_per_s=round(nbytes / t_put / 1e6, 1),
            h2d_sustained_s_per_batch=round(t_put_seq / nsteps, 4),
            h2d_sustained_mb_per_s=round(
                nbytes * nsteps / t_put_seq / 1e6, 1),
            compute_s_per_step=round(t_comp, 4),
            wall_s=round(t_wall, 2),
            cols_per_sec=round(nsteps * cols_per_step / t_wall, 1),
            overlap_efficiency=round(max(0.0, min(1.0, overlap)), 3),
            # unclamped value + the raw triple: the put-only pass runs
            # in a separate window on a drifting tunnel, so values >1
            # (or <0) expose that drift instead of being hidden by the
            # clamp
            overlap_unclamped=round(overlap, 3),
            overlap_raw_s=dict(t_put_seq=round(t_put_seq, 3),
                               tot_comp=round(tot_comp, 3),
                               t_wall=round(t_wall, 3)),
            compute_util=round(compute_util, 3),
            bound=("h2d" if t_put_seq > tot_comp else "compute"))
        results[name] = row
        print(json.dumps(row))
        assert np.isfinite(np.asarray(last.uflx)).all()
        return row

    # ---- host-mask design (reference dataflow) ----------------------
    mask_dt = np.int8 if platform == "tpu" else None
    layout = "compact"     # every backend: the pipeline-native layout
    host_batches = [
        (make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32, seed=i),
         make_mcica_clouds(ncol=B, nlay=L, dtype=jnp.float32,
                           layout=layout, mask_dtype=mask_dt, seed=i))
        for i in range(K)]
    run_phase("host_mask", host_batches,
              lambda b, i: step(b[0], b[1]), args.host_mask_steps, B)

    # ---- device-gen design (TPU-native dataflow) ---------------------
    # constant aerosol od stays on the device; the host ships profile
    # rows + (B, L) cloud fields only
    atm_fields = [make_atmosphere(ncol=B, nlay=L, dtype=jnp.float32,
                                  seed=i)._asdict() for i in range(K)]
    taua0 = jax.device_put(np.zeros((B, L, 16), np.float32))
    for d in atm_fields:
        d.pop("tauaer")
    gen_batches = [(atm_fields[i], cloud_profiles(B, L, i))
                   for i in range(K)]
    keys = jax.device_put(
        np.stack([np.asarray(jax.random.key_data(
            jax.random.fold_in(jax.random.key(7), i)))
            for i in range(max(args.steps, 16))]))

    @jax.jit
    def step_gen(parts, cp, i):
        key = jax.random.wrap_key_data(keys[i])
        atm = Atmosphere(**parts, tauaer=taua0)
        clouds = mcica_subcol_lw_compact(
            key, 2, cp["cldfrac"], cp["ciwp"], cp["clwp"],
            cp["rei"], cp["rel"],
            mask_dtype=jnp.int8 if platform == "tpu" else None)
        return model(atm, clouds)

    run_phase("device_gen", gen_batches,
              lambda b, i: step_gen(b[0], b[1], i % len(keys)),
              args.steps, B)

    # ---- host_mask_wire design: host-generated sub-columns (the
    # reference GCM contract, rrtmg_lw_rad.f90:117) with the
    # bit-packed mask wire — for hosts that produce their own McICA
    # masks and cannot use the device-side generator
    from rrtmg_lw_tpu.parallel import wire as w

    # schema captured from batch 0 pins the pytree structure while
    # keeping uniform channels at 0 bytes/col (schema="coded" would
    # double the wire)
    _e0a = w.encode_atmosphere(host_batches[0][0])
    _e0c = w.encode_compact_clouds(host_batches[0][1])
    sch_a, sch_c = w.schema_of(_e0a), w.schema_of(_e0c.fields)
    hostmask_wire = [
        (w.encode_atmosphere(host_batches[i][0], schema=sch_a),
         w.encode_compact_clouds(host_batches[i][1], schema=sch_c))
        for i in range(K)]

    @jax.jit
    def step_hmw(ea, ec, i):
        atm = w.decode_atmosphere(ea, taua0)
        clouds = w.decode_compact_clouds(
            ec, mask_dtype=jnp.int8 if mask_dt else jnp.float32)
        return model(atm, clouds)

    run_phase("host_mask_wire", hostmask_wire,
              lambda b, i: step_hmw(b[0], b[1], i),
              args.host_mask_steps, B)

    # ---- device_gen_wire design (compressed wire format) -------------
    # same dataflow as device_gen, but the host ships uint16
    # ratio/delta codes + per-batch reference profiles (parallel.wire)
    # and the step dequantizes on device — ~2.7x less wire
    wire_batches = [(w.encode_atmosphere(atm_fields[i]),
                     w.encode_cloud_profiles(cloud_profiles(B, L, i)))
                    for i in range(K)]

    @jax.jit
    def step_wire(ea, ec, i):
        key = jax.random.wrap_key_data(keys[i])
        atm = w.decode_atmosphere(ea, taua0)
        cp = w.decode_cloud_profiles(ec, like=atm.play)
        clouds = mcica_subcol_lw_compact(
            key, 2, cp["cldfrac"], cp["ciwp"], cp["clwp"],
            cp["rei"], cp["rel"],
            mask_dtype=jnp.int8 if platform == "tpu" else None)
        return model(atm, clouds)

    run_phase("device_gen_wire", wire_batches,
              lambda b, i: step_wire(b[0], b[1], i % len(keys)),
              args.steps, B)

    out = dict(platform=platform, device=str(jax.devices()[0]),
               depth=args.depth, distinct_host_batches=K,
               phases=results)
    path = ROOT / f"STREAM_r{args.round:02d}.json"
    if not args.quick:
        path.write_text(json.dumps(out, indent=1))
        print(f"-> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
