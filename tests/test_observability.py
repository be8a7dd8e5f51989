"""Observability utilities + error-flag surfacing."""

import jax.numpy as jnp
import numpy as np
import pytest

from rrtmg_lw_tpu import LWConfig, make_model
from rrtmg_lw_tpu.utils.profiling import (StageTimer, ThroughputMeter,
                                          device_memory_stats)
from rrtmg_lw_tpu.utils.synthetic import make_atmosphere, \
    make_mcica_clouds


def test_throughput_meter():
    meter = ThroughputMeter()
    for _ in range(3):
        with meter.step(ncols=128) as h:
            h["result"] = jnp.ones((128,)) * 2
    rep = meter.report()
    assert rep["columns"] == 384 and rep["steps"] == 3
    assert rep["columns_per_sec"] > 0


def test_stage_timer():
    t = StageTimer()
    t.measure("add", lambda x: x + 1, jnp.ones((64,)), iters=3)
    assert "add" in t.report()
    assert t.report()["add"] >= 0


def test_memory_stats_no_crash():
    device_memory_stats()  # None on CPU is fine


@pytest.mark.slow
def test_cld_bounds_flag_surfaces():
    m = make_model(LWConfig(icld=2, imca=1, dtype="float64"))
    atm = make_atmosphere(ncol=2, nlay=16)
    cl = make_mcica_clouds(ncol=2, nlay=16)
    fl = m(atm, cl)
    assert fl.cld_bounds_ok is not None
    assert fl.cld_bounds_ok.shape == (2, 16)
    assert bool(jnp.all(fl.cld_bounds_ok))
    # out-of-range ice size flips the flag without aborting
    bad = cl._replace(reicmc=jnp.asarray(cl.reicmc).at[0, 3].set(500.0))
    fl2 = m(atm, bad)
    assert not bool(fl2.cld_bounds_ok[0, 3])
    assert np.isfinite(np.asarray(fl2.uflx)).all()
