"""Shared test fixtures: re-exported from the package's synthetic module."""

from rrtmg_lw_tpu.utils.synthetic import (  # noqa: F401
    make_atmosphere, make_band_clouds, make_mcica_clouds)
