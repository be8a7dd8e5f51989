"""Native fparse scanner: builds, loads, and agrees with the Python path."""

import numpy as np

from rrtmg_lw_tpu import native


def test_native_builds_and_matches_python():
    text = """
    ! comment 1.0 2.0 should be ignored
    totplnk(1:5,  1) = (/ 0.14783e-05_rb, 1.5d0, -2.5, .5e+2, 7 /)
    x = -3.25_rb   ! trailing 9.9
    data foo / 1.0, -1.0e-10, 2.D5 /
    a(1) - b(2)    ! binary minus between identifiers, no number
    1-2             ! '2' follows binary minus after digit -> unsigned
    """
    ref = np.array([1, 5, 1, 0.14783e-05, 1.5, -2.5, 0.5e2, 7.0, -3.25,
                    1.0, -1.0e-10, 2.0e5, 1.0, 2.0, 1.0, 2.0])
    py = native._extract_numbers_py(text)
    np.testing.assert_allclose(py, ref)
    if native.available():
        nat = native.extract_numbers(text)
        np.testing.assert_allclose(nat, ref)
    else:  # toolchain missing: fallback must still serve
        np.testing.assert_allclose(native.extract_numbers(text), ref)


def test_native_on_reference_source():
    # scan a real reference file both ways and compare
    text = open("/root/reference/modules/rrlw_ref.f90").read()
    py = native._extract_numbers_py(text)
    assert len(py) > 0
    if native.available():
        nat = native.extract_numbers(text)
        np.testing.assert_array_equal(nat, py)
