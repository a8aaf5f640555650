"""Signal preprocessing parity vs scipy (and the skimage semantics it lowers to)."""
import numpy as np
import pytest
import scipy.ndimage as ndi
import scipy.signal as sp

from strique_tpu.ops import signal as sig_ops


def test_medfilt3_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 500, 1000)
    np.testing.assert_array_equal(sig_ops.medfilt3(x), sp.medfilt(x, kernel_size=3))


def test_open_close_matches_ndimage():
    """open+close chain == scipy.ndimage grey ops with a 1x8 footprint.

    skimage opening/closing with rectangle(1,8) (reference STRique.py:593-595)
    lower to exactly these scipy.ndimage calls.
    """
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, 4096).astype(np.float64)
    img = x.reshape(1, -1)
    fp = np.ones((1, 8), dtype=bool)
    expected = ndi.grey_closing(ndi.grey_opening(img, footprint=fp), footprint=fp)[0]
    got = sig_ops.open_close_np(x)
    np.testing.assert_array_equal(got, expected)


def test_erode_dilate_match_ndimage():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, 2048).astype(np.float64)
    img = x.reshape(1, -1)
    fp = np.ones((1, 8), dtype=bool)
    np.testing.assert_array_equal(sig_ops.erode_np(x), ndi.grey_erosion(img, footprint=fp)[0])
    np.testing.assert_array_equal(sig_ops.dilate_np(x), ndi.grey_dilation(img, footprint=fp)[0])
