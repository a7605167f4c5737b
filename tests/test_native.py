"""Native C++ data plane tests (build + parity vs the Python path)."""

import os

import numpy as np
import pytest

REF_DATA = "/root/reference/data"

native = pytest.importorskip("dvo_tpu.native")

try:
    native.load_library()
    HAVE_LIB = True
except Exception:
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(
    not (HAVE_LIB and os.path.isdir(REF_DATA)), reason="native lib or data absent"
)


def test_decode_gray_matches_reference_luma():
    p = os.path.join(REF_DATA, "logicool0", "0000.png")
    img = native.decode_png_f32(p, 1 / 255.0)
    from PIL import Image

    ref = np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
    assert img.shape == ref.shape
    # PIL rounds the ITU-R 601 luma to integers first; the native path keeps
    # float like cv::cvtColor — differences stay below one gray level.
    assert np.abs(img - ref).max() < 2.5 / 255.0


def test_decode_depth16_exact():
    p = os.path.join(REF_DATA, "KINECT_50MM", "depth01.png")
    d = native.decode_png_f32(p, 1 / 5000.0)
    from PIL import Image

    ref = np.asarray(Image.open(p), np.float32) / 5000.0
    np.testing.assert_allclose(d, ref, atol=1e-6)


def test_remap_matches_python(rng):
    from dvo_tpu.utils.datasets import (
        Calibration,
        build_undistort_map,
        remap_nearest as py_remap,
    )

    calib = Calibration.logicool()
    srcmap = build_undistort_map(calib)
    img = rng.random((480, 640)).astype(np.float32)
    out_n, valid_n = native.remap_nearest(img, srcmap, border=-2.0)
    out_p, valid_p = py_remap(img, srcmap, border=-2.0)
    np.testing.assert_array_equal(valid_n, valid_p)
    np.testing.assert_allclose(out_n, out_p, atol=0)


def test_prefetch_ordered_and_complete():
    paths = [os.path.join(REF_DATA, "logicool0", f"{i:04d}.png") for i in range(12)]
    pl = native.PrefetchLoader(paths, 1 / 255.0, threads=2)
    seen = [idx for idx, img, valid in pl]
    pl.close()
    assert seen == list(range(12))


def test_prefetch_with_remap():
    from dvo_tpu.utils.datasets import Calibration, build_undistort_map

    calib = Calibration.logicool()
    srcmap = build_undistort_map(calib)
    paths = [os.path.join(REF_DATA, "logicool0", f"{i:04d}.png") for i in range(3)]
    pl = native.PrefetchLoader(paths, 1 / 255.0, map_xy=srcmap, border=-2.0, threads=2)
    idx, img, valid = next(pl)
    pl.close()
    assert img.shape == (480, 640)
    assert valid.mean() > 0.8  # undistortion border only
