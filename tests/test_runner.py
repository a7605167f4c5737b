"""Full-sequence runner drivers on real reference data: the native
prefetch data plane vs the PIL fallback must produce the same trajectory,
and the pose-graph hook must run end-to-end."""

import os

import numpy as np
import pytest

from dvo_tpu.config import DVOConfig
from dvo_tpu.utils.datasets import Calibration, InfoSequence
from dvo_tpu.utils.runner import run_monocular

DATA = "/root/reference/data/logicool0"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data not available"
)


def _seq():
    return InfoSequence(os.path.join(DATA, "info.txt"))


def _native_available():
    try:
        from dvo_tpu import native

        native.load_library()
        return True
    except Exception:
        return False


@pytest.mark.slow
def test_monocular_native_matches_fallback(monkeypatch):
    """Same pixels through either decode path -> same trajectory."""
    cfg = DVOConfig.monocular()
    calib = Calibration.logicool()
    if not _native_available():
        pytest.skip("native lib unavailable")
    _, poses_native, _ = run_monocular(_seq(), calib, cfg, max_frames=8)

    # Force the PIL/NumPy fallback by making the native loader unbuildable.
    from dvo_tpu import native

    def boom(*a, **k):
        raise native.NativeUnavailable("forced fallback")

    monkeypatch.setattr(native, "PrefetchLoader", boom)
    _, poses_pil, _ = run_monocular(_seq(), calib, cfg, max_frames=8)

    # Both decoders produce identical gray values for these 8-bit PNGs; the
    # trajectories must agree to float noise.
    np.testing.assert_allclose(poses_native, poses_pil, atol=1e-5)


@pytest.mark.slow
def test_monocular_pose_graph_end_to_end():
    """--pose-graph path: refinement runs and returns finite poses of the
    right shape on real imagery."""
    cfg = DVOConfig.monocular()
    calib = Calibration.logicool()
    n = 30
    ts, poses, _ = run_monocular(_seq(), calib, cfg, max_frames=n,
                                 pose_graph=True)
    assert poses.shape == (n, 4, 4)
    assert np.all(np.isfinite(poses))
    # Rigid transforms: R orthonormal.
    RtR = np.einsum("nij,nik->njk", poses[:, :3, :3], poses[:, :3, :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-4)
