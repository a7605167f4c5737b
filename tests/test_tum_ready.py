"""TUM-readiness gate (round-4 VERDICT item 6): the day TUM fr1/xyz is
reachable, the phase-0 empirical ATE bound must be ONE command:

    python -m dvo_tpu.run --data <seq> --format tum --mode rgbd \
        --gt <seq>/groundtruth.txt --out traj.txt

This test synthesizes a TUM-layout dataset (rgb/ + depth/ + rgb.txt /
depth.txt timestamp lists + groundtruth.txt) from the renderer with known
ground truth and drives that exact command through run.main — parsing,
association, tracking (chunked driver), trajectory write, and ATE all
exercised end-to-end."""

import json
import os

import numpy as np
import pytest

from dvo_tpu import lie
from dvo_tpu.utils.trajectory import read_tum, write_tum

from test_odometry import render_sequence


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _write_tum_dataset(root, frames, depths, gt_poses):
    import jax.numpy as jnp  # noqa: F401
    from PIL import Image

    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    rgb_lines, depth_lines = [], []
    for k, ((img, _mask), depth) in enumerate(zip(frames, depths)):
        t = float(k)
        rp = f"rgb/{k:03d}.png"
        dp = f"depth/{k:03d}.png"
        Image.fromarray(
            np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
        ).save(os.path.join(root, rp))
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(root, dp))
        rgb_lines.append(f"{t:.6f} {rp}")
        depth_lines.append(f"{t:.6f} {dp}")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# ts path\n" + "\n".join(rgb_lines) + "\n")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("# ts path\n" + "\n".join(depth_lines) + "\n")
    write_tum(
        os.path.join(root, "groundtruth.txt"),
        np.arange(float(len(frames))), gt_poses,
    )


def test_tum_one_command_ate(tmp_path, rng, capsys):
    from dvo_tpu.run import main

    h, w = 96, 128
    n = 12
    step = np.array([0.006, -0.003, 0.004, 0.0, 0.0, 0.0], np.float32)
    frames, depth0, K = render_sequence(rng, n, h, w, step)
    depths, gt, xi = [], [], np.zeros(6, np.float32)
    import jax.numpy as jnp

    for k in range(n):
        depths.append(depth0 - k * step[2])
        gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
        xi = np.asarray(lie.compose(jnp.asarray(xi), jnp.asarray(step)))
    # The RGB-D preset pre-decimates by 2 (culls=1); kron-upsample the
    # rendered frames 2x so the point-sample cull recovers the rendered
    # pixels exactly (a sharp random texture decimated raw would alias).
    up = np.ones((2, 2), np.float32)
    frames = [(np.kron(img, up), np.kron(m, np.ones((2, 2), bool)))
              for img, m in frames]
    depths = [np.kron(d, up) for d in depths]
    root = str(tmp_path / "tumseq")
    _write_tum_dataset(root, frames, depths, gt)
    calib = str(tmp_path / "calib.yaml")
    with open(calib, "w") as f:
        f.write(
            "monocular:\n"
            f"  K: [{2*K[0,0]}, 0, {2*K[0,2]}, 0, {2*K[1,1]}, {2*K[1,2]}, "
            "0, 0, 1]\n"
            f"  resolution: [{2*w}, {2*h}]\n"
        )
    out = str(tmp_path / "traj.txt")
    rc = main([
        "--data", root, "--format", "tum", "--mode", "rgbd",
        "--calib", calib, "--gt", os.path.join(root, "groundtruth.txt"),
        "--out", out, "--chunk", "4",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["frames"] == n
    ts, xyz = read_tum(out)
    assert len(ts) == n and np.all(np.isfinite(xyz))
    # The command computes ATE itself; synthetic-GT accuracy at this
    # operating point is gated tightly by test_e2e — here the bar is the
    # one-command loop being sane (motion ~7 cm total).
    assert report["ate_rmse_m"] < 0.02, report
