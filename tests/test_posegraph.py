"""Global pose-graph refinement: consistency no-op, synthetic drifty loop
with a closure edge, and full-trajectory re-emission."""

import jax.numpy as jnp
import numpy as np

from dvo_tpu import lie
from dvo_tpu.models.posegraph import (
    PoseGraphConfig,
    PoseGraphEdges,
    apply_refinement,
    build_edges,
    chain_edges,
    optimize_pose_graph,
)


def _circle_poses(n, radius=1.0):
    """Ground-truth poses around a planar circle, heading tangent."""
    xs = []
    for k in range(n):
        th = 2 * np.pi * k / n
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th), np.sin(th)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T[0, 3] = radius * np.cos(th)
        T[1, 3] = radius * np.sin(th)
        xs.append(np.asarray(lie.se3_log(jnp.asarray(T))))
    return np.stack(xs).astype(np.float32)


def _odometry(xi_true, rng, noise):
    """Noisy consecutive relative measurements + the drifted dead-reckoned
    trajectory they integrate to."""
    n = xi_true.shape[0]
    T = [np.asarray(lie.se3_exp(jnp.asarray(x))) for x in xi_true]
    zs, drift = [], [np.eye(4, dtype=np.float32)]
    drift[0] = T[0]
    for k in range(n - 1):
        z = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T[k]) @ T[k + 1])))
        z = z + rng.standard_normal(6).astype(np.float32) * noise
        zs.append(z.astype(np.float32))
        drift.append(drift[-1] @ np.asarray(lie.se3_exp(jnp.asarray(zs[-1]))))
    xi_drift = np.stack(
        [np.asarray(lie.se3_log(jnp.asarray(t))) for t in drift]
    ).astype(np.float32)
    return np.stack(zs), xi_drift


def _ate(xi_a, xi_b):
    ta = np.stack([np.asarray(lie.se3_exp(jnp.asarray(x)))[:3, 3] for x in xi_a])
    tb = np.stack([np.asarray(lie.se3_exp(jnp.asarray(x)))[:3, 3] for x in xi_b])
    return float(np.sqrt(np.mean(np.sum((ta - tb) ** 2, axis=-1))))


def test_consistent_graph_is_noop(rng):
    xi = _circle_poses(8)
    i, j, z, w = chain_edges(xi)
    edges = PoseGraphEdges(jnp.asarray(i), jnp.asarray(j), jnp.asarray(z),
                           jnp.asarray(w))
    out, costs = optimize_pose_graph(jnp.asarray(xi), edges,
                                     PoseGraphConfig(iterations=3))
    assert float(costs[0]) < 1e-8
    np.testing.assert_allclose(np.asarray(out), xi, atol=1e-4)


def test_loop_closure_fixes_drift(rng):
    n = 12
    xi_true = _circle_poses(n)
    zs, xi_drift = _odometry(xi_true, rng, noise=0.02)

    ate0 = _ate(xi_drift, xi_true)
    # Edges: noisy odometry chain + exact closures (the last node back to
    # the start, plus two mid-loop crossings — the shape a re-tracking
    # closure pass produces).
    T = [np.asarray(lie.se3_exp(jnp.asarray(x))) for x in xi_true]

    def closure(a, b):
        return np.asarray(
            lie.se3_log(jnp.asarray(np.linalg.inv(T[a]) @ T[b]))
        ).astype(np.float32)

    # Keep relative rotations well under pi: near-180-degree pairs sit on
    # the SO(3) log branch cut where the residual linearization is invalid.
    pairs = [(n - 1, 0), (n - 2, 0), (n - 1, 1)]
    edges = build_edges(
        [np.arange(n - 1), np.asarray([a for a, _ in pairs])],
        [np.arange(1, n), np.asarray([b for _, b in pairs])],
        [zs, np.stack([closure(a, b) for a, b in pairs])],
        [np.ones(n - 1, np.float32), np.full(len(pairs), 20.0, np.float32)],
    )
    out, costs = optimize_pose_graph(
        jnp.asarray(xi_drift), edges, PoseGraphConfig(iterations=10)
    )
    ateN = _ate(np.asarray(out), xi_true)
    assert float(costs[-1]) < float(costs[0])
    assert ateN < 0.5 * ate0, (ate0, ateN)
    # Gauge held.
    np.testing.assert_allclose(np.asarray(out)[0], xi_drift[0], atol=1e-6)


def test_apply_refinement_corrects_interframes():
    # 3 keyframes at frames 0, 2, 4; intermediate frames 1, 3.
    poses = np.stack([np.eye(4, dtype=np.float32)] * 5)
    for f in range(5):
        poses[f][0, 3] = 0.1 * f  # straight line along x
    kf_idx = [0, 2, 4]
    # Refinement shifts keyframe 2 (frame 4) up by 0.05 in y.
    xi_ref = []
    for f in kf_idx:
        T = poses[f].copy()
        if f == 4:
            T[1, 3] += 0.05
        xi_ref.append(np.asarray(lie.se3_log(jnp.asarray(T))))
    out = apply_refinement(np.arange(5.0), poses, kf_idx, np.stack(xi_ref))
    # Keyframes land exactly on their refined poses.
    np.testing.assert_allclose(out[0], poses[0], atol=1e-5)
    np.testing.assert_allclose(out[4][1, 3], 0.05, atol=1e-5)
    # Frame 3 inherits keyframe 1's (identity) correction.
    np.testing.assert_allclose(out[3], poses[3], atol=1e-5)


def test_apply_live_correction_slot_semantics():
    """Device write-back of a chunked live refinement
    (posegraph.apply_live_correction): slots still holding refined
    keyframes (kf_id match) take their refined twist exactly; slots
    promoted AFTER the refinement (kf_id > max_id) move rigidly by the
    newest node's correction; the never-refined init keyframe and empty
    slots keep their twist; ref follows the ring head."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from dvo_tpu import lie
    from dvo_tpu.config import DVOConfig
    from dvo_tpu.models.odometry import monocular_init
    from dvo_tpu.models.posegraph import apply_live_correction

    cfg = DVOConfig(
        pyramid=dc.replace(DVOConfig().pyramid, levels=2, culls=0)
    )
    gray = jnp.zeros((16, 32), jnp.float32)
    mask = jnp.ones((16, 32), bool)
    K = jnp.asarray(np.array([[30.0, 0, 16], [0, 30.0, 8], [0, 0, 1]],
                             np.float32))
    state = monocular_init(gray, mask, K, jax.random.PRNGKey(0), cfg)
    cap = cfg.mapper.history_capacity
    # Hand-build a ring occupancy: slot 0 = init kf (id 0, push 0);
    # slots 1..3 = refined-era keyframes (ids 3, 7, 11); slot 4 = a
    # keyframe promoted AFTER the refinement (id 15) and current head.
    ids = np.full(cap, -1, np.int32)
    xi = np.zeros((cap, 6), np.float32)
    for slot, fid in ((0, 0), (1, 3), (2, 7), (3, 11), (4, 15)):
        ids[slot] = fid
        xi[slot, 0] = 0.01 * fid
    hist = dc.replace(
        state.history,
        kf_id=jnp.asarray(ids),
        xi=jnp.asarray(xi),
        head=jnp.asarray(4, jnp.int32),
        count=jnp.asarray(5, jnp.int32),
    )
    state = dc.replace(state, history=hist)

    xi_ref_slot = np.zeros((cap, 6), np.float32)
    id_slot = np.full(cap, -2, np.int32)
    for slot, fid in ((1, 3), (2, 7), (3, 11)):
        xi_ref_slot[slot] = [0.01 * fid + 0.005, 0.002, 0, 0, 0, 0]
        id_slot[slot] = fid
    # Also claim slot 4 held id 13 at refine time (since overwritten by
    # id 15) — must NOT match.
    xi_ref_slot[4] = [9.9, 9.9, 9.9, 0, 0, 0]
    id_slot[4] = 13
    corr = np.eye(4, dtype=np.float32)
    corr[0, 3] = 0.005   # newest refined node's left-correction

    out = apply_live_correction(
        state, jnp.asarray(xi_ref_slot), jnp.asarray(id_slot),
        jnp.asarray(11, jnp.int32), jnp.asarray(corr),
    )
    new_xi = np.asarray(out.history.xi)
    # Matched slots -> refined twists exactly.
    for slot, fid in ((1, 3), (2, 7), (3, 11)):
        np.testing.assert_allclose(new_xi[slot], xi_ref_slot[slot],
                                   atol=1e-6)
    # Newer slot (id 15 > max_id 11) -> rigid corr of its old pose, NOT
    # the stale claimed slot value.
    expect = np.asarray(lie.se3_log(
        jnp.asarray(corr) @ lie.se3_exp(jnp.asarray(xi[4]))
    ))
    np.testing.assert_allclose(new_xi[4], expect, atol=1e-6)
    # Init keyframe (id 0 <= max_id, unmatched) and empty slots unchanged.
    np.testing.assert_allclose(new_xi[0], xi[0], atol=0)
    np.testing.assert_allclose(new_xi[5:], xi[5:], atol=0)
    # Ref follows the head slot.
    np.testing.assert_allclose(np.asarray(out.ref.xi), new_xi[4], atol=0)
