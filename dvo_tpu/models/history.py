"""Fixed-capacity keyframe ring buffer — static-shape replacement for the
reference's unbounded ``FrameHistory`` (include/system/frame.hpp:146-188).

The mapper looks up the keyframe a pixel's depth was *born* in by its age:
``frame_history[age]`` indexes from the back (frame.hpp:176,
``m_history[size-1-i]``) — age 0 is the newest keyframe.  Here keyframes
live in stacked arrays (capacity, H, W) and the born lookup becomes
``slot = (head - age) mod capacity``, a real gather across the keyframe
axis — and the unit of sharding for the distributed mapping layer
(SURVEY.md §2 component 11).

Only what the mapper's depth update needs is stored per keyframe: base-level
gray + gradients (+ masks) and the world pose twist (mapper.cpp:99-120 uses
born->gray()/gradX()/gradY()/m_xi only).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dvo_tpu.models.frame import Frame


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KeyframeHistory:
    gray: jax.Array    # (C, H, W)
    mask: jax.Array    # (C, H, W) bool
    gx: jax.Array      # (C, H, W)
    gy: jax.Array      # (C, H, W)
    gmask: jax.Array   # (C, H, W) bool
    depth: jax.Array   # (C, H, W) — keyframe depth at push time (BA window)
    sigma: jax.Array   # (C, H, W)
    xi: jax.Array      # (C, 6) world pose twists
    kf_id: jax.Array   # (C,) int32 — frame_id of the keyframe in each slot
    #                    (-1 = never written); lets host-side consumers
    #                    (pose-graph live write-back, utils/runner) address
    #                    slots by frame identity without racing the ring
    head: jax.Array    # () int32 — slot of the newest keyframe
    count: jax.Array   # () int32 — number of live keyframes (<= C)

    @property
    def capacity(self) -> int:
        return self.gray.shape[0]

    @staticmethod
    def create(capacity: int, h: int, w: int) -> "KeyframeHistory":
        return KeyframeHistory(
            gray=jnp.zeros((capacity, h, w), jnp.float32),
            mask=jnp.zeros((capacity, h, w), bool),
            gx=jnp.zeros((capacity, h, w), jnp.float32),
            gy=jnp.zeros((capacity, h, w), jnp.float32),
            gmask=jnp.zeros((capacity, h, w), bool),
            depth=jnp.zeros((capacity, h, w), jnp.float32),
            sigma=jnp.ones((capacity, h, w), jnp.float32),
            xi=jnp.zeros((capacity, 6), jnp.float32),
            kf_id=jnp.full((capacity,), -1, jnp.int32),
            head=jnp.asarray(-1, jnp.int32),
            count=jnp.asarray(0, jnp.int32),
        )


def push(history: KeyframeHistory, frame: Frame) -> KeyframeHistory:
    """Append a frame as the newest keyframe (reference setRefFrame,
    frame.hpp:152-158).  Oldest slot is overwritten once full — ages are
    clamped to the live window at lookup."""
    s = frame.base
    slot = (history.head + 1) % history.capacity
    return dataclasses.replace(
        history,
        gray=history.gray.at[slot].set(s.gray),
        mask=history.mask.at[slot].set(s.mask),
        gx=history.gx.at[slot].set(s.gx),
        gy=history.gy.at[slot].set(s.gy),
        gmask=history.gmask.at[slot].set(s.gmask),
        depth=history.depth.at[slot].set(s.depth),
        sigma=history.sigma.at[slot].set(s.sigma),
        xi=history.xi.at[slot].set(frame.xi),
        kf_id=history.kf_id.at[slot].set(frame.frame_id),
        head=slot,
        count=jnp.minimum(history.count + 1, history.capacity),
    )


def refresh_head(history: KeyframeHistory, frame: Frame) -> KeyframeHistory:
    """Write the reference keyframe's *current* state (depth/sigma refined by
    every depth update since its push, pose possibly refined by BA) back into
    its ring slot.  Called before pushing the next keyframe so the BA window
    sees up-to-date maps, not push-time snapshots."""
    s = frame.base
    slot = history.head
    return dataclasses.replace(
        history,
        depth=history.depth.at[slot].set(s.depth),
        sigma=history.sigma.at[slot].set(s.sigma),
        xi=history.xi.at[slot].set(frame.xi),
    )


def write_back(history: KeyframeHistory, slots, xi, depth) -> KeyframeHistory:
    """Write BA-refined world poses and depth maps into the given ring slots
    (slots (M,), xi (M, 6), depth (M, H, W))."""
    return dataclasses.replace(
        history,
        xi=history.xi.at[slots].set(xi),
        depth=history.depth.at[slots].set(depth),
    )


def born_slot(history: KeyframeHistory, age: jax.Array) -> jax.Array:
    """Slot index of the keyframe ``age`` keyframes before the newest
    (reference operator[], frame.hpp:176).  Ages beyond the live window are
    clamped to the oldest retained keyframe."""
    age = jnp.clip(age, 0, jnp.maximum(history.count - 1, 0))
    return (history.head - age) % history.capacity
