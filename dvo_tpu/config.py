"""Typed configuration — every constant of the reference, as a named field.

The reference hard-codes its constants in anonymous namespaces scattered
through the code (SURVEY.md §5 "Config / flag system: none").  Here each one
is a dataclass field whose default is the reference value, with the source
cited so parity can be checked.  ``compat_*`` flags select faithful-vs-fixed
behavior for the reference's quirks (SURVEY.md §7 "Reference quirks").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """Image pyramid shape.  Reference: include/system/system.hpp:30,47,82.

    ``levels`` pyramid scenes are built coarsest-first; the input is first
    decimated by ``2**culls`` (reference include/system/frame.hpp:99-117,
    src/system/frame.cpp:30-37).
    """

    levels: int = 3          # monocular mode (system.hpp:47); RGB-D uses 4
    culls: int = 2           # monocular mode (system.hpp:47); RGB-D uses 1


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Coarse-to-fine photometric Gauss-Newton tracking.

    Reference constants: src/track/tracker.cpp:16-19, src/track/optimize.cpp.
    """

    max_iterations: int = 15          # tracker.cpp:19 MAXIMUM_ITERATION
    min_update_norm: float = 5e-4     # tracker.cpp:17 MINIMUM_UPDATE
    min_residual: float = 5e-3        # tracker.cpp:16 MINIMUM_RESIDUAL
    # The reference also aborts past a 200 ms wall-clock budget
    # (tracker.cpp:18,68-73).  A TPU program cannot branch on host time; we
    # run fixed iterations with convergence masking and *report* time instead.
    min_depth: float = 0.20           # optimize.cpp:39 depth gate [m]
    # Per-level weight numerator ("step"): level 0 -> 2.0, 1 -> 1.5, 2+ -> 1.0
    # (optimize.cpp:22-26).
    level_steps: Tuple[float, ...] = (2.0, 1.5, 1.0, 1.0)
    sigma_clamp: Tuple[float, float] = (0.01, 0.5)  # optimize.cpp:83
    # Level-2 crop: keep x in [20, 140], y in [20, 100] inclusive
    # (optimize.cpp:33-36 — absolute pixels, hard-coded for 160x120 but the
    # reference applies them verbatim at level index 2 of *any* pyramid).
    crop_level: int = 2               # level index the crop applies to
    crop_x: Tuple[int, int] = (20, 140)
    crop_y: Tuple[int, int] = (20, 100)
    # Faithful: weight applied to the residual vector B only, not to the
    # Jacobian rows A (optimize.cpp:87-89).  This scales every GN update by
    # the (sigma-dependent) weight — a 4-20x overshoot that is plausibly the
    # root cause of the reference's admitted tracking unreliability
    # (README.md:4-5).  Default is the fixed weighted-normal-equations form
    # (weight on both sides; uniform weights then cancel exactly).  Set True
    # only for single-step parity tests against the reference/oracle.
    compat_weight_b_only: bool = False
    # Levenberg damping added to J^T J diagonal (0 = faithful Gauss-Newton;
    # the reference's DECOMP_SVD pseudo-inverse is emulated by a tiny ridge).
    damping: float = 1e-6
    # Constant-velocity warm start (the reference always starts GN from
    # identity, tracker.cpp:28): seed each frame's optimization with the
    # motion prior composed from the previous relative pose and the last
    # frame-to-frame velocity.  Converges to the same optimum from a closer
    # start, so the early-exit driver executes fewer GN iterations.  The
    # prior is discarded (identity start) when its norm exceeds
    # ``warm_start_max_norm`` — a tracking glitch must not catapult the
    # next frame out of the photometric basin.
    # Default OFF (reference-faithful): in the NOISE-BOOTSTRAP monocular
    # mode the early poses are depth-noise-driven, and a velocity prior
    # built from them measurably slows the depth field's convergence
    # (kinectv2_01 gate: converged-pixel peak 86 vs 131-170 without).  The
    # RGB-D preset turns it ON — measured-depth tracking is coherent
    # frame-to-frame and its 256x212 4-level GN is where iterations cost.
    warm_start: bool = False
    warm_start_max_norm: float = 0.5
    # Iteration driver: True runs the GN loop as a ``lax.while_loop`` that
    # exits at convergence — the reference's post-update break
    # (tracker.cpp:68-73) as a real device-side early exit (typical
    # convergence is 3-6 of the 15 iterations).  False runs a fixed-length
    # ``lax.scan`` with a freeze mask: identical results, constant cost.
    early_exit: bool = True
    # GN linearization backend: "auto" (pallas on TPU, xla elsewhere),
    # "xla" (gather-based, exact reference sampling semantics) or "pallas"
    # (fused VMEM kernel, MXU one-hot sampling with clamp-to-edge borders —
    # see ops/pallas/gn.py).  Backed by loop-amortized measurement
    # (bench_probe2.py -> PROBE_r03.json); round-2's single-dispatch
    # numbers were swamped by the dev tunnel's ~29 ms RTT and are void.
    backend: str = "auto"
    # Matmul mode for the Pallas kernel's one-hot sampling contractions:
    # "high" (default) = 3 bf16 MXU passes (a manual hi/lo split omitting
    # the lo*lo term, since Mosaic lowers lax.Precision.HIGH to a single
    # pass inside kernels) — NOT bit-identical to f32: sampled intensities
    # carry ~2^-18 relative error vs HIGHEST, and the converged pose agrees
    # with the XLA twin to ~1e-4 twist norm rather than 1e-5
    # (tests/test_pallas.py parity tolerances measure this boundary);
    # "bf16" = one pass, fastest, but the ~2^-9 sample
    # quantization measurably biases the CONVERGED pose (the GN optimum of
    # a quantized photometric cost moves; see
    # tests/test_pallas.py::test_pallas_gn_bf16_close_to_f32), so it is
    # opt-in throughput mode, not the default — unlike the epipolar
    # kernel, whose SSD accept threshold (0.1/window) dwarfs the rounding;
    # "f32" = HIGHEST (6 passes) for exact-parity tests vs the XLA twin.
    # Corner-validity thresholds are relaxed to 0.99 under bf16.
    pallas_precision: str = "high"
    # y-window rows gathered per 8-row block in the Pallas kernel's one-hot
    # sampling matmul (ops/pallas/gn.py): the matmul costs O(rows * Wimg)
    # MACs per sampled row, and warped points cluster vertically once the
    # coarser levels have aligned, so a 32-row window around their mean cuts
    # the dominant contraction by full_h/32 (3.75x at 160x120, 6.6x at
    # 256x212).  Points outside the window are invalidated (identical
    # math, slightly fewer valid pixels for extreme warps).  <= 0 disables
    # (exact full-image gather, used by parity tests).
    # Measured robustness boundary (test_pallas_gn_window_large_rotation):
    # a 20-deg in-plane roll at 160x120 spreads a block's warped rows over
    # ~55 > 32 window rows and excludes ~27% of finest-level pixels, yet
    # tracking converges to the same pose as the exact gather (~1e-4); at
    # 23 deg BOTH modes diverge identically — the coarse-to-fine
    # photometric basin, not the window, is the binding constraint.
    gather_window: int = 32


@dataclasses.dataclass(frozen=True)
class DepthFilterConfig:
    """Gaussian inverse-variance depth fusion.  Reference src/math/gaussian.cpp."""

    # Compatibility gate: reject an observation if |d - mu| > gain * max(sigma, s)
    # where gain ramps 0.5 -> 1.0 over 0.8 m of min(d, |d - mu|)
    # (gaussian.cpp:19-21).
    gain_ramp: float = 0.8
    # On rejection in update(): reset depth to a uniform random draw capped at
    # 4.0 m and sigma to 0.5 (gaussian.cpp:22-25).  The reference constructs
    # uniform_real_distribution(2.0, 0.5) with reversed bounds — UB that in
    # practice (libstdc++) draws from [2.0, 0.5) "backwards"; we draw from
    # [0.5, 2.0] which is the evident intent (SURVEY.md §7 quirks).
    reset_depth_range: Tuple[float, float] = (0.5, 2.0)
    reset_depth_cap: float = 4.0
    reset_sigma: float = 0.5


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Keyframe policy + epipolar depth backend.

    Reference: src/map/mapper.cpp:12-13,90,122; src/map/implement.cpp:12-20.
    """

    min_movement: float = 0.02        # mapper.cpp:12 MINIMUM_MOVEMENT [m]
    max_forward: int = 6              # mapper.cpp:13 MAXIMUM_FORWARD [frames]
    # Depth-update crop: keep x in [16, 144], y in [12, 108] inclusive
    # (mapper.cpp:90, absolute pixels).
    crop_x: Tuple[int, int] = (16, 144)
    crop_y: Tuple[int, int] = (12, 108)
    # Epipolar search (implement.cpp)
    luminance_sigma: float = 0.5      # implement.cpp:12
    epipolar_sigma: float = 0.5       # implement.cpp:14
    predict_sigma: float = 0.06       # implement.cpp:17 [m]
    matching_threshold_ratio: float = 0.1   # implement.cpp:20
    ssd_window: int = 3               # implement.cpp:118 N
    max_steps: int = 100              # implement.cpp:141 step cap
    min_search_depth: float = 0.10    # implement.cpp:30 max(depth - sigma, 0.10)
    # Observation acceptance gates (mapper.cpp:122)
    accept_depth: Tuple[float, float] = (0.2, 6.0)
    accept_sigma: Tuple[float, float] = (0.0, 0.5)
    # Regularizer clamps fused depth to <= 6 m (implement.cpp:178).
    max_depth: float = 6.0
    # Keyframe ring-buffer capacity (the reference grows its history without
    # bound, frame.hpp:146-188; a fixed ring keeps shapes static for jit).
    history_capacity: int = 8
    depth_filter: DepthFilterConfig = dataclasses.field(default_factory=DepthFilterConfig)
    # Mapping backend: "auto" (pallas on TPU, xla elsewhere), "xla"
    # (gather-based march, exact reference sampling semantics) or "pallas"
    # (ops/pallas/{epipolar,regularize}.py — fused VMEM kernels for the
    # epipolar march + depth-filter update and the 4-neighbour regularizer).
    # Measured with fetch-synced timing on a v5e (bench_probe.py) the fused
    # kernel beats the gather-based march in and out of pipeline.
    backend: str = "auto"
    # Matmul precision inside the Pallas march kernel: "bf16" runs the
    # one-hot sampling contractions as single-pass bf16 MXU ops (f32
    # accumulate) — sampled intensities carry <= 2^-9 relative quantization,
    # far below the SSD accept threshold (0.1/window, implement.cpp:20) —
    # while "f32" keeps HIGHEST-precision parity with the XLA twin (6 MXU
    # passes per matmul, ~6x slower; used by the parity tests).
    pallas_precision: str = "bf16"
    # y-window rows gathered per row-block in the Pallas march kernel's
    # one-hot sampling matmuls (ops/pallas/epipolar.py): the epipolar
    # segments of one row cluster vertically, so gathering a window around
    # their y-extent instead of every born-keyframe row cuts the dominant
    # contraction by full_h/window (2.5x at 120x160 with 48).  Samples
    # outside the window are invalidated, which can only trim the deepest
    # search hypotheses of unusually steep segments.  <= 0 disables (exact
    # full-image gather, used by parity tests).
    # Measured per-block accuracy boundary under overflow
    # (test_pallas_epipolar_window_large_vertical_motion: segments spanning
    # ~60 rows > the 48 window): observation counts stay within 15% of the
    # exact gather — the window can also *accept* an in-window match where
    # exact found a deeper, threshold-failing minimum — >90% of
    # commonly-observed pixels take identical depths, and the median depth
    # error vs ground truth is unchanged; divergent observations are
    # handled by the depth filter's compatibility gate over later frames.
    gather_window: int = 48
    # Keyframe-ring slots the Pallas march gathers from, newest first: the
    # kernel's sampling matmul spans (4 * slots * gather_window) rows, and
    # most pixels' depth was born in the newest few keyframes, so
    # gathering only the newest N slots (born ages clamped to N-1 — the
    # same approximation the ring itself applies when a pixel outlives
    # the capacity window) cuts the dominant contraction by
    # history_capacity / N.  Pixels older than N-1 keyframes match
    # against the (N-1)-aged keyframe with its geometry — a slightly
    # shorter baseline; wrong matches fail the SSD gate or the depth
    # filter's compatibility gate.  <= 0 disables (exact full-ring
    # gather; the XLA twin is always exact).
    # Default 0 (exact), matching how the other approximations
    # (warm_start, windowing) default reference-faithful; the performance
    # presets (DVOConfig.monocular()) opt into the measured newest-4.
    gather_slots: int = 0


@dataclasses.dataclass(frozen=True)
class InitConfig:
    """Monocular depth bootstrap.  Reference include/system/frame.hpp:12-22."""

    depth_mean: float = 1.5
    depth_std: float = 0.5
    depth_floor: float = 0.5
    sigma: float = 0.5
    # Propagate initializes unobserved destination pixels to depth=1, sigma=1
    # (implement.cpp:229-231).
    propagate_depth: float = 1.0
    propagate_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Windowed photometric bundle adjustment (new capability; no reference
    counterpart — SURVEY.md §7 phase 5)."""

    # Run BA inside the VO pipeline on every keyframe promotion (once the
    # ring holds a full window): refined poses/depths flow back into the
    # keyframe ring and the new reference keyframe.  The hook point mirrors
    # the reference's keyframe-creation path (mapper.cpp:16-33).
    enabled: bool = False
    window: int = 7                   # keyframes per BA window
    iterations: int = 5               # Levenberg-Marquardt outer iterations
    damping: float = 1e-4
    huber_delta: float = 0.1          # photometric robust loss threshold
    depth_damping: float = 1e-3       # ridge on the (diagonal) depth block


@dataclasses.dataclass(frozen=True)
class DVOConfig:
    """Top-level framework configuration."""

    pyramid: PyramidConfig = dataclasses.field(default_factory=PyramidConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    mapper: MapperConfig = dataclasses.field(default_factory=MapperConfig)
    init: InitConfig = dataclasses.field(default_factory=InitConfig)
    ba: BAConfig = dataclasses.field(default_factory=BAConfig)

    @staticmethod
    def monocular() -> "DVOConfig":
        """Monocular mode: 3 levels, input pre-decimated 4x (system.hpp:47).

        The performance preset opts into the newest-4 keyframe-slot gather
        (MapperConfig.gather_slots — measured 2.61 -> 2.34 ms/frame with
        every accuracy gate unchanged, BASELINE.md r4); a bare
        ``DVOConfig()`` stays exact."""
        return DVOConfig(
            pyramid=PyramidConfig(levels=3, culls=2),
            mapper=MapperConfig(gather_slots=4),
        )

    @staticmethod
    def rgbd() -> "DVOConfig":
        """RGB-D tracking mode: 4 levels, 2x decimation (system.hpp:30,82).

        Warm start on: frame-to-frame measured-depth tracking is coherent,
        so the constant-velocity prior cuts executed GN iterations (see
        TrackerConfig.warm_start for why monocular defaults off).

        min_update_norm raised to 1.5e-3 (reference default 5e-4,
        tracker.cpp:16, tuned for its 160x120 mono mode): on real
        512x424 kinect frames the GN updates contract at only ~0.9 per
        iteration and creep from 5e-3 to ~1e-3 over the full 15-iteration
        cap — so the reference threshold never fires and every frame pays
        ~48 executed iterations (measured).  At 1.5e-3 tracking stops
        ~5-8 iterations earlier per level with NO measured accuracy cost
        on the known-motion rigs (KINECT_1DEG rotation 1.052 vs 1.053
        deg/frame; KINECT_50MM translation 30.1 vs 27.8 mm, both deep
        inside the rigs' accuracy bands).  Accuracy-critical callers can
        restore the reference threshold per run.

        pallas_precision "bf16" (round 5): executed GN iterations are
        ~80%% of the RGB-D frame, and the single-pass sampling contraction
        cuts the frame ~10%% (3.22 -> 2.91 ms/frame measured in-session)
        with the rigs unchanged (1DEG median rotation 1.035 -> 1.027
        deg/frame, 50MM translation 33.0 -> 32.8 mm) — measured-depth
        frame-to-frame tracking is insensitive to the ~2^-9 sample
        quantization that biases the noise-bootstrap monocular optimum
        (TrackerConfig.pallas_precision note; mono stays "high").
        gather_window 16 was ALSO tried and measured SLOWER than 32
        (3.09/3.33 vs 2.91/3.22 ms for bf16/high) — refuted, kept 32."""
        return DVOConfig(
            pyramid=PyramidConfig(levels=4, culls=1),
            tracker=TrackerConfig(warm_start=True, min_update_norm=1.5e-3,
                                  pallas_precision="bf16"),
        )


def resolve_backend(backend: str) -> str:
    """Resolve an "auto" kernel-backend choice at trace time: the fused
    Pallas kernels on TPU (bench_probe.py: 3-6x over the gather-based XLA
    twins), the exact-reference-semantics XLA twins everywhere else (CPU /
    interpret-mode Pallas is much slower and only used for parity tests)."""
    if backend != "auto":
        return backend
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


# Invalid-pixel sentinel used at the *host/IO boundary* only (undistortion
# border fill, reference math/util.hpp:7).  Inside device code validity is an
# explicit boolean mask, never a magic value.
INVALID = -2.0
EPSILON = 1e-6
