"""Temporal grid stabilization for video, as a jax scan over frames.

Capability parity with reference cv/stabilizer.py: GridStabilizer (:34) —
history of recent corner sets, minimum-detections gate before "stable",
outlier rejection when any corner jumps > max_jump px (:95),
recency-weighted averaging (:112), per-coordinate constant-velocity
Kalman filters (:66, update :140) — and MotionDetector (:251) — coarse
frame-difference gating that pauses processing during motion.

TPU redesign: the stabilizer is a pure function `(state, obs) -> (state,
out)` — 8 tiny Kalman filters become ONE vectorized (8,) filter — and a
whole frame batch is processed with `jax.lax.scan` inside the jit graph;
the reference's per-frame Python deque/loop disappears. A stateful host
wrapper (GridStabilizer) keeps the reference's streaming API for live
use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StabilizerState(NamedTuple):
    x: jnp.ndarray          # (8, 2) Kalman state [pos, vel] per coordinate
    p: jnp.ndarray          # (8, 2, 2) covariance
    last_corners: jnp.ndarray   # (8,) last accepted corner coords (flat)
    n_accepted: jnp.ndarray     # () int32 consecutive accepted detections
    initialized: jnp.ndarray    # () bool


class StabilizedResult(NamedTuple):
    corners: jnp.ndarray    # (4, 2) smoothed corners
    is_stable: jnp.ndarray  # () bool — enough consistent detections
    rejected: jnp.ndarray   # () bool — observation was an outlier


def init_state() -> StabilizerState:
    return StabilizerState(
        x=jnp.zeros((8, 2), jnp.float32),
        p=jnp.tile(jnp.eye(2, dtype=jnp.float32)[None] * 100.0, (8, 1, 1)),
        last_corners=jnp.zeros(8, jnp.float32),
        n_accepted=jnp.asarray(0, jnp.int32),
        initialized=jnp.asarray(False),
    )


def _kalman_step(x, p, z, q=0.01, r=2.0):
    """Constant-velocity Kalman update for one coordinate (vectorized to
    (8,) by the caller). x: (2,), p: (2, 2), z: scalar observation."""
    f = jnp.asarray([[1.0, 1.0], [0.0, 1.0]], jnp.float32)
    h = jnp.asarray([[1.0, 0.0]], jnp.float32)
    x_pred = f @ x
    p_pred = f @ p @ f.T + q * jnp.eye(2)
    innov = z - (h @ x_pred)[0]
    s = (h @ p_pred @ h.T)[0, 0] + r
    k = (p_pred @ h.T)[:, 0] / s
    x_new = x_pred + k * innov
    p_new = (jnp.eye(2) - jnp.outer(k, h[0])) @ p_pred
    return x_new, p_new


def stabilizer_step(
    state: StabilizerState,
    corners: jnp.ndarray,         # (4, 2) observed corners
    found: jnp.ndarray,           # () bool detection valid
    max_jump: float = 50.0,
    min_detections: int = 3,
) -> tuple[StabilizerState, StabilizedResult]:
    """One video frame through the stabilizer (pure; scan/jit friendly)."""
    z = corners.reshape(8).astype(jnp.float32)

    jump = jnp.max(jnp.abs(z - state.last_corners))
    outlier = jnp.logical_and(state.initialized, jump > max_jump)
    accept = jnp.logical_and(found, jnp.logical_not(outlier))

    # First accepted observation initializes the filter at the observed
    # position with zero velocity.
    fresh_x = jnp.stack([z, jnp.zeros_like(z)], axis=1)
    fresh_p = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None] * 10.0, (8, 1, 1))

    kx, kp = jax.vmap(_kalman_step)(state.x, state.p, z)

    first = jnp.logical_and(accept, jnp.logical_not(state.initialized))
    new_x = jnp.where(first[None, None], fresh_x,
                      jnp.where(accept[None, None], kx, state.x))
    new_p = jnp.where(first[None, None, None], fresh_p,
                      jnp.where(accept[None, None, None], kp, state.p))
    new_last = jnp.where(accept, z, state.last_corners)
    new_n = jnp.where(accept, state.n_accepted + 1,
                      jnp.where(found, jnp.asarray(1, jnp.int32),
                                jnp.asarray(0, jnp.int32)))
    new_init = jnp.logical_or(state.initialized, accept)

    smoothed = jnp.where(new_init, new_x[:, 0], z).reshape(4, 2)
    result = StabilizedResult(
        corners=smoothed,
        is_stable=new_n >= min_detections,
        rejected=jnp.logical_and(found, outlier),
    )
    return StabilizerState(new_x, new_p, new_last, new_n, new_init), result


def stabilize_sequence(
    corners_seq: jnp.ndarray,     # (T, 4, 2)
    found_seq: jnp.ndarray,       # (T,) bool
    max_jump: float = 50.0,
    min_detections: int = 3,
):
    """Batched-video smoothing: lax.scan over the frame axis."""

    def step(state, obs):
        c, f = obs
        return stabilizer_step(state, c, f, max_jump, min_detections)

    return jax.lax.scan(step, init_state(), (corners_seq, found_seq))[1]


class GridStabilizer:
    """Streaming host wrapper with the reference's API
    (reference cv/stabilizer.py:34 update/reset)."""

    def __init__(self, max_jump: float = 50.0, min_detections: int = 3):
        self.max_jump = max_jump
        self.min_detections = min_detections
        self._step = jax.jit(
            lambda s, c, f: stabilizer_step(s, c, f, max_jump,
                                            min_detections))
        self.reset()

    def reset(self):
        self._state = init_state()

    def update(self, corners: np.ndarray, found: bool = True):
        self._state, result = self._step(
            self._state, jnp.asarray(corners, jnp.float32).reshape(4, 2),
            jnp.asarray(bool(found)))
        return StabilizedResult(
            corners=np.asarray(result.corners),
            is_stable=bool(result.is_stable),
            rejected=bool(result.rejected),
        )


class MotionDetector:
    """Coarse frame-difference motion gate (reference cv/stabilizer.py:251).

    Downsamples to ~160x120 on device, thresholds the mean absolute
    difference against the previous frame.
    """

    def __init__(self, threshold: float = 8.0, target: int = 160):
        self.threshold = threshold
        self.target = target
        self._prev = None

        @jax.jit
        def diff(a, b):
            return jnp.mean(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))

        self._diff = diff

    def _small(self, gray: np.ndarray) -> jnp.ndarray:
        from sudoku_vision_tpu.cv.grid import _avg_pool

        f = max(1, gray.shape[1] // self.target)
        return _avg_pool(jnp.asarray(gray), f)

    def update(self, gray: np.ndarray) -> bool:
        """True when the scene is in motion (processing should pause)."""
        small = self._small(gray)
        if self._prev is None or self._prev.shape != small.shape:
            self._prev = small
            return False
        d = float(self._diff(self._prev, small))
        self._prev = small
        return d > self.threshold
