"""Pinhole camera with radial-tangential distortion, batched jnp.

Replaces cv::undistortPoints (reference src/Frame.cpp:80-109) and the
projection math scattered through src/Frame.cpp:170-205 (isInFrustum) and
src/Initializer.cpp (CheckRT reprojection) with closed forms.

Distortion model: 5-coefficient radtan (k1, k2, p1, p2, k3), the schema the
reference reads from YAML (src/Tracking.cpp:17-29).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class CameraIntrinsics(NamedTuple):
    """Static intrinsics shared by all frames (reference src/Frame.cpp:7-8)."""

    fx: float
    fy: float
    cx: float
    cy: float
    dist: tuple  # (k1, k2, p1, p2, k3)
    width: int
    height: int

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(d) > 1e-12 for d in self.dist)


def project(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2) (no distortion).

    Matches the reference's undistorted-keypoint convention: matching and BA
    operate on undistorted pixel coordinates.
    """
    z = pts_cam[..., 2:3]
    xy = pts_cam[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = fx * xy[..., 0] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def unproject(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> normalized image-plane coords (..., 2)."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def distort_radtan(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2).

    dist = (k1, k2, p1, p2, k3).
    """
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    K: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray, iters: int = 10
) -> jnp.ndarray:
    """Undistort pixel points (..., 2) -> undistorted pixel points (..., 2).

    Fixed-point iteration (the same scheme cv::undistortPoints uses), a
    static-iteration jit-friendly replacement for the reference's OpenCV call
    at src/Frame.cpp:98. Returns pixel coordinates re-projected through K.
    """
    xy_d = unproject(K, uv)

    def body(_, xy):
        k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_u = (xy_d[..., 0] - dx) / radial
        y_u = (xy_d[..., 1] - dy) / radial
        return jnp.stack([x_u, y_u], axis=-1)

    xy_u = lax.fori_loop(0, iters, body, xy_d)
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    u = fx * xy_u[..., 0] + cx
    v = fy * xy_u[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def compute_image_bounds(cam: CameraIntrinsics) -> tuple:
    """Undistorted image bounds (min_x, max_x, min_y, max_y).

    Implements the intended semantics of the reference's FindimageBound
    (src/Frame.cpp:111-142), which had corner-assignment and min/max bugs
    (SURVEY.md §2.4); here the four undistorted corners give true min/max.
    """
    if not cam.has_distortion:
        return 0.0, float(cam.width), 0.0, float(cam.height)
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=jnp.float32,
    )
    und = undistort_points(cam.K, jnp.array(cam.dist, dtype=jnp.float32), corners)
    min_x = float(jnp.min(und[:, 0]))
    max_x = float(jnp.max(und[:, 0]))
    min_y = float(jnp.min(und[:, 1]))
    max_y = float(jnp.max(und[:, 1]))
    return min_x, max_x, min_y, max_y
