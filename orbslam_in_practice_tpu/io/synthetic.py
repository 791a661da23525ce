"""Synthetic rendered sequences with ground truth (SURVEY.md §4.2).

Renders a random 3D point cloud of textured square blobs through a moving
pinhole camera — enough corner structure for the ORB front-end, with exact
ground-truth trajectory for end-to-end ATE tests and benchmarks (no real
datasets are available in this environment; the loaders for TUM/KITTI/EuRoC
formats live in io/datasets.py).
"""

from __future__ import annotations

import numpy as np

from orbslam_in_practice_tpu.geometry import se3

import jax.numpy as jnp


def make_trajectory(
    n_frames: int,
    kind: str = "strafe",
    step: float = 0.04,
    orbit_step: float | None = None,
):
    """Ground-truth Tcw per frame. Kinds: strafe (lateral), forward (FOE
    motion after a sideways lead-in for parallax), orbit (circle that
    revisits its start — loop-closure regime), rotation (yaw-dominant)."""
    poses = []
    for i in range(n_frames):
        T = np.eye(4, dtype=np.float32)
        if kind == "strafe":
            t_wc = np.array([i * step, 0.02 * np.sin(i * 0.2), 0.0])
            yaw = 0.01 * np.sin(i * 0.15)
        elif kind == "forward":
            t_wc = np.array([0.15 * np.sin(i * 0.08), 0.0, i * step])
            yaw = 0.02 * np.sin(i * 0.1)
        elif kind == "orbit":
            ang = i * (orbit_step if orbit_step is not None else step * 0.2)
            t_wc = np.array([3.0 * np.sin(ang), 0.0, 3.0 * (1 - np.cos(ang))])
            yaw = -ang
        elif kind == "rotation":
            # rotation-dominant: slow lateral drift + strong sinusoidal yaw
            t_wc = np.array([i * step * 0.5, 0.0, 0.0])
            yaw = 0.35 * np.sin(i * 0.08)
        else:
            raise ValueError(kind)
        R_wc = np.asarray(
            se3.exp_so3(jnp.asarray([0.0, yaw, 0.0], dtype=jnp.float32))
        )
        # Tcw = inverse of [R_wc | t_wc]
        T[:3, :3] = R_wc.T
        T[:3, 3] = -R_wc.T @ t_wc
        poses.append(T)
    return np.stack(poses)


class SyntheticSequence:
    """Renderable scene: world points with intensity/size attributes."""

    def __init__(
        self,
        n_frames: int = 60,
        n_points: int = 600,
        width: int = 640,
        height: int = 480,
        fx: float = 500.0,
        fy: float = 500.0,
        kind: str = "strafe",
        seed: int = 0,
        depth_range: tuple = (3.0, 9.0),
        spread: tuple = (6.0, 4.5),
        orbit_step: float | None = None,
        noise_sigma: float = 0.0,
        brightness_jitter: float = 0.0,
    ):
        rng = np.random.default_rng(seed)
        self.width, self.height = width, height
        self.seed = seed
        self.noise_sigma = noise_sigma
        self.brightness_jitter = brightness_jitter
        self.K = np.array(
            [[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], np.float32
        )
        self.poses = make_trajectory(n_frames, kind, orbit_step=orbit_step)
        self.n_frames = n_frames
        # scene sized to stay visible along the trajectory
        centers_w = np.stack(
            [-(T[:3, :3].T @ T[:3, 3]) for T in self.poses]
        )
        lo = centers_w.min(axis=0)
        hi = centers_w.max(axis=0)
        self.pts = np.stack(
            [
                rng.uniform(lo[0] - spread[0], hi[0] + spread[0], n_points),
                rng.uniform(lo[1] - spread[1], hi[1] + spread[1], n_points),
                rng.uniform(lo[2] + depth_range[0], hi[2] + depth_range[1], n_points),
            ],
            axis=-1,
        ).astype(np.float32)
        self.intensity = rng.uniform(90, 250, n_points).astype(np.float32)
        self.size_m = rng.uniform(0.02, 0.06, n_points).astype(np.float32)
        self.background = 25.0

    def gt_centers(self) -> np.ndarray:
        """(T, 3) ground-truth camera centers (world)."""
        return np.stack([-(T[:3, :3].T @ T[:3, 3]) for T in self.poses])

    def render(self, i: int) -> np.ndarray:
        """(H, W) float32 grayscale frame i."""
        T = self.poses[i]
        pc = self.pts @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        vis = z > 0.5
        img = np.full((self.height, self.width), self.background, np.float32)
        u = self.K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + self.K[1, 2]
        half = np.maximum(
            (self.K[0, 0] * self.size_m / np.maximum(z, 1e-6)).astype(np.int32), 1
        )
        order = np.argsort(-z)  # far first, near overwrites
        for j in order:
            if not vis[j]:
                continue
            uj, vj, h = int(round(u[j])), int(round(v[j])), int(half[j])
            if uj + h < 0 or uj - h >= self.width or vj + h < 0 or vj - h >= self.height:
                continue
            y0, y1 = max(vj - h, 0), min(vj + h + 1, self.height)
            x0, x1 = max(uj - h, 0), min(uj + h + 1, self.width)
            img[y0:y1, x0:x1] = self.intensity[j]
        if self.brightness_jitter > 0.0 or self.noise_sigma > 0.0:
            # deterministic per-frame degradation (real-data-shaped: sensor
            # noise + exposure changes; VERDICT round 1 item 7)
            frng = np.random.default_rng((self.seed + 1) * 100003 + i)
            if self.brightness_jitter > 0.0:
                gain = 1.0 + self.brightness_jitter * float(
                    frng.uniform(-1.0, 1.0)
                )
                img = img * gain
            if self.noise_sigma > 0.0:
                img = img + frng.normal(
                    0.0, self.noise_sigma, img.shape
                ).astype(np.float32)
            img = np.clip(img, 0.0, 255.0)
        return img
