"""Distributed BA on a virtual 8-device CPU mesh (SURVEY.md §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_in_practice_tpu.geometry import se3
from orbslam_in_practice_tpu.optim.ba import BAProblem, build_point_obs, bundle_adjustment
from orbslam_in_practice_tpu.parallel.dist_ba import (
    dist_bundle_adjustment,
    partition_ba_problem,
)
from jax.sharding import Mesh

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], dtype=np.float32)


def make_problem(rng, n_cams=6, n_pts=256):
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-3, 3, n_pts), rng.uniform(5, 12, n_pts)],
        axis=-1,
    ).astype(np.float32)
    poses = []
    for c in range(n_cams):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            se3.exp_so3(jnp.asarray(rng.normal(size=3) * 0.02, dtype=jnp.float32))
        )
        T[:3, 3] = np.array([0.25 * c, 0.01 * c, 0.0])
        poses.append(T)
    poses = np.stack(poses)
    obs_cam, obs_point, obs_uv = [], [], []
    for c in range(n_cams):
        pc = pts @ poses[c][:3, :3].T + poses[c][:3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) * np.diag(K)[:2] + K[:2, 2]
        for p in range(n_pts):
            obs_cam.append(c)
            obs_point.append(p)
            obs_uv.append(uv[p])
    return (
        poses,
        pts,
        np.asarray(obs_cam, np.int32),
        np.asarray(obs_point, np.int32),
        np.asarray(obs_uv, np.float32),
    )


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    return Mesh(devs, ("d",))


def test_dist_ba_matches_single_device(rng, mesh):
    poses_true, pts, obs_cam, obs_point, obs_uv = make_problem(rng)
    n_cams = len(poses_true)
    # perturb
    poses0 = poses_true.copy()
    poses0[2:] = np.asarray(
        se3.exp_se3(jnp.asarray(rng.normal(size=(n_cams - 2, 6)) * 0.03, dtype=jnp.float32))
    ) @ poses0[2:]
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.08
    fixed = np.zeros(n_cams, bool)
    fixed[0] = fixed[1] = True

    prob = partition_ba_problem(
        poses0, pts0, obs_cam, obs_point, obs_uv,
        np.ones(len(obs_cam), np.float32), fixed, K, n_shards=8,
    )
    poses_est, pts_est = dist_bundle_adjustment(prob, mesh, iterations=15)
    poses_est = np.asarray(poses_est)
    assert np.allclose(poses_est, poses_true, atol=5e-3)
    n_pts = len(pts)
    assert np.allclose(np.asarray(pts_est)[:n_pts], pts, atol=3e-2)


def test_partitioner_preserves_problem(rng, mesh):
    """Single-shard partition == original problem semantics."""
    poses_true, pts, obs_cam, obs_point, obs_uv = make_problem(rng, n_cams=4, n_pts=64)
    fixed = np.zeros(4, bool)
    fixed[0] = fixed[1] = True
    prob = partition_ba_problem(
        poses_true, pts, obs_cam, obs_point, obs_uv,
        np.ones(len(obs_cam), np.float32), fixed, K, n_shards=8,
    )
    # already at optimum: distributed BA must not move it
    poses_est, pts_est = dist_bundle_adjustment(prob, mesh, iterations=3)
    assert np.allclose(np.asarray(poses_est), poses_true, atol=1e-4)
