"""End-to-end: full SLAM pipeline on a synthetic rendered sequence
(SURVEY.md §4.3 — init -> tracking -> mapping -> ATE)."""

import numpy as np
import pytest

from orbslam_in_practice_tpu.config import SlamConfig
from orbslam_in_practice_tpu.io.evaluation import ate_rmse
from orbslam_in_practice_tpu.io.synthetic import SyntheticSequence
from orbslam_in_practice_tpu.system import SlamSystem
from orbslam_in_practice_tpu.slam.tracking import TrackingState


def small_config():
    return SlamConfig(
        fx=500.0, fy=500.0, cx=320.0, cy=240.0,
        width=640, height=480,
        n_features=600, n_levels=4, fps=10.0,
        k_max=64, l_max=8192,
    )


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=40, n_points=700, kind="strafe", seed=3)


def test_e2e_initializes_and_tracks(seq):
    sys = SlamSystem(small_config())
    n_tracked = 0
    for i in range(seq.n_frames):
        pose = sys.track_monocular(seq.render(i), i * 0.1)
        if pose is not None:
            n_tracked += 1
    assert sys.state == TrackingState.OK
    stats = sys.map.stats()
    assert stats["n_kf"] >= 2
    assert stats["n_lm"] > 50
    # at least half the frames tracked (init consumes the first few)
    assert n_tracked > seq.n_frames // 2

    rmse, n_aligned, cov = ate_rmse(sys.get_trajectory(), seq.gt_centers())
    # synthetic scene, exact projections: ATE should be small relative to the
    # ~1.6m trajectory extent
    assert n_aligned > seq.n_frames // 2
    assert rmse < 0.05


def test_e2e_trajectory_export(tmp_path, seq):
    sys = SlamSystem(small_config())
    for i in range(20):
        sys.track_monocular(seq.render(i), i * 0.1)
    tum = tmp_path / "traj_tum.txt"
    kitti = tmp_path / "traj_kitti.txt"
    sys.save_trajectory_tum(str(tum))
    sys.save_trajectory_kitti(str(kitti))
    lines = tum.read_text().strip().splitlines()
    assert len(lines) > 5
    assert len(lines[0].split()) == 8
    klines = kitti.read_text().strip().splitlines()
    assert len(klines[0].split()) == 12


def test_e2e_map_checkpoint(tmp_path, seq):
    sys = SlamSystem(small_config())
    for i in range(20):
        sys.track_monocular(seq.render(i), i * 0.1)
    path = tmp_path / "map.npz"
    sys.save_map(str(path))
    stats_before = sys.map.stats()
    sys2 = SlamSystem(small_config())
    sys2.load_map(str(path))
    assert sys2.map.stats() == stats_before


def test_e2e_fused_matches_unfused(seq):
    """The single-program steady-state step (Tracking._build_fused_steady)
    must track with the same quality as the per-stage host-driven flow, and
    must actually be exercised (not silently falling back)."""
    results = {}
    for fused in (True, False):
        sys = SlamSystem(small_config())
        sys.tracker.use_fused = fused
        for i in range(24):
            sys.track_monocular(seq.render(i), i * 0.1)
        assert sys.state == TrackingState.OK
        results[fused] = ate_rmse(sys.get_trajectory(), seq.gt_centers())[0]
        if fused:
            # the fused program really compiled and ran
            assert len(sys.tracker._fused_cache) == 1
    assert results[True] < 0.05
    assert results[False] < 0.05


def test_e2e_lost_and_relocalize(seq):
    """Kidnapped camera: track, blind the camera until LOST, resume a
    previously seen view, and require recovery (state OK, pose matching the
    earlier estimate in the map's own frame). The reference DECLARED this
    capability but left it empty (include/Tracking.h:45)."""
    sys = SlamSystem(small_config())
    poses = {}
    for i in range(28):
        p = sys.track_monocular(seq.render(i), i * 0.1)
        if p is not None:
            poses[i] = p
    assert sys.state == TrackingState.OK
    assert 20 in poses

    blank = np.zeros((480, 640), np.float32)
    for k in range(3):
        sys.track_monocular(blank, 3.0 + 0.1 * k)
    assert sys.state == TrackingState.LOST

    # resume with a view from the mapped region
    p = sys.track_monocular(seq.render(20), 4.0)
    assert sys.state == TrackingState.OK, "relocalization must recover"
    assert p is not None
    # same image as frame 20 -> the recovered pose must match the earlier
    # estimate (same map, same gauge; the map keeps refining between the two
    # visits, so allow a few percent of the ~1.1-unit trajectory extent)
    assert np.allclose(p[:3, 3], poses[20][:3, 3], atol=0.06), (
        p[:3, 3], poses[20][:3, 3])
    assert np.allclose(p[:3, :3], poses[20][:3, :3], atol=0.05)
    # and tracking must CONTINUE normally after recovery
    p2 = sys.track_monocular(seq.render(21), 4.1)
    assert p2 is not None and sys.state == TrackingState.OK
