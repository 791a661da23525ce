"""KITTI-shaped e2e at PRODUCTION map budgets, FULL sequence (VERDICT r3
next #2 / ADVICE r3: the r3 gate stopped at frame 100, just short of the
known tracking loss at ~122 — the gate now covers all 500 frames including
every 90-degree turn).

BASELINE.json config-3 regime: 1241x376, 2,000 features, 8 pyramid levels,
forward driving with smooth 90-degree turns (corridor world with corner
structure and path clearance), sensor noise + exposure jitter, and the
PRODUCTION budgets k_max=256 / l_max=16384 (SlamConfig defaults). Slot
recycling (keyframe AND pressure-driven landmark eviction), the
covisibility vote, and keyframe culling all scale with K and L here.

Round-4 measured reference points (TPU probe, tools/kitti_scale_probe.py,
KITTI500_r04.json): tracked_fraction 0.974 (six 1-frame blips, each
recovered by relocalization within a frame), ATE 0.49% of the 60 m path
without loop closure. Gates are set with ~2-3x headroom against those
measurements (VERDICT r3 next #8: margins must survive fp-scheduling
differences across machines).

Reference intent: the per-frame pipeline surviving full sequences
(/root/reference/src/Tracking.cpp:84-155) and unbounded map growth
(/root/reference/include/Map.h:28-29) inside fixed shapes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.kitti_scale_probe import run  # noqa: E402


@pytest.mark.slow
def test_e2e_kitti_production_budgets_full_sequence():
    result, system = run(n_frames=500, n_features=2000, seed=3)

    assert result["k_max"] == 256 and result["l_max"] == 16384
    # the regime is HELD end-to-end: >= 90% of frames tracked, and no lost
    # segment longer than ~2 s of driving (the system must recover, not
    # merely average well)
    assert result["tracked_fraction"] > 0.9, result["tracked_fraction"]
    long_losses = [
        seg for seg in result["lost_segments"] if seg[1] - seg[0] >= 20 and seg[0] > 10
    ]
    assert not long_losses, result["lost_segments"]
    # monocular drift without loop closure, Sim3-aligned, relative to the
    # driven path (TPU probe measured 0.49%)
    assert result["ate_pct_of_path"] < 1.5, result
    assert result["n_aligned"] > 450

    # the K/L-scaling host paths must stay bounded at production budgets
    st = result["host_stage_ms"]
    assert st["local_map_landmarks"]["p95"] < 60.0, st
    assert st["covisibility"]["p95"] < 60.0, st
    assert st["cull_keyframes"]["p95"] < 250.0, st
    # the map actually grew into the production tables and recycling ran
    assert result["map"]["n_lm"] > 8000, result["map"]
    assert result["map"]["n_kf"] > 100, result["map"]
    # saturation accounting: local BA must not have silently truncated
    assert result["mapper"]["n_ba_truncations"] == 0, result["mapper"]
