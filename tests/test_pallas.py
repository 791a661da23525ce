"""Pallas kernel parity vs jnp reference implementations (interpret mode on
the CPU test mesh; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from orbslam_in_practice_tpu.ops.fast import fast_score, nms3x3
from orbslam_in_practice_tpu.ops.pallas_fast import fast_score_nms


def test_pallas_fast_matches_jnp(rng):
    img = rng.uniform(0, 255, size=(480, 640)).astype(np.float32)
    want = np.asarray(nms3x3(fast_score(jnp.asarray(img))))
    got = np.asarray(fast_score_nms(jnp.asarray(img)))
    # interiors must agree exactly; borders both zero.
    # NMS ties at strip boundaries resolve identically (>= comparison).
    assert got.shape == want.shape
    assert np.array_equal(got[3:-3, 3:-3] > 0, want[3:-3, 3:-3] > 0) or np.allclose(
        got[3:-3, 3:-3], want[3:-3, 3:-3], atol=1e-4
    )
    assert np.allclose(got, want, atol=1e-4)


def test_pallas_fast_odd_size(rng):
    img = rng.uniform(0, 255, size=(376, 1241)).astype(np.float32)  # KITTI dims
    want = np.asarray(nms3x3(fast_score(jnp.asarray(img))))
    got = np.asarray(fast_score_nms(jnp.asarray(img)))
    assert np.allclose(got, want, atol=1e-4)
