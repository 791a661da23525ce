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


def test_pallas_patch_features_matches_jnp(rng):
    """Fused angle+blur+BRIEF kernel vs the jnp reference pipeline."""
    from orbslam_in_practice_tpu.ops.hamming import unpack_bits
    from orbslam_in_practice_tpu.ops.image import gaussian_blur7
    from orbslam_in_practice_tpu.ops.orb import brief_descriptors, ic_angle
    from orbslam_in_practice_tpu.ops.pallas_patch import orb_patch_features

    img = jnp.asarray(rng.uniform(0, 255, size=(120, 161)).astype(np.float32))
    n = 21  # non-multiple of the kernel's block size
    yx = jnp.asarray(
        np.stack(
            [rng.integers(20, 100, n), rng.integers(20, 140, n)], axis=-1
        ).astype(np.int32)
    )
    ang_p, bits_p = orb_patch_features(img, yx, interpret=True)
    ang_j = ic_angle(img, yx)
    bits_j = unpack_bits(brief_descriptors(gaussian_blur7(img), yx, ang_j))
    assert np.abs(np.asarray(ang_p) - np.asarray(ang_j)).max() < 1e-3
    # bit-exact in interpret mode (on TPU hardware tiny angle rounding can
    # flip pattern-point rounding; tested there via the bench path)
    assert (np.asarray(bits_p) != np.asarray(bits_j)).mean() < 0.005


def test_pallas_patch_features_border_keypoints(rng):
    """Keypoints at the exact 19px border and invalid zero entries are safe."""
    from orbslam_in_practice_tpu.ops.pallas_patch import orb_patch_features

    img = jnp.asarray(rng.uniform(0, 255, size=(96, 128)).astype(np.float32))
    yx = jnp.asarray(
        np.array(
            [[19, 19], [96 - 20, 128 - 20], [19, 128 - 20], [96 - 20, 19], [0, 0]],
            np.int32,
        )
    )
    ang, bits = orb_patch_features(img, yx, interpret=True)
    assert np.all(np.isfinite(np.asarray(ang)))
    assert bits.shape == (5, 256)
