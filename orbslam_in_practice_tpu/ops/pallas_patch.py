"""Pallas TPU kernel: fused per-keypoint ORB feature pipeline.

One kernel replaces the three per-keypoint hot stages of the extractor
(reference hot path src/ORBextractor.cpp:27-97 IC_Angle +
computeOrbDescriptor, and the GaussianBlur at :1046):

  patch slice -> intensity-centroid orientation -> in-patch 7x7 Gaussian
  blur -> rotated-BRIEF sampling -> 256 comparison bits

Why this shape: XLA lowers the per-keypoint patch gathers (vmapped
dynamic_slice / take) to scalar-ish gathers — measured ~4 ms for 512
keypoints at 640x480, the dominant cost of the whole tracking step. Here
the (edge-padded) level image is kept resident in VMEM — a VGA level is
~1.6 MB, far under the 16 MB budget — and each keypoint's (56, 256) patch
is a tile-aligned VMEM slice (row start rounded to the 8-sublane tile,
col start to the 128-lane tile; the keypoint's in-patch position is
dynamic). Everything else is static-shaped VPU/MXU work:

  - orientation moments: masked sums over the 31x31 disc (VPU),
  - blur: 7+7 statically-shifted weighted adds (VPU, exact f32 — the jnp
    conv path rounds through bf16),
  - BRIEF sampling: the rotated pattern's 512 samples become a one-hot
    column-select matmul (50, 250) @ (250, 512) on the MXU followed by a
    row-mask sublane reduction — no gather instruction anywhere.

The kernel needs no full-image blur pass at all: blurring happens inside
the patch, on exactly the pixels the descriptor reads.

Numerics match ops/orb.py's jnp path to float32 accuracy; comparison bits
can differ only where a pattern pair's blurred intensities tie to ~1e-4
(parity-tested in tests/test_pallas.py). Falls back to interpret mode off
TPU so the same code path runs under the CPU test mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam_in_practice_tpu.ops.image import _gauss_kernel7
from orbslam_in_practice_tpu.ops.orb import DESC_R, PATCH_R
from orbslam_in_practice_tpu.ops.orb_pattern import ORB_PATTERN

BLK = 8  # keypoints per grid step
_ROWS = 56  # patch rows: keypoint local row in [22, 30), ±22 reach fits
_LANES = 256  # patch cols: keypoint local col in [64, 192), ±22 reach fits
_PAD_R = 24  # image row padding (top; bottom gets +10 more), edge-replicated
_PAD_C = 64  # image col padding (left & right), edge-replicated
_BROWS = 50  # blurred rows (patch rows 3..52)
_BCOLS = 250  # blurred cols (patch cols 3..252)
_NS = 512  # samples per keypoint (256 pattern pairs x 2)


def _pattern_arrays():
    pat = np.asarray(ORB_PATTERN, dtype=np.float32)  # (256, 2, 2) [(x, y)]
    px = np.concatenate([pat[:, 0, 0], pat[:, 1, 0]])  # (512,)
    py = np.concatenate([pat[:, 0, 1], pat[:, 1, 1]])
    return px.reshape(1, _NS), py.reshape(1, _NS)


def _kernel(gauss7, yx_ref, px_ref, py_ref, img_ref, bits_ref, cs_ref):
    i = pl.program_id(0)
    k7 = gauss7  # python tuple of 7 float weights

    bit_rows = []
    cs_rows = []
    for k in range(BLK):
        y = yx_ref[i * BLK + k, 0]
        x = yx_ref[i * BLK + k, 1]
        # tile-aligned patch origin in the padded image; the keypoint sits at
        # dynamic local (kr, kc) with kr in [22, 30), kc in [64, 192)
        row0 = y + (_PAD_R - 22)
        row0a = pl.multiple_of(row0 - jax.lax.rem(row0, 8), 8)
        col0 = pl.multiple_of((x // 128) * 128, 128)
        kr = 22 + jax.lax.rem(row0, 8)
        kc = _PAD_C + jax.lax.rem(x, 128)
        patch = img_ref[pl.ds(row0a, _ROWS), pl.ds(col0, _LANES)]  # (56, 256)

        # --- orientation: intensity-centroid over the 31x31 disc ---
        rr = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0)
        cc_i = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
        dy = (rr - kr).astype(jnp.float32)
        dx = (cc_i - kc).astype(jnp.float32)
        disc = (dx * dx + dy * dy <= float(PATCH_R * PATCH_R)).astype(jnp.float32)
        m10 = jnp.sum(patch * (dx * disc))
        m01 = jnp.sum(patch * (dy * disc))
        r = jnp.sqrt(m10 * m10 + m01 * m01)
        safe = r > 0.0
        inv = jnp.where(safe, 1.0 / jnp.where(safe, r, 1.0), 0.0)
        ca = jnp.where(safe, m10 * inv, 1.0)
        sa = jnp.where(safe, m01 * inv, 0.0)

        # --- 7x7 separable blur inside the patch ---
        rows = k7[0] * patch[0:_BROWS, :]
        for t in range(1, 7):
            rows = rows + k7[t] * patch[t : t + _BROWS, :]
        blurred = k7[0] * rows[:, 0:_BCOLS]
        for t in range(1, 7):
            blurred = blurred + k7[t] * rows[:, t : t + _BCOLS]
        # blurred[r, c] = blur(patch[r+3, c+3]); (50, 250)

        # --- rotated-BRIEF sampling: one-hot column-select matmul (MXU)
        # followed by a row-mask sublane reduction; samples live on lanes ---
        rx = jnp.round(px_ref[:] * ca - py_ref[:] * sa).astype(jnp.int32)  # (1, 512)
        ry = jnp.round(px_ref[:] * sa + py_ref[:] * ca).astype(jnp.int32)
        rx = jnp.clip(rx, -DESC_R, DESC_R)
        ry = jnp.clip(ry, -DESC_R, DESC_R)
        srow = ry + (kr - 3)  # row in blurred coords
        scol = rx + (kc - 3)  # col in blurred coords
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (_BCOLS, _NS), 0)
        colsel = (col_iota == scol).astype(jnp.float32)  # (250, 512) one-hot
        # HIGHEST keeps the selected intensities at f32 accuracy so
        # comparison bits don't flip on close pairs (Mosaic supports only
        # DEFAULT/HIGHEST); the matmul is small enough that the extra MXU
        # passes don't show up in the step time
        m1 = jnp.dot(
            blurred,
            colsel,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (50, 512)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (_BROWS, _NS), 0)
        vals = jnp.sum(
            jnp.where(row_iota == srow, m1, 0.0), axis=0, keepdims=True
        )  # (1, 512)

        bits = (vals[:, 0:256] < vals[:, 256:_NS]).astype(jnp.int32)  # (1, 256)
        bit_rows.append(bits)
        one = jnp.ones((1, 1), jnp.float32)
        cs_rows.append(jnp.concatenate([ca * one, sa * one], axis=1))  # (1, 2)

    bits_ref[:, :] = jnp.concatenate(bit_rows, axis=0)  # (BLK, 256)
    cs_ref[:, :] = jnp.concatenate(cs_rows, axis=0)  # (BLK, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(padded, yx, px, py, interpret):
    n = yx.shape[0]
    n_blocks = n // BLK
    gauss7 = tuple(float(v) for v in _gauss_kernel7(2.0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(index_map=lambda i, yx: (0, 0), memory_space=pltpu.VMEM),  # px
            pl.BlockSpec(index_map=lambda i, yx: (0, 0), memory_space=pltpu.VMEM),  # py
            # the whole padded level image stays resident in VMEM
            pl.BlockSpec(index_map=lambda i, yx: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK, 256), lambda i, yx: (i, 0)),
            pl.BlockSpec((BLK, 2), lambda i, yx: (i, 0)),
        ],
    )
    bits, cs = pl.pallas_call(
        functools.partial(_kernel, gauss7),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 256), jnp.int32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
        ],
        interpret=interpret,
    )(yx, px, py, padded)
    return bits, cs


def orb_patch_features(img: jnp.ndarray, yx: jnp.ndarray, interpret: bool | None = None):
    """Fused angle + blur + BRIEF for keypoints of one pyramid level.

    img: (H, W) float32 raw level image. yx: (N, 2) int32 keypoint coords
    (rows, cols; invalid entries may be 0). Returns (angle (N,) f32 radians,
    bits (N, 256) uint8) — same contract as ic_angle + gaussian_blur7 +
    brief_descriptors on the jnp path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = yx.shape[0]
    n_pad = -(-n // BLK) * BLK
    if n_pad != n:
        yx = jnp.concatenate(
            [yx, jnp.zeros((n_pad - n, 2), jnp.int32)], axis=0
        )
    h, w = img.shape
    wp = -(-(w + 2 * _PAD_C) // 128) * 128
    # rows: top pad 24; bottom pad sized so the 8-aligned 56-row window of a
    # keypoint at y=H-1 stays in bounds (row0a+56 <= y+58 <= H+57), then
    # rounded up to a sublane multiple
    hp = -(-(h + _PAD_R + 34) // 8) * 8
    padded = jnp.pad(img, ((_PAD_R, hp - h - _PAD_R), (_PAD_C, wp - w - _PAD_C)), mode="edge")
    px, py = _pattern_arrays()
    bits, cs = _run(padded, yx, jnp.asarray(px), jnp.asarray(py), bool(interpret))
    angle = jnp.arctan2(cs[:n, 1], cs[:n, 0])
    return angle, bits[:n].astype(jnp.uint8)
