"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS over image strips.

The jnp path (ops/fast.py) materializes 16 rolled image copies in HBM; this
kernel streams the image ONCE: each grid step DMAs a row strip (+4px halo)
from HBM into VMEM scratch and computes the margin/arc/NMS pipeline entirely
on-chip with static slices — the memory-bound hot loop of the front-end
(reference hot path src/ORBextractor.cpp:745-786, SURVEY.md §3.2) at HBM
speed-of-light.

Numerically identical to ops.fast.fast_score -> nms3x3 on the interior
(parity-tested in tests/test_pallas.py); falls back to interpret mode off
TPU so the same code path runs under the CPU test mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orbslam_in_practice_tpu.ops.fast import _ARC, _CIRCLE

_STRIP = 32  # rows per grid step (VMEM working set ~ 16 margin arrays)
_HALO = 4  # 3 (circle radius) + 1 (NMS)


def _kernel(h_img, w_img, img_hbm, out_ref, scratch, sem):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * _STRIP, _STRIP + 2 * _HALO), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    h = _STRIP + 2  # score region height (1px NMS margin)
    w = scratch.shape[1] - 2 * _HALO + 2  # score region width
    center = scratch[3 : 3 + h, 3 : 3 + w]

    # bright/dark margins for the 16 circle neighbors (static slices)
    margins = []
    for dx, dy in _CIRCLE:
        neigh = scratch[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w]
        margins.append(neigh - center)

    # circular window-min of length 9 via a doubling tree (64 combines
    # instead of 256 for both polarities): min9(k) = min(min8(k), m(k+8));
    # the darker polarity's window-min is -window-max of the same margins.
    def win9(ms, op):
        x2 = [op(ms[k], ms[(k + 1) % 16]) for k in range(16)]
        x4 = [op(x2[k], x2[(k + 2) % 16]) for k in range(16)]
        x8 = [op(x4[k], x4[(k + 4) % 16]) for k in range(16)]
        return [op(x8[k], ms[(k + 8) % 16]) for k in range(16)]

    def fold_max(xs):
        while len(xs) > 1:
            xs = [jnp.maximum(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)] + (
                [xs[-1]] if len(xs) % 2 else []
            )
        return xs[0]

    bright = fold_max(win9(margins, jnp.minimum))
    # dark score = max_k min_{j∈win k}(-m_j) = max_k(-winmax_k) = -min_k winmax_k
    dark = fold_max([-w_ for w_ in win9(margins, jnp.maximum)])
    score = jnp.maximum(jnp.maximum(bright, dark), 0.0)

    # zero scores outside the valid 3px-interior of the ORIGINAL image so
    # border pixels never win or suppress in NMS (matches ops.fast semantics:
    # fast_score zeroes the border BEFORE nms3x3)
    row0 = i * _STRIP - 1  # global image row of score-region row 0
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (h, w - 2 + 2), 0)
    cols = -1 + jax.lax.broadcasted_iota(jnp.int32, (h, w - 2 + 2), 1)
    valid = (rows >= 3) & (rows < h_img - 3) & (cols >= 3) & (cols < w_img - 3)
    score = jnp.where(valid, score, 0.0)

    # 3x3 NMS within the strip (halo rows give cross-strip correctness)
    pooled = None
    for dy in range(3):
        for dx in range(3):
            s = score[dy : dy + _STRIP, dx : dx + w - 2]
            pooled = s if pooled is None else jnp.maximum(pooled, s)
    inner = score[1 : 1 + _STRIP, 1 : 1 + w - 2]
    out_ref[:] = jnp.where(inner >= pooled, inner, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "h_img", "w_img"))
def _run(padded: jnp.ndarray, interpret: bool, h_img: int, w_img: int):
    hp, wp = padded.shape
    n_strips = (hp - 2 * _HALO) // _STRIP
    out_w = wp - 2 * _HALO
    return pl.pallas_call(
        functools.partial(_kernel, h_img, w_img),
        grid=(n_strips,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_STRIP, out_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp - 2 * _HALO, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_STRIP + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)


def fast_score_nms(img: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """NMS'd FAST score map via the fused Pallas kernel.

    img: (H, W) float32. Returns (H, W); the 3px border is zero (same
    contract as ops.fast.fast_score + nms3x3).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = img.shape
    hp = -(-h // _STRIP) * _STRIP
    # lane-align the padded width
    wp = -(-(w + 2 * _HALO) // 128) * 128
    padded = jnp.zeros((hp + 2 * _HALO, wp), jnp.float32)
    padded = padded.at[_HALO : _HALO + h, _HALO : _HALO + w].set(img)
    out = _run(padded, bool(interpret), h, w)[:h, :w]
    # zero the 3px border (circle would read zero padding there)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, out, 0.0)
