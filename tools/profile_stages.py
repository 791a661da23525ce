"""Per-stage on-device timing of the flagship tracking step.

Methodology matches bench.py: chain REPS iterations inside one jitted
program, each iteration indexing a DIFFERENT input from a stacked batch
(prevents XLA LICM/algebraic shortcuts). Run on TPU to find the next kernel
to optimize.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_run")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from orbslam_in_practice_tpu.config import SlamConfig
from orbslam_in_practice_tpu.frontend.matcher import search_by_projection
from orbslam_in_practice_tpu.frontend.orb import ORBExtractor
from orbslam_in_practice_tpu.ops.fast import fast_score, nms3x3
from orbslam_in_practice_tpu.ops.pallas_fast import fast_score_nms
from orbslam_in_practice_tpu.ops.image import build_pyramid, gaussian_blur7
from orbslam_in_practice_tpu.ops.orb import (
    brief_descriptors,
    ic_angle,
    select_keypoints,
)
from orbslam_in_practice_tpu.optim.pose_opt import pose_optimization

REPS = 20


def timed(name, fn, *args):
    jitted = jax.jit(fn)
    float(jitted(*args))  # compile; host read forces execution (BENCH_NOTES)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(jitted(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:38s} {best*1e3:8.3f} ms/step")


def chain(stage):
    """stage: (H, W) image -> array; iterates over a stacked (REPS, H, W) batch."""

    def run(batch):
        def body(i, acc):
            img = lax.dynamic_index_in_dim(batch, i, 0, keepdims=False)
            return acc + jnp.sum(stage(img)).astype(jnp.float32)

        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    return run


def main():
    cfg = SlamConfig(n_features=512, n_levels=4, width=640, height=480)
    ext = ORBExtractor(cfg.n_features, cfg.scale_factor, cfg.n_levels, cfg.ini_th_fast, cfg.min_th_fast)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(0, 255, (REPS, cfg.height, cfg.width)), jnp.float32)
    image = batch[0]
    print("backend:", jax.default_backend())

    def full_extract(img):
        f = ext._extract(img)
        return f.xy.sum() + f.desc_packed.astype(jnp.float32).sum()

    timed("extractor (all levels, full)", chain(full_extract), batch)
    timed("pyramid", chain(lambda im: sum(l.sum() for l in build_pyramid(im, cfg.n_levels, cfg.scale_factor))), batch)

    budgets = ext.budgets
    use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        timed("fast+nms L0 (pallas)", chain(lambda im: fast_score_nms(im)), batch)
    timed("fast+nms L0 (jnp)", chain(lambda im: nms3x3(fast_score(im))), batch)

    def sel(im):
        sc = fast_score_nms(im) if use_pallas else nms3x3(fast_score(im))
        yx, r, v = select_keypoints(sc, budgets[0], ext.ini_th, ext.min_th)
        return yx.astype(jnp.float32).sum() + r.sum()

    timed("fast+nms+select L0", chain(sel), batch)

    score0 = fast_score_nms(image) if use_pallas else nms3x3(fast_score(image))
    yx0, _, _ = jax.jit(lambda s: select_keypoints(s, budgets[0], ext.ini_th, ext.min_th))(score0)
    yx0 = jax.block_until_ready(yx0)
    n_kp = yx0.shape[0]
    print(f"(L0 budget = {n_kp} keypoints; 512-kp stage numbers scale ~linearly)")

    timed("ic_angle L0", chain(lambda im: ic_angle(im, yx0)), batch)
    timed("gaussian_blur7 L0", chain(lambda im: gaussian_blur7(im)), batch)

    ang0 = jax.block_until_ready(jax.jit(lambda im: ic_angle(im, yx0))(image))
    timed("brief L0 (incl. blur)", chain(lambda im: brief_descriptors(gaussian_blur7(im), yx0, ang0).astype(jnp.float32)), batch)

    # matcher + pose opt at bench shapes
    frame = jax.block_until_ready(jax.jit(ext._extract)(image))
    n_lm = 1024
    K = jnp.asarray(cfg.cam.K)
    scale_factors = jnp.asarray(np.array([cfg.scale_factor**i for i in range(cfg.n_levels)], np.float32))
    inv_sigma2 = jnp.asarray(ext.inv_level_sigma2)
    lm_pos_b = jnp.asarray(
        np.stack([rng.uniform(-3, 3, (REPS, n_lm)), rng.uniform(-2, 2, (REPS, n_lm)), rng.uniform(4, 9, (REPS, n_lm))], -1),
        jnp.float32,
    )
    lm_desc = jnp.asarray(rng.integers(0, 2, (n_lm, 256)).astype(np.int8) * 2 - 1)
    lm_oct = jnp.zeros(n_lm, jnp.int32)
    Tcw = jnp.eye(4, dtype=jnp.float32)
    lm_valid = jnp.ones(n_lm, bool)

    def match_chain(lm_batch):
        def body(i, acc):
            lm = lax.dynamic_index_in_dim(lm_batch, i, 0, keepdims=False)
            m, d, _ = search_by_projection(
                lm, lm_desc, lm_valid, lm_oct, Tcw, frame, K, jnp.asarray(8.0), scale_factors
            )
            return acc + jnp.sum(m).astype(jnp.float32)

        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    timed("search_by_projection", match_chain, lm_pos_b)

    lm_pos = lm_pos_b[0]
    matches, _, _ = jax.jit(
        lambda: search_by_projection(lm_pos, lm_desc, lm_valid, lm_oct, Tcw, frame, K, jnp.asarray(8.0), scale_factors)
    )()
    obs = jnp.full(frame.n_features, -1, jnp.int32)
    obs = obs.at[jnp.maximum(matches, 0)].max(
        jnp.where(matches >= 0, jnp.arange(n_lm, dtype=jnp.int32), -1)
    )
    has = obs >= 0
    Xw_b = jnp.stack([lm_pos_b[i][jnp.maximum(obs, 0)] for i in range(REPS)])
    inv_s2 = inv_sigma2[jnp.clip(frame.octave, 0, cfg.n_levels - 1)]
    mask = jnp.asarray(np.asarray(has & frame.valid))

    def pose_chain(Xw_batch):
        def body(i, acc):
            Xw = lax.dynamic_index_in_dim(Xw_batch, i, 0, keepdims=False)
            T, inl, n = pose_optimization(Tcw, Xw, frame.xy, inv_s2, mask, K)
            return acc + T.sum() + n.astype(jnp.float32)

        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    timed("pose_optimization", pose_chain, Xw_b)


if __name__ == "__main__":
    main()
