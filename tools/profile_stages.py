"""Per-stage on-device timing of the flagship tracking step.

Chains each stage REPS times inside one jitted program (inputs perturbed per
iteration so XLA can't CSE the loop away) — same methodology as bench.py, so
numbers are comparable. Run on TPU to find the next kernel to optimize.
"""

from __future__ import annotations

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
    out = jax.block_until_ready(jitted(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:38s} {best*1e3:8.3f} ms/step")
    return out


def chain(stage):
    """stage: (carry_img,) -> array; chained with +i perturbation."""

    def run(img):
        def body(i, acc):
            r = stage(img + i.astype(jnp.float32) * 1e-3)
            return acc + jnp.sum(r).astype(jnp.float32)

        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    return run


def main():
    cfg = SlamConfig(n_features=512, n_levels=4, width=640, height=480)
    ext = ORBExtractor(cfg.n_features, cfg.scale_factor, cfg.n_levels, cfg.ini_th_fast, cfg.min_th_fast)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (cfg.height, cfg.width)), jnp.float32)
    print("backend:", jax.default_backend())

    # full extractor
    def full_extract(img):
        f = ext._extract(img)
        return f.xy.sum() + f.desc_packed.astype(jnp.float32).sum()

    timed("extractor (all levels, full)", chain(full_extract), image)

    # pyramid
    timed("pyramid", chain(lambda im: sum(l.sum() for l in build_pyramid(im, cfg.n_levels, cfg.scale_factor))), image)

    levels = build_pyramid(image, cfg.n_levels, cfg.scale_factor)
    budgets = ext.budgets

    # per-level stage timings on level 0 only (biggest image)
    img0 = levels[0]
    use_pallas = jax.default_backend() == "tpu"

    if use_pallas:
        timed("fast+nms L0 (pallas)", chain(lambda im: fast_score_nms(im)), img0)
    timed("fast+nms L0 (jnp)", chain(lambda im: nms3x3(fast_score(im))), img0)

    score0 = jax.block_until_ready((fast_score_nms(img0) if use_pallas else nms3x3(fast_score(img0))))

    def sel(im):
        sc = fast_score_nms(im) if use_pallas else nms3x3(fast_score(im))
        yx, r, v = select_keypoints(sc, budgets[0], ext.ini_th, ext.min_th)
        return yx.astype(jnp.float32).sum() + r.sum()

    timed("fast+nms+select L0", chain(sel), img0)

    yx0, _, _ = jax.jit(lambda s: select_keypoints(s, budgets[0], ext.ini_th, ext.min_th))(score0)
    yx0 = jax.block_until_ready(yx0)

    def ang_stage(im):
        return ic_angle(im, yx0)

    timed("ic_angle L0", chain(ang_stage), img0)

    timed("gaussian_blur7 L0", chain(lambda im: gaussian_blur7(im)), img0)

    ang0 = jax.block_until_ready(jax.jit(ang_stage)(img0))

    def brief_stage(im):
        return brief_descriptors(im, yx0, ang0).astype(jnp.float32)

    timed("brief L0 (on pre-blurred)", chain(brief_stage), img0)

    # matcher + pose opt at bench shapes
    frame = jax.block_until_ready(jax.jit(ext._extract)(image))
    n_lm = 1024
    K = jnp.asarray(cfg.cam.K)
    scale_factors = jnp.asarray(np.array([cfg.scale_factor**i for i in range(cfg.n_levels)], np.float32))
    inv_sigma2 = jnp.asarray(ext.inv_level_sigma2)
    lm_pos = jnp.asarray(
        np.stack([rng.uniform(-3, 3, n_lm), rng.uniform(-2, 2, n_lm), rng.uniform(4, 9, n_lm)], -1), jnp.float32
    )
    lm_desc = jnp.asarray(rng.integers(0, 2, (n_lm, 256)).astype(np.int8) * 2 - 1)
    lm_oct = jnp.zeros(n_lm, jnp.int32)
    Tcw = jnp.eye(4, dtype=jnp.float32)
    lm_valid = jnp.ones(n_lm, bool)

    def match_stage(im):
        # perturb pose instead of re-extracting
        m, d, _ = search_by_projection(
            lm_pos + im[0, 0] * 0, lm_desc, lm_valid, lm_oct, Tcw, frame, K, jnp.asarray(8.0), scale_factors
        )
        return m.astype(jnp.float32).sum() + d.sum()

    timed("search_by_projection", chain(match_stage), image)

    matches, _, _ = jax.jit(
        lambda: search_by_projection(lm_pos, lm_desc, lm_valid, lm_oct, Tcw, frame, K, jnp.asarray(8.0), scale_factors)
    )()
    obs = jnp.full(frame.n_features, -1, jnp.int32)
    obs = obs.at[jnp.maximum(matches, 0)].max(
        jnp.where(matches >= 0, jnp.arange(n_lm, dtype=jnp.int32), -1)
    )
    has = obs >= 0
    Xw = lm_pos[jnp.maximum(obs, 0)]
    inv_s2 = inv_sigma2[jnp.clip(frame.octave, 0, cfg.n_levels - 1)]
    mask = np.asarray(has & frame.valid)

    def pose_stage(im):
        T, inl, n = pose_optimization(Tcw + im[0, 0] * 0, Xw, frame.xy, inv_s2, jnp.asarray(mask), K)
        return T.sum() + n.astype(jnp.float32)

    timed("pose_optimization", chain(pose_stage), image)


if __name__ == "__main__":
    main()
