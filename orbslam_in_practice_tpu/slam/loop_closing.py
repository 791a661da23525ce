"""Loop closing: place recognition + Sim3 RANSAC + essential-graph correction.

Entirely absent from the reference (SURVEY.md §0: "no LoopClosing at all";
Sim3Solver exists but is never called and returns nothing,
src/Sim3Solver.cpp). Capability per BASELINE.json config 4: Sim3 loop
closure + essential-graph optimization.

TPU-native design (no BoW vocabulary):
- Place recognition: each keyframe gets a global descriptor — the mean of
  its ±1 BRIEF vectors (a 256-d float "bag of bits" histogram). Candidate
  retrieval is one matvec against the keyframe table; geometric
  verification then runs only on the shortlist. This replaces DBoW2 with
  an MXU-friendly dense retrieval.
- Sim3: vmapped Horn-RANSAC over 3-point hypotheses between the matched
  landmark sets (the RANSAC wrapper + returns the reference's Sim3Solver
  lacked), refined on inliers.
- Correction: covisibility essential graph (sequential chain + strong
  covisibility edges + the loop edge) optimized over Sim(3)
  (optim/pose_graph.py); landmarks corrected through their reference
  keyframe's Sim3 update; scale folded back to SE3 poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from orbslam_in_practice_tpu.frontend.matcher import match_descriptor_sets
from orbslam_in_practice_tpu.geometry.sim3 import horn_sim3
from orbslam_in_practice_tpu.geometry.sim3_lie import se3_to_sim3, sim3_to_se3
from orbslam_in_practice_tpu.optim.pose_graph import optimize_pose_graph

N_HYP = 128
MIN_INLIERS = 20


@jax.jit
def _sim3_ransac(pa: jnp.ndarray, pb: jnp.ndarray, valid: jnp.ndarray, key):
    """Robust similarity pb ≈ s R pa + t via vmapped 3-point Horn hypotheses.

    Returns (s, R, t, inlier_mask, n_inliers).
    """
    n = pa.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, n, shape=(N_HYP, 3), replace=True, p=probs)
    w = jnp.zeros((N_HYP, n), jnp.float32).at[
        jnp.arange(N_HYP)[:, None], idx
    ].set(1.0)

    def run(wm):
        s, R, t = horn_sim3(pa, pb, w=wm)
        resid = pb - (s * pa @ R.T + t)
        # scale-relative inlier threshold
        scene = jnp.sqrt(jnp.maximum(jnp.sum(pb * pb, axis=-1).mean(), 1e-6))
        inl = valid & (jnp.linalg.norm(resid, axis=-1) < 0.05 * scene)
        return s, R, t, jnp.sum(inl)

    ss, Rs, ts, n_inl = jax.vmap(run)(w)
    best = jnp.argmax(n_inl)
    s, R, t = ss[best], Rs[best], ts[best]
    # refine on inliers
    resid = pb - (s * pa @ R.T + t)
    scene = jnp.sqrt(jnp.maximum(jnp.sum(pb * pb, axis=-1).mean(), 1e-6))
    inl = valid & (jnp.linalg.norm(resid, axis=-1) < 0.05 * scene)
    s, R, t = horn_sim3(pa, pb, w=inl.astype(jnp.float32))
    resid = pb - (s * pa @ R.T + t)
    inl = valid & (jnp.linalg.norm(resid, axis=-1) < 0.05 * scene)
    return s, R, t, inl, jnp.sum(inl)


class LoopCloser:
    def __init__(self, config):
        self.cfg = config
        self.last_loop_kf = -1e9
        self.n_closures = 0

    # ---------------- place recognition ----------------

    def _global_descriptors(self, smap) -> np.ndarray:
        """(n_kf, 256) float — mean ±1 descriptor per keyframe."""
        desc = np.asarray(smap.kf_desc_pm1[: smap.n_kf], np.float32)
        valid = np.asarray(smap.kf_feat_valid[: smap.n_kf], np.float32)[..., None]
        s = (desc * valid).sum(axis=1) / np.maximum(valid.sum(axis=1), 1.0)
        n = np.linalg.norm(s, axis=-1, keepdims=True)
        return s / np.maximum(n, 1e-9)

    def detect_candidates(self, smap, kf_id: int, n_cand: int = 3) -> list:
        """Loop candidates: similar global descriptor, NOT covisible, and
        older than a temporal guard band."""
        if smap.n_kf < 10:
            return []
        g = self._global_descriptors(smap)
        sims = g @ g[kf_id]
        covis = smap.covisibility()
        neighbors = set(np.nonzero(covis[kf_id] >= 15)[0].tolist()) | {kf_id}
        # adaptive floor: covisible neighbors see the same place, so their
        # lowest similarity bounds "same-place" similarity from below
        # (ORB-SLAM's minScore against the BoW neighbor scores)
        nb_scores = [sims[j] for j in neighbors if j != kf_id]
        min_score = max(min(nb_scores) if nb_scores else 0.3, 0.2)
        cands = []
        for j in np.argsort(-sims):
            j = int(j)
            if j in neighbors:
                continue
            if abs(kf_id - j) < 10:  # temporal guard
                continue
            if sims[j] < min_score:
                break
            cands.append(j)
            if len(cands) >= n_cand:
                break
        return cands

    # ---------------- geometric verification ----------------

    def compute_sim3(self, smap, kf_id: int, cand: int):
        """Associate landmarks via descriptors, fit Sim3 cand->current.

        Returns (ok, s, R, t, n_inliers) with (s, R, t) mapping candidate-KF
        CAMERA-frame points to current-KF CAMERA frame (the Scm of ORB-SLAM).
        """
        f_max = smap.f_max
        obs_a = np.asarray(smap.kf_obs[kf_id])
        obs_b = np.asarray(smap.kf_obs[cand])
        has_a = jnp.asarray(obs_a >= 0) & smap.kf_feat_valid[kf_id]
        has_b = jnp.asarray(obs_b >= 0) & smap.kf_feat_valid[cand]
        matches = match_descriptor_sets(
            smap.kf_desc_pm1[kf_id], has_a, smap.kf_desc_pm1[cand], has_b
        )
        m_h = np.asarray(matches)
        sel = np.nonzero(m_h >= 0)[0]
        if len(sel) < MIN_INLIERS:
            return False, None, None, None, 0
        lm_a = obs_a[sel]
        lm_b = obs_b[m_h[sel]]
        lm_pos = np.asarray(smap.lm_pos)
        # positions in each keyframe's camera frame
        Ta = np.asarray(smap.kf_pose[kf_id])
        Tb = np.asarray(smap.kf_pose[cand])
        pa_cam = lm_pos[lm_b] @ Tb[:3, :3].T + Tb[:3, 3]  # candidate's view
        pb_cam = lm_pos[lm_a] @ Ta[:3, :3].T + Ta[:3, 3]  # current's view
        n_pad = f_max
        pa = np.zeros((n_pad, 3), np.float32)
        pb = np.zeros((n_pad, 3), np.float32)
        valid = np.zeros(n_pad, bool)
        pa[: len(sel)] = pa_cam
        pb[: len(sel)] = pb_cam
        valid[: len(sel)] = True
        s, R, t, inl, n_inl = _sim3_ransac(
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(valid), jax.random.PRNGKey(2)
        )
        if int(n_inl) < MIN_INLIERS:
            return False, None, None, None, int(n_inl)
        return True, float(s), np.asarray(R), np.asarray(t), int(n_inl)

    # ---------------- correction ----------------

    def close_loop(self, smap, kf_id: int, cand: int, s, R, t, run_global_ba: bool = True):
        """Essential-graph optimization with the loop constraint; write back
        corrected poses and landmark positions."""
        n = smap.n_kf
        poses = np.asarray(smap.kf_pose[:n])  # Tcw per KF
        S = np.stack([np.asarray(se3_to_sim3(jnp.asarray(p))) for p in poses])

        # edges: sequential chain + strong covisibility + loop edge
        covis = smap.covisibility()
        ei, ej, meas, w = [], [], [], []

        def add_edge(i, j, S_meas, weight):
            ei.append(i)
            ej.append(j)
            meas.append(S_meas)
            w.append(weight)

        for i in range(n - 1):
            add_edge(i, i + 1, S[i + 1] @ np.linalg.inv(S[i]), 1.0)
        for i in range(n):
            for j in range(i + 2, n):
                if covis[i][j] >= 50:
                    add_edge(i, j, S[j] @ np.linalg.inv(S[i]), 1.0)
        # loop edge: measured relative Sim3 candidate -> current
        S_loop = np.eye(4, dtype=np.float32)
        S_loop[:3, :3] = s * R
        S_loop[:3, 3] = t
        add_edge(cand, kf_id, S_loop.astype(np.float32), 5.0)

        fixed = np.zeros(n, bool)
        fixed[cand] = True  # the older side anchors the graph

        S_opt = optimize_pose_graph(
            jnp.asarray(S),
            jnp.asarray(ei, jnp.int32),
            jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(meas), jnp.float32),
            jnp.asarray(w, jnp.float32),
            jnp.asarray(fixed),
            iterations=25,
        )
        S_opt_h = np.asarray(S_opt)

        # landmark correction: move each landmark with its reference KF
        # X' = S_new^-1 * S_old * X  (in that KF's frame)
        lm_first = smap.lm_first_kf
        lm_valid = np.asarray(smap.lm_valid)
        lm_pos = np.array(np.asarray(smap.lm_pos))
        for k in range(n):
            sel = np.nonzero(lm_valid & (lm_first == k))[0]
            if len(sel) == 0:
                continue
            old = S[k]
            new = S_opt_h[k]
            X = lm_pos[sel]
            Xh = np.concatenate([X, np.ones((len(sel), 1), np.float32)], axis=1)
            Xc = (np.linalg.inv(new) @ old @ Xh.T).T[:, :3]
            lm_pos[sel] = Xc
        smap.set_landmark_positions(
            np.nonzero(lm_valid)[0], lm_pos[np.nonzero(lm_valid)[0]]
        )

        # poses: strip scale back to SE3 (scale folds into translation)
        new_poses = []
        for k in range(n):
            T, s_k = sim3_to_se3(jnp.asarray(S_opt_h[k]))
            T = np.array(T)  # writable copy
            T[:3, 3] /= float(s_k)  # Sim3 [sR|t] ~ SE3 [R|t/s] as world map
            new_poses.append(T)
        smap.set_kf_poses(list(range(n)), np.stack(new_poses))
        # full-map refinement after the graph correction (original ORB-SLAM's
        # RunGlobalBundleAdjustment; synchronous here)
        if run_global_ba:
            from orbslam_in_practice_tpu.slam.global_ba import (
                global_bundle_adjustment,
            )

            inv_s2 = np.array(
                [
                    1.0 / (self.cfg.scale_factor**i) ** 2
                    for i in range(self.cfg.n_levels)
                ],
                np.float32,
            )
            global_bundle_adjustment(
                smap,
                np.asarray(self.cfg.cam.K),
                inv_s2,
                iterations=10,
                fixed_kfs=(cand,),
            )
        self.n_closures += 1
        self.last_loop_kf = kf_id
        return True

    # ---------------- entry ----------------

    def attempt(self, smap, kf_id: int) -> bool:
        if kf_id - self.last_loop_kf < 10:
            return False
        for cand in self.detect_candidates(smap, kf_id):
            ok, s, R, t, n_inl = self.compute_sim3(smap, kf_id, cand)
            if ok:
                return self.close_loop(smap, kf_id, cand, s, R, t)
        return False
