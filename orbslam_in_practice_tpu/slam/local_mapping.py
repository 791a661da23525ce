"""Local mapping: the full capability set the reference only sketched.

The reference's LocalMapping (src/LocalMapping.cpp) implements only
ProcessNewKeyFrame (observation binding) and leaves recent-point culling,
new-point triangulation, fusion, LOCAL BA and keyframe culling absent
(SURVEY.md §2.1 #13, §3.5). This module provides all of them, synchronously
after each keyframe insertion (deterministic; the reference's intended
second thread is an orchestration detail, not a capability).

Jitted kernels: landmark invariant refresh (normals, distance ranges,
distinctive descriptors — MapPoint::UpdateNormalAndDepth and
ComputeDistinctiveDescriptors were *declared but never defined* in the
reference, include/MapPoint.h:22-23), epipolar triangulation of new points,
and windowed local BA (optim/ba.py) with padded static shapes.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from orbslam_in_practice_tpu.frontend.frame import Frame
from orbslam_in_practice_tpu.frontend.matcher import (
    TH_HIGH,
    TH_LOW,
    epipolar_match_kf,
    fundamental_from_poses,
    search_by_projection,
)
from orbslam_in_practice_tpu.geometry.triangulate import triangulate_dlt
from orbslam_in_practice_tpu.optim.ba import (
    BAProblem,
    adaptive_o_max,
    build_point_obs,
    bundle_adjustment,
    count_obs_drops,
)

O_MAX = 12  # max observations per landmark used in invariants / local BA


def _bucket(n: int, floor: int, cap: int) -> int:
    """Smallest power-of-2 bucket >= n, floored at `floor`, capped at `cap`
    (one jit compile per bucket — bounded cache growth)."""
    b = max(floor, int(2 ** np.ceil(np.log2(max(n, 1)))))
    return min(b, cap)


def _pad_to(x, n, fill=0):
    x = np.asarray(x)
    if len(x) >= n:
        return x[:n]
    pad = np.full((n - len(x),) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


@jax.jit
def _landmark_invariants(
    lm_pos: jnp.ndarray,  # (L, 3)
    kf_pose_tbl: jnp.ndarray,  # (K, 4, 4) device mirror
    kf_desc_tbl: jnp.ndarray,  # (K, F, 256) int8 device mirror (row policy)
    kf_oct_tbl: jnp.ndarray,  # (K, F) int32 device mirror (row policy)
    obs_kf: jnp.ndarray,  # (L, O_MAX) int32 observing KF slot (0-padded)
    obs_feat: jnp.ndarray,  # (L, O_MAX) int32 feature index (0-padded)
    obs_valid: jnp.ndarray,  # (L, O_MAX)
    scale_factor: jnp.ndarray,
    n_levels: jnp.ndarray,
):
    """Normals, distance invariants, distinctive descriptors (batched).

    Observation poses/descriptors/octaves are gathered ON DEVICE from the
    map's keyframe mirrors (row-policy, so they are resident and fresh):
    the call uploads only (L, O_MAX) index arrays — ~56 KB — instead of the
    ~1.9 MB of gathered pose/descriptor payload the round-3a version pushed
    through the ~49 MB/s relay on every refresh (3x per keyframe). Padding
    indices gather keyframe 0's real rows; every use is masked by obs_valid
    and the host writes back only rows with has_obs.

    Normal: mean unit vector from observing camera centers to the point.
    Distance range: from the LAST observation's octave, ORB-SLAM convention
      max_dist = dist * scale^octave, min_dist = max_dist / scale^(nLevels-1).
    Distinctive descriptor: the observation descriptor minimizing the median
      Hamming distance to the other observations.
    """
    obs_kf_pose = kf_pose_tbl[obs_kf]  # (L, O, 4, 4)
    obs_desc = kf_desc_tbl[obs_kf, obs_feat]  # (L, O, 256)
    obs_octave = kf_oct_tbl[obs_kf, obs_feat]  # (L, O)
    R = obs_kf_pose[..., :3, :3]
    t = obs_kf_pose[..., :3, 3]
    centers = -jnp.einsum("loji,loj->loi", R, t)  # (L, O, 3) camera centers (world)
    vecs = lm_pos[:, None, :] - centers
    norms = jnp.maximum(jnp.linalg.norm(vecs, axis=-1, keepdims=True), 1e-9)
    unit = vecs / norms
    w = obs_valid[..., None].astype(jnp.float32)
    normal = jnp.sum(unit * w, axis=1)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # reference observation = last valid one
    idx_last = jnp.maximum(
        jnp.sum(obs_valid.astype(jnp.int32), axis=1) - 1, 0
    )  # (L,)
    dist_ref = jnp.take_along_axis(norms[..., 0], idx_last[:, None], axis=1)[:, 0]
    oct_ref = jnp.take_along_axis(obs_octave, idx_last[:, None], axis=1)[:, 0]
    max_dist = dist_ref * scale_factor**oct_ref.astype(jnp.float32)
    min_dist = max_dist / scale_factor ** (n_levels.astype(jnp.float32) - 1.0)

    # distinctive descriptor: pairwise Hamming between observations
    d = obs_desc.astype(jnp.float32)  # ±1
    dots = jnp.einsum("loc,lpc->lop", d, d)  # (L, O, O)
    ham = (256.0 - dots) * 0.5
    pair_ok = obs_valid[:, :, None] & obs_valid[:, None, :]
    ham = jnp.where(pair_ok, ham, jnp.inf)
    med = jnp.nanmedian(jnp.where(jnp.isinf(ham), jnp.nan, ham), axis=2)  # (L, O)
    med = jnp.where(obs_valid & jnp.isfinite(med), med, jnp.inf)
    best = jnp.argmin(med, axis=1)  # (L,)
    desc = jnp.take_along_axis(obs_desc, best[:, None, None], axis=1)[:, 0]
    return normal, min_dist, max_dist, desc, oct_ref


@partial(jax.jit, static_argnames=())
def _triangulate_pairs(
    T1: jnp.ndarray,
    T2: jnp.ndarray,
    K: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    pair_valid: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
):
    """Triangulate matched feature pairs between two keyframes and gate them
    (parallax, cheirality, reprojection) — the new-map-point path of
    original ORB-SLAM's CreateNewMapPoints.

    Returns (points_world (N, 3), accept (N,)).
    """
    P1 = K @ T1[:3, :4]
    P2 = K @ T2[:3, :4]
    Xw = triangulate_dlt(P1[None], P2[None], xy1, xy2)  # world coords

    def depth_and_reproj(T, xy):
        pc = Xw @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
        v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
        err2 = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        return z, err2

    z1, e1 = depth_and_reproj(T1, xy1)
    z2, e2 = depth_and_reproj(T2, xy2)
    # parallax between rays
    c1 = -T1[:3, :3].T @ T1[:3, 3]
    c2 = -T2[:3, :3].T @ T2[:3, 3]
    r1 = Xw - c1
    r2 = Xw - c2
    cos_par = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    th2 = 5.991 / jnp.maximum(inv_sigma2_1, 1e-9)
    accept = (
        pair_valid
        & jnp.all(jnp.isfinite(Xw), axis=-1)
        & (z1 > 0)
        & (z2 > 0)
        & (cos_par < 0.9998)
        & (e1 < th2)
        & (e2 < th2)
    )
    return Xw, accept


@jax.jit
def _match_triangulate_neighbors(
    T1, xy1, free1, oct1, angle1,
    nb_T, nb_xy, nb_free, nb_oct, nb_angle, nb_th,
    kf_desc_tbl, kf1_idx, nb_idx,
    K, inv_level_sigma2, inv_s2_feat,
):
    """CreateNewMapPoints' per-neighbor epipolar match + triangulation,
    vmapped over a FIXED number of neighbor lanes — one device program and
    one transfer for the whole stage. Unused lanes carry all-False free
    masks and fall out as no matches.

    Descriptors are gathered ON DEVICE from the keyframe descriptor mirror
    (row policy, resident): the call uploads neighbor INDICES instead of
    ~1.6 MB of (NB+1, F, 256) int8 descriptors per keyframe through the
    ~49 MB/s relay. Padding lanes gather row 0's real descriptors — inert,
    their free masks are all-False.

    Returns (matches (NB, F), Xw (NB, F, 3), accept (NB, F))."""
    desc1 = kf_desc_tbl[kf1_idx]

    def per_nb(T2, xy2, free2, oct2, angle2, th, nbi):
        desc2 = kf_desc_tbl[nbi]
        F12 = fundamental_from_poses(T1, T2, K)
        m = epipolar_match_kf(
            xy1, desc1, free1, oct1,
            xy2, desc2, free2, oct2,
            F12, inv_level_sigma2,
            max_dist=th, angle1=angle1, angle2=angle2,
        )
        xy2m = xy2[jnp.maximum(m, 0)]
        Xw, accept = _triangulate_pairs(
            T1, T2, K, xy1, xy2m, m >= 0, inv_s2_feat
        )
        return m, Xw, accept

    return jax.vmap(per_nb)(nb_T, nb_xy, nb_free, nb_oct, nb_angle, nb_th, nb_idx)


@jax.jit
def _fuse_match_neighbors(
    pts, desc, valid, octv,
    nb_T, nb_xy, nb_fv, nb_oct, nb_angle,
    kf_desc_tbl, nb_idx,
    K, scale_factors,
):
    """ORBmatcher::Fuse's projection matching vmapped over a fixed set of
    neighbor keyframes — one device program, one transfer. Neighbor
    descriptors are gathered on device from the keyframe descriptor mirror
    (row policy, resident) — indices go up the relay, not ~1.3 MB of int8.
    Returns matches (NB, F) into each neighbor's features."""
    F = nb_xy.shape[1]

    def per_nb(T, xy, fv, oc, ang, nbi):
        d = kf_desc_tbl[nbi]
        frame = Frame(
            xy=xy, xy_raw=xy, octave=oc, angle=ang,
            response=jnp.zeros(F, jnp.float32), valid=fv,
            desc_packed=jnp.zeros((F, 8), jnp.uint32), desc_pm1=d,
        )
        m, _, _ = search_by_projection(
            pts, desc, valid, octv, T, frame, K,
            jnp.asarray(3.0), scale_factors, max_th_dist=TH_LOW,
        )
        return m

    return jax.vmap(per_nb)(nb_T, nb_xy, nb_fv, nb_oct, nb_angle, nb_idx)


class LocalMapper:
    """Synchronous local-mapping pipeline driven by Tracking."""

    def __init__(self, config, extractor):
        self.cfg = config
        self.ext = extractor
        self.scale_factors = np.array(
            [config.scale_factor**i for i in range(config.n_levels)], dtype=np.float32
        )
        # padded local-BA shapes (stable jit cache): *_floor is the bucket
        # the steady state compiles once; mature maps grow the pad in
        # power-of-2 buckets up to *_cap before anything is dropped
        self.ba_k = int(2 ** int(np.ceil(np.log2(max(4, config.local_window + 8)))))
        self.ba_l_floor = getattr(config, "ba_lm_budget", 2048)
        self.ba_o_floor = getattr(config, "ba_obs_budget", 8192)
        self.ba_l_cap = max(getattr(config, "ba_lm_max", 8192), self.ba_l_floor)
        self.ba_o_cap = max(getattr(config, "ba_obs_max", 32768), self.ba_o_floor)
        # (lm_id, lm_uid, created_at_seq) for culling — uid guards against
        # slot recycling, seq (not slot id) measures age
        self._recent_lms: list = []
        self.n_ba_truncations = 0  # local-BA budget clips (SURVEY §7.3 risk)
        self.n_ba_obs_drops = 0  # observations beyond the per-landmark cap
        self.n_fuse_merges = 0  # landmark merge conflicts resolved in fusion
        self.n_lm_evictions = 0  # pressure-driven landmark evictions

    # ---------- landmark invariant refresh ----------

    def refresh_landmarks(self, smap, lm_ids: np.ndarray):
        """Recompute normal / distance range / distinctive descriptor for the
        given landmarks from their current observations.

        Fixed-shape discipline (the profile_mapping.py lesson): L is padded
        to a power-of-2 bucket so the jitted kernel compiles once per bucket,
        not once per call. Observation INDEX arrays are built on the host and
        uploaded; the pose/descriptor/octave payload is gathered ON DEVICE
        from the keyframe mirrors (row policy — resident and fresh), and the
        5 outputs come back in ONE device_get."""
        if len(lm_ids) == 0:
            return
        lm_ids = np.asarray(lm_ids)
        with smap.lock:
            outs, has_obs, L_real = self._refresh_dispatch(smap, lm_ids)
        normal, min_d, max_d, desc, oct_ref = jax.device_get(outs)
        with smap.lock:
            smap.write_landmark_invariants(
                lm_ids,
                normal[:L_real], min_d[:L_real], max_d[:L_real],
                desc[:L_real], oct_ref[:L_real], has_obs[:L_real],
            )

    def _refresh_dispatch(self, smap, lm_ids: np.ndarray):
        """Host assembly + kernel dispatch for refresh_landmarks (call with
        smap.lock held; the returned lazy arrays are device_get elsewhere)."""
        kf_idx, feat_idx, which = smap.observations_of(lm_ids)
        L_real = len(lm_ids)
        L = max(64, int(2 ** np.ceil(np.log2(L_real))))
        obs_kf = np.zeros((L, O_MAX), np.int32)
        obs_feat = np.zeros((L, O_MAX), np.int32)
        obs_val = np.zeros((L, O_MAX), bool)
        # vectorized grouping: slot = rank of each observation within its
        # landmark group (stable sort keeps observation order)
        if len(which):
            order = np.argsort(which, kind="stable")
            sw = which[order]
            group_start = np.zeros(len(sw), np.int64)
            new_grp = np.nonzero(np.r_[True, sw[1:] != sw[:-1]])[0]
            group_start[new_grp] = np.arange(len(sw))[new_grp]
            group_start = np.maximum.accumulate(group_start)
            slot = np.arange(len(sw)) - group_start
            keep = slot < O_MAX
            li = sw[keep]
            sl = slot[keep]
            obs_kf[li, sl] = kf_idx[order][keep]
            obs_feat[li, sl] = feat_idx[order][keep]
            obs_val[li, sl] = True
        has_obs = obs_val.any(axis=1)
        lm_pos_pad = np.zeros((L, 3), np.float32)
        lm_pos_pad[:L_real] = smap.hview("lm_pos")[lm_ids]
        # poses/descriptors/octaves gathered on device from the kf mirrors
        # (row-policy: resident and fresh) — only indices go up the relay
        outs = _landmark_invariants(
            jnp.asarray(lm_pos_pad),
            smap.kf_pose,
            smap.kf_desc_pm1,
            smap.kf_octave,
            jnp.asarray(obs_kf),
            jnp.asarray(obs_feat),
            jnp.asarray(obs_val),
            jnp.asarray(self.cfg.scale_factor, jnp.float32),
            jnp.asarray(self.cfg.n_levels, jnp.int32),
        )
        return outs, has_obs, L_real

    # ---------- new map point creation ----------

    def create_new_points(self, smap, kf_id: int, n_neighbors: int = 5) -> int:
        """Triangulate new landmarks between the new KF and its top covisible
        neighbors (capability absent in reference — SURVEY.md §3.5).

        ALL neighbors run in ONE device program (epipolar match +
        triangulation vmapped over the neighbor axis, fixed NB lanes) with
        ONE device_get — the round-2 per-neighbor loop paid per-call relay
        round trips and re-uploaded dirtied mirrors between neighbors
        (tools/profile_mapping.py: 2.15 s/keyframe warm). Conflict policy
        matches the sequential semantics: the first accepting neighbor (in
        covisibility order) claims a feature.

        Async-safe: assembly and apply run under smap.lock; the device wait
        is lock-free, and apply re-validates keyframe identity (kf_seq) and
        feature freeness against post-wait host truth."""
        with smap.lock:
            disp = self._create_dispatch(smap, kf_id, n_neighbors)
            if disp is None:
                return 0
        outs, lanes, free1, oct1, seqs = disp
        m_all, Xw_all, acc_all = jax.device_get(outs)
        with smap.lock:
            return self._create_apply(
                smap, kf_id, lanes, free1, oct1, seqs, m_all, Xw_all, acc_all
            )

    def _create_dispatch(self, smap, kf_id: int, n_neighbors: int):
        covis = smap.covisibility()
        if smap.n_kf_active() < 2:
            return None
        row = covis[kf_id].copy()
        order = np.argsort(-row)
        neighbors = [int(i) for i in order[:n_neighbors] if row[i] >= 10 and i != kf_id]
        feat_valid_h = smap.hview("kf_feat_valid")[kf_id]
        inv_s2 = 1.0 / self.scale_factors**2
        kf_pose_h = smap.hview("kf_pose")
        obs_all = smap.hview("kf_obs")
        T1 = kf_pose_h[kf_id]
        c1 = -T1[:3, :3].T @ T1[:3, 3]

        # host-side neighbor gates (baseline/depth), keep at most NB lanes
        lanes = []
        for nb in neighbors:
            T2 = kf_pose_h[nb]
            # ORB-SLAM's CreateNewMapPoints baseline gate: skip a neighbor
            # whose baseline is under 1% of its median scene depth. Under
            # near-pure rotation the epipolar constraint degenerates and
            # (with the TH_HIGH match threshold) wrong correspondences can
            # pass every later gate — measured to blow rotation-regime ATE
            # from 0.013 to 0.196 when this guard is absent.
            c2 = -T2[:3, :3].T @ T2[:3, 3]
            baseline = float(np.linalg.norm(c1 - c2))
            nb_lms = smap.keyframe_landmarks(nb)
            if len(nb_lms):
                pos_nb = smap.hview("lm_pos")[nb_lms]
                z_nb = (pos_nb @ T2[:3, :3].T + T2[:3, 3])[:, 2]
                z_med = float(np.median(z_nb[z_nb > 0])) if (z_nb > 0).any() else 0.0
            else:
                z_med = 0.0
            if z_med <= 0.0 or baseline / z_med < 0.01:
                continue
            # adaptive descriptor threshold: permissive only when the pair's
            # baseline makes the epipolar constraint selective (the
            # rotation-histogram check below the matcher handles repeating-
            # texture mismatches; this guards the truly degenerate regime)
            epi_th = TH_HIGH if baseline / z_med > 0.04 else TH_LOW
            lanes.append((nb, T2, epi_th))
        if not lanes:
            return None

        NB = n_neighbors  # fixed lane count (stable jit cache)
        F = smap.f_max
        free1 = feat_valid_h & (obs_all[kf_id] < 0)
        nb_T = np.tile(np.eye(4, dtype=np.float32), (NB, 1, 1))
        nb_xy = np.zeros((NB, F, 2), np.float32)
        nb_free = np.zeros((NB, F), bool)
        nb_oct = np.zeros((NB, F), np.int32)
        nb_angle = np.zeros((NB, F), np.float32)
        nb_th = np.full(NB, TH_LOW, np.int32)
        nb_idx = np.zeros(NB, np.int32)  # pad lanes gather row 0: inert (free all-False)
        fv_all = smap.hview("kf_feat_valid")
        xy_all = smap.hview("kf_xy")
        desc_all = smap.hview("kf_desc_pm1")
        oct_all = smap.hview("kf_octave")
        angle_all = smap.hview("kf_angle")
        for i, (nb, T2, epi_th) in enumerate(lanes):
            nb_T[i] = T2
            nb_xy[i] = xy_all[nb]
            nb_free[i] = fv_all[nb] & (obs_all[nb] < 0)
            nb_oct[i] = oct_all[nb]
            nb_angle[i] = angle_all[nb]
            nb_th[i] = epi_th
            nb_idx[i] = nb
        oct1 = oct_all[kf_id].copy()

        outs = _match_triangulate_neighbors(
            jnp.asarray(T1),
            jnp.asarray(xy_all[kf_id]),
            jnp.asarray(free1),
            jnp.asarray(oct1),
            jnp.asarray(angle_all[kf_id]),
            jnp.asarray(nb_T),
            jnp.asarray(nb_xy),
            jnp.asarray(nb_free),
            jnp.asarray(nb_oct),
            jnp.asarray(nb_angle),
            jnp.asarray(nb_th),
            smap.kf_desc_pm1,
            jnp.asarray(kf_id, jnp.int32),
            jnp.asarray(nb_idx),
            jnp.asarray(self.cfg.cam.K),
            jnp.asarray(inv_s2),
            jnp.asarray(inv_s2[oct1.clip(0, len(inv_s2) - 1)]),
        )
        # keyframe-identity snapshot: apply aborts a keyframe whose slot was
        # recycled (evicted + reallocated) during the lock-free device wait
        seqs = {k: int(smap.kf_seq[k]) for k in [kf_id] + [nb for nb, _, _ in lanes]}
        return outs, lanes, free1, oct1, seqs

    def _create_apply(
        self, smap, kf_id, lanes, free1, oct1, seqs, m_all, Xw_all, acc_all
    ) -> int:
        kf_valid = smap.kf_valid_host()
        if not kf_valid[kf_id] or int(smap.kf_seq[kf_id]) != seqs[kf_id]:
            return 0
        obs_all = smap.hview("kf_obs")
        desc_all = smap.hview("kf_desc_pm1")
        n_created = 0
        # re-derive freeness from CURRENT truth (tracking may have bound
        # features or scrubbed observations during the device wait)
        claimed = ~(free1 & (obs_all[kf_id] < 0))
        seq = int(smap.kf_seq[kf_id])
        for i, (nb, _, _) in enumerate(lanes):
            if not kf_valid[nb] or int(smap.kf_seq[nb]) != seqs[nb]:
                continue
            nb_free_now = obs_all[nb, np.maximum(m_all[i], 0)] < 0
            new_feats = np.nonzero(acc_all[i] & ~claimed & nb_free_now)[0]
            if len(new_feats) == 0:
                continue
            ids = smap.allocate_landmarks(len(new_feats))
            if len(ids) < len(new_feats):  # capacity: keep only what fits
                new_feats = new_feats[: len(ids)]
                if len(ids) == 0:
                    continue
            claimed[new_feats] = True
            # provisional invariants; refreshed at the end of the epoch
            smap.add_landmarks(
                ids,
                Xw_all[i][new_feats],
                desc_all[kf_id][new_feats],
                np.zeros((len(ids), 3), np.float32),
                oct1[new_feats],
                np.zeros(len(ids), np.float32),
                np.full(len(ids), np.inf, np.float32),
                first_kf=kf_id,
            )
            smap.add_observations(kf_id, new_feats, ids)
            smap.add_observations(nb, m_all[i][new_feats], ids)
            self._recent_lms.extend(
                (int(i_), int(smap.lm_uid[i_]), seq) for i_ in ids
            )
            n_created += len(ids)
        return n_created

    # ---------- local BA ----------

    def local_ba(self, smap, kf_id: int, iterations: int = 10):
        """Windowed local bundle adjustment (BASELINE.json config 2).

        Window: the new KF + its most covisible neighbors (cfg.local_window);
        fixed: all other KFs observing the window's landmarks + gauge.

        Async-safe: assembly/apply under smap.lock, lock-free device solve;
        write-back drops cameras whose slot was recycled mid-solve and
        scrubs only observations whose binding is unchanged."""
        with smap.lock:
            disp = self._ba_dispatch(smap, kf_id, iterations)
            if disp is None:
                return
        outs, cams, lm_ids, kf_idx, feat_idx, obs_len, seqs = disp
        poses_new, points_new, chi2 = jax.device_get(outs)
        with smap.lock:
            kf_valid = smap.kf_valid_host()
            live = [
                i
                for i, k in enumerate(cams)
                if kf_valid[k] and int(smap.kf_seq[k]) == seqs[i]
            ]
            if live:
                smap.set_kf_poses(
                    [cams[i] for i in live], np.asarray(poses_new)[live]
                )
            # landmark erasure is worker-local (sequential), so lm_ids are
            # live; positions write back unconditionally
            smap.set_landmark_positions(lm_ids, np.asarray(points_new)[: len(lm_ids)])
            # scrub outlier observations (chi2 > 5.991), only where the
            # observing keyframe is still the same keyframe
            chi2_h = np.asarray(chi2)[:obs_len]
            bad = chi2_h > 5.991
            if bad.any():
                seq_arr = np.asarray(seqs)
                cam_of_obs = self._obs_cam_slot
                ok_kf = (
                    kf_valid[kf_idx[bad]]
                    & (smap.kf_seq[kf_idx[bad]] == seq_arr[cam_of_obs[bad]])
                )
                if ok_kf.any():
                    smap.scrub_observations(
                        kf_idx[bad][ok_kf], feat_idx[bad][ok_kf]
                    )

    def _ba_dispatch(self, smap, kf_id: int, iterations: int):
        covis = smap.covisibility()
        row = covis[kf_id]
        order = np.argsort(-row)
        window = [kf_id] + [
            int(i) for i in order[: self.cfg.local_window - 1] if row[i] >= 15 and i != kf_id
        ]
        if len(window) < 2:
            return None
        lm_ids = np.unique(
            np.concatenate([smap.keyframe_landmarks(k) for k in window])
        )
        if len(lm_ids) == 0:
            return None
        if len(lm_ids) > self.ba_l_cap:
            # hard cap: keep the landmarks with the MOST observations (the
            # strongest map structure), not the lowest slot ids
            self.n_ba_truncations += 1
            logging.getLogger("orbslam_tpu").warning(
                "local BA landmark hard cap: %d -> %d (kf %d)",
                len(lm_ids), self.ba_l_cap, kf_id,
            )
            order = np.argsort(-smap.lm_obs_count[lm_ids], kind="stable")
            lm_ids = np.sort(lm_ids[order[: self.ba_l_cap]])
        kf_idx, feat_idx, which = smap.observations_of(lm_ids)
        # cameras: window (free) + others observing these landmarks (fixed)
        in_window = np.isin(kf_idx, window)
        fixed_kfs = np.unique(kf_idx[~in_window])
        cams = list(window) + [int(k) for k in fixed_kfs]
        cams = cams[: self.ba_k]
        cam_slot = {k: i for i, k in enumerate(cams)}
        fixed = np.zeros(len(cams), bool)
        for i, k in enumerate(cams):
            if k not in window:
                fixed[i] = True
        # gauge: also fix the oldest window KF by insertion seq (slot ids
        # are not temporal under recycling)
        oldest = min(window, key=lambda k: smap.kf_seq[k])
        fixed[cam_slot[oldest]] = True
        if not fixed.any() or len(cams) == 1:
            return None

        keep = np.isin(kf_idx, cams)
        kf_idx, feat_idx, which = kf_idx[keep], feat_idx[keep], which[keep]
        if len(kf_idx) == 0:
            return None
        obs_oct = smap.hview("kf_octave")[kf_idx, feat_idx]
        # Order observations STRONGEST FIRST: window-camera observations
        # (the poses being optimized), then by covisibility of the observing
        # camera with the current KF, then finer octave. Every clip below —
        # the hard observation cap AND the per-landmark o_max grouping (which
        # keeps each landmark's first o_max entries) — then keeps the
        # strongest edges instead of table-scan order (VERDICT r3 weak #3).
        covis_w = covis[kf_id][kf_idx].astype(np.float64)
        covis_w[in_window[keep]] += 1e9
        order = np.lexsort((obs_oct, -covis_w))
        kf_idx, feat_idx, which, obs_oct = (
            kf_idx[order], feat_idx[order], which[order], obs_oct[order]
        )
        if len(kf_idx) > self.ba_o_cap:
            self.n_ba_truncations += 1
            logging.getLogger("orbslam_tpu").warning(
                "local BA observation hard cap: %d -> %d (kf %d)",
                len(kf_idx), self.ba_o_cap, kf_id,
            )
        n_obs = min(len(kf_idx), self.ba_o_cap)
        kf_idx, feat_idx, which, obs_oct = (
            kf_idx[:n_obs], feat_idx[:n_obs], which[:n_obs], obs_oct[:n_obs]
        )
        obs_cam = np.array([cam_slot[int(k)] for k in kf_idx], np.int32)
        obs_uv = smap.hview("kf_xy")[kf_idx, feat_idx]
        inv_s2 = (1.0 / self.scale_factors**2)[obs_oct.clip(0, len(self.scale_factors) - 1)]
        # per-landmark observation budget: adapt to the actual max count
        # (bucketed for jit-cache stability); beyond the cap observations are
        # dropped consistently from BOTH halves of the normal equations
        # (optim.ba.included_obs_mask) — and, with the strength ordering
        # above, the dropped ones are each landmark's WEAKEST edges
        max_count = int(np.bincount(which, minlength=1).max())
        o_max = adaptive_o_max(max_count, O_MAX, cap=48)
        dropped = count_obs_drops(which, len(lm_ids), o_max)
        if dropped:
            self.n_ba_obs_drops += dropped
            logging.getLogger("orbslam_tpu").warning(
                "local BA dropped %d observations beyond o_max=%d (kf %d)",
                dropped, o_max, kf_id,
            )

        K_pad = self.ba_k
        # padding buckets grow with the live problem (power-of-2, floored at
        # the configured budget) so mature maps are not silently truncated
        L_pad = _bucket(len(lm_ids), self.ba_l_floor, self.ba_l_cap)
        O_pad = _bucket(n_obs, self.ba_o_floor, self.ba_o_cap)
        poses = np.tile(np.eye(4, dtype=np.float32), (K_pad, 1, 1))
        poses[: len(cams)] = smap.hview("kf_pose")[cams]
        points = np.zeros((L_pad, 3), np.float32)
        points[: len(lm_ids)] = smap.hview("lm_pos")[lm_ids]
        fixed_pad = np.ones(K_pad, bool)
        fixed_pad[: len(cams)] = fixed
        prob = BAProblem(
            poses=jnp.asarray(poses),
            points=jnp.asarray(points),
            obs_cam=jnp.asarray(_pad_to(obs_cam, O_pad)),
            obs_point=jnp.asarray(_pad_to(which.astype(np.int32), O_pad)),
            obs_uv=jnp.asarray(_pad_to(obs_uv.astype(np.float32), O_pad)),
            obs_inv_sigma2=jnp.asarray(_pad_to(inv_s2.astype(np.float32), O_pad, 1.0)),
            obs_mask=jnp.asarray(
                _pad_to(np.ones(len(obs_cam), bool), O_pad, False)
            ),
            point_obs=jnp.asarray(
                build_point_obs(_pad_to(which.astype(np.int32), O_pad, -1), L_pad, o_max)
            ),
            fixed_cam=jnp.asarray(fixed_pad),
            K=jnp.asarray(self.cfg.cam.K),
        )
        outs = bundle_adjustment(prob, iterations=iterations)
        # write-back happens in local_ba (the reference forgot it entirely —
        # src/Optimizer.cpp:127-128). Outputs stay PADDED (K_pad) until the
        # host slices them: a device-side [:len(cams)] slice would mint one
        # XLA program per distinct camera count.
        self._obs_cam_slot = obs_cam  # obs -> camera slot, for scrub guard
        seqs = [int(smap.kf_seq[k]) for k in cams]
        return outs, cams, lm_ids, kf_idx, feat_idx, len(obs_cam), seqs

    # ---------- fusion ----------

    def fuse_neighbors(
        self, smap, kf_id: int, n_neighbors: int = 5, neighbors=None
    ) -> int:
        """SearchInNeighbors / ORBmatcher::Fuse semantics (absent in the
        reference — SURVEY.md §3.5): project the new KF's landmarks into its
        covisible neighbors; matched free features gain an observation;
        matched features holding ANOTHER landmark trigger a merge (the
        landmark with more observations wins).

        All neighbors are matched in ONE vmapped device program with ONE
        transfer (same rationale as _match_triangulate_neighbors); the
        merge bookkeeping stays host-side numpy.

        `neighbors` overrides the covisibility-derived set — loop closing
        passes the loop candidate's neighborhood (the SearchAndFuse role:
        merging the revisit's duplicate landmarks into the corrected
        originals; without it the loop sides stay disjoint and tracking
        re-drifts on the duplicates).

        Async-safe like create_new_points: lock around assembly/apply,
        lock-free device wait, seq-validated apply against current truth."""
        with smap.lock:
            disp = self._fuse_dispatch(smap, kf_id, n_neighbors, neighbors)
            if disp is None:
                return 0
        outs, neighbors, ids_pad, seqs = disp
        m_all = np.asarray(jax.device_get(outs))
        with smap.lock:
            return self._fuse_apply(smap, kf_id, neighbors, ids_pad, seqs, m_all)

    def _fuse_dispatch(self, smap, kf_id: int, n_neighbors: int, neighbors):
        covis = smap.covisibility()
        row = covis[kf_id]
        if neighbors is None:
            order = np.argsort(-row)
            neighbors = [
                int(i) for i in order[:n_neighbors] if row[i] >= 15 and i != kf_id
            ]
        else:
            neighbors = [int(i) for i in neighbors[:n_neighbors] if i != kf_id]
        lm_ids = smap.keyframe_landmarks(kf_id)
        if len(lm_ids) == 0 or not neighbors:
            return None
        pad = smap.f_max
        ids_pad = np.zeros(pad, np.int32)
        ids_pad[: min(len(lm_ids), pad)] = lm_ids[:pad]
        base_valid = (np.arange(pad) < len(lm_ids)) & smap.hview("lm_valid")[ids_pad]
        NB = n_neighbors
        F = smap.f_max
        nb_T = np.tile(np.eye(4, dtype=np.float32), (NB, 1, 1))
        nb_xy = np.zeros((NB, F, 2), np.float32)
        nb_fv = np.zeros((NB, F), bool)
        nb_oct = np.zeros((NB, F), np.int32)
        nb_angle = np.zeros((NB, F), np.float32)
        nb_idx = np.zeros(NB, np.int32)  # pad lanes: row 0, inert (fv all-False)
        kf_pose_h = smap.hview("kf_pose")
        for i, nb in enumerate(neighbors):
            nb_T[i] = kf_pose_h[nb]
            nb_xy[i] = smap.hview("kf_xy")[nb]
            nb_fv[i] = smap.hview("kf_feat_valid")[nb]
            nb_oct[i] = smap.hview("kf_octave")[nb]
            nb_angle[i] = smap.hview("kf_angle")[nb]
            nb_idx[i] = nb
        lm_pos_h = smap.hview("lm_pos")
        outs = _fuse_match_neighbors(
            jnp.asarray(lm_pos_h[ids_pad]),
            jnp.asarray(smap.hview("lm_desc_pm1")[ids_pad]),
            jnp.asarray(base_valid),
            jnp.asarray(smap.hview("lm_octave")[ids_pad]),
            jnp.asarray(nb_T),
            jnp.asarray(nb_xy),
            jnp.asarray(nb_fv),
            jnp.asarray(nb_oct),
            jnp.asarray(nb_angle),
            smap.kf_desc_pm1,
            jnp.asarray(nb_idx),
            jnp.asarray(self.cfg.cam.K),
            jnp.asarray(self.scale_factors),
        )
        seqs = {k: int(smap.kf_seq[k]) for k in [kf_id] + neighbors}
        return outs, neighbors, ids_pad, seqs

    def _fuse_apply(self, smap, kf_id, neighbors, ids_pad, seqs, m_all) -> int:
        kf_valid = smap.kf_valid_host()
        if not kf_valid[kf_id] or int(smap.kf_seq[kf_id]) != seqs[kf_id]:
            return 0
        kf_pose_h = smap.hview("kf_pose")
        # landmark identity: a slot recycled during the device wait must not
        # receive the stale match results (lm_valid re-checked per landmark)
        lm_valid_now = smap.lm_valid_host()[ids_pad]
        n_fused = 0
        for i, nb in enumerate(neighbors):
            if not kf_valid[nb] or int(smap.kf_seq[nb]) != seqs[nb]:
                continue
            m_h = m_all[i]
            obs_b = smap.hview("kf_obs")[nb]
            hit = np.nonzero((m_h >= 0) & lm_valid_now)[0]
            lms = ids_pad[hit]
            feats = m_h[hit]
            existing = obs_b[feats]
            # free features gain an observation — one batched scatter
            free = existing < 0
            if free.any():
                smap.add_observations(nb, feats[free], lms[free])
                n_fused += int(free.sum())
            # conflicting features hold ANOTHER landmark -> candidate merge;
            # the landmark with more observations wins. Counted
            # (n_fuse_merges) so the "rare enough for a host loop" claim is
            # verifiable at scale (VERDICT r2 weak #7).
            # POSITION GATE: merge only true duplicates — the two 3D points
            # must agree within 5% of viewing depth. Without it, dense
            # repetitive-texture regimes (KITTI corridor, 2k features,
            # near-identical consecutive KFs) chain-merge DISTINCT points
            # that happen to match by window+descriptor: measured 14,408
            # merges in 100 frames, corrupting the map until tracking died
            # (round-4 turn diagnosis). ORB-SLAM's Fuse implicitly bounds
            # this with its reprojection-error check on the replacement.
            conf_lm = lms[~free]
            conf_ex = existing[~free]
            if len(conf_lm):
                lm_pos_live = smap.hview("lm_pos")
                T_nb = kf_pose_h[nb]
                X_lm = lm_pos_live[conf_lm]
                X_ex = lm_pos_live[conf_ex]
                depth = (X_ex @ T_nb[:3, :3].T + T_nb[:3, 3])[:, 2]
                agree = np.linalg.norm(X_lm - X_ex, axis=1) < 0.05 * np.maximum(
                    depth, 1e-3
                )
                for lm, ex, ok_ in zip(conf_lm, conf_ex, agree):
                    lm, ex = int(lm), int(ex)
                    if ex == lm or not ok_:
                        continue
                    if smap.lm_obs_count[ex] >= smap.lm_obs_count[lm]:
                        smap.replace_landmark(lm, ex)
                    else:
                        smap.replace_landmark(ex, lm)
                    n_fused += 1
                    self.n_fuse_merges += 1
        return n_fused

    # ---------- culling ----------

    def cull_landmarks(self, smap, current_kf: int):
        """Recent-landmark culling (ORB-SLAM MapPointCulling semantics):
        a new landmark must be observed by >= 3 keyframes within 2 keyframes
        of its creation or it is erased. Ages are measured in keyframe
        SEQUENCE numbers (slot-recycling safe); stale entries whose slot was
        recycled (uid mismatch) or already erased are dropped."""
        with smap.lock:
            cur_seq = int(smap.kf_seq[current_kf])
            lm_valid = smap.lm_valid_host()
            keep, erase = [], []
            for lm_id, uid, created_seq in self._recent_lms:
                if smap.lm_uid[lm_id] != uid or not lm_valid[lm_id]:
                    continue  # recycled or already erased elsewhere
                age = cur_seq - created_seq
                n_obs = smap.lm_obs_count[lm_id]
                if age >= 2:
                    if n_obs < 3:
                        erase.append(lm_id)
                    # else: graduated
                else:
                    keep.append((lm_id, uid, created_seq))
            self._recent_lms = keep
            if erase:
                smap.erase_landmarks(np.array(erase, np.int32))
            return len(erase)

    def cull_keyframes(self, smap, kf_id: int) -> int:
        """Redundant-keyframe culling (ORB-SLAM KeyFrameCulling semantics,
        absent in the reference — SURVEY.md §2.1 #5): a covisible KF is
        removed when >= 90% of its landmarks are observed by at least 3
        other keyframes at the same or a finer octave. Vectorized via a
        per-landmark cumulative octave histogram."""
        with smap.lock:
            return self._cull_keyframes_locked(smap, kf_id)

    def _cull_keyframes_locked(self, smap, kf_id: int) -> int:
        covis = smap.covisibility()
        # the two INITIAL keyframes (by insertion seq, slot-recycling safe)
        # are exempt — they carry the map gauge
        candidates = [
            int(j)
            for j in np.nonzero(covis[kf_id] >= 15)[0]
            if smap.kf_seq[j] >= 2 and j != kf_id
        ]
        if not candidates:
            return 0
        obs_all = smap.hview("kf_obs")[: smap.n_kf].copy()  # writable
        oct_all = smap.hview("kf_octave")[: smap.n_kf]
        valid_kf = smap.hview("kf_valid")[: smap.n_kf].copy()
        n_levels = self.cfg.n_levels
        # per-(landmark, octave) observation histogram, built ONCE and
        # decremented as keyframes are culled (was rebuilt per candidate)
        sel = valid_kf[:, None] & (obs_all >= 0)
        lm_flat = obs_all[sel]
        oct_flat = np.clip(oct_all[sel], 0, n_levels - 1)
        hist = np.zeros((smap.l_max, n_levels), np.int32)
        np.add.at(hist, (lm_flat, oct_flat), 1)
        # cumulative histogram hoisted OUT of the candidate loop (VERDICT r2:
        # the O(l_max * n_levels) cumsum per candidate was the remaining host
        # hot loop); on a cull it is decremented in place per affected level
        cum = np.cumsum(hist, axis=1)
        n_culled = 0
        for k in candidates:
            if not valid_kf[k]:
                continue
            feats = np.nonzero(obs_all[k] >= 0)[0]
            if len(feats) < 20:
                continue
            lms = obs_all[k, feats]
            octs = np.clip(oct_all[k, feats] + 1, 0, n_levels - 1)
            n_better = cum[lms, octs] - 1  # minus this KF's own observation
            redundant = int((n_better >= 3).sum())
            if redundant > 0.9 * len(feats):
                smap.remove_keyframe(k)
                rm_oct = np.clip(oct_all[k, feats], 0, n_levels - 1)
                for lvl in range(n_levels):
                    in_lvl = rm_oct <= lvl
                    np.subtract.at(cum[:, lvl], lms[in_lvl], 1)
                valid_kf[k] = False
                obs_all[k] = -1
                n_culled += 1
        return n_culled

    # ---------- counters ----------

    def stats(self) -> dict:
        return {
            "n_ba_truncations": self.n_ba_truncations,
            "n_ba_obs_drops": self.n_ba_obs_drops,
            "n_fuse_merges": self.n_fuse_merges,
            "n_lm_evictions": self.n_lm_evictions,
            "n_recent_lms": len(self._recent_lms),
        }

    # ---------- entry point ----------

    def process_new_keyframe(self, smap, kf_id: int, cull_kfs: bool = True):
        """ProcessNewKeyFrame + the absent capabilities, in order
        (ref src/LocalMapping.cpp:11-21 Run + SURVEY.md §3.5 gap list).

        Invariant refreshes are BATCHED: one refresh program at the END of
        the epoch over every landmark the epoch touched, instead of one per
        stage (start + post-create + post-fuse). On the relay-fronted TPU
        each device program costs ~45 ms of fixed latency (BENCH_NOTES r3),
        so the keyframe path's stage COUNT is the dominant lever
        (VERDICT r3 next #3); intermediate stages tolerate one-epoch-stale
        invariants (create does not read them; fuse reads desc/dist gates
        whose provisional values are permissive)."""
        with smap.lock:
            if not smap.kf_valid_host()[kf_id]:
                return  # evicted while queued (async mode)
            # coalesce the just-inserted keyframe's row-mirror updates (6
            # tables) into one program before the epoch's kernels read them
            smap.flush_mirrors()
        self.cull_landmarks(smap, kf_id)
        with smap.lock:
            # landmark-table pressure: keep headroom for this epoch's new
            # points by evicting the weakest old landmarks (never the current
            # KF's set or the still-maturing recent ones)
            cap = smap.landmark_capacity()
            headroom = min(2048, smap.l_max // 8)
            if cap < headroom:
                # protect the whole covisible WINDOW's landmark union, not
                # just the current KF's set + recent: the next tracked frames
                # project exactly the window's landmarks, and evicting up to
                # ~2048 of them in one epoch momentarily thinned the tracked
                # local map right at saturation (ADVICE r4)
                covis_row = smap.covisibility()[kf_id]
                window = [kf_id] + [
                    int(j)
                    for j in np.argsort(-covis_row)[: self.cfg.local_window]
                    if covis_row[j] >= 15 and j != kf_id
                ]
                protect = np.concatenate(
                    [smap.keyframe_landmarks(k) for k in window]
                    + [np.array([i for i, _, _ in self._recent_lms], np.int64)]
                )
                self.n_lm_evictions += smap.evict_landmarks(
                    headroom - cap, protect
                )
        self.create_new_points(smap, kf_id)
        self.fuse_neighbors(smap, kf_id)
        if smap.n_kf_active() >= 3:
            self.local_ba(smap, kf_id)
        if cull_kfs and smap.n_kf_active() >= 8:
            self.cull_keyframes(smap, kf_id)
        # one end-of-epoch refresh: the keyframe's (post-create/fuse/BA)
        # landmark set, computed from post-BA geometry
        with smap.lock:
            kf_lms = (
                smap.keyframe_landmarks(kf_id)
                if smap.kf_valid_host()[kf_id]
                else np.zeros(0, np.int64)
            )
        self.refresh_landmarks(smap, kf_lms)
        # coalesce every pending mirror-row update into ONE program before
        # tracking resumes (the next fused frame reads 7 landmark mirrors —
        # lazily that is 7 separate relay execute sequences)
        with smap.lock:
            smap.flush_mirrors()
