"""Tracking: the per-frame state machine driving the whole pipeline.

Redesign of the reference's Tracking (src/Tracking.cpp, SURVEY.md §3.2-3.4):
the 5-state machine (include/Tracking.h:21-28) runs on the host; every
numeric stage (extraction, matching, pose optimization, initialization) is a
jitted fixed-shape computation. Implements the stages the reference stubbed:
SearchByProjection-based motion-model tracking (:344-349 called an empty
stub), SearchLocalPoints (:389-392 empty), keyframe insertion decision
(:140-141 comment only), relocalization (include/Tracking.h:45 empty), and
Reset (include/Tracking.h:33 empty).
"""

from __future__ import annotations

from enum import Enum

import jax.numpy as jnp
import numpy as np

from orbslam_in_practice_tpu.frontend.matcher import (
    search_by_projection,
    search_for_initialization,
    search_frame_to_kf,
)
from orbslam_in_practice_tpu.frontend.orb import ORBExtractor
from orbslam_in_practice_tpu.optim.pose_opt import pose_optimization
from orbslam_in_practice_tpu.slam.initializer import initialize_two_view
from orbslam_in_practice_tpu.slam.local_mapping import LocalMapper
from orbslam_in_practice_tpu.slam.map import SlamMap
from orbslam_in_practice_tpu.slam.relocalization import relocalize
from orbslam_in_practice_tpu.slam.loop_closing import LoopCloser
from orbslam_in_practice_tpu.optim.ba import BAProblem, build_point_obs, bundle_adjustment

import jax


class TrackingState(Enum):
    """ref include/Tracking.h:21-28 (STATE_NotReady..STATE_Lost)."""

    NOT_READY = 0
    NO_IMAGES = 1
    NOT_INITIALIZED = 2
    OK = 3
    LOST = 4


LOCAL_MAP_MAX = 4096  # padded local-map landmark budget


class Tracking:
    def __init__(self, config):
        self.cfg = config
        self.cam = config.cam
        self.K = jnp.asarray(self.cam.K)
        self.extractor = ORBExtractor(
            config.n_features,
            config.scale_factor,
            config.n_levels,
            config.ini_th_fast,
            config.min_th_fast,
            cam=self.cam,
        )
        # doubled budget for init (ref src/Tracking.cpp:48)
        self.ini_extractor = ORBExtractor(
            2 * config.n_features,
            config.scale_factor,
            config.n_levels,
            config.ini_th_fast,
            config.min_th_fast,
            cam=self.cam,
        )
        self.scale_factors = jnp.asarray(
            np.array([config.scale_factor**i for i in range(config.n_levels)], np.float32)
        )
        self.inv_level_sigma2 = np.asarray(self.extractor.inv_level_sigma2)
        # map feature dim sized for the doubled-budget init extractor
        self.map = SlamMap(config.k_max, config.l_max, self.ini_extractor.total)
        self.mapper = LocalMapper(config, self.extractor)
        self.loop_closer = LoopCloser(config) if config.enable_loop_closing else None

        self.state = TrackingState.NO_IMAGES
        self.frame_id = -1
        self.last_frame = None
        self.last_pose = None  # (4, 4) Tcw of last frame
        self.last_obs = None  # (F,) landmark ids of last frame
        self.velocity = None  # (4, 4) Tcw_cur @ inv(Tcw_last)
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self._peak_inliers_since_kf = 0
        self.last_reloc_frame_id = -1e9
        # init buffers (ref MonocularInitialization :157-224)
        self._init_frame = None
        self._init_frame_id = -1
        self._prev_matched = None
        # trajectory log: (frame_id, timestamp, Tcw or None, ref_kf,
        # T_rel = Tcw_frame @ inv(Tcw_refkf at track time)) — relative
        # anchoring lets later BA / loop closures retroactively refine the
        # whole trajectory (ORB-SLAM's SaveTrajectoryTUM semantics)
        self.trajectory: list = []
        self.n_inliers = 0
        self.n_local_map_truncations = 0  # counted cap (VERDICT r4 weak #3)
        self.new_kf_ids: list = []
        self._fused_cache = {}  # image shape -> jitted fused steady step
        self.use_fused = True  # single-program steady state (tests flip this)
        self.map.on_kf_removed = self._reanchor_trajectory
        # asynchronous local mapping (the reference's producer/consumer
        # split, include/LocalMapping.h:17-22 — see slam/async_mapping.py):
        # keyframe epochs run in a worker thread; tracking keeps going on
        # the pre-epoch map. Worker→tracking events (loop-closure rebase)
        # are applied at the next frame boundary.
        self._pending_closure_rebase = None
        self.async_driver = None
        if getattr(config, "async_mapping", False):
            from orbslam_in_practice_tpu.slam.async_mapping import (
                AsyncMapperDriver,
            )

            self.async_driver = AsyncMapperDriver(self)

    # ------------------------------------------------------------------
    def reset(self):
        """Real Reset (ref include/Tracking.h:33 had an empty body)."""
        if self.async_driver is not None:
            # finish queued epochs against the old map before swapping it
            self.async_driver.drain()
            self._pending_closure_rebase = None
        old_map = self.map
        self.map = SlamMap(self.cfg.k_max, self.cfg.l_max, self.ini_extractor.total)
        self.map.on_kf_removed = self._reanchor_trajectory
        self.mapper = LocalMapper(self.cfg, self.extractor)
        if self.loop_closer is not None:
            self.loop_closer = LoopCloser(self.cfg)
        self.state = TrackingState.NOT_INITIALIZED
        self.last_pose = None
        self.last_obs = None
        self.velocity = None
        self.ref_kf = -1
        self._init_frame = None
        self._prev_matched = None
        # freeze old trajectory entries at their absolute poses: the new
        # map restarts slot ids AND seq numbers from 0, so a stale
        # (ref, ref_seq) pair would otherwise re-anchor to an unrelated
        # keyframe of the new map in materialize_trajectory. Entries are
        # MATERIALIZED through the pre-reset map first (T_rel @ current
        # kf_pose[ref]) so BA/loop-closure refinement accumulated since
        # track time is preserved in the frozen pose (ADVICE r4) —
        # old_map still holds the pre-reset keyframe poses at this point.
        old_valid = old_map.kf_valid_host()
        old_pose = old_map.hview("kf_pose")
        old_seq = old_map.kf_seq
        frozen = []
        for fid, ts, pose, ref, T_rel, seq in self.trajectory:
            if (
                pose is not None
                and ref >= 0
                and T_rel is not None
                and old_valid[ref]
                and old_seq[ref] == seq
            ):
                pose = T_rel @ old_pose[ref]
            frozen.append((fid, ts, pose, -1, None, -1))
        self.trajectory = frozen

    # ------------------------------------------------------------------
    def track_mono(self, image: jnp.ndarray, timestamp: float):
        """Per-frame entry (ref track_mono :54-82 + track :84-155).

        image: (H, W) float32 grayscale [0, 255].
        Returns the current Tcw (4, 4) numpy or None while uninitialized.
        """
        self.frame_id += 1
        if self.async_driver is not None:
            self.async_driver.raise_errors()
            self._consume_async_events()

        if (
            self.use_fused
            and self.state == TrackingState.OK
            and self.velocity is not None
            and self.last_obs is not None
        ):
            # hot path: the whole steady-state frame as ONE device program
            status, frame = self._track_frame_fused(image)
            if status == "ok":
                ok = True
            elif status == "stage2":
                # local-map tracking failed (same outcome as the unfused flow)
                self.state = TrackingState.LOST
                self.velocity = None
                ok = False
            else:  # motion model failed -> host fallbacks (ref-KF tracking)
                if frame is None:
                    frame = self.extractor(jnp.asarray(image, jnp.float32))
                with self.map.lock:
                    ok = self._track_frame(frame, try_motion=False)
            pose = self.last_pose if ok else None
            with self.map.lock:
                # under the lock: a worker-side keyframe cull REBINDS
                # self.trajectory (_reanchor_trajectory) — an unlocked
                # append could land on the stale list and be lost
                if pose is None:
                    self.trajectory.append(
                        (self.frame_id, timestamp, None, -1, None, -1)
                    )
                    return None
                return self._log_pose(pose, timestamp)

        extractor = (
            self.ini_extractor
            if self.state in (TrackingState.NO_IMAGES, TrackingState.NOT_INITIALIZED)
            else self.extractor
        )
        frame = extractor(jnp.asarray(image, jnp.float32))

        if self.state == TrackingState.NO_IMAGES:
            self.state = TrackingState.NOT_INITIALIZED

        if self.state == TrackingState.NOT_INITIALIZED:
            with self.map.lock:
                self._monocular_initialization(frame)
            pose = self.last_pose if self.state == TrackingState.OK else None
        elif self.state == TrackingState.OK:
            with self.map.lock:
                ok = self._track_frame(frame)
            pose = self.last_pose if ok else None
        else:  # LOST
            if self.map.n_kf_active() <= 5:
                # reset-on-early-lost (ORB-SLAM Tracking::track's mono
                # reset when lost soon after initialization — the gap at
                # ref src/Tracking.cpp:143-146, empty include/Tracking.h:33):
                # a 5-keyframe map is cheaper to rebuild than to relocalize
                # against
                self.reset()
                pose = None
            else:
                with self.map.lock:
                    ok = self._relocalize(frame)
                pose = self.last_pose if ok else None

        with self.map.lock:
            if pose is None:
                self.trajectory.append(
                    (self.frame_id, timestamp, None, -1, None, -1)
                )
                return None
            return self._log_pose(pose, timestamp)

    def _consume_async_events(self):
        """Apply worker→tracking events at the frame boundary (async mode).

        Loop-closure rebase: the worker corrected keyframe poses wholesale;
        re-anchor last_pose through the reference keyframe's pose delta so
        the motion model restarts from the corrected geometry (the sync
        path's `last_pose = map.kf_pose[kf_id]`, done late)."""
        ev = self._pending_closure_rebase
        if ev is None:
            return
        self._pending_closure_rebase = None
        ref_kf, ref_seq, pose_before = ev
        with self.map.lock:
            if (
                self.last_pose is not None
                and pose_before is not None
                and ref_kf >= 0
                and self.map.kf_valid_host()[ref_kf]
                and int(self.map.kf_seq[ref_kf]) == ref_seq
            ):
                pose_now = self.map.hview("kf_pose")[ref_kf]
                self.last_pose = jnp.asarray(
                    np.asarray(self.last_pose)
                    @ np.linalg.inv(pose_before)
                    @ pose_now
                )
                self._prev_pose = self.last_pose
            self.velocity = None  # the motion model is stale post-closure

    def _reanchor_trajectory(self, kf_id: int, kf_seq: int, kf_pose: np.ndarray):
        """Re-anchor trajectory entries referencing a keyframe being removed
        to the nearest surviving keyframe (by insertion seq): T_rel' =
        T_rel @ T_old @ inv(T_new), using poses at removal time — the
        relative chain is preserved, so later map corrections (local BA,
        loop closure) keep refining these frames retroactively."""
        survivors = self.map.valid_keyframes_by_seq()
        survivors = survivors[survivors != kf_id]
        if len(survivors) == 0:
            return
        seqs = self.map.kf_seq[survivors]
        new_ref = int(survivors[np.argmin(np.abs(seqs - kf_seq))])
        new_seq = int(self.map.kf_seq[new_ref])
        T_new_inv = np.linalg.inv(self.map.hview("kf_pose")[new_ref])
        out = []
        for entry in self.trajectory:
            fid, ts, pose, ref, T_rel, ref_seq = entry
            if ref == kf_id and ref_seq == kf_seq and T_rel is not None:
                out.append(
                    (fid, ts, pose, new_ref, T_rel @ kf_pose @ T_new_inv, new_seq)
                )
            else:
                out.append(entry)
        self.trajectory = out

    def _log_pose(self, pose, timestamp):
        pose_np = np.asarray(pose)
        ref = self.ref_kf
        if ref >= 0:
            T_ref = self.map.hview("kf_pose")[ref]
            T_rel = pose_np @ np.linalg.inv(T_ref)
            ref_seq = int(self.map.kf_seq[ref])
        else:
            T_rel = None
            ref_seq = -1
        self.trajectory.append(
            (self.frame_id, timestamp, pose_np, ref, T_rel, ref_seq)
        )
        return pose_np

    # ------------------------------------------------------------------
    # Initialization (ref :157-284)
    # ------------------------------------------------------------------
    def _monocular_initialization(self, frame):
        n_kp = int(frame.num_valid())
        if self._init_frame is None:
            if n_kp > 100:  # ref :159-171
                self._init_frame = frame
                self._init_frame_id = self.frame_id
                self._prev_matched = frame.xy
            return
        if n_kp <= 100:
            self._init_frame = None
            return

        matches = search_for_initialization(
            self._init_frame, frame, self._prev_matched, window=100, nn_ratio=0.9
        )
        m_h = np.asarray(matches)
        n_matches = int((m_h >= 0).sum())
        if n_matches < 100:  # ref :190-196
            self._init_frame = None
            return
        # follow matched features: search centers for the next attempt track
        # the current positions (ORB-SLAM's vbPrevMatched update)
        prev = np.array(np.asarray(self._prev_matched))
        frame_xy = np.asarray(frame.xy)
        sel = m_h >= 0
        prev[sel] = frame_xy[m_h[sel]]
        self._prev_matched = jnp.asarray(prev)

        p1 = self._init_frame.xy
        p2 = frame.xy[jnp.maximum(matches, 0)]
        mask = matches >= 0
        result = initialize_two_view(
            p1, p2, mask, self.K, jax.random.PRNGKey(0)
        )
        if not bool(result["success"]):
            return

        self._create_initial_map(frame, matches, result)

    def _create_initial_map(self, frame, matches, result):
        """ref CreateInitialMapMonocular :226-284, with real BA write-back."""
        R = result["R"]
        t = result["t"]
        good = np.asarray(result["good_mask"])
        X = np.asarray(result["points3d"])  # frame-1 camera coords == world
        m_h = np.asarray(matches)

        T1 = jnp.eye(4, dtype=jnp.float32)
        T2 = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)

        f1 = self._init_frame
        feat1 = np.nonzero(good)[0]
        feat2 = m_h[feat1]
        ids = self.map.allocate_landmarks(len(feat1))
        feat1 = feat1[: len(ids)]
        feat2 = feat2[: len(ids)]

        obs1 = np.full(f1.n_features, -1, np.int32)
        obs1[feat1] = ids
        obs2 = np.full(frame.n_features, -1, np.int32)
        obs2[feat2] = ids

        kf1 = self.map.add_keyframe(f1, T1, obs1, self._init_frame_id)
        kf2 = self.map.add_keyframe(frame, T2, obs2, self.frame_id)

        oct1 = np.asarray(f1.octave)[feat1]
        desc1 = np.asarray(f1.desc_pm1)[feat1]
        self.map.add_landmarks(
            ids,
            X[feat1],
            desc1,
            np.zeros((len(ids), 3), np.float32),
            oct1,
            np.zeros(len(ids), np.float32),
            np.full(len(ids), np.inf, np.float32),
            first_kf=kf1,
        )
        self.mapper.refresh_landmarks(self.map, ids)

        # full BA on the initial map (ref GlobalBundleAdjustemnt(map, 20) :254)
        self._initial_global_ba(kf1, kf2, ids)

        # median-depth scale normalization (ref :256-278)
        Xn = self.map.hview("lm_pos")[ids].copy()
        T2n = self.map.hview("kf_pose")[kf2].copy()  # writable copy
        # KF1 is the world origin, so depth in KF1 == world z
        med = float(np.median(Xn[:, 2]))
        if med <= 0 or (self.map.hview("kf_obs")[kf2] >= 0).sum() < 80:
            self.reset()
            return
        scale = 1.0 / med
        Xn = Xn * scale
        T2n[:3, 3] *= scale
        self.map.set_landmark_positions(ids, Xn)
        self.map.set_kf_poses([kf2], [T2n])
        self.mapper.refresh_landmarks(self.map, ids)

        self.last_pose = jnp.asarray(T2n)
        self.last_frame = frame
        self.last_obs = obs2
        self.ref_kf = kf2
        self.last_kf_frame_id = self.frame_id
        self.velocity = None
        self.state = TrackingState.OK
        self.new_kf_ids += [kf1, kf2]

    def _initial_global_ba(self, kf1, kf2, ids, iterations: int = 20):
        kf_idx, feat_idx, which = self.map.observations_of(ids)
        obs_uv = self.map.hview("kf_xy")[kf_idx, feat_idx]
        obs_oct = self.map.hview("kf_octave")[kf_idx, feat_idx]
        inv_s2 = self.inv_level_sigma2[obs_oct.clip(0, self.cfg.n_levels - 1)]
        cams = [kf1, kf2]
        cam_slot = {kf1: 0, kf2: 1}
        obs_cam = np.array([cam_slot[int(k)] for k in kf_idx], np.int32)
        L = len(ids)
        prob = BAProblem(
            poses=jnp.asarray(self.map.hview("kf_pose")[cams]),
            points=self.map.lm_pos[jnp.asarray(ids)],
            obs_cam=jnp.asarray(obs_cam),
            obs_point=jnp.asarray(which.astype(np.int32)),
            obs_uv=jnp.asarray(obs_uv.astype(np.float32)),
            obs_inv_sigma2=jnp.asarray(inv_s2.astype(np.float32)),
            obs_mask=jnp.ones(len(obs_cam), bool),
            point_obs=jnp.asarray(build_point_obs(which, L, 4)),
            fixed_cam=jnp.asarray(np.array([True, False])),
            K=self.K,
        )
        poses_new, points_new, chi2 = bundle_adjustment(prob, iterations=iterations)
        self.map.set_kf_poses(cams, poses_new)
        self.map.set_landmark_positions(ids, points_new)

    # ------------------------------------------------------------------
    # Steady-state tracking (ref :95-152)
    # ------------------------------------------------------------------
    def _build_fused_steady(self):
        """One jitted program for the whole steady-state frame (the design
        stance of SURVEY.md §7.1: the per-frame pipeline is ONE fixed-shape
        computation): extract -> motion-model projection match (radius 15,
        in-graph retry at 30) -> pose-only BA -> local-map projection match
        (radius 4, landmark invariants) -> pose-only BA -> velocity update.

        The unfused per-stage methods below remain as fallbacks (reference-
        keyframe tracking, relocalization) and as the behavioral spec.
        """
        ext = self.extractor
        K = self.K
        sf = self.scale_factors
        inv_sig = jnp.asarray(self.inv_level_sigma2)
        n_levels = self.cfg.n_levels
        from jax import lax

        def obs_from_matches(frame, matches, ids, lm_pos):
            n_set = matches.shape[0]
            obs_loc = jnp.full(frame.n_features, -1, jnp.int32)
            obs_loc = obs_loc.at[jnp.maximum(matches, 0)].max(
                jnp.where(matches >= 0, jnp.arange(n_set, dtype=jnp.int32), -1)
            )
            has = obs_loc >= 0
            sel = ids[jnp.maximum(obs_loc, 0)]
            Xw = lm_pos[sel]
            obs_glob = jnp.where(has, sel, -1)
            return obs_glob, Xw, has

        F = self.map.f_max

        def step(
            image, packed_ids, velocity, last_pose,
            lm_pos, lm_desc, lm_valid, lm_oct, lm_normal, lm_mind, lm_maxd,
        ):
            # packed_ids: ONE host->device upload for all per-frame id state
            # [mm_ids (f_max) | loc_ids (LOCAL_MAP_MAX) | mm_n | loc_n] —
            # each separate upload pays a full relay round trip (~22 ms,
            # BENCH_NOTES.md), which dominated the 189 ms tracking frame.
            mm_ids = packed_ids[:F]
            loc_ids = packed_ids[F : F + LOCAL_MAP_MAX]
            mm_n = packed_ids[F + LOCAL_MAP_MAX]
            loc_n = packed_ids[F + LOCAL_MAP_MAX + 1]
            # image arrives as 8.8 fixed-point uint16 (half the float32
            # payload through the ~37 MB/s relay, ~16 ms of a 67 ms frame)
            # and is decoded on device. Plain uint8 measured cheaper still
            # but its 1-level quantization pushed the rotation-dominant
            # noisy regime's ATE 0.02 -> 0.09; 8 fractional bits keep the
            # sub-level gradients FAST/BRIEF score against.
            frame = ext._extract(image.astype(jnp.float32) * (1.0 / 256.0))
            inv_s2 = inv_sig[jnp.clip(frame.octave, 0, n_levels - 1)]
            pred = velocity @ last_pose

            # stage 1: motion model (ref TrackWithMotionModel :330-372)
            v1 = (jnp.arange(mm_ids.shape[0]) < mm_n) & lm_valid[mm_ids]
            p1, d1, o1 = lm_pos[mm_ids], lm_desc[mm_ids], lm_oct[mm_ids]

            def match1(radius):
                m, _, _ = search_by_projection(
                    p1, d1, v1, o1, pred, frame, K, jnp.asarray(radius), sf
                )
                return m

            m15 = match1(15.0)
            m1 = lax.cond(
                jnp.sum(m15 >= 0) >= 20, lambda: m15, lambda: match1(30.0)
            )
            n_match1 = jnp.sum(m1 >= 0)
            obs1, Xw1, has1 = obs_from_matches(frame, m1, mm_ids, lm_pos)
            Tcw1, _, n1 = pose_optimization(
                pred, Xw1, frame.xy, inv_s2, has1 & frame.valid, K
            )
            ok1 = (n_match1 >= 20) & (n1 >= 10)
            Tcw1 = jnp.where(ok1, Tcw1, pred)

            # stage 2: local map (ref TrackLocalMap :374-387 + the empty
            # SearchLocalPoints), seeded by stage 1's pose
            v2 = (jnp.arange(loc_ids.shape[0]) < loc_n) & lm_valid[loc_ids]
            m2, _, _ = search_by_projection(
                lm_pos[loc_ids], lm_desc[loc_ids], v2, lm_oct[loc_ids],
                Tcw1, frame, K, jnp.asarray(4.0), sf,
                pts_normal=lm_normal[loc_ids],
                pts_min_dist=lm_mind[loc_ids],
                pts_max_dist=lm_maxd[loc_ids],
            )
            obs2, Xw2, has2 = obs_from_matches(frame, m2, loc_ids, lm_pos)
            Tcw2, inl2, n2 = pose_optimization(
                Tcw1, Xw2, frame.xy, inv_s2, has2 & frame.valid, K
            )
            obs2 = jnp.where(inl2, obs2, -1)
            ok = ok1 & (n2 >= 30)
            velocity_new = Tcw2 @ jnp.linalg.inv(last_pose)
            return frame, Tcw2, obs2, velocity_new, ok1, ok, n2

        return jax.jit(step)

    def _track_frame_fused(self, image):
        """Fused steady-state step; returns (status, frame).

        status: 'ok' (tracked), 'stage1' (motion model failed — caller should
        try reference-keyframe tracking on the returned frame), 'stage2'
        (local map failed — lost, matching the unfused control flow).
        """
        shape = tuple(image.shape)
        if shape not in self._fused_cache:
            self._fused_cache[shape] = self._build_fused_steady()
        step = self._fused_cache[shape]

        # assembly + dispatch under the map lock (mirror reads mutate the
        # mirror cache); the device wait below is lock-free so the async
        # mapping worker's host sections interleave with it
        with self.map.lock:
            mm = np.unique(self.last_obs[self.last_obs >= 0])
            if len(mm) < 10:
                return "stage1", None
            loc = self._local_map_landmarks()
            if len(loc) == 0:
                return "stage1", None
            m = self.map
            packed = np.empty(m.f_max + LOCAL_MAP_MAX + 2, np.int32)
            packed[: m.f_max] = _pad_ids(mm, m.f_max)
            packed[m.f_max : m.f_max + LOCAL_MAP_MAX] = _pad_ids(loc, LOCAL_MAP_MAX)
            packed[m.f_max + LOCAL_MAP_MAX] = min(len(mm), m.f_max)
            packed[m.f_max + LOCAL_MAP_MAX + 1] = min(len(loc), LOCAL_MAP_MAX)
            img_fx = np.clip(
                np.asarray(image, np.float32) * 256.0, 0.0, 65535.0
            ).astype(np.uint16)
            frame, Tcw, obs, vel, ok1, ok, n2 = step(
                jnp.asarray(img_fx),
                jnp.asarray(packed),
                self.velocity,
                jnp.asarray(self.last_pose),
                m.lm_pos, m.lm_desc_pm1, m.lm_valid, m.lm_octave,
                m.lm_normal, m.lm_min_dist, m.lm_max_dist,
            )
        # ONE device->host transfer for all small outputs (each separate read
        # costs a full relay round trip — BENCH_NOTES.md)
        ok1_h, ok_h, obs_h, n2_h = jax.device_get((ok1, ok, obs, n2))
        if not bool(ok1_h):
            return "stage1", frame
        if not bool(ok_h):
            return "stage2", frame
        with self.map.lock:
            self._prev_pose = self.last_pose
            self.last_pose = Tcw
            self.last_obs = obs_h
            self.velocity = vel
            self.n_inliers = int(n2_h)
            if self._need_new_keyframe(frame):
                self._insert_keyframe(frame)
        self.last_frame = frame
        return "ok", frame

    def _track_frame(self, frame, try_motion: bool = True) -> bool:
        ok = False
        if try_motion and self.velocity is not None:
            ok = self._track_with_motion_model(frame)
        if not ok:
            ok = self._track_reference_keyframe(frame)
        if not ok:
            self.state = TrackingState.LOST
            self.velocity = None
            return False

        ok = self._track_local_map(frame)
        if not ok:
            self.state = TrackingState.LOST
            self.velocity = None
            return False

        # velocity update (ref :122-138, fixing the uncopied-pose defect :131)
        if self.last_pose is not None:
            last_inv = np.linalg.inv(np.asarray(self._prev_pose))
            self.velocity = jnp.asarray(np.asarray(self.last_pose) @ last_inv)

        if self._need_new_keyframe(frame):
            self._insert_keyframe(frame)

        self.last_frame = frame
        return True

    def _gather_landmark_arrays(self, lm_ids: np.ndarray, pad: int, invariants=False):
        ids = _pad_ids(lm_ids, pad)
        ids_j = jnp.asarray(ids)
        valid = jnp.asarray((np.arange(pad) < len(lm_ids)))
        base = (
            self.map.lm_pos[ids_j],
            self.map.lm_desc_pm1[ids_j],
            valid & self.map.lm_valid[ids_j],
            self.map.lm_octave[ids_j],
            ids,
        )
        if not invariants:
            return base
        return base + (
            self.map.lm_normal[ids_j],
            self.map.lm_min_dist[ids_j],
            self.map.lm_max_dist[ids_j],
        )

    def _pose_opt_from_matches(self, frame, lm_ids_padded, matches, Tcw_init):
        """Build (landmark, feature) pairs -> pose_optimization -> obs array."""
        m_h = np.asarray(matches)
        sel = m_h >= 0
        # per-feature landmark binding
        obs = np.full(frame.n_features, -1, np.int32)
        obs[m_h[sel]] = lm_ids_padded[: len(m_h)][sel]
        obs_j = jnp.asarray(obs)
        has = obs_j >= 0
        Xw = self.map.lm_pos[jnp.maximum(obs_j, 0)]
        inv_s2 = jnp.asarray(self.inv_level_sigma2)[
            jnp.clip(frame.octave, 0, self.cfg.n_levels - 1)
        ]
        Tcw, inlier, n_in = pose_optimization(
            Tcw_init, Xw, frame.xy, inv_s2, has & frame.valid, self.K
        )
        inl_h = np.asarray(inlier)
        obs[~inl_h] = -1
        return Tcw, obs, int(np.asarray(n_in))

    def _track_with_motion_model(self, frame) -> bool:
        """ref TrackWithMotionModel :330-372 with a REAL SearchByProjection."""
        pred = jnp.asarray(np.asarray(self.velocity) @ np.asarray(self.last_pose))
        lm_ids = self.last_obs[self.last_obs >= 0]
        lm_ids = np.unique(lm_ids)
        if len(lm_ids) < 10:
            return False
        pts, desc, valid, octv, ids_pad = self._gather_landmark_arrays(
            lm_ids, self.map.f_max
        )
        for radius in (15.0, 30.0):  # ref th=7 then retry wider (:344-349)
            matches, _, _ = search_by_projection(
                pts, desc, valid, octv, pred, frame, self.K,
                jnp.asarray(radius), self.scale_factors,
            )
            if int((np.asarray(matches) >= 0).sum()) >= 20:
                break
        if int((np.asarray(matches) >= 0).sum()) < 20:
            return False
        self._prev_pose = self.last_pose
        Tcw, obs, n_in = self._pose_opt_from_matches(frame, ids_pad, matches, pred)
        if n_in < 10:  # ref :358-371
            return False
        self.last_pose = Tcw
        self.last_obs = obs
        self.n_inliers = n_in
        return True

    def _track_reference_keyframe(self, frame) -> bool:
        """ref TrackReferenceKeyFrame :287-328 (SearchByBoW role)."""
        if self.ref_kf < 0:
            return False
        kf = self.ref_kf
        kf_has_lm = self.map.kf_feat_valid[kf] & (self.map.kf_obs[kf] >= 0)
        matches = search_frame_to_kf(
            frame,
            self.map.kf_xy[kf],
            self.map.kf_angle[kf],
            self.map.kf_desc_pm1[kf],
            kf_has_lm,
        )
        m_h = np.asarray(matches)
        if (m_h >= 0).sum() < 15:  # ref requires >=15 via BoW matches
            return False
        # convert feature->feature matches into feature->landmark obs
        kf_obs_h = self.map.kf_obs_host()[kf]
        obs = np.full(frame.n_features, -1, np.int32)
        sel = m_h >= 0
        obs[sel] = kf_obs_h[m_h[sel]]
        obs_j = jnp.asarray(obs)
        has = obs_j >= 0
        Xw = self.map.lm_pos[jnp.maximum(obs_j, 0)]
        inv_s2 = jnp.asarray(self.inv_level_sigma2)[
            jnp.clip(frame.octave, 0, self.cfg.n_levels - 1)
        ]
        self._prev_pose = self.last_pose
        Tcw, inlier, n_in = pose_optimization(
            jnp.asarray(self.last_pose), Xw, frame.xy, inv_s2, has & frame.valid, self.K
        )
        if int(np.asarray(n_in)) < 10:  # ref :312-327
            return False
        inl_h = np.asarray(inlier)
        obs[~inl_h] = -1
        self.last_pose = Tcw
        self.last_obs = obs
        self.n_inliers = int(np.asarray(n_in))
        return True

    def _local_map_landmarks(self) -> np.ndarray:
        """K1 covisibility vote (ref UpdateLocalKeyFrames :400-443 +
        UpdateLocalPoints :445-471, with the indexing defect :462 fixed).

        Returns at most LOCAL_MAP_MAX landmark ids. When the vote exceeds
        the budget, the STRONGEST landmarks are kept — ordered by
        observation count, ties broken toward landmarks of the
        most-voted local keyframes — and the clip is counted
        (n_local_map_truncations): VERDICT r4 weak #3, the slot-order
        `[:LOCAL_MAP_MAX]` truncation dropped the NEWEST landmarks first
        exactly when the map was densest, silently."""
        cur_lms = np.unique(self.last_obs[self.last_obs >= 0])
        if len(cur_lms) == 0:
            return cur_lms
        kf_idx, _, _ = self.map.observations_of(cur_lms)
        k1, votes = np.unique(kf_idx, return_counts=True)
        # K1 keyframes + expand via top covisible neighbors (the K2 expansion
        # the reference left absent, :441-442)
        covis = self.map.covisibility()
        local_kfs = set(int(k) for k in k1)
        for k in list(local_kfs):
            nb = np.argsort(-covis[k])[:3]
            for j in nb:
                if covis[k][j] >= 15:
                    local_kfs.add(int(j))
        lms = [self.map.keyframe_landmarks(k) for k in sorted(local_kfs)]
        if not lms:
            return cur_lms
        out = np.unique(np.concatenate(lms))
        if len(out) > LOCAL_MAP_MAX:
            self.n_local_map_truncations += 1
            order = np.argsort(-self.map.lm_obs_count[out], kind="stable")
            out = np.sort(out[order[:LOCAL_MAP_MAX]])
        return out

    def _track_local_map(self, frame) -> bool:
        """ref TrackLocalMap :374-387 + the empty SearchLocalPoints :389-392."""
        lm_ids = self._local_map_landmarks()
        if len(lm_ids) == 0:
            return False
        pts, desc, valid, octv, ids_pad, normal, min_d, max_d = (
            self._gather_landmark_arrays(lm_ids, LOCAL_MAP_MAX, invariants=True)
        )
        matches, _, _ = search_by_projection(
            pts, desc, valid, octv, jnp.asarray(self.last_pose), frame, self.K,
            jnp.asarray(4.0), self.scale_factors,
            pts_normal=normal, pts_min_dist=min_d, pts_max_dist=max_d,
        )
        Tcw, obs, n_in = self._pose_opt_from_matches(
            frame, ids_pad, matches, jnp.asarray(self.last_pose)
        )
        # ref requires >=30 local-map inliers (original ORB-SLAM)
        if n_in < 30:
            return False
        self.last_pose = Tcw
        self.last_obs = obs
        self.n_inliers = n_in
        return True

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, frame) -> bool:
        """Keyframe decision (absent in ref :140-141; ORB-SLAM criteria).

        The fixed-shape table never blocks insertion: when full, the
        weakest-connected old keyframe is evicted in _insert_keyframe
        (slot recycling — SURVEY.md §7.1's free-list design)."""
        frames_since_kf = self.frame_id - self.last_kf_frame_id
        if frames_since_kf < 1:
            return False
        # no insertion right after relocalization (ORB-SLAM's mMaxFrames guard)
        if (
            self.last_reloc_frame_id >= 0
            and self.frame_id < self.last_reloc_frame_id + int(self.cfg.fps)
            and self.map.n_kf_active() > int(self.cfg.fps)
        ):
            return False
        # reference tracked count = ref-KF landmarks with >= minObs
        # observations (ORB-SLAM's TrackedMapPoints). minObs adapts to map
        # age: right after two-view init every landmark has exactly 2
        # observations, so a flat minObs=3 makes ref_tracked 0 and the 0.9
        # ratio can never fire — tracking then starves for fps frames.
        min_obs = 3 if self.map.n_kf_active() > 2 else 2
        ref_obs = self.map.kf_obs_host()[self.ref_kf]
        seen = ref_obs[ref_obs >= 0]
        ref_tracked = (
            int((self.map.lm_obs_count[seen] >= min_obs).sum()) if len(seen) else 0
        )
        # ORB-SLAM mono decision: c2 (inliers < 0.9*refTracked, > 15) gates
        # everything; our mapper runs synchronously so "mapping idle" (c1b's
        # min-gap 0) always holds. long_gap kept as the c1a fallback.
        c2 = self.n_inliers < 0.9 * ref_tracked and self.n_inliers > 15
        long_gap = frames_since_kf >= max(2, int(self.cfg.fps))
        # decay criterion: on a young map (e.g. constant rotation sweeping
        # into unmapped area) most ref-KF landmarks have only 2 observations,
        # so ref_tracked is tiny and c2 can sit false while absolute inliers
        # bleed toward the LOST threshold. ONLY when c2's denominator is
        # clearly uninformative (ref_tracked well below the live inlier
        # count), fall back to inserting when inliers drop well below their
        # post-KF peak. Guarded this way it never fires on mature maps,
        # where c2 alone governs (over-insertion churns the keyframe table
        # and was measured to cost accuracy on strafe/KITTI regimes).
        self._peak_inliers_since_kf = max(
            self._peak_inliers_since_kf, self.n_inliers
        )
        decay = (
            ref_tracked < self.n_inliers  # c2 denominator uninformative
            and self.n_inliers < 0.7 * self._peak_inliers_since_kf
            and frames_since_kf >= 2
            and self.n_inliers > 15
        )
        want = c2 or decay or (long_gap and self.n_inliers >= 30)
        if not want:
            return False
        # async-mapping gate (ORB-SLAM's SetAcceptKeyFrames/queue<3 rule):
        # with the mapper busy, only the inlier-driven criteria may queue a
        # second keyframe; a saturated queue refuses outright and the next
        # frames re-ask (the c1b "mapping idle" note above applies only to
        # synchronous mode)
        if self.async_driver is not None:
            pending = self.async_driver.pending()
            if pending >= self.async_driver.QUEUE_MAX:
                return False
            if pending >= 1 and not (c2 or decay):
                return False
        return True

    def _insert_keyframe(self, frame):
        if self.map.keyframe_capacity() < 1:
            # protect the working set: current ref KF + its top covisible
            # neighbors + the global gauge (earliest keyframe by seq)
            protect = {self.ref_kf}
            covis = self.map.covisibility()
            if self.ref_kf >= 0 and self.ref_kf < covis.shape[0]:
                nb = np.argsort(-covis[self.ref_kf])[: self.cfg.local_window]
                protect |= {int(j) for j in nb if covis[self.ref_kf][j] > 0}
            by_seq = self.map.valid_keyframes_by_seq()
            if len(by_seq):
                protect.add(int(by_seq[0]))
            self.map.evict_keyframe(np.asarray(sorted(protect)))
        kf_id = self.map.add_keyframe(
            frame, jnp.asarray(self.last_pose), self.last_obs, self.frame_id
        )
        self.ref_kf = kf_id
        self.last_kf_frame_id = self.frame_id
        self._peak_inliers_since_kf = 0
        if self.async_driver is not None:
            # producer side of the reference's intended mapping thread:
            # hand the epoch (+ loop closing) to the worker and keep
            # tracking on the pre-epoch map (slam/async_mapping.py)
            self.async_driver.enqueue(self.map, kf_id)
            self.new_kf_ids.append(kf_id)
            return
        self.mapper.process_new_keyframe(self.map, kf_id)
        if self.loop_closer is not None and self.loop_closer.attempt(self.map, kf_id):
            # map geometry jumped: the motion model is stale
            self.velocity = None
            # SearchAndFuse: merge the revisit's duplicate landmarks into
            # the corrected originals via the loop candidate's neighborhood,
            # so tracking continues on the closed map instead of re-drifting
            # on the duplicates (original ORB-SLAM's CorrectLoop fuse step)
            if self.loop_closer.last_closure is not None:
                _, cand_c = self.loop_closer.last_closure
                covis = self.map.covisibility()
                nbs = [cand_c] + [
                    int(j)
                    for j in np.argsort(-covis[cand_c])[:4]
                    if covis[cand_c][j] >= 15 and j != kf_id
                ]
                if self.mapper.fuse_neighbors(self.map, kf_id, neighbors=nbs):
                    self.mapper.refresh_landmarks(
                        self.map, self.map.keyframe_landmarks(kf_id)
                    )
        # poses may have moved in local BA / loop closure; stay consistent
        self.last_pose = self.map.kf_pose[kf_id]
        self.new_kf_ids.append(kf_id)

    # ------------------------------------------------------------------
    def _relocalize(self, frame) -> bool:
        ok, Tcw, obs, n_in, kf = relocalize(self, frame)
        if not ok:
            return False
        self._prev_pose = jnp.asarray(Tcw)
        self.last_pose = jnp.asarray(Tcw)
        self.last_obs = obs
        self.last_frame = frame
        self.n_inliers = n_in
        self.velocity = None
        self.ref_kf = kf  # re-anchor to the keyframe we relocalized against
        self.last_reloc_frame_id = self.frame_id
        self.state = TrackingState.OK
        return True


def materialize_trajectory(tracker) -> list:
    """[(frame_id, ts, Tcw or None), ...] with poses re-anchored to the
    CURRENT keyframe poses, so global BA / loop closures refine the full
    trajectory retroactively."""
    if tracker.async_driver is not None:
        tracker.async_driver.drain()  # fold in every queued epoch first
    out = []
    kf_valid = tracker.map.kf_valid_host()
    kf_pose = tracker.map.hview("kf_pose")
    kf_seq = tracker.map.kf_seq
    for entry in tracker.trajectory:
        frame_id, ts, pose, ref, T_rel, ref_seq = entry
        # a recycled ref slot (seq mismatch) means the anchor keyframe was
        # removed and the slot reused by a different keyframe — fall back to
        # the absolute pose recorded at track time
        anchored = (
            ref >= 0
            and T_rel is not None
            and kf_valid[ref]
            and kf_seq[ref] == ref_seq
        )
        if pose is None:
            out.append((frame_id, ts, None))
        elif anchored:
            out.append((frame_id, ts, T_rel @ kf_pose[ref]))
        else:
            out.append((frame_id, ts, pose))
    return out


def _pad_ids(ids: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, np.int32)
    out[: min(len(ids), n)] = ids[:n]
    return out
