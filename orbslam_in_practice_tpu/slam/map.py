"""World model: fixed-shape array map (keyframes, landmarks, observations).

Replaces the reference's pointer graph — Map's std::sets (include/Map.h:28-29),
KeyFrame's per-object members (include/KeyFrame.h), MapPoint's observation
std::map (include/MapPoint.h:61) — with slot-allocated device arrays
(SURVEY.md §7.1 design stance):

- keyframe table: poses + per-keyframe feature arrays + obs (feature ->
  landmark id) — the observation structure IS the (KF, feature) -> landmark
  index array, so covisibility is one MXU matmul away.
- landmark table: position, representative descriptor, normal, distance
  invariants (the reference declared but never defined UpdateNormalAndDepth /
  ComputeDistinctiveDescriptors — SURVEY.md §2.4; here they are real,
  slam/local_mapping.py).
- covisibility: shared-observation counts M @ M^T (KeyFrame::UpdateConnections
  semantics, src/KeyFrame.cpp:54-116, threshold th=15 applied by consumers),
  with the reference's self-edge bug (:97,103) structurally impossible.

Slot lifecycle (long-sequence viability — the reference's map grows
unboundedly, include/Map.h:28-29; fixed shapes need recycling):
- freed keyframe/landmark slots go on free lists and are reallocated;
- landmark frees are *quarantined* until the next keyframe insertion so ids
  cached by the tracker between frames can never silently re-bind to a new
  landmark within the same mapping epoch;
- `kf_seq` gives every keyframe a monotonic insertion number (the reference's
  static id counter, src/KeyFrame.cpp:5) — all ordering-sensitive logic
  (loop temporal guard, gauge choice, culling exemptions) uses kf_seq, never
  slot ids;
- `lm_uid` gives every landmark allocation a generation tag so stale id
  references are detectable after recycling.

Mutation is host-driven (single-writer — the reference had shared mutable
state and zero locks, SURVEY.md §5 race-detection note) but the arrays stay
on device; hot queries (covisibility, local-map assembly) are jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("l_max",))
def _covis_matrix(kf_obs: jnp.ndarray, kf_valid: jnp.ndarray, l_max: int):
    """Shared-landmark counts between keyframes: (K, K) int32.

    kf_obs: (K, F) landmark id or -1. One one-hot matmul on the MXU.
    """
    k, f = kf_obs.shape
    sees = jnp.zeros((k, l_max), jnp.float32)
    kf_idx = jnp.broadcast_to(jnp.arange(k)[:, None], (k, f))
    valid = (kf_obs >= 0) & kf_valid[:, None]
    sees = sees.at[kf_idx, jnp.maximum(kf_obs, 0)].max(valid.astype(jnp.float32))
    counts = sees @ sees.T  # (K, K)
    counts = counts * (1.0 - jnp.eye(k))
    return counts.astype(jnp.int32)


class SlamMap:
    """Slot-allocated map. All arrays are jnp (functional updates)."""

    def __init__(
        self,
        k_max: int = 256,
        l_max: int = 16384,
        f_max: int = 1024,
        desc_dim: int = 256,
    ):
        self.k_max = k_max
        self.l_max = l_max
        self.f_max = f_max
        self.n_kf = 0  # slot high-water mark (slots [0, n_kf) may be invalid)
        self.n_lm = 0  # slot high-water mark
        self.next_kf_id = 0  # monotonically increasing (ref src/KeyFrame.cpp:5)

        self.kf_pose = jnp.tile(jnp.eye(4, dtype=jnp.float32), (k_max, 1, 1))
        self.kf_valid = jnp.zeros(k_max, bool)
        self.kf_frame_id = np.full(k_max, -1, np.int64)  # source frame index
        self.kf_seq = np.full(k_max, -1, np.int64)  # monotonic insertion order
        self.kf_xy = jnp.zeros((k_max, f_max, 2), jnp.float32)
        self.kf_octave = jnp.zeros((k_max, f_max), jnp.int32)
        self.kf_angle = jnp.zeros((k_max, f_max), jnp.float32)
        self.kf_feat_valid = jnp.zeros((k_max, f_max), bool)
        self.kf_desc_pm1 = jnp.zeros((k_max, f_max, desc_dim), jnp.int8)
        self.kf_obs = jnp.full((k_max, f_max), -1, jnp.int32)

        self.lm_pos = jnp.zeros((l_max, 3), jnp.float32)
        self.lm_valid = jnp.zeros(l_max, bool)
        self.lm_desc_pm1 = jnp.zeros((l_max, desc_dim), jnp.int8)
        self.lm_normal = jnp.zeros((l_max, 3), jnp.float32)
        self.lm_min_dist = jnp.zeros(l_max, jnp.float32)
        self.lm_max_dist = jnp.full(l_max, jnp.inf, jnp.float32)
        self.lm_octave = jnp.zeros(l_max, jnp.int32)
        self.lm_first_kf = np.full(l_max, -1, np.int32)
        self.lm_uid = np.full(l_max, -1, np.int64)  # allocation generation tag
        self.lm_obs_count = np.zeros(l_max, np.int32)
        self.lm_found_count = np.zeros(l_max, np.int32)  # visible->matched ratio
        self.lm_visible_count = np.zeros(l_max, np.int32)
        self._next_lm_uid = 0
        # free lists (recycled slots). Landmark frees sit in quarantine until
        # the next keyframe insertion (see module docstring).
        self._kf_free: list = []
        self._lm_free: list = []
        self._lm_free_pending: list = []
        self._covis_cache = None  # invalidated on any observation change
        self._host_cache = {}  # host mirrors of device tables, same lifetime

    def _invalidate_caches(self):
        self._covis_cache = None
        self._host_cache.clear()

    def kf_obs_host(self) -> np.ndarray:
        """Host mirror of kf_obs — ONE device->host transfer per map
        mutation epoch instead of one per query (the per-frame local-map
        vote and keyframe decision both read it)."""
        if "kf_obs" not in self._host_cache:
            self._host_cache["kf_obs"] = np.asarray(self.kf_obs)
        return self._host_cache["kf_obs"]

    def lm_valid_host(self) -> np.ndarray:
        if "lm_valid" not in self._host_cache:
            self._host_cache["lm_valid"] = np.asarray(self.lm_valid)
        return self._host_cache["lm_valid"]

    def kf_valid_host(self) -> np.ndarray:
        if "kf_valid" not in self._host_cache:
            self._host_cache["kf_valid"] = np.asarray(self.kf_valid)
        return self._host_cache["kf_valid"]

    # ---------------- counts / capacity ----------------

    def n_kf_active(self) -> int:
        return int(self.kf_valid_host()[: self.n_kf].sum())

    def n_lm_active(self) -> int:
        return int(self.lm_valid_host()[: self.n_lm].sum())

    def keyframe_capacity(self) -> int:
        return (self.k_max - self.n_kf) + len(self._kf_free)

    def landmark_capacity(self) -> int:
        return (self.l_max - self.n_lm) + len(self._lm_free)

    def valid_keyframes_by_seq(self) -> np.ndarray:
        """Valid keyframe slot ids ordered by insertion sequence (temporal
        order — robust to slot recycling)."""
        valid = self.kf_valid_host()[: self.n_kf]
        ids = np.nonzero(valid)[0]
        return ids[np.argsort(self.kf_seq[ids], kind="stable")]

    # ---------------- keyframes ----------------

    def add_keyframe(self, frame, Tcw: jnp.ndarray, obs: np.ndarray, frame_id: int) -> int:
        """Insert a Frame snapshot (ref KeyFrame ctor src/KeyFrame.cpp:11-17).

        obs: (F,) int32 landmark id per feature (-1 = none).
        Returns the keyframe slot id.
        """
        # a keyframe insertion starts a new mapping epoch: quarantined
        # landmark frees become allocatable
        if self._lm_free_pending:
            self._lm_free.extend(self._lm_free_pending)
            self._lm_free_pending = []
        if self._kf_free:
            k = self._kf_free.pop()
        elif self.n_kf < self.k_max:
            k = self.n_kf
            self.n_kf += 1
        else:
            raise RuntimeError("keyframe table full (k_max); evict first")
        nf = frame.n_features
        if nf > self.f_max:
            raise ValueError(f"frame has {nf} features > map f_max {self.f_max}")

        def pad(x, fill=0):
            if nf == self.f_max:
                return x
            shape = (self.f_max - nf,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

        self.kf_pose = self.kf_pose.at[k].set(Tcw)
        self.kf_valid = self.kf_valid.at[k].set(True)
        self.kf_frame_id[k] = frame_id
        self.kf_seq[k] = self.next_kf_id
        self.kf_xy = self.kf_xy.at[k].set(pad(frame.xy))
        self.kf_octave = self.kf_octave.at[k].set(pad(frame.octave))
        self.kf_angle = self.kf_angle.at[k].set(pad(frame.angle))
        self.kf_feat_valid = self.kf_feat_valid.at[k].set(pad(frame.valid, False))
        self.kf_desc_pm1 = self.kf_desc_pm1.at[k].set(pad(frame.desc_pm1))
        obs = pad(jnp.asarray(obs, jnp.int32), -1)
        self.kf_obs = self.kf_obs.at[k].set(
            jnp.where(self.kf_feat_valid[k], obs, -1)
        )
        # bump landmark observation counts
        host_obs = np.asarray(obs)
        seen = host_obs[host_obs >= 0]
        np.add.at(self.lm_obs_count, seen, 1)
        self.next_kf_id += 1
        self._invalidate_caches()
        return k

    def set_kf_poses(self, kf_ids, poses):
        self.kf_pose = self.kf_pose.at[jnp.asarray(kf_ids)].set(jnp.asarray(poses))

    # ---------------- landmarks ----------------

    def allocate_landmarks(self, n: int) -> np.ndarray:
        """Allocate up to n slots (recycled first, then fresh); silently
        truncates at capacity — callers size their work by the returned ids.
        Slots are tagged with a fresh generation uid (lm_uid)."""
        n = min(n, self.landmark_capacity())
        n_recycled = min(n, len(self._lm_free))
        recycled = [self._lm_free.pop() for _ in range(n_recycled)]
        n_fresh = n - n_recycled
        fresh = np.arange(self.n_lm, self.n_lm + n_fresh, dtype=np.int32)
        self.n_lm += n_fresh
        ids = np.concatenate([np.asarray(recycled, np.int32), fresh])
        self.lm_uid[ids] = np.arange(
            self._next_lm_uid, self._next_lm_uid + len(ids), dtype=np.int64
        )
        self._next_lm_uid += len(ids)
        return ids

    def _free_landmark_slots(self, ids: np.ndarray):
        """Return fully-dereferenced landmark slots to the (quarantined)
        free list. Callers must already have cleared all kf_obs references.
        Idempotent: uid == -1 marks an already-freed slot (double-freeing
        would hand the same slot to two future landmarks)."""
        ids = np.unique(np.asarray(ids))
        ids = ids[self.lm_uid[ids] >= 0]
        if len(ids) == 0:
            return
        self.lm_obs_count[ids] = 0
        self.lm_first_kf[ids] = -1
        self.lm_uid[ids] = -1
        self._lm_free_pending.extend(int(i) for i in ids)

    def add_landmarks(
        self,
        ids: np.ndarray,
        pos: jnp.ndarray,
        desc_pm1: jnp.ndarray,
        normal: jnp.ndarray,
        octave: jnp.ndarray,
        min_dist: jnp.ndarray,
        max_dist: jnp.ndarray,
        first_kf: int,
        valid_mask: np.ndarray | None = None,
    ):
        """Batch landmark insertion (ref MapPoint ctor src/MapPoint.cpp:7-15,
        plus the distance/normal invariants the reference lacked)."""
        ids_j = jnp.asarray(ids)
        self.lm_pos = self.lm_pos.at[ids_j].set(jnp.asarray(pos))
        self.lm_desc_pm1 = self.lm_desc_pm1.at[ids_j].set(jnp.asarray(desc_pm1))
        self.lm_normal = self.lm_normal.at[ids_j].set(jnp.asarray(normal))
        self.lm_octave = self.lm_octave.at[ids_j].set(jnp.asarray(octave, jnp.int32))
        self.lm_min_dist = self.lm_min_dist.at[ids_j].set(jnp.asarray(min_dist))
        self.lm_max_dist = self.lm_max_dist.at[ids_j].set(jnp.asarray(max_dist))
        v = np.ones(len(ids), bool) if valid_mask is None else np.asarray(valid_mask)
        self.lm_valid = self.lm_valid.at[ids_j].set(jnp.asarray(v))
        self.lm_first_kf[ids] = first_kf
        self._host_cache.pop("lm_valid", None)

    def set_landmark_positions(self, ids, pos):
        self.lm_pos = self.lm_pos.at[jnp.asarray(ids)].set(jnp.asarray(pos))

    def erase_landmarks(self, ids: np.ndarray):
        """SetBadFlag semantics (absent in reference — SURVEY.md §2.1 #6).
        Slots are recycled (quarantined until the next keyframe)."""
        if len(ids) == 0:
            return
        ids = np.asarray(ids)
        ids_j = jnp.asarray(ids)
        self.lm_valid = self.lm_valid.at[ids_j].set(False)
        # remove from keyframe observation tables
        is_bad = jnp.zeros(self.l_max, bool).at[ids_j].set(True)
        obs_bad = (self.kf_obs >= 0) & is_bad[jnp.maximum(self.kf_obs, 0)]
        self.kf_obs = jnp.where(obs_bad, -1, self.kf_obs)
        self._free_landmark_slots(ids)
        self._invalidate_caches()

    def _gc_orphan_landmarks(self, candidate_ids: np.ndarray):
        """Free landmarks whose observation count dropped to zero (nothing
        references them anymore — keeping them would leak slots forever)."""
        if len(candidate_ids) == 0:
            return
        cand = np.unique(np.asarray(candidate_ids))
        orphan = cand[
            (self.lm_obs_count[cand] <= 0) & self.lm_valid_host()[cand]
        ]
        if len(orphan) == 0:
            return
        self.lm_valid = self.lm_valid.at[jnp.asarray(orphan)].set(False)
        self._free_landmark_slots(orphan)
        self._host_cache.pop("lm_valid", None)

    def add_observations(self, kf_id: int, feat_idx: np.ndarray, lm_ids: np.ndarray):
        """Bind landmark ids to keyframe features (MapPoint::AddObservation +
        KeyFrame::AddMapPoint semantics, src/MapPoint.cpp:17-24)."""
        if len(feat_idx) == 0:
            return
        self.kf_obs = self.kf_obs.at[kf_id, jnp.asarray(feat_idx)].set(
            jnp.asarray(lm_ids, jnp.int32)
        )
        np.add.at(self.lm_obs_count, np.asarray(lm_ids), 1)
        self._invalidate_caches()

    # ---------------- queries ----------------

    def covisibility(self) -> np.ndarray:
        """(n_kf, n_kf) shared-landmark counts (host array, cached until
        the observation structure changes)."""
        if self._covis_cache is None:
            counts = _covis_matrix(self.kf_obs, self.kf_valid, self.l_max)
            self._covis_cache = np.asarray(counts)
        return self._covis_cache[: self.n_kf, : self.n_kf]

    def keyframe_landmarks(self, kf_id: int) -> np.ndarray:
        """Landmark ids observed by a keyframe (host, deduped, valid only)."""
        obs = self.kf_obs_host()[kf_id]
        lm_valid = self.lm_valid_host()
        ids = obs[obs >= 0]
        return np.unique(ids[lm_valid[ids]])

    def observations_of(self, lm_ids: np.ndarray) -> tuple:
        """(kf_idx, feat_idx, lm_idx_into_input) for all observations of the
        given landmarks across valid keyframes (host-side)."""
        obs = self.kf_obs_host()[: self.n_kf]  # (K, F)
        lookup = np.full(self.l_max, -1, np.int64)
        lookup[lm_ids] = np.arange(len(lm_ids))
        hit = (obs >= 0) & (lookup[np.maximum(obs, 0)] >= 0)
        kf_idx, feat_idx = np.nonzero(hit)
        return kf_idx, feat_idx, lookup[obs[kf_idx, feat_idx]]

    def stats(self) -> dict:
        return {
            "n_kf": self.n_kf_active(),
            "n_lm": self.n_lm_active(),
            "n_obs": int(np.asarray(jnp.sum(self.kf_obs >= 0))),
            "kf_slots_hw": self.n_kf,
            "lm_slots_hw": self.n_lm,
            "kf_free": len(self._kf_free),
            "lm_free": len(self._lm_free) + len(self._lm_free_pending),
        }

    def remove_keyframe(self, kf_id: int):
        """KeyFrame::SetBadFlag semantics (absent in reference — SURVEY.md
        §2.1 #5 'SetBadFlag/culling absent'): drop the KF and its
        observations; landmark bookkeeping updated, the slot recycled, and
        landmarks anchored to this KF re-anchored to another observer."""
        obs = self.kf_obs_host()[kf_id]
        seen = obs[obs >= 0]
        np.subtract.at(self.lm_obs_count, seen, 1)
        self.kf_valid = self.kf_valid.at[kf_id].set(False)
        self.kf_obs = self.kf_obs.at[kf_id].set(-1)
        self.kf_feat_valid = self.kf_feat_valid.at[kf_id].set(False)
        self.kf_seq[kf_id] = -1
        self.kf_frame_id[kf_id] = -1
        self._kf_free.append(int(kf_id))
        self._invalidate_caches()
        # re-anchor landmarks whose reference keyframe this was (loop closure
        # corrects landmarks through lm_first_kf — a dangling anchor would
        # move them with an unrelated pose after slot reuse)
        seen = np.unique(seen)
        anchored = seen[self.lm_first_kf[seen] == kf_id]
        if len(anchored):
            first = np.full(len(anchored), -1, np.int32)
            kf_idx, _, which = self.observations_of(anchored)
            if len(kf_idx):
                # earliest-seq observer becomes the new anchor: sort by seq
                # DESCENDING so duplicate fancy-index writes leave the
                # smallest seq in place (last write wins)
                order = np.argsort(-self.kf_seq[kf_idx], kind="stable")
                first[which[order]] = kf_idx[order].astype(np.int32)
            self.lm_first_kf[anchored] = first
        # landmarks that lost their last observation are garbage
        self._gc_orphan_landmarks(seen)

    def evict_keyframe(self, protect: np.ndarray) -> int:
        """Evict one keyframe to make room when the table is full: the most
        REDUNDANT one — the keyframe whose landmarks are best covered by
        other keyframes (ORB-SLAM's culling criterion applied to eviction).
        Returns the evicted slot or -1. Protect should contain the current
        local window (and is always honored).

        Why not weakest-connected-oldest: on a loop trajectory the old
        keyframes on the far side are exactly the ones with zero connection
        to the current working set, so that policy deletes the loop anchors
        place recognition needs; a unique-coverage (low-redundancy) keyframe
        is kept no matter how old or isolated it is."""
        valid = self.kf_valid_host()[: self.n_kf].copy()
        protect = set(int(p) for p in protect)
        cands = [k for k in np.nonzero(valid)[0] if int(k) not in protect]
        if not cands:
            return -1
        obs = self.kf_obs_host()
        redundancy = np.empty(len(cands))
        for i, k in enumerate(cands):
            seen = obs[k][obs[k] >= 0]
            # a keyframe with no landmark observations retains nothing:
            # maximally evictable (above any real redundancy score).
            # >= 4 = this KF's own observation + at least 3 OTHERS, matching
            # the KeyFrameCulling criterion the docstring cites
            redundancy[i] = (
                float((self.lm_obs_count[seen] >= 4).mean()) if len(seen) else 2.0
            )
        covis = self.covisibility()
        prot = [p for p in protect if p < self.n_kf and valid[p]]
        strength = (
            covis[np.asarray(cands)][:, np.asarray(prot, int)].sum(axis=1)
            if prot
            else np.zeros(len(cands))
        )
        # most redundant first; among equals, the one best represented by
        # the current working set
        order = sorted(
            range(len(cands)), key=lambda i: (-redundancy[i], -strength[i])
        )
        victim = int(cands[order[0]])
        self.remove_keyframe(victim)
        return victim

    def replace_landmark(self, loser: int, winner: int):
        """MapPoint::Replace semantics: merge duplicate landmarks after
        fusion; every observation of `loser` re-points to `winner` unless the
        keyframe already observes `winner` (then the duplicate is dropped).
        Vectorized: one gather + one scatter."""
        obs = self.kf_obs_host()
        kf_idx, feat_idx = np.nonzero(obs == loser)
        if len(kf_idx):
            sees_winner = (obs == winner).any(axis=1)
            drop = sees_winner[kf_idx]
            new_vals = np.where(drop, -1, winner).astype(np.int32)
            self.kf_obs = self.kf_obs.at[
                jnp.asarray(kf_idx), jnp.asarray(feat_idx)
            ].set(jnp.asarray(new_vals))
            self.lm_obs_count[winner] += int((~drop).sum())
        self.lm_valid = self.lm_valid.at[loser].set(False)
        self._free_landmark_slots(np.asarray([loser]))
        self._invalidate_caches()

    def scrub_observations(self, kf_idx, feat_idx):
        """Remove specific (keyframe, feature) observations (BA outlier
        scrubbing); keeps the covisibility cache coherent and collects
        landmarks that lost their last observation."""
        if len(kf_idx) == 0:
            return
        obs = np.asarray(self.kf_obs[jnp.asarray(kf_idx), jnp.asarray(feat_idx)])
        seen = obs[obs >= 0]
        np.subtract.at(self.lm_obs_count, seen, 1)
        self.kf_obs = self.kf_obs.at[
            jnp.asarray(kf_idx), jnp.asarray(feat_idx)
        ].set(-1)
        self._invalidate_caches()
        self._gc_orphan_landmarks(seen)

    def pseudo_frame(self, kf_id: int):
        """View a stored keyframe as a Frame (for projection-based matching
        against keyframes — fusion, loop closing)."""
        from orbslam_in_practice_tpu.frontend.frame import Frame

        return Frame(
            xy=self.kf_xy[kf_id],
            xy_raw=self.kf_xy[kf_id],
            octave=self.kf_octave[kf_id],
            angle=self.kf_angle[kf_id],
            response=jnp.zeros(self.f_max, jnp.float32),
            valid=self.kf_feat_valid[kf_id],
            desc_packed=jnp.zeros((self.f_max, 8), jnp.uint32),
            desc_pm1=self.kf_desc_pm1[kf_id],
        )
