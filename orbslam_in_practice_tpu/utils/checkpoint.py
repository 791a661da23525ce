"""Map checkpoint / resume (absent in reference — SURVEY.md §5).

The array-of-slots map serializes trivially to a single npz; orbax is
unnecessary for a flat dict of arrays, and npz keeps the checkpoint portable.
Free lists are reconstructed from the validity masks on load (an invalid
slot below the high-water mark is by definition recyclable).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_ARRAY_FIELDS = [
    "kf_pose",
    "kf_valid",
    "kf_xy",
    "kf_octave",
    "kf_angle",
    "kf_feat_valid",
    "kf_desc_pm1",
    "kf_obs",
    "lm_pos",
    "lm_valid",
    "lm_desc_pm1",
    "lm_normal",
    "lm_min_dist",
    "lm_max_dist",
    "lm_octave",
]
_HOST_FIELDS = [
    "kf_frame_id",
    "kf_seq",
    "lm_first_kf",
    "lm_uid",
    "lm_obs_count",
    "lm_found_count",
    "lm_visible_count",
]
_SCALARS = ["n_kf", "n_lm", "next_kf_id", "_next_lm_uid"]


def save_map(path: str, smap):
    data = {f: np.asarray(getattr(smap, f)) for f in _ARRAY_FIELDS}
    data.update({f: np.asarray(getattr(smap, f)) for f in _HOST_FIELDS})
    data.update({f: np.asarray(getattr(smap, f)) for f in _SCALARS})
    np.savez_compressed(path, **data)


def load_map(path: str, smap):
    data = np.load(path)
    for f in _ARRAY_FIELDS:
        setattr(smap, f, jnp.asarray(data[f]))
    for f in _HOST_FIELDS:
        if f in data:
            setattr(smap, f, data[f].copy())
    for f in _SCALARS:
        if f in data:
            setattr(smap, f, int(data[f]))
    # rebuild free lists: invalid slots below the high-water marks
    kf_valid = smap.kf_valid_host()
    lm_valid = smap.lm_valid_host()
    smap._kf_free = [int(k) for k in np.nonzero(~kf_valid[: smap.n_kf])[0]]
    smap._lm_free = [int(i) for i in np.nonzero(~lm_valid[: smap.n_lm])[0]]
    smap._lm_free_pending = []
    smap._invalidate_caches()
