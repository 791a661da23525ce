"""Global place-recognition descriptors.

Role: the retrieval index DBoW2 plays in original ORB-SLAM — the reference
stubs it entirely (ComputeBoW empty at /root/reference/src/Frame.cpp:274-277,
the vocabulary file named but never loaded, src/system.cpp:10).

Descriptor: the L2-normalized MEAN of a keyframe's ±1 BRIEF vectors —
measured the best RANKER of every variant tried on rendered revisit data
(tools/gdesc_experiment.py, round 4): top-1 retrieval accuracy 0.81 vs
0.12-0.56 for VLAD/BoW variants over random codebooks (32-128 anchors,
anchor-residual / cell-sum / cell-mean / histogram aggregations, signed-sqrt
+ intra-norm). The catch — and round 3's regression — is that its raw
cosines compress into ~[0.95, 1.0] (shared scene-statistics component), so
ABSOLUTE thresholds are meaningless: round 3's adaptive min-score floor
(min over covisible neighbors ~0.98) sat ABOVE true-revisit similarity
(~0.96) and filtered every true candidate. Consumers must use RANK (top-k)
plus geometric verification, never a similarity floor; `center()` subtracts
the map-wide mean (computable live from the keyframe table) when a
zero-referenced score is needed (true revisits ~+0.29, unrelated ~0.0,
measured).

Descriptors are computed ONCE per keyframe at insertion (features are
immutable after insertion) and cached in the map's `kf_gdesc` table
(row-policy device mirror: one row upload per insertion); retrieval anywhere
(loop closing, relocalization) is then one (K, 256) @ (256,) matvec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GDESC_DIM = 256


@jax.jit
def global_descriptor(desc_pm1: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(F, 256) ±1 descriptors + (F,) validity -> (256,) L2-normalized mean
    descriptor. Invalid features contribute nothing."""
    d = desc_pm1.astype(jnp.float32)
    v = valid.astype(jnp.float32)[:, None]
    m = jnp.sum(d * v, axis=0) / jnp.maximum(jnp.sum(v), 1.0)
    return m / jnp.maximum(jnp.linalg.norm(m), 1e-9)


def center(G: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Subtract the mean over valid rows and L2-renormalize (host-side;
    decompresses the shared-component cosine pile-up for scoring)."""
    rows = G[valid]
    if len(rows) == 0:
        return G
    mu = rows.mean(axis=0, keepdims=True)
    Gc = G - mu
    n = np.linalg.norm(Gc, axis=1, keepdims=True)
    return Gc / np.maximum(n, 1e-9)
