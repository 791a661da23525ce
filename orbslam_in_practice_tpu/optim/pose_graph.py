"""Essential-graph (pose-graph) optimization over Sim(3).

Capability absent from the reference (SURVEY.md §2.1: "essential-graph
optimization absent"); original ORB-SLAM runs g2o OptimizeEssentialGraph
after a loop closure. Here: Gauss-Newton on Sim3 vertices with relative-pose
edges, Jacobians by jax.jacfwd of the stacked residual at the current
linearization point (the graph is small — hundreds of vertices — so the
dense normal equations are cheap and TPU-friendly).

Convention: vertex i holds S_iw (world -> keyframe i). An edge (i, j) with
measurement S_ji_meas (= S_jw S_iw^-1 at measurement time) has residual
r_ij = log_sim3(S_ji_meas · S_iw · S_jw^-1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from orbslam_in_practice_tpu.geometry.sim3_lie import (
    exp_sim3,
    log_sim3,
    sim3_inverse,
)


def _residuals(deltas, S_vertices, edge_i, edge_j, S_meas):
    """deltas: (K, 7) tangent updates; returns (E, 7) residuals."""
    S = exp_sim3(deltas) @ S_vertices  # (K, 4, 4)
    Si = S[edge_i]
    Sj = S[edge_j]
    err = S_meas @ Si @ sim3_inverse(Sj)
    return log_sim3(err)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    S_vertices: jnp.ndarray,
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    S_meas: jnp.ndarray,
    edge_weight: jnp.ndarray,
    fixed: jnp.ndarray,
    iterations: int = 20,
):
    """Optimize Sim3 vertices against relative-pose measurements.

    Args:
      S_vertices: (K, 4, 4) initial Sim3 world->KF poses.
      edge_i, edge_j: (E,) int32 vertex indices per edge.
      S_meas: (E, 4, 4) measured S_ji (maps KF i frame to KF j frame).
      edge_weight: (E,) weights (0 masks an edge; covisibility edges can be
        weighted by shared-point count as in ORB-SLAM's essential graph).
      fixed: (K,) bool gauge-fixed vertices (e.g. the loop keyframe).

    Returns:
      (K, 4, 4) optimized Sim3 vertices.
    """
    n = S_vertices.shape[0]
    dtype = S_vertices.dtype
    free = (~fixed).astype(dtype)[:, None]

    def gn_step(_, state):
        S, lam = state

        def res_flat(deltas):
            return _residuals(deltas, S, edge_i, edge_j, S_meas).reshape(-1)

        zero = jnp.zeros((n, 7), dtype)
        r0 = res_flat(zero)  # (E*7,)
        J = jax.jacfwd(res_flat)(zero).reshape(-1, n * 7)  # (E*7, K*7)
        w = jnp.repeat(edge_weight, 7)
        H = J.T @ (J * w[:, None])
        g = -J.T @ (r0 * w)
        # gauge fixing
        free_flat = jnp.repeat(free[:, 0], 7)
        H = H * free_flat[:, None] * free_flat[None, :]
        H = H + jnp.diag(1.0 - free_flat)
        g = g * free_flat
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(n * 7, dtype=dtype)
        delta = jnp.linalg.solve(H, g).reshape(n, 7) * free
        S_new = exp_sim3(delta) @ S
        cost_old = jnp.sum(r0 * r0 * w)
        r_new = _residuals(jnp.zeros((n, 7), dtype), S_new, edge_i, edge_j, S_meas)
        cost_new = jnp.sum(r_new.reshape(-1) ** 2 * w)
        ok = jnp.isfinite(cost_new) & (cost_new < cost_old)
        S = jnp.where(ok, S_new, S)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return S, lam

    S, _ = lax.fori_loop(0, iterations, gn_step, (S_vertices, jnp.asarray(1e-6, dtype)))
    return S
