"""Sim3 pose-graph (essential graph) optimization.

TPU-native rebuild of ``Optimizer::OptimizeEssentialGraph``
(reference src/Optimizer.cc:781-1044): keyframe poses are lifted to Sim3,
relative-pose edges (spanning tree, loop edges, strong covisibility) are
optimized with Gauss-Newton on the dense [7K x 7K] system — at SLAM scale
(K <= a few thousand) the dense Hessian Cholesky IS the TPU-fast path, so
no sparse machinery is needed. Edge residual matches g2o's EdgeSim3:
``e = log(S_ji * S_iw * S_wj)`` with measurement ``S_ji`` frozen at its
pre-loop value; Jacobians come from jacfwd on the retraction (exact, and
free of hand-derived adjoint bookkeeping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie


def edge_residual(S_i, S_j, S_meas_ji):
    """e = log( S_meas_ji * S_i * S_j^-1 )  [7]."""
    err = lie.sim3_compose(
        S_meas_ji, lie.sim3_compose(S_i, lie.sim3_inverse(S_j))
    )
    return lie.sim3_log(err)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    S_poses,
    edge_i,
    edge_j,
    S_meas_ji,
    edge_w,
    fixed,
    iters: int = 20,
):
    """Optimize Sim3 keyframe poses over relative-pose edges.

    Args:
      S_poses: [K,8] Sim3 world->keyframe.
      edge_i/edge_j: [E] int32 endpoints.
      S_meas_ji: [E,8] measured S_j->S_i relative Sim3 (S_i * S_j^-1).
      edge_w: [E] weights (0 = padding).
      fixed: [K] 1.0 where pose held (the loop-origin KF,
        src/Optimizer.cc:855).
      iters: GN iterations (reference uses 20, src/Optimizer.cc:987).

    Returns optimized [K,8] poses.
    """
    K = S_poses.shape[0]
    E = edge_i.shape[0]

    def build(Sp):
        def per_edge(i, j, meas):
            Si, Sj = Sp[i], Sp[j]
            r = edge_residual(Si, Sj, meas)
            Ji = jax.jacfwd(
                lambda xi: edge_residual(lie.sim3_retract(Si, xi), Sj, meas)
            )(jnp.zeros(7))
            Jj = jax.jacfwd(
                lambda xj: edge_residual(Si, lie.sim3_retract(Sj, xj), meas)
            )(jnp.zeros(7))
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(edge_i, edge_j, S_meas_ji)
        # gauge / fixed poses: zero their Jacobians
        Ji = Ji * (1.0 - fixed[edge_i])[:, None, None]
        Jj = Jj * (1.0 - fixed[edge_j])[:, None, None]
        w = edge_w
        cost = jnp.sum(jnp.sum(r * r, axis=-1) * w)

        H = jnp.zeros((K, 7, K, 7), S_poses.dtype)
        Hii = jnp.einsum("e,eri,erj->eij", w, Ji, Ji)
        Hjj = jnp.einsum("e,eri,erj->eij", w, Jj, Jj)
        Hij = jnp.einsum("e,eri,erj->eij", w, Ji, Jj)
        H = H.at[edge_i, :, edge_i, :].add(Hii)
        H = H.at[edge_j, :, edge_j, :].add(Hjj)
        H = H.at[edge_i, :, edge_j, :].add(Hij)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7), S_poses.dtype)
        b = b.at[edge_i].add(-jnp.einsum("e,eri,er->ei", w, Ji, r))
        b = b.at[edge_j].add(-jnp.einsum("e,eri,er->ei", w, Jj, r))
        return H.reshape(K * 7, K * 7), b.reshape(K * 7), cost

    def step(_, carry):
        Sp, lam, cost = carry
        H, b, _ = build(Sp)
        # fixed poses: identity rows to keep the system SPD
        diag_fix = jnp.repeat(fixed, 7)
        H = H + jnp.diag(diag_fix + 1e-8)
        Hd = H + lam * jnp.diag(jnp.diag(H))
        dx = jnp.linalg.solve(Hd, b).reshape(K, 7)
        dx = dx * (1.0 - fixed)[:, None]
        S_new = jax.vmap(lie.sim3_retract)(Sp, dx)
        _, _, new_cost = build(S_new)
        ok = (new_cost < cost) & jnp.all(jnp.isfinite(dx))
        Sp = jnp.where(ok, S_new, Sp)
        return (
            Sp,
            jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e6),
            jnp.where(ok, new_cost, cost),
        )

    _, _, cost0 = build(S_poses)
    Sp, _, _ = jax.lax.fori_loop(
        0, iters, step, (S_poses, jnp.asarray(1e-6, S_poses.dtype), cost0)
    )
    return Sp
