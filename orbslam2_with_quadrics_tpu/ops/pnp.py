"""Perspective-n-Point RANSAC for relocalization.

Replaces ``PnPsolver`` (reference src/PnPsolver.cc — EPnP inside adaptive
RANSAC). TPU-native design: a single vmapped batch of 6-point DLT pose
hypotheses scored in parallel, followed by an inlier refit and the motion-
only LM (ops/pose_opt.py) as the polish stage — the same
hypothesize-score-refine contract; DLT-6 replaces EPnP's control-point
machinery because a batched 12x12 SVD is one fused kernel on TPU and the
minimal-set quality difference is absorbed by the refit + LM stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import camera, lie


def _dlt_pose(pw, uv, Kc, w=None):
    """DLT: solve P [3,4] from >=6 world-point/pixel pairs, then factor
    K^-1 P -> [R|t] with orthonormalization."""
    fx, fy, cx, cy = Kc[0], Kc[1], Kc[2], Kc[3]
    xn = (uv[:, 0] - cx) / fx
    yn = (uv[:, 1] - cy) / fy
    X = jnp.concatenate([pw, jnp.ones_like(pw[:, :1])], axis=-1)  # [N,4]
    z = jnp.zeros_like(X)
    r1 = jnp.concatenate([X, z, -xn[:, None] * X], axis=-1)  # [N,12]
    r2 = jnp.concatenate([z, X, -yn[:, None] * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # sign: points should be in front (positive depth for the centroid)
    ctr = jnp.mean(pw, axis=0)
    s = jnp.sign(M[2] @ ctr + P[2, 3])
    P = P * jnp.where(s == 0, 1.0, s)
    M = P[:, :3]
    # orthonormalize via SVD: R = U V^T, scale = mean singular value
    U, sv, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    scale = jnp.mean(sv)
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return lie.se3_make(lie.matrix_to_quat(R), t)


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(
    pw,
    uv,
    valid,
    Kc,
    inv_sigma2,
    key=None,
    n_hyp: int = 256,
    chi2_th: float = 5.991,
):
    """RANSAC pose from 2D-3D matches (reference PnPsolver::iterate,
    src/PnPsolver.cc; fixed hypothesis count instead of adaptive early
    exit — all hypotheses evaluate in parallel anyway).

    Returns (T_cw [7], inliers [N] bool, n_inliers).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    N = pw.shape[0]
    gum = -jnp.log(
        -jnp.log(jax.random.uniform(key, (n_hyp, N), minval=1e-9, maxval=1.0))
    )
    sel = jax.lax.top_k(jnp.where(valid[None, :], gum, -jnp.inf), 6)[1]

    T_all = jax.vmap(lambda idx: _dlt_pose(pw[idx], uv[idx], Kc))(sel)

    def score(T):
        uvp, z = camera.project(Kc, lie.se3_apply(T, pw))
        e2 = jnp.sum((uvp - uv) ** 2, axis=-1) * inv_sigma2
        inl = (e2 < chi2_th) & (z > 0.05) & valid
        return jnp.sum(inl.astype(jnp.int32)), inl

    n_inl, inls = jax.vmap(score)(T_all)
    best = jnp.argmax(n_inl)
    # refit on inliers
    T_ref = _dlt_pose(pw, uv, Kc, w=inls[best].astype(pw.dtype))
    n_ref, inl_ref = score(T_ref)
    better = n_ref >= n_inl[best]
    T_out = jnp.where(better, T_ref, T_all[best])
    inl_out = jnp.where(better, inl_ref, inls[best])
    return T_out, inl_out, jnp.maximum(n_ref, n_inl[best])
