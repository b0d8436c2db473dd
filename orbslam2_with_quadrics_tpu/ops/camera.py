"""Pinhole camera model: projection, undistortion, stereo/RGB-D helpers.

Replaces the reference's scattered OpenCV camera handling:
- projection residuals used in pose optimization / BA
  (reference: Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:80-196)
- keypoint undistortion via cv::undistortPoints
  (reference: src/Frame.cc:404-434) — here a fixed-iteration inverse of the
  radial-tangential model (5 Newton-free fixed-point steps, which matches
  OpenCV's default iterative scheme)
- back-projection (reference: src/Frame.cc:666-680)

Intrinsics are a 4-vector ``[fx, fy, cx, cy]``; distortion a 5-vector
``[k1, k2, p1, p2, k3]``. Everything broadcasts over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie


def project(K, p_cam):
    """Camera-frame 3D point -> pixel. Returns (uv[...,2], z[...])."""
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    z = p_cam[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * p_cam[..., 0] / zs + cx
    v = fy * p_cam[..., 1] / zs + cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(K, baseline_fx, p_cam):
    """Stereo projection -> (u_l, v_l, u_r). ``baseline_fx`` = fx*b (the
    reference's ``mbf``, src/Tracking.cc:136)."""
    uv, z = project(K, p_cam)
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    ur = uv[..., 0] - baseline_fx / zs
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(K, uv, z):
    """Pixel + depth -> camera-frame 3D point (src/Frame.cc:666-680)."""
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    x = (uv[..., 0] - cx) * z / fx
    y = (uv[..., 1] - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def world_to_pixel(T_cw, K, p_world):
    """World point -> pixel through pose T_cw. Returns (uv, depth)."""
    return project(K, lie.se3_apply(T_cw, p_world))


def distort_normalized(dist, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(K, dist, uv, iters: int = 5):
    """Undistort pixel keypoints (fixed-point inverse of the distortion
    model; OpenCV-compatible; reference src/Frame.cc:404-434)."""
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    xd = jnp.stack(
        [(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1
    )
    x = xd
    for _ in range(iters):
        d = distort_normalized(dist, x) - x  # distortion offset at current x
        x = xd - d
    return jnp.stack(
        [x[..., 0] * fx + cx, x[..., 1] * fy + cy], axis=-1
    )


def triangulate_dlt(P1, P2, uv1, uv2):
    """Two-view DLT triangulation (reference src/Initializer.cc:734-747,
    src/LocalMapping.cc:322-337). P1,P2: [...,3,4] projection matrices,
    uv1/uv2: [...,2] pixels. Returns homogeneous-normalized 3D point."""
    rows = jnp.stack(
        [
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # [...,4,4]
    # row-normalize for f32 conditioning (pixel-scale rows are ~1e3)
    rows = rows / jnp.maximum(
        jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12
    )
    # right singular vector of smallest singular value
    _, _, vt = jnp.linalg.svd(rows)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    ws = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    return Xh[..., :3] / ws[..., None]


def projection_matrix(T_cw, K):
    """K [3x3-equivalent 4-vec] and pose -> 3x4 projection matrix
    (reference src/Converter.cc:50-58 ``toProjMat``)."""
    M = lie.se3_to_matrix(T_cw)[..., :3, :]
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    Km = jnp.stack(
        [fx, zeros, cx, zeros, fy, cy, zeros, zeros, ones], axis=-1
    ).reshape(fx.shape + (3, 3))
    return Km @ M
