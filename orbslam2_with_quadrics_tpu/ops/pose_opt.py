"""Motion-only pose optimization (the per-frame hot solver).

TPU-native rebuild of ``Optimizer::PoseOptimization``
(reference src/Optimizer.cc:239-451): a unary-edge Levenberg-Marquardt solve
of one SE3 camera pose against N fixed map points, run as
``rounds`` x ``iters`` with chi-square inlier re-classification between
rounds (gates 5.991 mono / 7.815 stereo) and the Huber kernel dropped for
the final rounds — the reference's schedule (4 rounds x 10 iters,
src/Optimizer.cc:358-446) with the inner count trimmed to 5: each LM step
is a sequential dependency on TPU, and warm-started GN converges in <=3
steps, so extra inner iterations cost latency and buy nothing (validated:
identical inlier counts and pose error on the test scenes).

Perf structure: candidate evaluation is residual-only (no Jacobians), so
an LM iteration costs one Jacobian build + one cheap cost probe instead of
two full builds. Everything is fixed-shape; the whole solve is one jitted
fori_loop — no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import camera, lie, residuals


def _row_weights(is_stereo):
    return jnp.stack(
        [jnp.ones_like(is_stereo), jnp.ones_like(is_stereo), is_stereo], axis=-1
    )


def _residuals_only(T, K, bf, points, obs):
    """e [N,3] without Jacobians (cheap candidate probe)."""
    pc = lie.se3_apply(T, points)
    uvr, z = camera.project_stereo(K, bf, pc)
    return obs - uvr, z


def _chi2_cost(T, K, bf, points, obs, row_w, w_obs, huber_delta2):
    e, z = _residuals_only(T, K, bf, points, obs)
    w = w_obs * (z > 0.05)
    chi2 = jnp.sum(e * e * row_w, axis=-1) * w
    rho = jnp.where(
        (huber_delta2 > 0) & (chi2 > huber_delta2),
        2.0 * jnp.sqrt(huber_delta2 * jnp.maximum(chi2, 1e-12)) - huber_delta2,
        chi2,
    )
    return jnp.sum(rho), chi2


def _normal_eq(T, K, bf, points, obs, row_w, w_obs, huber_delta2):
    """H [6,6], b [6] and robust cost at T (one Jacobian build)."""
    e, Jc = jax.vmap(
        lambda p, o: residuals.residual_and_jacobians(T, K, bf, p, o)[:2]
    )(points, obs)
    chi2 = jnp.sum(e * e * row_w, axis=-1) * w_obs
    hw = jnp.where(
        huber_delta2 > 0,
        residuals.huber_weight(chi2, jnp.where(huber_delta2 > 0, huber_delta2, 1.0)),
        jnp.ones_like(chi2),
    )
    w = w_obs * hw
    Jw = Jc * (row_w[..., None] * w[:, None, None])
    H = jnp.einsum("nri,nrj->ij", Jw, Jc)
    # GN normal equations: H delta = b with b = -J^T W e (J = de/dx)
    b = -jnp.einsum("nri,nr->i", Jw, e)
    return H, b


def _lm_round(T, K, bf, points, obs, row_w, w_obs, huber_delta2, iters):
    """`iters` LM steps on a fixed inlier weighting."""

    def step(_, carry):
        T, lam, cost = carry
        H, b = _normal_eq(T, K, bf, points, obs, row_w, w_obs, huber_delta2)
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-10 * jnp.eye(6, dtype=H.dtype)
        delta = jnp.linalg.solve(Hd, b)
        T_new = lie.se3_retract(T, delta)
        cost_new, _ = _chi2_cost(
            T_new, K, bf, points, obs, row_w, w_obs, huber_delta2
        )
        ok = (cost_new < cost) & jnp.all(jnp.isfinite(delta))
        T = jnp.where(ok, T_new, T)
        cost = jnp.where(ok, cost_new, cost)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e6)
        return T, lam, cost

    cost0, _ = _chi2_cost(T, K, bf, points, obs, row_w, w_obs, huber_delta2)
    T, _, _ = jax.lax.fori_loop(
        0, iters, step, (T, jnp.asarray(1e-4, T.dtype), cost0)
    )
    return T


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimization(
    T_init,
    K,
    bf,
    points_w,
    obs_uvr,
    is_stereo,
    inv_sigma2,
    valid,
    rounds: int = 4,
    iters: int = 5,
):
    """Optimize one camera pose against fixed 3D points.

    Args:
      T_init: [7] initial pose (world->camera).
      K: [4] intrinsics; bf: scalar fx*baseline (0 for pure mono).
      points_w: [N,3] map points (padded).
      obs_uvr: [N,3] measured (u, v, u_r); u_r arbitrary for mono rows.
      is_stereo: [N] 1.0 where the u_r row is a real measurement.
      inv_sigma2: [N] per-observation information (1/sigma^2 by pyramid
        level, reference Optimizer.cc:297,334).
      valid: [N] 1.0 for real observations, 0.0 padding.
      rounds/iters: outer re-classification rounds x inner LM iterations.

    Returns:
      (T_opt [7], inlier_mask [N] bool, n_inliers scalar int32)
    """
    row_w = _row_weights(is_stereo)
    chi2_gate = jnp.where(
        is_stereo > 0, residuals.CHI2_STEREO, residuals.CHI2_MONO
    )
    inlier = valid > 0

    T = T_init
    for r in range(rounds):
        huber_delta2 = jnp.asarray(
            residuals.CHI2_STEREO if r < 2 else 0.0, T_init.dtype
        )
        w_obs = inlier.astype(T.dtype) * inv_sigma2
        T = _lm_round(
            T, K, bf, points_w, obs_uvr, row_w, w_obs, huber_delta2, iters
        )
        # re-classify over ALL valid obs so outliers can be rescued
        w_all = (valid > 0).astype(T.dtype) * inv_sigma2
        _, chi2_all = _chi2_cost(
            T, K, bf, points_w, obs_uvr, row_w, w_all, jnp.asarray(0.0)
        )
        inlier = (chi2_all < chi2_gate) & (valid > 0)

    n_inliers = jnp.sum(inlier.astype(jnp.int32))
    return T, inlier, n_inliers
