"""Bundle adjustment: Schur-complement Levenberg-Marquardt, CG-solved.

TPU-native replacement for the reference's g2o BlockSolver pipeline
(Thirdparty/g2o/g2o/core/block_solver.hpp + src/Optimizer.cc:41-778):

- The edge list is a flat, fixed-capacity struct-of-arrays
  ``(cam_idx, pnt_idx, uvr, is_stereo, inv_sigma2, valid)`` — masking
  replaces g2o's edge levels/removal.
- Landmarks are marginalized exactly as g2o does with
  ``setMarginalized(true)`` (src/Optimizer.cc:98,579): per-point 3x3 blocks
  are eliminated in closed form and the reduced camera system
  ``S = Hcc - W Hpp^-1 W^T`` is solved.
- Instead of sparse Cholesky, S is applied *implicitly* via two
  segment-sum sweeps over the edge list and solved with block-Jacobi
  preconditioned conjugate gradients — the same sweep parallelizes over a
  device mesh by sharding edges and ``psum``-ing the reduced products
  (see parallel/dist_ba.py), which is the BASELINE.json multi-host target.
- Huber robustness is IRLS weights; LM damping with accept/reject steps.

All shapes static; the entire solve is one jitted ``fori_loop``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, residuals


class BAProblem(NamedTuple):
    poses: jnp.ndarray       # [C,7] T_cw
    points: jnp.ndarray      # [P,3]
    K: jnp.ndarray           # [4]
    bf: jnp.ndarray          # scalar fx*baseline
    cam_idx: jnp.ndarray     # [O] int32
    pnt_idx: jnp.ndarray     # [O] int32
    uvr: jnp.ndarray         # [O,3]
    is_stereo: jnp.ndarray   # [O] float (1.0 stereo row active)
    inv_sigma2: jnp.ndarray  # [O]
    valid: jnp.ndarray       # [O] float mask
    fixed_cam: jnp.ndarray   # [C] float (1.0 = pose constant)
    fixed_pnt: jnp.ndarray   # [P] float


def _edge_terms(prob: BAProblem, huber_delta2, axis_name=None):
    """Residuals, weights and weighted Jacobians for every edge."""
    e, Jc, Jp, z = jax.vmap(
        lambda c, p, o: residuals.residual_and_jacobians(
            prob.poses[c], prob.K, prob.bf, prob.points[p], o
        )
    )(prob.cam_idx, prob.pnt_idx, prob.uvr)

    row_w = jnp.stack(
        [
            jnp.ones_like(prob.is_stereo),
            jnp.ones_like(prob.is_stereo),
            prob.is_stereo,
        ],
        axis=-1,
    )  # [O,3]
    # depth must be positive; kill edges behind the camera
    # (reference checks pKF->IsInImage / positive depth when building edges)
    ok = prob.valid * (z > 0.05).astype(e.dtype)
    chi2 = jnp.sum(e * e * row_w, axis=-1) * prob.inv_sigma2
    hw = jnp.where(
        huber_delta2 > 0,
        residuals.huber_weight(chi2, jnp.where(huber_delta2 > 0, huber_delta2, 1.0)),
        1.0,
    )
    w = ok * prob.inv_sigma2 * hw  # [O]

    # robust cost
    rho = jnp.where(
        (huber_delta2 > 0) & (chi2 > huber_delta2),
        2.0 * jnp.sqrt(huber_delta2 * jnp.maximum(chi2, 1e-12)) - huber_delta2,
        chi2,
    )
    cost = jnp.sum(rho * ok)
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)

    # gauge: fixed cameras/points contribute no Jacobian
    Jc = Jc * (1.0 - prob.fixed_cam[prob.cam_idx])[:, None, None]
    Jp = Jp * (1.0 - prob.fixed_pnt[prob.pnt_idx])[:, None, None]

    wr = row_w * w[:, None]  # [O,3] combined row weights
    JcW = Jc * wr[:, :, None]  # [O,3,6]
    JpW = Jp * wr[:, :, None]  # [O,3,3]
    return e, Jc, Jp, JcW, JpW, cost, chi2, ok


def _seg(vals, idx, num, axis_name=None):
    out = jax.ops.segment_sum(vals, idx, num_segments=num)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def _cam_reduce(vals, prob, C, axis_name=None, cam_grid=None):
    """Per-camera reduction. With ``cam_grid=(C, N)`` the edge table is
    known to be cam-major [C, N] (cam_idx = arange(C) repeated), so the
    reduction is a pure reshape-sum — a scatter-free VPU reduction
    instead of a segment_sum (TPU scatter-adds run ~10x slower than
    dense reductions; per-cam blocks are the fattest edge tensors)."""
    if cam_grid is not None:
        Cg, N = cam_grid
        return vals.reshape((Cg, N) + vals.shape[1:]).sum(axis=1)
    return _seg(vals, prob.cam_idx, C, axis_name)


def _build_system(prob: BAProblem, huber_delta2, lam, axis_name=None,
                  cam_grid=None):
    C, P = prob.poses.shape[0], prob.points.shape[0]
    e, Jc, Jp, JcW, JpW, cost, _, _ = _edge_terms(prob, huber_delta2, axis_name)

    Hcc = _cam_reduce(
        jnp.einsum("ori,orj->oij", JcW, Jc), prob, C, axis_name, cam_grid
    )
    # GN normal equations: H delta = b with b = -J^T W e (J = de/dx)
    bc = _cam_reduce(
        -jnp.einsum("ori,or->oi", JcW, e), prob, C, axis_name, cam_grid
    )
    Hpp = _seg(jnp.einsum("ori,orj->oij", JpW, Jp), prob.pnt_idx, P, axis_name)
    bp = _seg(-jnp.einsum("ori,or->oi", JpW, e), prob.pnt_idx, P, axis_name)
    Wcp = jnp.einsum("ori,orj->oij", JcW, Jp)  # [O,6,3] stays per-edge

    # LM damping (multiplicative on diagonals + small absolute floor);
    # fixed cameras get an identity block so the Jacobi preconditioner
    # stays O(1) and CG directions are not polluted
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    eye3 = jnp.eye(3, dtype=Hpp.dtype)
    Hcc_d = (
        Hcc
        + lam * Hcc * eye6
        + (1e-8 + prob.fixed_cam)[:, None, None] * eye6
    )
    # points with no (free) observations likewise
    pnt_observed = jnp.abs(jnp.einsum("pii->p", Hpp)) > 1e-12
    Hpp_d = (
        Hpp
        + lam * Hpp * eye3
        + jnp.where(pnt_observed, 1e-8, 1.0)[:, None, None] * eye3
    )
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    return Hcc_d, bc, Hpp_inv, bp, Wcp, cost


def _schur_matvec(x, prob, Hcc_d, Hpp_inv, Wcp, axis_name=None):
    """S x = Hcc_d x - W Hpp^-1 W^T x via two edge sweeps."""
    P = prob.points.shape[0]
    C = prob.poses.shape[0]
    t1 = jnp.einsum("oij,oi->oj", Wcp, x[prob.cam_idx])      # [O,3] W^T x
    y = jnp.einsum("pij,pj->pi", Hpp_inv, _seg(t1, prob.pnt_idx, P, axis_name))
    t2 = jnp.einsum("oij,oj->oi", Wcp, y[prob.pnt_idx])      # [O,6]
    coupling = _seg(t2, prob.cam_idx, C, axis_name)
    return jnp.einsum("cij,cj->ci", Hcc_d, x) - coupling


def _pcg(b, matvec, Minv, iters: int):
    """Block-Jacobi preconditioned CG on the reduced camera system."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = jnp.einsum("cij,cj->ci", Minv, r0)
    p0 = z0

    def body(_, st):
        x, r, z, p = st
        Ap = matvec(p)
        rz = jnp.sum(r * z)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        r2 = r - alpha * Ap
        z2 = jnp.einsum("cij,cj->ci", Minv, r2)
        beta = jnp.sum(r2 * z2) / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        return x, r2, z2, z2 + beta * p

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0))
    return x


def ba_iteration(prob: BAProblem, lam, huber_delta2, cg_iters: int, axis_name=None):
    """One damped Gauss-Newton (LM) step. Returns (new_prob, cost, step_ok)."""
    Hcc_d, bc, Hpp_inv, bp, Wcp, cost = _build_system(
        prob, huber_delta2, lam, axis_name
    )
    Minv = jnp.linalg.inv(Hcc_d)
    g = bc - _schur_rhs(prob, Hpp_inv, bp, Wcp, axis_name)
    dc = _pcg(
        g,
        lambda x: _schur_matvec(x, prob, Hcc_d, Hpp_inv, Wcp, axis_name),
        Minv,
        cg_iters,
    )
    dc = dc * (1.0 - prob.fixed_cam)[:, None]

    # back-substitute points: dp = Hpp^-1 (bp - W^T dc)
    P = prob.points.shape[0]
    t1 = jnp.einsum("oij,oi->oj", Wcp, dc[prob.cam_idx])
    dp = jnp.einsum(
        "pij,pj->pi", Hpp_inv, bp - _seg(t1, prob.pnt_idx, P, axis_name)
    )
    dp = dp * (1.0 - prob.fixed_pnt)[:, None]

    new_poses = jax.vmap(lie.se3_retract)(prob.poses, dc)
    new_points = prob.points + dp
    cand = prob._replace(poses=new_poses, points=new_points)
    _, _, _, _, _, new_cost, _, _ = _edge_terms(cand, huber_delta2, axis_name)

    finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp))
    ok = (new_cost < cost) & finite
    out = jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), cand, prob
    )
    return out, jnp.where(ok, new_cost, cost), ok


def _schur_rhs(prob, Hpp_inv, bp, Wcp, axis_name=None, cam_grid=None):
    """W Hpp^-1 bp accumulated per camera."""
    C = prob.poses.shape[0]
    y = jnp.einsum("pij,pj->pi", Hpp_inv, bp)
    t = jnp.einsum("oij,oj->oi", Wcp, y[prob.pnt_idx])
    return _cam_reduce(t, prob, C, axis_name, cam_grid)


@partial(jax.jit, static_argnames=("n_iters", "cg_iters", "use_huber", "axis_name"))
def ba_solve(
    prob: BAProblem,
    n_iters: int = 10,
    cg_iters: int = 40,
    use_huber: bool = True,
    axis_name: str | None = None,
):
    """Run ``n_iters`` LM steps. Returns (prob, final_cost).

    Mirrors Optimizer::LocalBundleAdjustment's 5-then-10 schedule when
    called twice with an outlier-mask refresh in between
    (src/Optimizer.cc:653-707); GlobalBundleAdjustemnt's 10/20 iterations
    map to a single call (src/Optimizer.cc:41-64).
    """
    huber_delta2 = jnp.asarray(residuals.CHI2_STEREO if use_huber else 0.0)

    def body(_, carry):
        prob, lam, cost = carry
        prob, cost, ok = ba_iteration(prob, lam, huber_delta2, cg_iters, axis_name)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
        return prob, lam, cost

    _, _, _, _, _, cost0, _, _ = _edge_terms(prob, huber_delta2, axis_name)
    prob, _, cost = jax.lax.fori_loop(
        0, n_iters, body, (prob, jnp.asarray(1e-4, prob.poses.dtype), cost0)
    )
    return prob, cost


@jax.jit
def edge_chi2(prob: BAProblem):
    """Per-edge chi2 + validity under the current estimate (for the
    5-iter -> outlier purge -> 10-iter local BA schedule and the final
    erase step, src/Optimizer.cc:672-744)."""
    _, _, _, _, _, _, chi2, ok = _edge_terms(prob, jnp.asarray(0.0))
    gate = jnp.where(prob.is_stereo > 0, residuals.CHI2_STEREO, residuals.CHI2_MONO)
    return chi2, (chi2 < gate) & (ok > 0)


def local_ba(prob: BAProblem, cg_iters: int = 40):
    """Reference LocalBundleAdjustment schedule: 5 robust iters, purge
    outlier edges, 10 more iters (src/Optimizer.cc:653-707)."""
    prob, _ = ba_solve(prob, n_iters=5, cg_iters=cg_iters, use_huber=True)
    _, inl = edge_chi2(prob)
    prob = prob._replace(valid=prob.valid * inl.astype(prob.valid.dtype))
    prob, cost = ba_solve(prob, n_iters=10, cg_iters=cg_iters, use_huber=False)
    return prob, cost


# ----------------------------------------------------------------------
# Dense-Schur direct solver (latency path for local BA)
#
# The PCG path above runs ~30 sequential CG steps per LM iteration, each
# a full edge sweep — great for mesh-sharded problems (dist_ba), but on
# one chip the reduced camera system of a LOCAL window is tiny
# (C <= ~50 cameras => <= 300 dims): build S = Hcc - W Hpp^-1 W^T
# DENSELY with one MXU einsum over a compacted point table and solve it
# exactly with Cholesky. One LM iteration costs ~2 edge sweeps instead
# of ~60 (g2o solves the same reduced system with sparse Cholesky,
# Thirdparty/g2o/g2o/core/block_solver.hpp; this is the TPU-shaped
# equivalent).
# ----------------------------------------------------------------------


def _local_point_table(prob: BAProblem, n_local_pts: int):
    """Compact the point ids that actually couple cameras (valid edge,
    free point) into L local slots; overflow points fall back to
    "no coupling this iteration" — the LM accept/reject guard keeps that
    safe. The eligible set is fixed for a whole ba_solve_dense call, so
    this sort runs once per solve, not once per LM iteration."""
    P = prob.points.shape[0]
    L = n_local_pts
    eligible = (prob.valid > 0) & (prob.fixed_pnt[prob.pnt_idx] < 0.5)
    tagged = jnp.where(eligible, prob.pnt_idx, P)
    loc_ids = jnp.unique(tagged, size=L, fill_value=P)          # [L] sorted
    loc_of = jnp.full((P + 1,), L, jnp.int32)
    loc_of = loc_of.at[loc_ids].set(jnp.arange(L, dtype=jnp.int32))
    loc_of = loc_of.at[P].set(L)  # sentinel / fillers never map back
    ploc = loc_of[tagged]                                        # [O]
    return loc_ids, ploc


def _dense_schur_step(prob: BAProblem, lam, huber_delta2, loc_ids, ploc,
                      cam_grid=None):
    """One LM step solving the reduced camera system exactly."""
    C = prob.poses.shape[0]
    P = prob.points.shape[0]
    L = loc_ids.shape[0]
    Hcc_d, bc, Hpp_inv, bp, Wcp, cost = _build_system(
        prob, huber_delta2, lam, cam_grid=cam_grid
    )
    seg = jnp.where(ploc < L, ploc * C + prob.cam_idx, L * C)
    V = jax.ops.segment_sum(Wcp, seg, num_segments=L * C + 1)[:-1]
    V = V.reshape(L, C, 6, 3)                                    # [L,C,6,3]
    Hpi = Hpp_inv[jnp.clip(loc_ids, 0, P - 1)]                   # [L,3,3]
    # filler slots (loc_ids == P) have V == 0, so their Hpi value is inert

    # S_cross[c,d] = sum_p V[p,c] Hpi[p] V[p,d]^T  — one big matmul
    VH = jnp.einsum("pcij,pjk->pcik", V, Hpi)                    # [L,C,6,3]
    # contract over points: [C,6,3] x [C,6,3] -> [C,6,C,6] summing the 3-axis
    S_cross = jnp.einsum("pcik,pdjk->cidj", VH, V)
    S = -S_cross
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc_d)
    S_flat = S.reshape(C * 6, C * 6)

    g = bc - _schur_rhs(prob, Hpp_inv, bp, Wcp, cam_grid=cam_grid)
    dc = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(
            S_flat + 1e-10 * jnp.eye(C * 6, dtype=S_flat.dtype)
        ),
        g.reshape(-1),
    ).reshape(C, 6)
    dc = dc * (1.0 - prob.fixed_cam)[:, None]

    # back-substitute points: dp = Hpp^-1 (bp - W^T dc)
    t1 = jnp.einsum("oij,oi->oj", Wcp, dc[prob.cam_idx])
    dp = jnp.einsum(
        "pij,pj->pi", Hpp_inv, bp - _seg(t1, prob.pnt_idx, P)
    )
    dp = dp * (1.0 - prob.fixed_pnt)[:, None]

    new_poses = jax.vmap(lie.se3_retract)(prob.poses, dc)
    cand = prob._replace(poses=new_poses, points=prob.points + dp)
    _, _, _, _, _, new_cost, _, _ = _edge_terms(cand, huber_delta2)
    finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp))
    ok = (new_cost < cost) & finite
    out = jax.tree.map(lambda a, b: jnp.where(ok, a, b), cand, prob)
    return out, jnp.where(ok, new_cost, cost), ok


@partial(jax.jit, static_argnames=("n_iters", "n_local_pts", "use_huber",
                                   "cam_grid"))
def ba_solve_dense(
    prob: BAProblem,
    n_iters: int = 10,
    n_local_pts: int = 8192,
    use_huber: bool = True,
    cam_grid=None,
):
    """ba_solve with the dense-Schur direct step (single chip, local-BA
    problem sizes). Same LM damping/accept schedule as ba_solve.

    cam_grid: optional static (C, N) when the edge table is cam-major
    [C, N] — per-camera reductions become scatter-free reshape-sums."""
    huber_delta2 = jnp.asarray(residuals.CHI2_STEREO if use_huber else 0.0)

    loc_ids, ploc = _local_point_table(prob, n_local_pts)

    def body(_, carry):
        prob, lam, cost = carry
        prob, cost, ok = _dense_schur_step(
            prob, lam, huber_delta2, loc_ids, ploc, cam_grid
        )
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
        return prob, lam, cost

    _, _, _, _, _, cost0, _, _ = _edge_terms(prob, huber_delta2)
    prob, _, cost = jax.lax.fori_loop(
        0, n_iters, body, (prob, jnp.asarray(1e-4, prob.poses.dtype), cost0)
    )
    return prob, cost
