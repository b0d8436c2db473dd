import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import ba, camera, lie, residuals

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])
BF = jnp.asarray(50.0)


def make_problem(
    key, n_cams=6, n_pts=96, stereo=True, noise_px=0.3,
    pose_pert=0.02, pnt_pert=0.05, n_fixed=1,
):
    ks = jax.random.split(key, 6)
    pts = jax.random.uniform(
        ks[0], (n_pts, 3),
        minval=jnp.asarray([-3.0, -2.0, 5.0]), maxval=jnp.asarray([3.0, 2.0, 12.0]),
    )
    # cameras on a small arc
    xi = (
        jax.random.normal(ks[1], (n_cams, 6))
        * jnp.asarray([0.02, 0.02, 0.02, 0.4, 0.1, 0.1])
    )
    xi = xi.at[:, 3].add(jnp.linspace(0, 1.5, n_cams))
    poses_true = lie.se3_exp(xi)

    # every point observed by every camera (dense edges)
    cam_idx = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), n_pts)
    pnt_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), n_cams)
    pc = lie.se3_apply(poses_true[cam_idx], pts[pnt_idx])
    uvr, z = camera.project_stereo(K, BF, pc)
    uvr = uvr + noise_px * jax.random.normal(ks[2], uvr.shape)
    if not stereo:
        uvr = uvr.at[:, 2].set(0.0)

    poses0 = jax.vmap(lie.se3_retract)(
        poses_true,
        jax.random.normal(ks[3], (n_cams, 6)) * pose_pert,
    )
    # keep fixed cams at truth
    poses0 = jnp.where(jnp.arange(n_cams)[:, None] < n_fixed, poses_true, poses0)
    pts0 = pts + jax.random.normal(ks[4], pts.shape) * pnt_pert

    prob = ba.BAProblem(
        poses=poses0,
        points=pts0,
        K=K,
        bf=BF,
        cam_idx=cam_idx,
        pnt_idx=pnt_idx,
        uvr=uvr,
        is_stereo=jnp.full((len(cam_idx),), 1.0 if stereo else 0.0),
        inv_sigma2=jnp.ones((len(cam_idx),)),
        valid=jnp.ones((len(cam_idx),)),
        fixed_cam=(jnp.arange(n_cams) < n_fixed).astype(jnp.float32),
        fixed_pnt=jnp.zeros((n_pts,)),
    )
    return prob, poses_true, pts


def pose_err(poses_a, poses_b):
    d = jax.vmap(lambda a, b: lie.se3_log(lie.se3_compose(a, lie.se3_inverse(b))))(
        poses_a, poses_b
    )
    return float(jnp.max(jnp.linalg.norm(d, axis=-1)))


def test_ba_cost_decreases_and_recovers_stereo():
    # noise 0.1px: the MLE of this scene then sits within ~1e-2 of truth
    # (at 0.3px the statistical limit is ~2.3e-2 — verified against the
    # dense solve; see test_schur_step_matches_dense_gn for step equality)
    prob, poses_true, pts_true = make_problem(
        jax.random.PRNGKey(0), noise_px=0.1
    )
    _, _, _, _, _, cost0, _, _ = ba._edge_terms(prob, jnp.asarray(0.0))
    out, cost = ba.ba_solve(prob, n_iters=12, cg_iters=30, use_huber=False)
    assert float(cost) < float(cost0) * 0.1
    assert pose_err(out.poses, poses_true) < 1e-2
    assert float(jnp.max(jnp.linalg.norm(out.points - pts_true, axis=-1))) < 3e-2


def test_ba_mono_reduces_reprojection():
    prob, _, _ = make_problem(jax.random.PRNGKey(1), stereo=False, n_fixed=2)
    out, _ = ba.ba_solve(prob, n_iters=12, cg_iters=30, use_huber=False)
    chi2, inl = ba.edge_chi2(out)
    # mean reprojection chi2 ~ noise level (0.3px)^2 * 2dof
    m = float(jnp.sum(chi2 * out.valid) / jnp.sum(out.valid))
    assert m < 1.0
    assert float(jnp.mean(inl.astype(jnp.float32))) > 0.95


def test_ba_huber_survives_outliers():
    prob, poses_true, _ = make_problem(jax.random.PRNGKey(2), noise_px=0.1)
    # corrupt 10% of observations badly
    n = prob.uvr.shape[0]
    bad = jax.random.uniform(jax.random.PRNGKey(3), (n,)) < 0.1
    uvr = jnp.where(
        bad[:, None],
        prob.uvr + 100.0 * jax.random.normal(jax.random.PRNGKey(4), prob.uvr.shape),
        prob.uvr,
    )
    prob = prob._replace(uvr=uvr)
    out, _ = ba.local_ba(prob, cg_iters=30)
    assert pose_err(out.poses, poses_true) < 1e-2
    # purge dropped most of the corrupted edges
    assert float(jnp.sum(out.valid * bad) / jnp.sum(bad)) < 0.1


def test_schur_step_matches_dense_gn():
    """The implicit Schur/CG step equals a dense damped-GN step."""
    prob, _, _ = make_problem(
        jax.random.PRNGKey(5), n_cams=3, n_pts=12, noise_px=0.0,
        pose_pert=0.01, pnt_pert=0.02,
    )
    lam = jnp.asarray(1e-4)
    C, P = 3, 12

    out, _, ok = ba.ba_iteration(prob, lam, jnp.asarray(0.0), cg_iters=200)
    assert bool(ok)

    # dense reference: stack weighted residuals, autodiff wrt (xi_all, dp_all)
    def r_all(xic, dpp):
        poses = jax.vmap(lie.se3_retract)(prob.poses, xic.reshape(C, 6))
        pts = prob.points + dpp.reshape(P, 3)
        q = prob._replace(poses=poses, points=pts)
        e, _, _, _, _, _, _, okm = ba._edge_terms(q, jnp.asarray(0.0))
        row_w = jnp.stack(
            [jnp.ones_like(q.is_stereo), jnp.ones_like(q.is_stereo), q.is_stereo],
            axis=-1,
        )
        w = jnp.sqrt(row_w * (okm * q.inv_sigma2)[:, None])
        return (w * e).reshape(-1)

    z6, z3 = jnp.zeros(C * 6), jnp.zeros(P * 3)
    Jc = jax.jacfwd(r_all, argnums=0)(z6, z3)
    Jp = jax.jacfwd(r_all, argnums=1)(z6, z3)
    J = jnp.concatenate([Jc, Jp], axis=1)
    r = r_all(z6, z3)
    H = J.T @ J
    g = -J.T @ r  # GN: H delta = -J^T r with J = de/dx, e = obs - pred
    Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(H.shape[0])
    # gauge: remove fixed cam block (cam 0)
    Hf = Hd[6:, 6:]
    gf = g[6:]
    delta = jnp.linalg.solve(Hf, gf)
    dxi = jnp.concatenate([jnp.zeros(6), delta[: (C - 1) * 6]]).reshape(C, 6)
    dpt = delta[(C - 1) * 6 :].reshape(P, 3)

    poses_ref = jax.vmap(lie.se3_retract)(prob.poses, dxi)
    pts_ref = prob.points + dpt
    np.testing.assert_allclose(np.asarray(out.poses), np.asarray(poses_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(pts_ref), atol=2e-3)


def test_dense_schur_matches_pcg():
    """ba_solve_dense (single-chip latency path: dense reduced system +
    Cholesky) must reproduce the PCG solver's solution — same LM
    schedule, exact solve instead of 30 CG sweeps."""
    import jax

    from orbslam2_with_quadrics_tpu.ops import ba, camera, lie

    key = jax.random.PRNGKey(0)
    C, P, O = 16, 512, 4096
    Kc = jnp.asarray([500.0, 500.0, 320.0, 240.0])
    bf = jnp.asarray(50.0)
    pts = jax.random.uniform(
        key, (P, 3),
        minval=jnp.asarray([-5.0, -3.0, 3.0]),
        maxval=jnp.asarray([5.0, 3.0, 15.0]),
    )
    poses = lie.se3_exp(
        jax.random.normal(key, (C, 6))
        * jnp.asarray([0.005] * 3 + [0.2, 0.05, 0.2])
    )
    # cam-major edge table (the dense path's required layout: each
    # camera's edges are one contiguous [N] row, like the [K,N]
    # observation table every in-repo caller gathers from)
    N = O // C
    ci = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    # per-camera UNIQUE point draws (the real map invariant the dense
    # path's gather table relies on: one keypoint per point per keyframe)
    pi = jnp.concatenate([
        jax.random.permutation(jax.random.PRNGKey(100 + c), P)[:N]
        for c in range(C)
    ]).astype(jnp.int32)
    uvr, _ = camera.project_stereo(Kc, bf, lie.se3_apply(poses[ci], pts[pi]))
    prob = ba.BAProblem(
        poses=poses, points=pts + 0.03, K=Kc, bf=bf,
        cam_idx=ci, pnt_idx=pi,
        uvr=uvr + 0.5 * jax.random.normal(key, uvr.shape),
        is_stereo=jnp.ones((O,)), inv_sigma2=jnp.ones((O,)),
        valid=jnp.ones((O,)),
        fixed_cam=jnp.zeros((C,)).at[0].set(1.0),
        fixed_pnt=jnp.zeros((P,)),
    )
    p1, c1 = ba.ba_solve(prob, n_iters=6, cg_iters=40, use_huber=False)
    p2, c2 = ba.ba_solve_dense(prob, n_iters=6, n_local_pts=P, use_huber=False,
                               cam_grid=(C, N))
    assert float(c2) < 0.1 * float(
        ba._edge_terms(prob, jnp.asarray(0.0))[5]
    ), "dense LM failed to reduce cost"
    np.testing.assert_allclose(
        np.asarray(p1.poses), np.asarray(p2.poses), atol=5e-5
    )
    assert abs(float(c1) - float(c2)) / max(float(c1), 1.0) < 1e-3


def test_dense_schur_point_overflow_is_safe():
    """With n_local_pts smaller than the active point count the dense
    step drops coupling for overflow points but the LM guard must keep
    the solve convergent (cost strictly decreases)."""
    import jax

    from orbslam2_with_quadrics_tpu.ops import ba, camera, lie

    key = jax.random.PRNGKey(2)
    C, P, O = 8, 256, 2048
    Kc = jnp.asarray([400.0, 400.0, 160.0, 120.0])
    pts = jax.random.uniform(
        key, (P, 3),
        minval=jnp.asarray([-3.0, -2.0, 3.0]),
        maxval=jnp.asarray([3.0, 2.0, 9.0]),
    )
    poses = lie.se3_exp(
        jax.random.normal(key, (C, 6)) * jnp.asarray([0.004] * 3 + [0.1] * 3)
    )
    N = O // C
    ci = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    pi = jnp.concatenate([
        jax.random.permutation(jax.random.PRNGKey(300 + c), P)[:N]
        for c in range(C)
    ]).astype(jnp.int32)
    uvr, _ = camera.project_stereo(
        Kc, jnp.asarray(40.0), lie.se3_apply(poses[ci], pts[pi])
    )
    prob = ba.BAProblem(
        poses=poses, points=pts + 0.02, K=Kc, bf=jnp.asarray(40.0),
        cam_idx=ci, pnt_idx=pi, uvr=uvr,
        is_stereo=jnp.ones((O,)), inv_sigma2=jnp.ones((O,)),
        valid=jnp.ones((O,)),
        fixed_cam=jnp.zeros((C,)).at[0].set(1.0),
        fixed_pnt=jnp.zeros((P,)),
    )
    cost0 = float(ba._edge_terms(prob, jnp.asarray(0.0))[5])
    # only half the active points fit the dense coupling table
    _, c = ba.ba_solve_dense(prob, n_iters=8, n_local_pts=128, use_huber=False,
                             cam_grid=(C, N))
    assert float(c) < 0.5 * cost0
