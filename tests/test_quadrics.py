import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import ba, camera, lie, quadrics

K = jnp.asarray([400.0, 400.0, 320.0, 240.0])


def make_quadric():
    pose = lie.se3_make(
        lie.so3_exp_quat(jnp.asarray([0.1, -0.2, 0.3])), jnp.asarray([0.5, -0.3, 6.0])
    )
    return quadrics.Quadric(pose=pose, scale=jnp.asarray([0.8, 0.5, 0.3]))


def ring_of_cameras(n=6, radius=0.0):
    """Cameras looking at the quadric from distinct viewpoints."""
    Ts = []
    for i in range(n):
        ang = 0.25 * (i - n / 2) / n * np.pi
        xi = jnp.asarray([0.02 * i, ang, 0.01 * i, 0.8 * np.sin(ang) + 0.2 * i / n, 0.1 * np.cos(ang), 0.3 * i / n])
        Ts.append(lie.se3_exp(xi))
    return jnp.stack(Ts)


def test_dual_matrix_roundtrip():
    q = make_quadric()
    Qd = quadrics.dual_matrix(q)
    q2 = quadrics.from_dual_matrix(Qd)
    np.testing.assert_allclose(
        np.sort(np.asarray(q.scale)), np.sort(np.asarray(q2.scale)), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lie.se3_trans(q.pose)), np.asarray(lie.se3_trans(q2.pose)),
        atol=1e-3,
    )


def test_projected_bbox_contains_center():
    q = make_quadric()
    T = lie.se3_identity()
    bbox, ok = quadrics.project_bbox(q, T, K)
    assert bool(ok)
    ctr_uv, _ = camera.project(K, lie.se3_apply(T, lie.se3_trans(q.pose)))
    assert float(bbox[0]) < float(ctr_uv[0]) < float(bbox[2])
    assert float(bbox[1]) < float(ctr_uv[1]) < float(bbox[3])


def test_quadric_init_from_bboxes():
    """SVD init from >=3 exact bbox observations recovers the ellipsoid
    (the capability the reference left unwired, QuadricLandmark.cc:149-242)."""
    q = make_quadric()
    Ts = ring_of_cameras(6)
    bboxes = []
    for i in range(6):
        b, ok = quadrics.project_bbox(q, Ts[i], K)
        assert bool(ok)
        bboxes.append(b)
    bboxes = jnp.stack(bboxes)
    est, ok = quadrics.quadric_init(Ts, K, bboxes, jnp.ones((6,), bool))
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(lie.se3_trans(est.pose)),
        np.asarray(lie.se3_trans(q.pose)),
        atol=0.15,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(est.scale)), np.sort(np.asarray(q.scale)), atol=0.15
    )


def test_quadric_init_rejects_two_views():
    q = make_quadric()
    Ts = ring_of_cameras(6)
    bboxes = jnp.stack([quadrics.project_bbox(q, Ts[i], K)[0] for i in range(6)])
    valid = jnp.zeros((6,), bool).at[0].set(True).at[1].set(True)
    _, ok = quadrics.quadric_init(Ts, K, bboxes, valid)
    assert not bool(ok)


def test_joint_quadric_ba_improves_both():
    """Joint camera-point-quadric BA reduces bbox + point reprojection."""
    q_true = make_quadric()
    Ts = ring_of_cameras(6)
    n_pts = 64
    pts = jax.random.uniform(
        jax.random.PRNGKey(0), (n_pts, 3),
        minval=jnp.asarray([-2.0, -1.5, 4.0]), maxval=jnp.asarray([2.0, 1.5, 9.0]),
    )
    cam_idx = jnp.repeat(jnp.arange(6, dtype=jnp.int32), n_pts)
    pnt_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), 6)
    uv, _ = camera.project(K, lie.se3_apply(Ts[cam_idx], pts[pnt_idx]))
    uvr = jnp.concatenate([uv, jnp.zeros((len(cam_idx), 1))], axis=-1)

    bboxes = jnp.stack([quadrics.project_bbox(q_true, Ts[i], K)[0] for i in range(6)])

    base = ba.BAProblem(
        poses=Ts,
        points=pts + 0.02 * jax.random.normal(jax.random.PRNGKey(1), pts.shape),
        K=K,
        bf=jnp.asarray(0.0),
        cam_idx=cam_idx,
        pnt_idx=pnt_idx,
        uvr=uvr,
        is_stereo=jnp.zeros((len(cam_idx),)),
        inv_sigma2=jnp.ones((len(cam_idx),)),
        valid=jnp.ones((len(cam_idx),)),
        fixed_cam=jnp.zeros((6,)).at[0].set(1.0).at[1].set(1.0),
        fixed_pnt=jnp.zeros((n_pts,)),
    )
    q0 = quadrics.retract(
        q_true, jnp.asarray([0.05, -0.03, 0.02, 0.1, -0.05, 0.1, 0.1, -0.1, 0.05])
    )
    prob = quadrics.QuadricBAProblem(
        base=base,
        quad_pose=q0.pose[None],
        quad_scale=q0.scale[None],
        qe_cam=jnp.arange(6, dtype=jnp.int32),
        qe_quad=jnp.zeros((6,), jnp.int32),
        qe_bbox=bboxes,
        qe_valid=jnp.ones((6,)),
        qe_w=jnp.full((6,), 1e-2),  # bbox units are pixels^2-scale
    )
    out, cost = quadrics.quadric_ba_solve(prob, K, n_iters=10, cg_iters=30)

    # bbox residual shrank
    def bbox_err(qp, qs):
        qq = quadrics.Quadric(qp[0], qs[0])
        errs = []
        for i in range(6):
            e, ok = quadrics.bbox_residual(qq, out.base.poses[i], K, bboxes[i])
            errs.append(np.abs(np.asarray(e)).mean())
        return float(np.mean(errs))

    e0 = bbox_err(prob.quad_pose, prob.quad_scale)
    e1 = bbox_err(out.quad_pose, out.quad_scale)
    assert e1 < 0.5 * e0
    # points stayed consistent
    d = np.linalg.norm(np.asarray(out.base.points) - np.asarray(pts), axis=-1)
    assert np.median(d) < 0.02
