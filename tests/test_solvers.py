"""Sim3 (Horn/RANSAC/LM), PnP RANSAC, and pose-graph tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import camera, lie, pnp, pose_graph, sim3solver

K = jnp.asarray([400.0, 400.0, 320.0, 240.0])


def test_horn_exact():
    key = jax.random.PRNGKey(0)
    p1 = jax.random.normal(key, (32, 3)) * 2.0
    S_true = lie.sim3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.5, -0.2, 0.8, 0.3]))
    p2 = lie.sim3_apply(S_true, p1)
    S = sim3solver.horn_sim3(p1, p2)
    np.testing.assert_allclose(
        np.asarray(lie.sim3_apply(S, p1)), np.asarray(p2), atol=1e-4
    )
    np.testing.assert_allclose(float(lie.sim3_scale(S)), float(jnp.exp(0.3)), rtol=1e-4)


def test_horn_fixed_scale():
    p1 = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    S_true = lie.sim3_exp(jnp.asarray([0.1, 0.0, -0.2, 0.3, 0.1, -0.4, 0.0]))
    p2 = lie.sim3_apply(S_true, p1)
    S = sim3solver.horn_sim3(p1, p2, fix_scale=True)
    assert abs(float(lie.sim3_scale(S)) - 1.0) < 1e-5


def _sim3_scene(key, n=64, outliers=0.2):
    k1, k2 = jax.random.split(key)
    # points in candidate camera frame
    p1 = jax.random.uniform(
        k1, (n, 3),
        minval=jnp.asarray([-2.0, -1.5, 3.0]), maxval=jnp.asarray([2.0, 1.5, 9.0]),
    )
    S_true = lie.sim3_exp(jnp.asarray([0.05, -0.03, 0.08, 0.4, -0.1, 0.2, 0.15]))
    p2 = lie.sim3_apply(S_true, p1)
    bad = jax.random.uniform(k2, (n,)) < outliers
    p2 = jnp.where(bad[:, None], p2 + jax.random.normal(k2, p2.shape) * 2.0, p2)
    uv1, _ = camera.project(K, p1)
    uv2, _ = camera.project(K, p2)  # consistent with corrupted p2
    # observations come from the *true* projections of the true points
    uv2_obs, _ = camera.project(K, lie.sim3_apply(S_true, p1))
    return p1, p2, uv1, uv2_obs, S_true, bad


def test_ransac_sim3_robust():
    p1, p2, uv1, uv2, S_true, bad = _sim3_scene(jax.random.PRNGKey(2))
    n = p1.shape[0]
    S, inl, n_inl = sim3solver.ransac_sim3(
        p1, p2, jnp.ones((n,), bool), K, K, uv1, uv2,
        jnp.ones((n,)), jnp.ones((n,)),
    )
    assert int(n_inl) > 0.7 * (1 - 0.25) * n
    err = lie.sim3_log(lie.sim3_compose(S, lie.sim3_inverse(S_true)))
    assert float(jnp.linalg.norm(err)) < 0.05


def test_optimize_sim3_polishes():
    p1, p2, uv1, uv2, S_true, bad = _sim3_scene(jax.random.PRNGKey(3), outliers=0.0)
    n = p1.shape[0]
    S0 = lie.sim3_retract(S_true, jnp.asarray([0.02, -0.01, 0.03, 0.05, 0.02, -0.04, 0.05]))
    S, inl, n_inl = sim3solver.optimize_sim3(
        S0, p1, p2, jnp.ones((n,), bool), K, K, uv1, uv2,
        jnp.ones((n,)), jnp.ones((n,)),
    )
    err = lie.sim3_log(lie.sim3_compose(S, lie.sim3_inverse(S_true)))
    assert float(jnp.linalg.norm(err)) < 5e-3
    assert int(n_inl) == n


def test_ransac_pnp_with_outliers():
    key = jax.random.PRNGKey(4)
    n = 96
    pw = jax.random.uniform(
        key, (n, 3),
        minval=jnp.asarray([-2.0, -1.5, 4.0]), maxval=jnp.asarray([2.0, 1.5, 10.0]),
    )
    T_true = lie.se3_exp(jnp.asarray([0.1, -0.05, 0.15, 0.3, -0.2, 0.1]))
    uv, _ = camera.project(K, lie.se3_apply(T_true, pw))
    bad = jax.random.uniform(jax.random.PRNGKey(5), (n,)) < 0.3
    uv = jnp.where(
        bad[:, None], uv + 60.0 * jax.random.normal(key, uv.shape), uv
    )
    T, inl, n_inl = pnp.ransac_pnp(
        pw, uv, jnp.ones((n,), bool), K, jnp.ones((n,))
    )
    err = lie.se3_log(lie.se3_compose(T, lie.se3_inverse(T_true)))
    assert float(jnp.linalg.norm(err)) < 0.01
    assert float(jnp.mean(inl[~bad])) > 0.9


def test_pose_graph_closes_loop():
    """Chain of 12 poses with drift; loop edge to the start pulls the last
    pose back; residuals vanish on consistent input."""
    n = 12
    # true poses: circle
    xs = []
    S_true = [lie.sim3_identity()]
    for i in range(1, n):
        step = jnp.asarray([0.0, 0.0, 2 * np.pi / n, 0.5, 0.0, 0.0, 0.0])
        S_true.append(lie.sim3_compose(lie.sim3_exp(step), S_true[-1]))
    S_true = jnp.stack(S_true)

    # odometry edges with accumulated drift in the estimates
    drift = lie.sim3_exp(jnp.asarray([0.0, 0.0, 0.01, 0.02, 0.0, 0.0, 0.005]))
    S_est = [S_true[0]]
    for i in range(1, n):
        rel_true = lie.sim3_compose(S_true[i], lie.sim3_inverse(S_true[i - 1]))
        rel_drift = lie.sim3_compose(drift, rel_true)
        S_est.append(lie.sim3_compose(rel_drift, S_est[-1]))
    S_est = jnp.stack(S_est)

    # edges: consecutive (using drifted measurements = consistent with est)
    ei = jnp.arange(n - 1, dtype=jnp.int32)
    ej = jnp.arange(1, n, dtype=jnp.int32)
    meas = jax.vmap(
        lambda i, j: lie.sim3_compose(S_est[j], lie.sim3_inverse(S_est[i]))
    )(ei, ej)
    # loop edge n-1 -> 0 with TRUE relative
    ei = jnp.concatenate([ei, jnp.asarray([n - 1], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.asarray([0], jnp.int32)])
    loop_meas = lie.sim3_compose(S_true[0], lie.sim3_inverse(S_true[n - 1]))
    meas = jnp.concatenate([meas, loop_meas[None]], axis=0)
    w = jnp.ones((n,))
    fixed = jnp.zeros((n,)).at[0].set(1.0)

    S_opt = pose_graph.optimize_pose_graph(S_est, ei, ej, meas, w, fixed, iters=25)

    # after optimization the loop residual is small
    r_before = pose_graph.edge_residual(S_est[n - 1], S_est[0], loop_meas)
    r_after = pose_graph.edge_residual(S_opt[n - 1], S_opt[0], loop_meas)
    assert float(jnp.linalg.norm(r_after)) < 0.3 * float(jnp.linalg.norm(r_before))
    # and the end pose moved toward truth
    e_before = jnp.linalg.norm(
        lie.sim3_log(lie.sim3_compose(S_est[n - 1], lie.sim3_inverse(S_true[n - 1])))
    )
    e_after = jnp.linalg.norm(
        lie.sim3_log(lie.sim3_compose(S_opt[n - 1], lie.sim3_inverse(S_true[n - 1])))
    )
    assert float(e_after) < 0.5 * float(e_before)


def test_pose_graph_zero_residual_fixed_point():
    """Consistent input -> optimizer leaves poses unchanged."""
    n = 5
    S = jax.vmap(lie.sim3_exp)(
        jax.random.normal(jax.random.PRNGKey(6), (n, 7)) * 0.3
    )
    ei = jnp.asarray([0, 1, 2, 3], jnp.int32)
    ej = jnp.asarray([1, 2, 3, 4], jnp.int32)
    meas = jax.vmap(
        lambda i, j: lie.sim3_compose(S[j], lie.sim3_inverse(S[i]))
    )(ei, ej)
    S_opt = pose_graph.optimize_pose_graph(
        S, ei, ej, meas, jnp.ones((4,)), jnp.zeros((n,)).at[0].set(1.0), iters=5
    )
    np.testing.assert_allclose(np.asarray(S_opt), np.asarray(S), atol=2e-3)


def test_epnp_minimal_and_weighted():
    """EPnP (reference PnPsolver.h:79-125): exact on clean minimal sets,
    and the weighted refit path ignores outlier rows."""
    import numpy as np
    from orbslam2_with_quadrics_tpu.ops import camera, lie, pnp

    K = jnp.asarray([520.0, 521.0, 325.0, 250.0])
    rng = np.random.RandomState(11)
    ok = 0
    for _ in range(10):
        pts = jnp.asarray(
            rng.rand(4, 3) * np.array([4, 3, 4]) + np.array([-2, -1.5, 4]),
            jnp.float32,
        )
        T_true = lie.se3_exp(
            jnp.asarray(rng.randn(6) * np.array([0.1] * 3 + [0.3] * 3), jnp.float32)
        )
        uv, _ = camera.project(K, lie.se3_apply(T_true, pts))
        T = pnp.epnp_pose(pts, uv, K)
        uvp, _ = camera.project(K, lie.se3_apply(T, pts))
        if float(jnp.max(jnp.abs(uvp - uv))) < 0.1:
            ok += 1
    assert ok >= 8  # rare degenerate simplices may fail; RANSAC absorbs them

    # weighted: 24 clean + 8 garbage rows, weights mask the garbage
    pts = jnp.asarray(
        rng.rand(32, 3) * np.array([4, 3, 4]) + np.array([-2, -1.5, 4]), jnp.float32
    )
    T_true = lie.se3_exp(jnp.asarray([0.05, -0.03, 0.08, 0.2, -0.1, 0.15]))
    uv, _ = camera.project(K, lie.se3_apply(T_true, pts))
    uv = uv.at[24:].add(300.0)
    w = jnp.concatenate([jnp.ones((24,)), jnp.zeros((8,))])
    T = pnp.epnp_pose(pts, uv, K, w=w)
    err = jnp.linalg.norm(lie.se3_log(lie.se3_compose(T, lie.se3_inverse(T_true))))
    assert float(err) < 1e-2


def test_pose_graph_matrix_free_matches_dense():
    """The matrix-free PCG essential-graph solver must agree with the
    dense-Hessian reference implementation on a noisy random graph."""
    n = 10
    key = jax.random.PRNGKey(3)
    S_true = jax.vmap(lie.sim3_exp)(jax.random.normal(key, (n, 7)) * 0.4)
    # chain + a few chords
    ei = list(range(n - 1)) + [0, 2, 4]
    ej = list(range(1, n)) + [5, 7, 9]
    ei = jnp.asarray(ei, jnp.int32)
    ej = jnp.asarray(ej, jnp.int32)
    meas = jax.vmap(
        lambda i, j: lie.sim3_compose(S_true[j], lie.sim3_inverse(S_true[i]))
    )(ei, ej)
    # noisy start
    S0 = jax.vmap(lie.sim3_retract)(
        S_true, jax.random.normal(jax.random.PRNGKey(4), (n, 7)) * 0.1
    )
    S0 = S0.at[0].set(S_true[0])
    w = jnp.ones((ei.shape[0],))
    fixed = jnp.zeros((n,)).at[0].set(1.0)
    S_cg = pose_graph.optimize_pose_graph(S0, ei, ej, meas, w, fixed, iters=15)
    S_dn = pose_graph.optimize_pose_graph_dense(
        S0, ei, ej, meas, w, fixed, iters=15
    )
    # both must land on the (unique, fully-constrained) truth
    np.testing.assert_allclose(np.asarray(S_cg), np.asarray(S_true), atol=5e-3)
    np.testing.assert_allclose(np.asarray(S_cg), np.asarray(S_dn), atol=5e-3)
