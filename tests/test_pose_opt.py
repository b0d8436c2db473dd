import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import camera, lie, pose_opt, residuals

K = jnp.asarray([520.9, 521.0, 325.1, 249.7])
BF = jnp.asarray(40.0)


def make_scene(key, n=256, noise=0.0, outlier_frac=0.0, stereo=False):
    kp, kn, ko, kt = jax.random.split(key, 4)
    pts = jax.random.uniform(
        kp, (n, 3), minval=jnp.asarray([-2.0, -1.5, 4.0]),
        maxval=jnp.asarray([2.0, 1.5, 10.0]),
    )
    T_true = lie.se3_exp(
        jnp.asarray([0.03, -0.05, 0.02, 0.1, -0.2, 0.15])
    )
    pc = lie.se3_apply(T_true, pts)
    if stereo:
        obs, _ = camera.project_stereo(K, BF, pc)
    else:
        uv, _ = camera.project(K, pc)
        obs = jnp.concatenate([uv, jnp.zeros((n, 1))], axis=-1)
    obs = obs + noise * jax.random.normal(kn, obs.shape)
    if outlier_frac > 0:
        is_out = jax.random.uniform(ko, (n,)) < outlier_frac
        obs = jnp.where(
            is_out[:, None], obs + 80.0 * jax.random.normal(kt, obs.shape), obs
        )
    else:
        is_out = jnp.zeros((n,), bool)
    return pts, obs, T_true, is_out


def test_residual_jacobians_match_autodiff():
    key = jax.random.PRNGKey(0)
    pts, obs, T_true, _ = make_scene(key, n=8, stereo=True)
    T = lie.se3_retract(T_true, jnp.asarray([0.01, 0.02, -0.01, 0.05, 0.0, -0.03]))

    for i in range(8):
        e, Jc, Jp, z = residuals.residual_and_jacobians(T, K, BF, pts[i], obs[i])
        Jc_num = jax.jacfwd(
            lambda xi: residuals.residual_and_jacobians(
                lie.se3_retract(T, xi), K, BF, pts[i], obs[i]
            )[0]
        )(jnp.zeros(6))
        Jp_num = jax.jacfwd(
            lambda p: residuals.residual_and_jacobians(T, K, BF, p, obs[i])[0]
        )(pts[i])
        np.testing.assert_allclose(Jc, Jc_num, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(Jp, Jp_num, atol=1e-3, rtol=1e-3)


def _run(pts, obs, stereo, valid_n=None):
    n = pts.shape[0]
    valid = jnp.ones((n,))
    if valid_n is not None:
        valid = (jnp.arange(n) < valid_n).astype(jnp.float32)
    return pose_opt.pose_optimization(
        lie.se3_identity(),
        K,
        BF,
        pts,
        obs,
        jnp.full((n,), 1.0 if stereo else 0.0),
        jnp.ones((n,)),
        valid,
    )


def test_pose_opt_converges_clean_mono():
    pts, obs, T_true, _ = make_scene(jax.random.PRNGKey(1))
    T_opt, inl, n_inl = _run(pts, obs, stereo=False)
    np.testing.assert_allclose(
        lie.se3_log(lie.se3_compose(T_opt, lie.se3_inverse(T_true))),
        np.zeros(6),
        atol=1e-3,
    )
    assert int(n_inl) >= 250


def test_pose_opt_converges_stereo_with_outliers():
    pts, obs, T_true, is_out = make_scene(
        jax.random.PRNGKey(2), noise=0.5, outlier_frac=0.2, stereo=True
    )
    T_opt, inl, n_inl = _run(pts, obs, stereo=True)
    err = lie.se3_log(lie.se3_compose(T_opt, lie.se3_inverse(T_true)))
    assert float(jnp.linalg.norm(err[:3])) < 5e-3      # rotation rad
    assert float(jnp.linalg.norm(err[3:])) < 2e-2      # translation
    # most outliers classified out, most inliers kept
    assert float(jnp.mean(inl[~is_out])) > 0.9
    assert float(jnp.mean(inl[is_out])) < 0.2


def test_pose_opt_respects_padding():
    pts, obs, T_true, _ = make_scene(jax.random.PRNGKey(3))
    # poison the padded tail; must not affect the solution
    pts = pts.at[200:].set(jnp.nan)
    obs_bad = obs.at[200:].set(1e9)
    # NaNs propagate through 0-weight in float math, so use huge-but-finite
    pts = jnp.nan_to_num(pts, nan=1e6)
    T_opt, _, n_inl = _run(pts, obs_bad, stereo=False, valid_n=200)
    err = lie.se3_log(lie.se3_compose(T_opt, lie.se3_inverse(T_true)))
    assert float(jnp.linalg.norm(err)) < 2e-3
    assert int(n_inl) == 200
