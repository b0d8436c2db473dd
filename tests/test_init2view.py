import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import camera, init2view, lie

K = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def two_view_scene(key, planar=False, n=200, noise=0.3, baseline=0.4):
    kp, kn = jax.random.split(key)
    if planar:
        xy = jax.random.uniform(kp, (n, 2), minval=-3.0, maxval=3.0)
        # plane z = 6 + 0.3x + 0.1y
        z = 6.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
        pts = jnp.concatenate([xy, z[:, None]], axis=-1)
    else:
        pts = jax.random.uniform(
            kp, (n, 3),
            minval=jnp.asarray([-3.0, -2.0, 4.0]),
            maxval=jnp.asarray([3.0, 2.0, 12.0]),
        )
    T21 = lie.se3_exp(
        jnp.asarray([0.02, -0.04, 0.01, baseline, 0.03, 0.05])
    )
    uv1, z1 = camera.project(K, pts)
    uv2, z2 = camera.project(K, lie.se3_apply(T21, pts))
    uv1 = uv1 + noise * jax.random.normal(kn, uv1.shape)
    uv2 = uv2 + noise * jax.random.normal(jax.random.PRNGKey(99), uv2.shape)
    valid = (
        (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
        & (uv2[:, 0] > 0) & (uv2[:, 0] < 640) & (uv2[:, 1] > 0) & (uv2[:, 1] < 480)
    )
    return pts, uv1, uv2, valid, T21


def relpose_err(T_est, T_true):
    """Rotation error (rad) and translation direction error (rad), since
    mono recovers translation only up to scale."""
    dr = lie.so3_log(
        lie.quat_mul(lie.se3_quat(T_est), lie.quat_conj(lie.se3_quat(T_true)))
    )
    t_e = lie.se3_trans(T_est)
    t_t = lie.se3_trans(T_true)
    cos = jnp.sum(t_e * t_t) / jnp.maximum(
        jnp.linalg.norm(t_e) * jnp.linalg.norm(t_t), 1e-12
    )
    return float(jnp.linalg.norm(dr)), float(jnp.arccos(jnp.clip(cos, -1, 1)))


def test_init_general_scene_uses_f():
    pts, uv1, uv2, valid, T21 = two_view_scene(jax.random.PRNGKey(0))
    res = init2view.initialize_two_view(K, uv1, uv2, valid)
    assert bool(res.ok)
    assert not bool(res.used_h)
    r_err, t_err = relpose_err(res.T_21, T21)
    assert r_err < 0.01
    # translation direction within ~2.3 deg: the 8-pt estimate at 0.3px
    # noise; the init map is globally BA'd right after (Tracking.cc:686)
    assert t_err < 0.04
    # triangulated points match scene up to scale (quantile check: raw
    # two-view depth sigma at z~11, 0.3px noise is ~0.16m)
    good = np.asarray(res.good)
    s = np.median(np.asarray(res.points)[good, 2] / np.asarray(pts)[good, 2])
    err = np.linalg.norm(
        np.asarray(res.points)[good] / s - np.asarray(pts)[good], axis=-1
    )
    assert np.median(err) < 0.2
    assert np.quantile(err, 0.9) < 0.6


def test_init_planar_scene_uses_h():
    pts, uv1, uv2, valid, T21 = two_view_scene(jax.random.PRNGKey(1), planar=True)
    res = init2view.initialize_two_view(K, uv1, uv2, valid)
    assert bool(res.used_h)
    assert bool(res.ok)
    r_err, t_err = relpose_err(res.T_21, T21)
    assert r_err < 0.02
    assert t_err < 0.05


def test_init_rejects_pure_rotation():
    # no translation -> no parallax -> must refuse
    pts, uv1, uv2, valid, _ = two_view_scene(
        jax.random.PRNGKey(2), baseline=0.0, noise=0.2
    )
    res = init2view.initialize_two_view(K, uv1, uv2, valid)
    assert not bool(res.ok)


def test_init_with_outlier_matches():
    pts, uv1, uv2, valid, T21 = two_view_scene(jax.random.PRNGKey(3))
    # shuffle 20% of uv2 (wrong matches)
    n = uv2.shape[0]
    rng = np.random.RandomState(0)
    bad = rng.rand(n) < 0.2
    perm = rng.permutation(n)
    uv2n = np.asarray(uv2).copy()
    uv2n[bad] = uv2n[perm[bad]]
    res = init2view.initialize_two_view(K, uv1, jnp.asarray(uv2n), valid)
    assert bool(res.ok)
    r_err, t_err = relpose_err(res.T_21, T21)
    assert r_err < 0.01
    assert t_err < 0.06
