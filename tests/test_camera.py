import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import camera, lie

K = jnp.asarray([520.9, 521.0, 325.1, 249.7])
DIST = jnp.asarray([0.26, -0.95, -0.0054, 0.0027, 1.16])  # TUM1.yaml-like


def test_project_backproject_roundtrip():
    p = jax.random.uniform(
        jax.random.PRNGKey(0), (64, 3),
        minval=jnp.asarray([-2.0, -2.0, 1.0]), maxval=jnp.asarray([2.0, 2.0, 9.0]),
    )
    uv, z = camera.project(K, p)
    p2 = camera.backproject(K, uv, z)
    np.testing.assert_allclose(p, p2, atol=1e-4)


def test_stereo_projection_disparity_positive():
    p = jnp.asarray([[0.5, 0.2, 3.0]])
    uvr, _ = camera.project_stereo(K, 40.0, p)
    assert float(uvr[0, 0]) > float(uvr[0, 2])  # u_r < u_l


def test_undistort_inverts_distortion():
    # build distorted pixels from known ideal pixels, then undo
    ideal = jax.random.uniform(
        jax.random.PRNGKey(1), (128, 2), minval=140.0, maxval=420.0
    )
    fx, fy, cx, cy = K
    xn = jnp.stack([(ideal[:, 0] - cx) / fx, (ideal[:, 1] - cy) / fy], axis=-1)
    xd = camera.distort_normalized(DIST, xn)
    distorted = jnp.stack([xd[:, 0] * fx + cx, xd[:, 1] * fy + cy], axis=-1)
    recovered = camera.undistort_points(K, DIST, distorted, iters=8)
    np.testing.assert_allclose(recovered, ideal, atol=0.08)


def test_triangulate_dlt_exact():
    T1 = lie.se3_identity()
    T2 = lie.se3_exp(jnp.asarray([0.02, -0.01, 0.03, 0.3, 0.05, 0.1]))
    P1 = camera.projection_matrix(T1, K)
    P2 = camera.projection_matrix(T2, K)
    pts = jax.random.uniform(
        jax.random.PRNGKey(2), (32, 3),
        minval=jnp.asarray([-1.0, -1.0, 3.0]), maxval=jnp.asarray([1.0, 1.0, 8.0]),
    )
    uv1, _ = camera.project(K, lie.se3_apply(T1, pts))
    uv2, _ = camera.project(K, lie.se3_apply(T2, pts))
    X = jax.vmap(camera.triangulate_dlt, in_axes=(None, None, 0, 0))(P1, P2, uv1, uv2)
    np.testing.assert_allclose(X, pts, atol=1e-2)
