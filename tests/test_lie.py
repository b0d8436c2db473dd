import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_with_quadrics_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def rand_se3(key, n=()):
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, n + (6,)) * jnp.asarray([0.7] * 3 + [2.0] * 3)
    return lie.se3_exp(xi)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = lie.quat_normalize(jax.random.normal(key, (32, 4)))
    v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    out1 = lie.quat_rotate(q, v)
    out2 = jnp.einsum("bij,bj->bi", lie.quat_to_matrix(q), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_matrix_quat_roundtrip():
    q = lie.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (64, 4)))
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_so3_exp_log_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 1.2
    # log can only recover angles in [0, pi) — clamp the test inputs there
    n = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.where(n > 3.0, w * (3.0 / n), w)
    w2 = lie.so3_log(lie.so3_exp_quat(w))
    np.testing.assert_allclose(w, w2, atol=1e-5)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = lie.so3_exp_quat(w)
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(lie.so3_log(q), w, atol=1e-7)


def test_se3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(4), (64, 6)) * 0.8
    xi2 = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_compose_inverse():
    A = rand_se3(jax.random.PRNGKey(5), (16,))
    B = rand_se3(jax.random.PRNGKey(6), (16,))
    p = jax.random.normal(jax.random.PRNGKey(7), (16, 3))
    # (A*B) p == A (B p)
    np.testing.assert_allclose(
        lie.se3_apply(lie.se3_compose(A, B), p),
        lie.se3_apply(A, lie.se3_apply(B, p)),
        atol=1e-4,
    )
    # A^-1 A == I
    eye = lie.se3_compose(lie.se3_inverse(A), A)
    np.testing.assert_allclose(lie.se3_apply(eye, p), p, atol=1e-4)


def test_se3_matrix_roundtrip():
    T = rand_se3(jax.random.PRNGKey(8), (16,))
    T2 = lie.se3_from_matrix(lie.se3_to_matrix(T))
    p = jax.random.normal(jax.random.PRNGKey(9), (16, 3))
    np.testing.assert_allclose(
        lie.se3_apply(T, p), lie.se3_apply(T2, p), atol=1e-4
    )


def test_se3_retract_first_order():
    T = rand_se3(jax.random.PRNGKey(10))
    xi = jnp.asarray([1e-3, -2e-3, 0.5e-3, 2e-3, 1e-3, -1e-3])
    p = jnp.asarray([0.3, -0.2, 1.5])
    lhs = lie.se3_apply(lie.se3_retract(T, xi), p)
    pc = lie.se3_apply(T, p)
    rhs = pc + jnp.cross(xi[:3], pc) + xi[3:]
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_sim3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(11), (64, 7)) * jnp.asarray(
        [0.6] * 3 + [1.0] * 3 + [0.3]
    )
    xi2 = lie.sim3_log(lie.sim3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=2e-4)


def test_sim3_compose_apply():
    xa = jax.random.normal(jax.random.PRNGKey(12), (8, 7)) * 0.5
    xb = jax.random.normal(jax.random.PRNGKey(13), (8, 7)) * 0.5
    A, B = lie.sim3_exp(xa), lie.sim3_exp(xb)
    p = jax.random.normal(jax.random.PRNGKey(14), (8, 3))
    np.testing.assert_allclose(
        lie.sim3_apply(lie.sim3_compose(A, B), p),
        lie.sim3_apply(A, lie.sim3_apply(B, p)),
        atol=1e-4,
    )
    inv = lie.sim3_compose(lie.sim3_inverse(A), A)
    np.testing.assert_allclose(lie.sim3_apply(inv, p), p, atol=1e-4)


def test_sim3_se3_consistency():
    """sim3 with s=1 behaves exactly like se3."""
    T = rand_se3(jax.random.PRNGKey(15), (8,))
    S = lie.sim3_from_se3(T)
    p = jax.random.normal(jax.random.PRNGKey(16), (8, 3))
    np.testing.assert_allclose(
        lie.sim3_apply(S, p), lie.se3_apply(T, p), atol=1e-5
    )


def test_sim3_zero_rotation_with_scale():
    xi = jnp.asarray([0.0, 0.0, 0.0, 1.0, -2.0, 3.0, 0.4])
    S = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(S)
    np.testing.assert_allclose(xi, xi2, atol=5e-4)
