"""Global bundle adjustment frees EVERY keyframe, not a covisibility
window (Optimizer::GlobalBundleAdjustemnt, reference src/Optimizer.cc:41-237,
KF0 fixed at :79).

The decisive scenario: a trajectory whose two ends observe disjoint point
sets — a keyframe sharing ZERO points with the last keyframe must still be
corrected by the post-loop GBA (the round-1 window-limited stand-in left
such keyframes fixed)."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.models import local_mapping as lm
from orbslam2_with_quadrics_tpu.models import map_state as ms
from orbslam2_with_quadrics_tpu.ops import camera, lie, orb

K = jnp.asarray([300.0, 300.0, 160.0, 120.0])
BF = jnp.asarray(30.0)  # stereo: fx * 0.1 m baseline — pins the scale
                        # gauge that a monocular BA leaves free (the
                        # reference's mono GBA has the same 7-dof gauge)
N = 128


def build_chain_map(n_kf=6, n_seg=60, noise=0.08, seed=0):
    """Keyframes along +x; each KF k observes ONLY segment-k points plus
    segment k-1 (chain covisibility). KF0 and KF n-1 share nothing."""
    cfg = ms.MapConfig(max_keyframes=8, max_points=1024, n_features=N, n_levels=4)
    m = ms.empty_map(cfg)
    rng = np.random.RandomState(seed)

    xs = np.linspace(0.0, 2.5, n_kf)
    poses_true = [lie.se3_exp(jnp.asarray([0, 0, 0, -x, 0, 0])) for x in xs]

    # per-segment point clouds centred in front of each keyframe
    seg_pts, seg_ids = [], []
    for k in range(n_kf):
        p = rng.uniform(
            low=[xs[k] - 0.6, -1.0, 4.0], high=[xs[k] + 0.6, 1.0, 6.0],
            size=(n_seg, 3),
        ).astype(np.float32)
        desc = jnp.asarray(
            rng.randint(0, 2**31 - 1, (n_seg, 8)), jnp.uint32
        )
        m, ids = ms.insert_points(
            m, jnp.asarray(p), desc, jnp.full((n_seg,), k, jnp.int32),
            jnp.ones((n_seg,), bool),
        )
        seg_pts.append(p)
        seg_ids.append(np.asarray(ids))

    for k in range(n_kf):
        T_true = poses_true[k]
        # observe own segment + previous segment (chain)
        ids = seg_ids[k] if k == 0 else np.concatenate([seg_ids[k - 1], seg_ids[k]])
        pw = seg_pts[k] if k == 0 else np.concatenate([seg_pts[k - 1], seg_pts[k]])
        ids, pw = ids[:N], pw[:N]
        uv, z = camera.project(K, lie.se3_apply(T_true, jnp.asarray(pw)))
        npts = len(ids)
        uv_full = jnp.zeros((N, 2)).at[:npts].set(uv)
        ur = uv[:, 0] - BF / jnp.maximum(z, 1e-6)  # right-image column
        ur_full = jnp.full((N,), -1.0).at[:npts].set(ur)
        obs = jnp.full((N,), -1, jnp.int32).at[:npts].set(jnp.asarray(ids))
        kp_valid = jnp.zeros((N,), bool).at[:npts].set(
            np.asarray(z)[:npts] > 0
        )
        # noisy pose estimate (KF0 exact: it is the gauge)
        xi = jnp.asarray(rng.uniform(-noise, noise, 6)) * (k > 0)
        T_est = lie.se3_retract(T_true, xi)
        m, _ = ms.insert_keyframe(
            m, T_est, jnp.asarray(k, jnp.int32), uv_full,
            ur_full, jnp.zeros((N, ), jnp.int32),
            jnp.zeros((N,)), jnp.zeros((N, 8), jnp.uint32), kp_valid, obs,
            jnp.asarray(k - 1, jnp.int32),
        )
    # noisy points too
    m = m._replace(
        pt_pos=m.pt_pos
        + jnp.asarray(rng.uniform(-0.03, 0.03, m.pt_pos.shape), jnp.float32)
        * m.pt_valid[:, None]
    )
    return m, poses_true


def _pose_err(m, poses_true):
    return [
        float(
            jnp.linalg.norm(
                lie.se3_log(
                    lie.se3_compose(m.kf_pose[k], lie.se3_inverse(poses_true[k]))
                )
            )
        )
        for k in range(len(poses_true))
    ]


def test_global_ba_corrects_disconnected_keyframes():
    m, poses_true = build_chain_map()
    n_kf = len(poses_true)

    # verify the premise: KF0 and KF n-1 share zero points
    W = np.asarray(ms.covisibility(m))
    assert W[0, n_kf - 1] == 0, "test scenario must have disconnected ends"

    err_before = _pose_err(m, poses_true)
    _, _, inv_sigma2 = orb.scale_factors(4, 1.2)
    m2, cost = lm.run_global_ba(m, K, BF, inv_sigma2, n_iters=10)
    err_after = _pose_err(m2, poses_true)

    # gauge keyframe untouched
    assert err_after[0] < 1e-6
    # EVERY keyframe improved (esp. those sharing nothing with the last)
    for k in range(1, n_kf):
        assert err_after[k] < 0.2 * err_before[k], (
            f"KF{k}: {err_before[k]:.4f} -> {err_after[k]:.4f}"
        )


def test_global_ba_fixes_kf0_only():
    m, poses_true = build_chain_map(noise=0.0)
    # zero noise: GBA must be (near) a no-op
    _, _, inv_sigma2 = orb.scale_factors(4, 1.2)
    m2, _ = lm.run_global_ba(m, K, BF, inv_sigma2, n_iters=3)
    for k in range(len(poses_true)):
        d = float(jnp.linalg.norm(m2.kf_pose[k] - m.kf_pose[k]))
        assert d < 2e-2
