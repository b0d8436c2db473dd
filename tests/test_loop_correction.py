"""End-to-end loop correction on a hand-built drifted map.

Constructs the classic loop-closure situation explicitly (a trajectory
whose tail is drifted by a known Sim3, with duplicated landmarks for the
revisited place), then drives LoopCloser.attempt_close — BoW matching ->
Horn RANSAC -> Sim3 LM -> pose-graph -> point remap — and checks the
drift is removed. This isolates the correction stack from place-
recognition recall (tested separately) and from tracker re-attachment
(which on easy synthetic scenes prevents drift from accumulating at all).
"""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.models import loop_closing as lc
from orbslam2_with_quadrics_tpu.models import map_state as ms
from orbslam2_with_quadrics_tpu.ops import camera, lie, orb, vocab

K = jnp.asarray([300.0, 300.0, 160.0, 120.0])
N = 256  # keypoints per KF


def rand_desc(key, n):
    return jax.random.randint(key, (n, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )


def build_drifted_loop(n_kf=10, n_home=120, n_route=40):
    """Trajectory 0..n_kf-1 along a line and back; poses/points of the
    second half drifted by S_drift. The home scene is observed by KF0
    (clean) and KF n_kf-1 (drifted duplicate points)."""
    cfg = ms.MapConfig(max_keyframes=16, max_points=2048, n_features=N, n_levels=4)
    m = ms.empty_map(cfg)
    key = jax.random.PRNGKey(0)

    home_pts = jax.random.uniform(
        key, (n_home, 3),
        minval=jnp.asarray([-1.5, -1.0, 4.0]), maxval=jnp.asarray([1.5, 1.0, 7.0]),
    )
    home_desc = rand_desc(jax.random.PRNGKey(1), n_home)

    # ground-truth poses: out along +x and back
    xs = np.concatenate([np.linspace(0, 4, n_kf // 2), np.linspace(4, 0.3, n_kf - n_kf // 2)])
    poses_true = [lie.se3_exp(jnp.asarray([0, 0, 0, -x, 0, 0])) for x in xs]

    # drift: applied to the SECOND half of the trajectory estimate
    S_drift = lie.sim3_exp(
        jnp.asarray([0.02, -0.03, 0.04, 0.35, 0.15, -0.1, 0.08])
    )

    def drifted_pose(T):
        # estimated pose of a drifted camera: T_est = T_true o S_drift^-1
        Sinv = lie.sim3_inverse(S_drift)
        Tm = lie.sim3_to_se3(
            lie.sim3_compose(lie.sim3_from_se3(T), Sinv)
        )
        return Tm

    # clean home points into the pool
    m, home_ids = ms.insert_points(
        m, home_pts, home_desc, jnp.zeros((n_home,), jnp.int32),
        jnp.ones((n_home,), bool),
    )
    # drifted duplicates of the home points (what the returning tracker
    # triangulated): p_est = S_drift(p_true)
    home_dup = lie.sim3_apply(S_drift, home_pts)
    m, dup_ids = ms.insert_points(
        m, home_dup, home_desc, jnp.full((n_home,), n_kf - 1, jnp.int32),
        jnp.ones((n_home,), bool),
    )

    # route points (clean for first half, drifted for second half)
    route_desc = rand_desc(jax.random.PRNGKey(2), n_route * n_kf)

    for k in range(n_kf):
        T_true = poses_true[k]
        drift_k = k >= n_kf // 2
        T_est = drifted_pose(T_true) if drift_k else T_true

        # observations: home points for first and last KF, route points else
        if k == 0:
            pts_ids = np.asarray(home_ids)
            pw = home_pts
            desc = home_desc
        elif k == n_kf - 1:
            pts_ids = np.asarray(dup_ids)
            pw = home_dup
            desc = home_desc
        else:
            rp = jax.random.uniform(
                jax.random.PRNGKey(10 + k), (n_route, 3),
                minval=jnp.asarray([-1.5, -1.0, 4.0]),
                maxval=jnp.asarray([1.5, 1.0, 7.0]),
            )
            rp = rp + jnp.asarray([-xs[k], 0.0, 0.0]) * 0  # local scene
            rp = lie.se3_apply(lie.se3_inverse(T_true), lie.se3_apply(lie.se3_identity(), rp))
            d = route_desc[k * n_route : (k + 1) * n_route]
            rp_est = lie.sim3_apply(S_drift, rp) if drift_k else rp
            m, ids = ms.insert_points(
                m, rp_est, d, jnp.full((n_route,), k, jnp.int32),
                jnp.ones((n_route,), bool),
            )
            pts_ids = np.asarray(ids)
            pw = rp_est
            desc = d

        # project into the ESTIMATED camera (consistent estimated world)
        uv, z = camera.project(K, lie.se3_apply(T_est, jnp.asarray(pw)))
        npts = len(pts_ids)
        uv_full = jnp.zeros((N, 2)).at[:npts].set(uv)
        desc_full = jnp.zeros((N, 8), jnp.uint32).at[:npts].set(desc)
        obs = jnp.full((N,), -1, jnp.int32).at[:npts].set(jnp.asarray(pts_ids))
        kp_valid = jnp.zeros((N,), bool).at[:npts].set(True)
        m, slot = ms.insert_keyframe(
            m, T_est, jnp.asarray(k, jnp.int32), uv_full,
            jnp.full((N,), -1.0), jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,)), desc_full, kp_valid, obs,
            jnp.asarray(k - 1, jnp.int32),
        )
    # sane descriptors/normals/scale bands (the pipeline maintains these;
    # the loop-point projection gate predicts octaves from the band)
    m = ms.update_point_stats(m, orb.scale_factors(4, 1.2)[0])
    return m, poses_true, S_drift, cfg


def test_attempt_close_removes_drift():
    m, poses_true, S_drift, cfg = build_drifted_loop()
    n_kf = int(m.n_kf)

    # vocabulary trained on the map's own descriptors
    voc = vocab.train(m.kf_desc.reshape(-1, 8)[:2048], k=8, levels=3)
    closer = lc.LoopCloser(voc, cfg)
    for s in range(n_kf):
        closer.add_keyframe(s, m.kf_desc[s], m.kf_kp_valid[s])

    slot, cand = n_kf - 1, 0
    # drift before: the last pose is off by the injected Sim3
    err_before = float(
        jnp.linalg.norm(
            lie.se3_log(
                lie.se3_compose(
                    m.kf_pose[slot], lie.se3_inverse(poses_true[slot])
                )
            )
        )
    )
    m2, ok = closer.attempt_close(m, slot, cand, K, n_levels=4)
    assert ok, "geometric verification failed on a true loop"
    err_after = float(
        jnp.linalg.norm(
            lie.se3_log(
                lie.se3_compose(
                    m2.kf_pose[slot], lie.se3_inverse(poses_true[slot])
                )
            )
        )
    )
    assert err_after < 0.3 * err_before
    # home duplicates were remapped close to the clean home points
    # (points created by the last KF carry its correction)
    P = m.pt_pos.shape[0]
    dup_mask = np.asarray(m.pt_first_kf) == n_kf - 1
    clean_mask = np.asarray(m.pt_first_kf) == 0
    dup_after = np.asarray(m2.pt_pos)[dup_mask]
    clean = np.asarray(m2.pt_pos)[clean_mask][: dup_after.shape[0]]
    med = np.median(np.linalg.norm(dup_after - clean, axis=1))
    assert med < 0.25, f"duplicate home points still offset by {med}"
    # SearchAndFuse merged the duplicated home landmarks into the loop
    # side's originals: the valid point count DROPS (LoopClosing.cc:518-542)
    n_before = int(jnp.sum(m.pt_valid))
    n_after = int(jnp.sum(m2.pt_valid))
    n_dup = int(dup_mask.sum())
    assert n_after <= n_before - 0.5 * n_dup, (
        f"expected >=50% of {n_dup} duplicates fused, "
        f"got {n_before - n_after}"
    )
    # the fused duplicates' observations now point at the originals: the
    # last keyframe must still observe >= as many points as before
    assert int(jnp.sum(m2.kf_obs_point[n_kf - 1] >= 0)) >= int(
        jnp.sum(m.kf_obs_point[n_kf - 1] >= 0)
    ) - 5
    # and the closure is recorded as a persistent loop edge
    assert closer.loop_edges == [(n_kf - 1, 0)]


def test_covis_group_accumulation_rejects_isolated_weak_candidate():
    """DetectLoopCandidates' group scoring (src/KeyFrameDatabase.cc:142-197):
    a lone candidate is rejected when a covisibility-supported group's
    accumulated score dwarfs it; the kept group returns its best member."""
    from orbslam2_with_quadrics_tpu.models.loop_closing import (
        _accumulate_covis_groups,
    )

    K = 16
    scores = np.zeros(K)
    # isolated weak candidate 3; supported group {10, 11, 12}
    scores[3] = 0.4
    scores[10], scores[11], scores[12] = 0.35, 0.30, 0.25
    W = np.zeros((K, K))
    for a in (10, 11, 12):
        for b in (10, 11, 12):
            if a != b:
                W[a, b] = 30
    cand = np.asarray([3, 10, 11, 12])
    keep = _accumulate_covis_groups(scores, cand, W)
    # group acc = 0.90; candidate 3 acc = 0.4 < 0.75*0.90
    assert keep == {10}

    # an isolated candidate that IS strong enough survives
    scores[3] = 0.8
    keep = _accumulate_covis_groups(scores, cand, W)
    assert 3 in keep and 10 in keep
