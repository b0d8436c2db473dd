"""End-to-end System tests on synthetic sequences (mono + RGB-D)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_with_quadrics_tpu.models import frontend as fe
from orbslam2_with_quadrics_tpu.models import map_state as ms
from orbslam2_with_quadrics_tpu.models import system as sysm
from orbslam2_with_quadrics_tpu.utils import metrics, synthetic

H, W = 240, 320
FX = 260.0


def make_cfg(sensor="mono", **kw):
    return sysm.SystemConfig(
        frontend=fe.FrontendConfig(
            height=H, width=W, n_features=512, n_levels=4,
            fx=FX, fy=FX, cx=W / 2, cy=H / 2,
            bf=0.0 if sensor == "mono" else 0.1 * FX,
        ),
        map=ms.MapConfig(
            max_keyframes=32, max_points=4096, n_features=512, n_levels=4
        ),
        sensor=sensor,
        max_frames_between_kf=8,
        **kw,
    )


def run_seq(slam, imgs, poses_gt, depths=None):
    for i in range(len(imgs)):
        if depths is not None:
            slam.track_rgbd(imgs[i], depths[i], timestamp=i / 30.0)
        else:
            slam.track_monocular(imgs[i], timestamp=i / 30.0)
    est, gt = [], []
    for fid, ts, T7 in slam.full_trajectory():
        est.append(metrics.se3_vec_to_mat(T7))
        gt.append(poses_gt[fid])
    return est, gt


@pytest.fixture(scope="module")
def planar_seq():
    return synthetic.planar_sequence(n_frames=25, h=H, w=W, fx=FX, fy=FX, seed=3)


def test_mono_pipeline_tracks_and_maps(planar_seq):
    imgs, poses_gt, K = planar_seq
    slam = sysm.System(make_cfg())
    est, gt = run_seq(slam, imgs, poses_gt)
    assert slam.state == sysm.System.OK
    assert int(slam.map.n_kf) >= 2
    assert int(slam.map.n_pt) > 50
    assert len(est) >= 20
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est), metrics.camera_centers_from_Tcw(gt)
    )
    span = np.linalg.norm(
        metrics.camera_centers_from_Tcw(gt).max(0)
        - metrics.camera_centers_from_Tcw(gt).min(0)
    )
    assert ate < 0.05 * span


def test_rgbd_pipeline_metric_scale(planar_seq):
    imgs, poses_gt, K = planar_seq
    depths = [synthetic.planar_depth(T, K, H, W) for T in poses_gt]
    slam = sysm.System(make_cfg(sensor="rgbd"))
    est, gt = run_seq(slam, imgs, poses_gt, depths)
    assert slam.state == sysm.System.OK
    # RGB-D is metric: align WITHOUT scale
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est),
        metrics.camera_centers_from_Tcw(gt),
        with_scale=False,
    )
    assert ate < 0.08


def test_map_save_load_roundtrip(planar_seq, tmp_path):
    from orbslam2_with_quadrics_tpu.utils import serialization

    imgs, poses_gt, K = planar_seq
    slam = sysm.System(make_cfg())
    run_seq(slam, imgs[:15], poses_gt[:15])
    p = str(tmp_path / "map.npz")
    serialization.save_map(p, slam.map)
    m2 = serialization.load_map(p)
    assert int(m2.n_kf) == int(slam.map.n_kf)
    np.testing.assert_array_equal(
        np.asarray(m2.pt_valid), np.asarray(slam.map.pt_valid)
    )
    np.testing.assert_allclose(
        np.asarray(m2.kf_pose), np.asarray(slam.map.kf_pose)
    )


def test_system_checkpoint_resume(planar_seq, tmp_path):
    """Full checkpoint mid-sequence; the restored System keeps tracking."""
    from orbslam2_with_quadrics_tpu.utils import serialization

    imgs, poses_gt, K = planar_seq
    slam = sysm.System(make_cfg())
    for i in range(15):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    assert slam.state == sysm.System.OK
    p = str(tmp_path / "ckpt.pkl")
    serialization.save_system(p, slam)

    slam2 = sysm.System(make_cfg())
    serialization.load_system(p, slam2)
    assert slam2.state == sysm.System.OK
    assert int(slam2.map.n_kf) == int(slam.map.n_kf)
    for i in range(15, 25):
        slam2.track_monocular(imgs[i], timestamp=i / 30.0)
    slam2.shutdown()  # drain the pipelined frame (reference: Shutdown
    # must precede trajectory access, src/System.cc:301-320)
    assert slam2.state == sysm.System.OK
    assert len(slam2.trajectory) == 25


def test_trajectory_export_formats(planar_seq, tmp_path):
    from orbslam2_with_quadrics_tpu.utils import trajectory

    imgs, poses_gt, K = planar_seq
    slam = sysm.System(make_cfg())
    run_seq(slam, imgs[:12], poses_gt[:12])
    items = [
        (ts, metrics.se3_vec_to_mat(T7)) for _, ts, T7 in slam.full_trajectory()
    ]
    ptum = str(tmp_path / "tum.txt")
    pkit = str(tmp_path / "kitti.txt")
    trajectory.save_tum(ptum, items)
    trajectory.save_kitti(pkit, items)
    tum = np.loadtxt(ptum)
    kit = np.loadtxt(pkit)
    assert tum.shape == (len(items), 8)
    assert kit.shape == (len(items), 12)
    # quaternions normalized
    np.testing.assert_allclose(
        np.linalg.norm(tum[:, 4:8], axis=1), 1.0, atol=1e-5
    )


def test_localization_mode_and_status_api(planar_seq, tmp_path):
    """Reference System.h:80-123 surface: ActivateLocalizationMode freezes
    the map, MapChanged reports big changes, getters expose frame state,
    savers write TUM/KITTI files."""
    imgs, poses_gt, K = planar_seq
    slam = sysm.System(make_cfg())
    for i in range(12):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    assert slam.get_tracking_state() == sysm.System.OK
    n_kf_before = int(slam.map.n_kf)
    n_pt_before = int(slam.map.n_pt)

    slam.activate_localization_mode()
    for i in range(12, 20):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    # tracking continued but the map did not grow
    assert slam.get_tracking_state() == sysm.System.OK
    assert int(slam.map.n_kf) == n_kf_before
    assert int(slam.map.n_pt) == n_pt_before

    slam.deactivate_localization_mode()
    for i in range(20, len(imgs)):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)

    ids, pos = slam.get_tracked_map_points()
    assert len(ids) >= 30 and pos.shape == (len(ids), 3)
    kps = slam.get_tracked_keypoints_un()
    assert kps.ndim == 2 and kps.shape[1] == 2 and len(kps) > 0

    # map_changed: no loop closure ran, but reset() counts as a big change
    assert not slam.map_changed()
    slam.shutdown()
    t1, t2, t3 = (str(tmp_path / f"t{i}.txt") for i in range(3))
    slam.save_trajectory_tum(t1)
    slam.save_keyframe_trajectory_tum(t2)
    slam.save_trajectory_kitti(t3)
    assert len(open(t1).readlines()) == len(slam.full_trajectory())
    assert len(open(t2).readlines()) == len(slam.keyframe_trajectory())
    row = open(t3).readline().split()
    assert len(row) == 12  # KITTI 3x4 row-major
    slam.reset()
    assert slam.map_changed() and not slam.map_changed()

    with pytest.raises(AssertionError):
        slam.track_stereo(imgs[0], imgs[0])


def test_async_gba_merge_propagates(planar_seq):
    """Async global BA (reference LoopClosing.cc:579,645-749): the GBA
    result computed on a snapshot must be applied to snapshot KFs/points
    verbatim and spanning-tree-propagated to KFs/points created while it
    ran. Fabricating a GBA result = snapshot warped by a known rigid G
    makes the expected merged state exact: every pose -> T_cw o G^-1,
    every point -> G(p)."""
    import jax
    import jax.numpy as jnp

    from orbslam2_with_quadrics_tpu.ops import lie

    imgs, poses_gt, K = planar_seq
    cfg = make_cfg(async_gba=True)
    cfg.max_frames_between_kf = 4
    slam = sysm.System(cfg)
    for i in range(14):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    snap = slam.map
    for i in range(14, 25):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    m_before = slam.map
    assert int(m_before.n_kf) > int(snap.n_kf), "no new KFs during 'GBA'"
    assert int(m_before.n_pt) > int(snap.n_pt), "no new points during 'GBA'"

    G = lie.se3_exp(jnp.asarray([0.05, -0.03, 0.08, 0.2, -0.1, 0.3]))
    Ginv = lie.se3_inverse(G)
    gba = snap._replace(
        kf_pose=jax.vmap(lambda T: lie.se3_compose(T, Ginv))(snap.kf_pose),
        pt_pos=jax.vmap(lambda p: lie.se3_apply(G, p))(snap.pt_pos),
    )
    T_cw_before = np.asarray(slam.T_cw)
    slam._gba_result = (snap, gba, slam._map_epoch)
    slam._apply_gba_if_ready()

    kf_valid = np.asarray(m_before.kf_valid)
    in_snap = np.asarray(snap.kf_valid) & kf_valid
    got_pose = np.asarray(slam.map.kf_pose)
    before_pose = np.asarray(m_before.kf_pose)
    parents = np.asarray(m_before.kf_parent)
    # snapshot KFs take the GBA result verbatim (even where local BA
    # refined them meanwhile -- GBA wins, LoopClosing.cc:684-688)
    expect_snap = np.asarray(
        jax.vmap(lambda T: lie.se3_compose(T, Ginv))(snap.kf_pose)
    )
    np.testing.assert_allclose(
        got_pose[in_snap], expect_snap[in_snap], atol=1e-5
    )
    # KFs created during GBA keep their relative pose to the parent
    for s in np.where(kf_valid & ~in_snap)[0]:
        p = parents[s]
        rel_before = np.asarray(lie.se3_compose(
            jnp.asarray(before_pose[s]),
            lie.se3_inverse(jnp.asarray(before_pose[p])),
        ))
        rel_after = np.asarray(lie.se3_compose(
            jnp.asarray(got_pose[s]),
            lie.se3_inverse(jnp.asarray(got_pose[p])),
        ))
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-5,
                                   err_msg=f"new kf {s} parent {p}")
    # snapshot points take the GBA positions
    pt_valid = np.asarray(m_before.pt_valid)
    in_snap_pt = np.asarray(snap.pt_valid) & pt_valid
    got_pt = np.asarray(slam.map.pt_pos)
    expect_snap_pt = np.asarray(
        jax.vmap(lambda p: lie.se3_apply(G, p))(snap.pt_pos)
    )
    np.testing.assert_allclose(
        got_pt[in_snap_pt], expect_snap_pt[in_snap_pt], atol=1e-5
    )
    # new points keep their reference-KF camera-frame coordinates
    ref = np.asarray(m_before.pt_first_kf)
    for i in np.where(pt_valid & ~in_snap_pt)[0]:
        r = ref[i]
        cam_before = np.asarray(lie.se3_apply(
            jnp.asarray(before_pose[r]), jnp.asarray(np.asarray(m_before.pt_pos)[i])
        ))
        cam_after = np.asarray(lie.se3_apply(
            jnp.asarray(got_pose[r]), jnp.asarray(got_pt[i])
        ))
        np.testing.assert_allclose(cam_after, cam_before, atol=1e-5,
                                   err_msg=f"new pt {i} ref {r}")
    # live camera keeps its relative pose to its reference KF
    rk = slam.ref_kf
    rel_before = np.asarray(lie.se3_compose(
        jnp.asarray(T_cw_before), lie.se3_inverse(jnp.asarray(before_pose[rk]))
    ))
    rel_after = np.asarray(lie.se3_compose(
        slam.T_cw, lie.se3_inverse(jnp.asarray(got_pose[rk]))
    ))
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-5)


def test_async_gba_thread_end_to_end(planar_seq):
    """The real thread path: launch on a live map, keep tracking, shutdown
    joins and applies; the map stays consistent (tracking survives)."""
    imgs, poses_gt, K = planar_seq
    cfg = make_cfg(async_gba=True)
    cfg.max_frames_between_kf = 4
    slam = sysm.System(cfg)
    for i in range(14):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    slam._launch_global_ba(int(slam.ref_kf))
    for i in range(14, len(imgs)):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    slam.shutdown()
    assert slam._gba_result is None and slam._gba_thread is None
    assert slam.state == sysm.System.OK
    assert np.isfinite(np.asarray(slam.map.kf_pose)).all()
    est = [metrics.se3_vec_to_mat(T7) for _, _, T7 in slam.full_trajectory()]
    gt = [poses_gt[fid] for fid, _, _ in slam.full_trajectory()]
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est), metrics.camera_centers_from_Tcw(gt)
    )
    assert np.isfinite(ate)
