"""Extended System integration: stereo, loop closing, quadrics, reloc."""

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
            max_keyframes=48, max_points=8192, n_features=512, n_levels=4
        ),
        sensor=sensor,
        # close-point thresholds scaled from the reference's 100/70
        # (which assume ~2000-feature frames) to this 512-feature scene:
        # the fast synthetic motion sheds tracked close points quickly, so
        # bNeedToInsertClose is what drives stereo keyframe insertion here
        **{
            "max_frames_between_kf": 6,
            "kf_close_tracked_th": 250,
            "kf_close_untracked_th": 40,
            **kw,
        },
    )


def test_stereo_pipeline_metric():
    imgs_l, imgs_r, poses_gt, K = synthetic.planar_sequence_stereo(
        n_frames=20, h=H, w=W, fx=FX, fy=FX, baseline=0.1, seed=5
    )
    slam = sysm.System(make_cfg(sensor="stereo"))
    for i in range(len(imgs_l)):
        slam.track_stereo(imgs_l[i], imgs_r[i], timestamp=i / 30.0)
    assert slam.state == sysm.System.OK
    est = [metrics.se3_vec_to_mat(T7) for _, _, T7 in slam.full_trajectory()]
    gt = [poses_gt[fid] for fid, _, _ in slam.full_trajectory()]
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est),
        metrics.camera_centers_from_Tcw(gt),
        with_scale=False,  # stereo is metric
    )
    assert ate < 0.1


def test_quadric_end_to_end():
    """Mono + synthetic detections of a virtual object: the quadric
    initializes and lands near the object's true position."""
    from orbslam2_with_quadrics_tpu.ops import lie, quadrics

    imgs, poses_gt, K = synthetic.planar_sequence(
        n_frames=22, h=H, w=W, fx=FX, fy=FX, seed=3
    )
    # virtual object: ellipsoid floating above the plane (world units; the
    # mono map has its own scale, so compare in *normalized* space)
    q_true = quadrics.Quadric(
        pose=lie.se3_make(
            jnp.asarray([1.0, 0.0, 0.0, 0.0]), jnp.asarray([0.4, 0.3, 0.6])
        ),
        scale=jnp.asarray([0.25, 0.2, 0.15]),
    )
    cfg = make_cfg(enable_quadrics=True, quadric_min_points=3)
    slam = sysm.System(cfg)
    Kj = jnp.asarray(K)
    for i in range(len(imgs)):
        T_cw = jnp.asarray(
            np.concatenate(
                [
                    _mat_quat(poses_gt[i][:3, :3]),
                    poses_gt[i][:3, 3],
                ]
            ),
            jnp.float32,
        )
        bbox, ok = quadrics.project_bbox(q_true, T_cw, Kj)
        det = None
        if bool(ok):
            b = np.asarray(bbox)
            det = np.asarray(
                [[b[0], b[1], b[2] - b[0], b[3] - b[1], 0.9, 1.0]], np.float32
            )
        slam.track_monocular(imgs[i], timestamp=i / 30.0, detections=det)

    assert slam.state == sysm.System.OK
    inits = [lm for lm in slam.quadrics.landmarks if lm.initialized]
    assert len(inits) >= 1
    lm = inits[0]
    # gauge-free check: the estimated quadric must re-project onto the
    # measured boxes in the keyframes it was built from (IoU)
    q_est = quadrics.Quadric(jnp.asarray(lm.pose), jnp.asarray(lm.scale))
    ious = []
    for slot, bbox in zip(lm.kf_slots, lm.bboxes):
        pred, ok = quadrics.project_bbox(
            q_est, slam.map.kf_pose[slot], Kj
        )
        if not bool(ok):
            continue
        p = np.asarray(pred)
        b = np.asarray(bbox)
        ix = max(0.0, min(p[2], b[2]) - max(p[0], b[0]))
        iy = max(0.0, min(p[3], b[3]) - max(p[1], b[1]))
        inter = ix * iy
        union = (
            (p[2] - p[0]) * (p[3] - p[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        )
        ious.append(inter / max(union, 1e-9))
    assert len(ious) >= 3
    assert np.median(ious) > 0.5


def _mat_quat(R):
    from orbslam2_with_quadrics_tpu.utils.trajectory import _R_to_quat

    qx, qy, qz, qw = _R_to_quat(R)
    return np.asarray([qw, qx, qy, qz])


def test_relocalization_after_kidnap():
    """Feed noise frames to force LOST, then return to a known view —
    the BoW+PnP relocalization must recover (reference
    src/Tracking.cc:1341-1502)."""
    rng = np.random.RandomState(3)
    imgs, poses_gt, K = synthetic.planar_sequence(
        n_frames=30, h=H, w=W, fx=FX, fy=FX, seed=9, relief=True
    )
    cfg = make_cfg(enable_loop_closing=True)  # trains the vocabulary
    cfg = sysm.SystemConfig(
        **{**cfg.__dict__, "vocab_train_kfs": 2, "max_frames_between_kf": 2}
    )
    slam = sysm.System(cfg)
    for i in range(30):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    assert slam.state == sysm.System.OK
    # need >5 KFs or the lost-after-weak-init auto-reset wipes the map
    assert int(slam.map.n_kf) > 5
    assert slam.loop_closer is not None
    T_before = np.asarray(slam.T_cw)

    # kidnap: white noise frames
    for k in range(3):
        slam.track_monocular(
            rng.rand(H, W).astype(np.float32) * 255.0, timestamp=1.0 + k
        )
    assert slam.state == sysm.System.LOST

    # return to a previously-seen view
    recovered = False
    for i in range(16, 26):
        slam.track_monocular(imgs[i], timestamp=2.0 + i / 30.0)
        if slam.state == sysm.System.OK:
            recovered = True
            break
    assert recovered


def test_loop_closing_on_orbit():
    imgs, poses_gt, K = synthetic.planar_sequence(
        n_frames=40, h=H, w=W, fx=FX, fy=FX, seed=7, motion="orbit_loop"
    )
    cfg = make_cfg(enable_loop_closing=True, max_frames_between_kf=4)
    slam = sysm.System(cfg)
    for i in range(len(imgs)):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    # tracked through and built a database; loop closure is opportunistic
    # on this short sequence, so only assert the machinery engaged and the
    # trajectory stayed sane
    assert slam.state == sysm.System.OK
    assert slam.loop_closer is not None
    est = [metrics.se3_vec_to_mat(T7) for _, _, T7 in slam.full_trajectory()]
    gt = [poses_gt[fid] for fid, _, _ in slam.full_trajectory()]
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est), metrics.camera_centers_from_Tcw(gt)
    )
    span = np.linalg.norm(
        metrics.camera_centers_from_Tcw(gt).max(0)
        - metrics.camera_centers_from_Tcw(gt).min(0)
    )
    assert ate < 0.12 * span


def test_relocalization_without_loop_closing():
    """The reference can always relocalize — the vocabulary and keyframe
    database exist independently of loop closing (src/System.cc:64-88).
    Same kidnap scenario as above but with enable_loop_closing=False."""
    rng = np.random.RandomState(3)
    imgs, poses_gt, K = synthetic.planar_sequence(
        n_frames=30, h=H, w=W, fx=FX, fy=FX, seed=9, relief=True
    )
    cfg = make_cfg(enable_loop_closing=False)
    cfg = sysm.SystemConfig(
        **{**cfg.__dict__, "vocab_train_kfs": 2, "max_frames_between_kf": 2}
    )
    slam = sysm.System(cfg)
    for i in range(30):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    assert slam.state == sysm.System.OK
    assert int(slam.map.n_kf) > 5
    # database maintained even though loop closing is off
    assert slam.loop_closer is not None

    for k in range(3):
        slam.track_monocular(
            rng.rand(H, W).astype(np.float32) * 255.0, timestamp=1.0 + k
        )
    assert slam.state == sysm.System.LOST

    recovered = False
    for i in range(16, 26):
        slam.track_monocular(imgs[i], timestamp=2.0 + i / 30.0)
        if slam.state == sysm.System.OK:
            recovered = True
            break
    assert recovered


def test_capacity_growth_and_compaction():
    """A keyframe pool far smaller than the sequence demands must not
    silently stop mapping (the reference has no capacity limits,
    src/Map.cc): the pool compacts culled slots and/or doubles, and
    tracking runs to the end with a sane trajectory."""
    imgs, poses_gt, K = synthetic.planar_sequence(
        n_frames=24, h=H, w=W, fx=FX, fy=FX, seed=11
    )
    cfg = make_cfg()
    cfg = sysm.SystemConfig(
        **{
            **cfg.__dict__,
            # insert as densely as possible: this test exists to overflow
            # the 10-slot pool, not to model mapping occupancy (c1a at
            # every 2nd frame forces insertion past the mapping-idle
            # backpressure gate)
            "kf_idle_frames": 1,
            "max_frames_between_kf": 2,
            "map": ms.MapConfig(
                max_keyframes=10, max_points=8192, n_features=512, n_levels=4
            ),
        }
    )
    slam = sysm.System(cfg)
    for i in range(len(imgs)):
        slam.track_monocular(imgs[i], timestamp=i / 30.0)
    slam.shutdown()
    assert slam.state == sysm.System.OK
    # mapping kept going past the original pool: creations exceeded it
    # and a capacity event (compaction or doubling) actually fired
    assert slam.n_kfs_created + 2 > 10  # +2 = the two init keyframes
    assert slam.n_kf_growths + slam.n_kf_compactions >= 1
    pool = slam.map.kf_valid.shape[0]
    assert int(slam.map.n_kf) <= pool
    traj = slam.full_trajectory()
    assert len(traj) == len(imgs)
    est = [metrics.se3_vec_to_mat(T7) for _, _, T7 in traj]
    gt = [poses_gt[fid] for fid, _, _ in traj]
    ate = metrics.ate_rmse(
        metrics.camera_centers_from_Tcw(est), metrics.camera_centers_from_Tcw(gt)
    )
    span = np.linalg.norm(
        metrics.camera_centers_from_Tcw(gt).max(0)
        - metrics.camera_centers_from_Tcw(gt).min(0)
    )
    assert ate < 0.12 * span
