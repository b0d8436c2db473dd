"""Dataset-scale synthetic evaluation: the primary-accuracy run.

No TUM/KITTI datasets exist in this sandbox (no network), so this is the
full-workload stand-in the reference validates with its example drivers
(mono_tum.cc:68-132 + README.md.bk evaluation flow): 640x480 frames,
1000 features, 8 pyramid levels, >=1,500 frames with a genuine long loop
(`out_and_back` leaves the start area entirely and returns — the revisit
is only reconnectable by loop closure), driven frame-by-frame through
``System`` exactly as ``examples/mono_tum.py`` drives real data.

Records into EVAL_r{N}.json: ATE RMSE (absolute + % of trajectory span),
organic loop closures, median/mean tracking time (the reference's own
metric, mono_tum.cc:120-129), fps, capacity events (pool growth /
compaction), final map size, and peak device memory when available.

Usage:
    python scripts/eval_full.py --frames 1500 --out EVAL_r03.json
    python scripts/eval_full.py --sensor stereo --features 2000 ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--sensor", choices=["mono", "stereo"], default="mono")
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--motion", default="out_and_back")
    ap.add_argument("--plane-half", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--noise", type=float, default=6.0,
                    help="sensor noise sigma (gray levels); 0 = clean render")
    ap.add_argument("--tex-size", type=int, default=0,
                    help="texture resolution; 0 = auto (~170 px per world "
                         "unit, so full-res frames see crisp corners instead "
                         "of a blurry upsample of a small texture)")
    ap.add_argument("--max-keyframes", type=int, default=128,
                    help="initial pool; growth/compaction must handle the rest")
    ap.add_argument("--max-points", type=int, default=32768)
    ap.add_argument("--n-local-kf", type=int, default=24,
                    help="tracking local-map window (reference caps at 80 "
                         "of hundreds of KFs, src/Tracking.cc:1285 — the "
                         "window must be a strict subset of the map for "
                         "revisits to be loop-closure events)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--stereo-ref-ratio", type=float, default=0.75,
                    help="stereo/RGB-D thRefRatio; raise toward 1.0 for "
                         "denser keyframes when inliers decay slowly")
    ap.add_argument("--max-kf-gap", type=int, default=30,
                    help="mMaxFrames (reference Camera.fps): forced "
                         "keyframe cadence; lower = denser keyframes")
    ap.add_argument("--tag", default="")
    ap.add_argument("--progress-every", type=int, default=50)
    args = ap.parse_args()

    import jax

    from orbslam2_with_quadrics_tpu.models import frontend as fe
    from orbslam2_with_quadrics_tpu.models import map_state as ms
    from orbslam2_with_quadrics_tpu.models import system as sysm
    from orbslam2_with_quadrics_tpu.utils import metrics, synthetic

    H, W = args.height, args.width
    FX = 520.9 * W / 640.0  # TUM1-like intrinsics scaled to the frame
    bf = 0.0 if args.sensor == "mono" else 0.08 * FX
    cfg = sysm.SystemConfig(
        frontend=fe.FrontendConfig(
            height=H, width=W, n_features=args.features, n_levels=args.levels,
            fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0, bf=bf,
        ),
        map=ms.MapConfig(
            max_keyframes=args.max_keyframes, max_points=args.max_points,
            n_features=args.features, n_levels=args.levels,
        ),
        sensor=args.sensor,
        max_frames_between_kf=args.max_kf_gap,  # reference mMaxFrames=fps
        kf_stereo_ref_ratio=args.stereo_ref_ratio,
        enable_loop_closing=True,
        n_local_kf=args.n_local_kf,
    )
    slam = sysm.System(cfg)

    # ~250 texture px per world unit keeps the per-view corner count at
    # the level the toy scenes have (blob density is per texture px)
    tex_size = args.tex_size or int(
        min(8192, max(2048, 2 * args.plane_half * 250))
    )
    stream = synthetic.planar_stream(
        n_frames=args.frames, h=H, w=W, fx=FX, fy=FX, seed=args.seed,
        motion=args.motion, plane_half=args.plane_half, relief=True,
        noise=args.noise, tex_size=tex_size,
    )
    if args.sensor == "stereo":
        tex = synthetic._texture(tex_size, args.seed)
        relief_tex = synthetic._texture(512, args.seed + 77)
        noise_rng = (
            np.random.RandomState(args.seed + 979) if args.noise > 0 else None
        )
        K3 = np.array([[FX, 0, W / 2.0], [0, FX, H / 2.0], [0, 0, 1.0]])
        baseline = bf / FX

    poses_gt = []
    frame_times = []
    t_start = time.time()
    loops_seen_at = []
    for i, (img, T_gt) in enumerate(stream):
        poses_gt.append(T_gt)
        loops_before = slam.n_loops_closed
        t0 = time.perf_counter()
        if args.sensor == "mono":
            slam.track_monocular(img, timestamp=i / 30.0)
        else:
            img_r = synthetic.render_plane(
                tex, synthetic.stereo_right_pose(T_gt, baseline), K3, H, W,
                plane_half=args.plane_half, relief_tex=relief_tex,
                noise=args.noise, noise_rng=noise_rng,
            )
            slam.track_stereo(img, img_r, timestamp=i / 30.0)
        frame_times.append(time.perf_counter() - t0)
        if slam.n_loops_closed > loops_before:
            loops_seen_at.append(i)
        if i % args.progress_every == 0:
            st = {0: "INIT", 1: "OK", 2: "LOST"}[slam.state]
            inl = slam.metrics[-1]["inliers"] if slam.metrics else -1
            print(
                f"frame {i:5d}/{args.frames} state={st} "
                f"kfs={int(np.asarray(slam.map.kf_valid).sum())} "
                f"pts={int(np.asarray(slam.map.pt_valid).sum())} inl={inl} "
                f"loops={slam.n_loops_closed} "
                f"pool=K{slam.map.kf_valid.shape[0]}/P{slam.map.pt_pos.shape[0]} "
                f"t={time.time()-t_start:.0f}s",
                flush=True,
            )
    wall = time.time() - t_start
    slam.shutdown()

    est, gt = [], []
    for fid, ts, T7 in slam.full_trajectory():
        est.append(metrics.se3_vec_to_mat(T7))
        gt.append(poses_gt[fid])
    ce = metrics.camera_centers_from_Tcw(est)
    cg = metrics.camera_centers_from_Tcw(gt)
    with_scale = args.sensor == "mono"
    ate = metrics.ate_rmse(ce, cg, with_scale=with_scale)
    span = float(np.linalg.norm(cg.max(0) - cg.min(0)))
    ft = np.asarray(frame_times[5:])  # skip compile-heavy head
    mem = {}
    try:
        st = jax.local_devices()[0].memory_stats()
        if st:
            mem = {
                "peak_bytes_in_use": int(st.get("peak_bytes_in_use", 0)),
                "bytes_limit": int(st.get("bytes_limit", 0)),
            }
    except Exception:
        pass

    result = {
        "eval": "full_scale_synthetic",
        "tag": args.tag,
        "platform": jax.default_backend(),
        "config": {
            "sensor": args.sensor, "frames": args.frames,
            "resolution": [H, W], "features": args.features,
            "levels": args.levels, "motion": args.motion,
            "plane_half": args.plane_half, "noise": args.noise,
            "tex_size": tex_size,
            "initial_pool": [args.max_keyframes, args.max_points],
        },
        "ate_rmse": float(ate),
        "ate_pct_of_span": round(100.0 * ate / span, 3),
        "trajectory_span": span,
        "frames_tracked": len(est),
        "n_loops_closed": int(slam.n_loops_closed),
        "loop_closed_at_frames": loops_seen_at,
        "keyframes_live": int(np.asarray(slam.map.kf_valid).sum()),
        "keyframes_created": int(slam.n_kfs_created),
        "points_live": int(np.asarray(slam.map.pt_valid).sum()),
        "pool_final": [int(slam.map.kf_valid.shape[0]),
                       int(slam.map.pt_pos.shape[0])],
        "capacity_events": {
            "point_compactions": slam.n_point_compactions,
            "point_growths": slam.n_point_growths,
            "kf_compactions": slam.n_kf_compactions,
            "kf_growths": slam.n_kf_growths,
        },
        "median_tracking_ms": round(float(np.median(ft)) * 1e3, 2),
        "mean_tracking_ms": round(float(np.mean(ft)) * 1e3, 2),
        "fps_end_to_end": round(len(frame_times) / wall, 2),
        "wall_seconds": round(wall, 1),
        "memory": mem,
        "pass": bool(ate < 0.02 * span and slam.n_loops_closed >= 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
