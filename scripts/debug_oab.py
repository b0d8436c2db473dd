"""Focused diagnosis of the out-and-back return-leg match decay.

Runs the mono system on a reduced out_and_back sequence and every
STRIDE frames reports, from the live MapState:
  - n_frustum:   valid points projecting into the current view
  - n_reachable: frustum points observed by >=1 live keyframe (only
                 these can enter the covisibility-vote local map)
  - n_window:    frustum points inside the top-N covisible window
  - matches / inliers from the frame itself
Distinguishes map amnesia (n_reachable collapses: churned keyframes
wiped the observation rows) from matching failure (candidates exist
but are not matched).

Usage: python scripts/debug_oab.py [frames] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main(frames=800, out=None):
    import jax.numpy as jnp

    from orbslam2_with_quadrics_tpu.models import frontend as fe
    from orbslam2_with_quadrics_tpu.models import map_state as ms
    from orbslam2_with_quadrics_tpu.models import system as sysm
    from orbslam2_with_quadrics_tpu.ops import camera, lie
    from orbslam2_with_quadrics_tpu.utils import synthetic

    H, W, FX, NF = 240, 320, 260.0, 600
    cfg = sysm.SystemConfig(
        frontend=fe.FrontendConfig(
            height=H, width=W, n_features=NF, n_levels=8,
            fx=FX, fy=FX, cx=W / 2.0, cy=H / 2.0,
        ),
        map=ms.MapConfig(max_keyframes=128, max_points=16384,
                         n_features=NF, n_levels=8),
        sensor="mono", max_frames_between_kf=30, kf_idle_frames=3,
        enable_loop_closing=True, async_gba=True, n_local_kf=24,
    )
    slam = sysm.System(cfg)
    stream = synthetic.planar_stream(
        n_frames=frames, h=H, w=W, fx=FX, fy=FX, seed=3,
        motion="out_and_back", plane_half=8.0, relief=True, noise=6.0,
        tex_size=4000,
    )
    STRIDE = 25
    rows = []
    for i, (img, T_gt) in enumerate(stream):
        img8 = np.clip(img, 0, 255).astype(np.uint8)
        slam.track_monocular(img8, timestamp=i / 30.0)
        if i % STRIDE == 0 and slam.state == slam.OK and i > 10:
            slam._flush()
            m = slam.map
            P = m.pt_pos.shape[0]
            T = slam.T_cw

            import jax as _jax

            @_jax.jit
            def _frus(m, T):
                pc = lie.se3_apply(T, m.pt_pos)
                uv, z = camera.project(cfg.frontend.K, pc)
                return (
                    m.pt_valid & (z > 0.05)
                    & (uv[:, 0] >= 0) & (uv[:, 0] < W)
                    & (uv[:, 1] >= 0) & (uv[:, 1] < H)
                )

            frus = np.asarray(_frus(m, T))
            obs = np.asarray(m.kf_obs_point)
            kfv = np.asarray(m.kf_valid)
            kpv = np.asarray(m.kf_kp_valid)
            # points referenced by any live keyframe
            ref = np.zeros(P + 1, bool)
            rowsok = obs[kfv]
            okm = (rowsok >= 0) & kpv[kfv]
            ref[np.where(okm, rowsok, P)] = True
            reachable = frus & ref[:P]
            # covisible-window union (what tracking actually searches)
            from orbslam2_with_quadrics_tpu.models import tracking as tr
            pt_ids, kf_mask = tr.select_local_points(
                m, slam.prev_obs, min(cfg.n_local_kf, 128), 4096,
                slam._get_obs_A(),
            )
            pt_ids = np.asarray(pt_ids)
            win = np.zeros(P + 1, bool)
            win[pt_ids] = True
            n_window = int((frus & win[:P]).sum())
            mtr = slam.metrics[-1] if slam.metrics else {}
            rows.append({
                "frame": i,
                "n_frustum": int(frus.sum()),
                "n_reachable": int(reachable.sum()),
                "n_window": n_window,
                "matches": int(mtr.get("matches", -1)),
                "inliers": int(mtr.get("inliers", -1)),
                "kfs_live": int(kfv.sum()),
                "pts_live": int(np.asarray(m.pt_valid).sum()),
            })
            print(rows[-1], flush=True)
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 800, a[1] if len(a) > 1 else None)
