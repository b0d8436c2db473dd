"""Per-stage DEVICE time of the per-frame hot path via scan ablation.

Times N-iteration device-side scans of progressively larger prefixes of
the frame step (extract -> stage-A match -> pose-opt A -> local-select ->
stage-B match -> pose-opt B), so each stage's cost is a scan-time DELTA —
dispatch/tunnel latency cancels, unlike single-dispatch timings. Feeds
the speed-of-light table in bench.py (VERDICT r04 weak #4: no roofline
attribution existed).

Usage: python scripts/profile_track.py  (on TPU; CPU works for smoke)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orbslam2_with_quadrics_tpu.models import frontend as fe
    from orbslam2_with_quadrics_tpu.models import map_state as ms
    from orbslam2_with_quadrics_tpu.models import tracking as tr
    from orbslam2_with_quadrics_tpu.ops import camera, lie, matching, orb, pose_opt

    H, W, NFEAT, NLEV = 480, 640, 1024, 8
    NPTS, NKF = 8192, 64
    cfg = fe.FrontendConfig(
        height=H, width=W, n_features=NFEAT, n_levels=NLEV,
        fx=520.9, fy=521.0, cx=325.1, cy=249.7,
    )
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255.0)
    mcfg = ms.MapConfig(
        max_keyframes=NKF, max_points=NPTS, n_features=NFEAT, n_levels=NLEV
    )
    m = ms.empty_map(mcfg)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(
        key, (NPTS, 3),
        minval=jnp.asarray([-3.0, -2.0, 2.0]),
        maxval=jnp.asarray([3.0, 2.0, 10.0]),
    )
    desc = jax.random.randint(
        key, (NPTS, 8), 0, 2**31 - 1, dtype=jnp.int32
    ).astype(jnp.uint32)
    uv_all, _ = camera.project(cfg.K, pts)
    m = m._replace(
        pt_pos=pts, pt_valid=jnp.ones((NPTS,), bool), pt_desc=desc,
        pt_max_dist=jnp.full((NPTS,), 100.0),
        pt_normal=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (NPTS, 1)),
        n_pt=jnp.asarray(NPTS, jnp.int32),
        kf_valid=jnp.zeros((NKF,), bool).at[:16].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:16].set(True),
        kf_uv=jnp.tile(uv_all[None, :NFEAT], (NKF, 1, 1)),
        kf_desc=m.kf_desc.at[:16].set(desc[:NFEAT]),
        kf_obs_point=m.kf_obs_point.at[:16].set(
            (jnp.arange(NFEAT)[None, :] + 13 * jnp.arange(16)[:, None]) % NPTS
        ),
        n_kf=jnp.asarray(16, jnp.int32),
    )
    obs_A = ms.observation_matrix(m)
    T0 = lie.se3_identity()
    prev_obs = jnp.arange(NFEAT, dtype=jnp.int32)
    sf, sigma2, inv_s2_tab = orb.scale_factors(NLEV, 1.2)

    N_IT = 200

    def scan_time(body, carry0, label):
        def seq(carry0, img):
            def b(carry, _):
                return body(carry, img), jnp.float32(0)

            c, _ = jax.lax.scan(b, carry0, None, length=N_IT)
            return c

        f = jax.jit(seq)
        out = jax.block_until_ready(f(carry0, img))
        # tunnel RT (~25-35 ms) rides on every wall measurement: use long
        # scans + min-of-3 so the per-frame figure is device time
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(carry0, img))
            best = min(best, time.perf_counter() - t0)
        dt = best / N_IT
        print(f"{label:34s} {dt*1e3:8.3f} ms/frame (cumulative)")
        return dt

    # 1. extraction only
    def b_extract(carry, img):
        T, po = carry
        feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
        return (T + feats.uv[0, 0] * 1e-12, po)

    t1 = scan_time(b_extract, (T0, prev_obs), "extract")

    # 2. + stage-A projection match
    def stage_a(feats, T, po):
        P = m.pt_pos.shape[0]
        qa_ids = jnp.where(po >= 0, po, P - 1)
        qa_ok = (po >= 0) & m.pt_valid[qa_ids]
        pa = m.pt_pos[qa_ids]
        pc = lie.se3_apply(T, pa)
        uv_a, z_a = camera.project(cfg.K, pc)
        mi, md = matching.match_by_projection(
            proj_uv=uv_a, proj_valid=qa_ok & (z_a > 0.1),
            pred_level=jnp.zeros((NFEAT,), jnp.int32),
            query_desc=m.pt_desc[qa_ids], query_angle=jnp.zeros((NFEAT,)),
            feats_uv=feats.uv_und, feats_level=feats.level,
            feats_desc=feats.desc, feats_angle=feats.angle,
            feats_valid=feats.valid, radius=15.0, scale_factors=sf,
            th=matching.TH_HIGH,
        )
        obs_a = jnp.full((NFEAT,), -1, jnp.int32)
        obs_a = obs_a.at[jnp.where(mi >= 0, mi, NFEAT)].set(
            jnp.where(mi >= 0, qa_ids, -1), mode="drop"
        )
        return obs_a

    def b_match_a(carry, img):
        T, po = carry
        feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
        obs_a = stage_a(feats, T, po)
        return (T + jnp.float32(jnp.sum(obs_a)) * 1e-12, po)

    t2 = scan_time(b_match_a, (T0, prev_obs), "+ stage-A match")

    # 3. + pose opt A (2 rounds x 3 iters)
    def b_pose_a(carry, img):
        T, po = carry
        feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
        obs_a = stage_a(feats, T, po)
        T_a, _, _ = tr._pose_opt_from_obs(
            m, feats, T, obs_a, cfg.K, jnp.asarray(0.0), inv_s2_tab,
            rounds=2, iters=3,
        )
        return (T_a, po)

    t3 = scan_time(b_pose_a, (T0, prev_obs), "+ pose-opt A (2x3)")

    # 4. + local-point selection
    def b_select(carry, img):
        T, po = carry
        feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
        obs_a = stage_a(feats, T, po)
        T_a, _, _ = tr._pose_opt_from_obs(
            m, feats, T, obs_a, cfg.K, jnp.asarray(0.0), inv_s2_tab,
            rounds=2, iters=3,
        )
        pt_ids, kf_mask = tr.select_local_points(m, obs_a, NKF, 4096, obs_A)
        return (T_a + jnp.float32(jnp.sum(pt_ids)) * 1e-12, po)

    t4 = scan_time(b_select, (T0, prev_obs), "+ local select")

    # 5. full track_frame
    def b_full(carry, img):
        T, po = carry
        feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
        res = tr.track_frame(
            m, feats, T, po, cfg.K, jnp.asarray(0.0), height=H, width=W,
            n_levels=NLEV, n_local_kf=NKF, n_local_pt=4096, obs_A=obs_A,
        )
        return (res.T_cw, po)

    t5 = scan_time(b_full, (T0, prev_obs), "full frame")

    print("\n--- stage deltas (device ms/frame) ---")
    print(f"extract           {t1*1e3:8.3f}")
    print(f"stage-A match     {(t2-t1)*1e3:8.3f}")
    print(f"pose-opt A (2x3)  {(t3-t2)*1e3:8.3f}")
    print(f"local select      {(t4-t3)*1e3:8.3f}")
    print(f"stage-B mt + opt  {(t5-t4)*1e3:8.3f}")
    print(f"TOTAL             {t5*1e3:8.3f}")

    # pose-opt iteration slope: 4x5 vs 1x1
    def mk_pose(rounds, iters):
        def b(carry, img):
            T, po = carry
            feats = fe.extract_mono(cfg, img + T[0] * 1e-7)
            obs_a = stage_a(feats, T, po)
            T_a, _, _ = tr._pose_opt_from_obs(
                m, feats, T, obs_a, cfg.K, jnp.asarray(0.0), inv_s2_tab,
                rounds=rounds, iters=iters,
            )
            return (T_a, po)
        return b

    ta = scan_time(mk_pose(4, 5), (T0, prev_obs), "pose-opt 4x5 (chain)")
    tb = scan_time(mk_pose(1, 1), (T0, prev_obs), "pose-opt 1x1 (chain)")
    print(f"per-LM-iter cost  {(ta-tb)/19*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
