"""Per-stage timing of the frame hot path — HONEST in-loop methodology.

Usage: python scripts/bench_profile.py          # TPU via tunnel
       JAX_PLATFORMS=cpu PYTHONPATH= python scripts/bench_profile.py

Measurement rules learned the hard way on this backend (don't regress
them — each one silently produced 10-40x optimistic numbers):

1. NEVER time repeated jit calls with identical arguments: the dispatch
   path on the axon tunnel short-circuits identical executions, reporting
   ~0.03 ms for a 2 ms computation. Time a ``lax.scan`` whose carry feeds
   every input instead.
2. Thread the carry into EVERY operand the stage reads (image, features,
   descriptors): anything loop-invariant is hoisted out of the scan by
   XLA and you measure a frame that skips that work entirely. This bug
   shipped in an earlier bench.py: a constant image hoisted the whole ORB
   front-end and inflated fps 3x.
3. Consume every output you care about (sum it into the carry): unused
   outputs (e.g. descriptors) are dead-code-eliminated together with the
   stages that produce them.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.models import frontend as fe
from orbslam2_with_quadrics_tpu.models import map_state as ms
from orbslam2_with_quadrics_tpu.models import tracking as tr
from orbslam2_with_quadrics_tpu.ops import lie, matching, orb


def scan_time(name, body, init, n=30):
    """Time ``body`` inside a lax.scan with a flowing carry (see module
    docstring for why this is the only trustworthy shape)."""

    @jax.jit
    def run(init):
        return jax.lax.scan(lambda c, _: (body(c), None), init, None, length=n)[0]

    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.3f} ms/iter", flush=True)


def main():
    H, W, NFEAT, NLEV = 480, 640, 1024, 8
    NPTS, NKF = 8192, 64
    cfg = fe.FrontendConfig(height=H, width=W, n_features=NFEAT, n_levels=NLEV,
                            fx=520.9, fy=521.0, cx=325.1, cy=249.7)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255.0)
    print(f"platform: {jax.devices()[0].platform}")

    mcfg = ms.MapConfig(max_keyframes=NKF, max_points=NPTS, n_features=NFEAT,
                        n_levels=NLEV)
    m = ms.empty_map(mcfg)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(
        key, (NPTS, 3),
        minval=jnp.asarray([-3.0, -2.0, 2.0]), maxval=jnp.asarray([3.0, 2.0, 10.0]),
    )
    desc = jax.random.randint(key, (NPTS, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )
    m = m._replace(
        pt_pos=pts, pt_valid=jnp.ones((NPTS,), bool), pt_desc=desc,
        pt_max_dist=jnp.full((NPTS,), 100.0),
        pt_normal=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (NPTS, 1)),
        n_pt=jnp.asarray(NPTS, jnp.int32),
        kf_valid=jnp.zeros((NKF,), bool).at[:8].set(True),
        kf_kp_valid=m.kf_kp_valid.at[:8].set(True),
        kf_obs_point=m.kf_obs_point.at[:8].set(
            (jnp.arange(NFEAT)[None, :] + 13 * jnp.arange(8)[:, None]) % NPTS
        ),
        n_kf=jnp.asarray(8, jnp.int32),
    )
    obs_A = ms.observation_matrix(m)
    T0 = lie.se3_identity()
    prev_obs = jnp.arange(NFEAT, dtype=jnp.int32)
    feats0 = fe.extract_mono(cfg, img)
    jax.block_until_ready((obs_A, feats0))
    sf, _, inv_tab = orb.scale_factors(NLEV, 1.2)

    # --- full frame: extract + track (what bench.py measures) ---
    def body_frame(carry):
        T, po = carry
        f = fe.extract_mono(cfg, img + T[0] * 1e-7)
        res = tr.track_frame(
            m, f, T, po, cfg.K, jnp.asarray(0.0), height=H, width=W,
            n_levels=NLEV, n_local_kf=NKF, n_local_pt=4096, obs_A=obs_A,
        )
        return (res.T_cw, res.obs_point)

    scan_time("frame = extract + track", body_frame, (T0, prev_obs))

    # --- extraction: detection only vs with descriptors ---
    def body_det(c):
        f = orb.extract(img + c, n_features=NFEAT, n_levels=NLEV)
        return c + (jnp.sum(f.uv) + jnp.sum(f.score)) * 1e-15

    scan_time("extract: detection (uv+score)", body_det, jnp.asarray(0.0))

    def body_desc(c):
        f = orb.extract(img + c, n_features=NFEAT, n_levels=NLEV)
        return c + (
            jnp.sum(f.uv) + jnp.sum(f.desc).astype(jnp.float32) + jnp.sum(f.angle)
        ) * 1e-15

    scan_time("extract: full (+desc+angle)", body_desc, jnp.asarray(0.0))

    # --- tracking with fully-varying features ---
    def body_track(carry):
        T, po = carry
        f = feats0._replace(
            uv_und=feats0.uv_und + T[0] * 1e-9,
            uv=feats0.uv + T[0] * 1e-9,
            angle=feats0.angle + T[0] * 1e-9,
            desc=feats0.desc ^ po[:1].astype(jnp.uint32)[0],
        )
        res = tr.track_frame(
            m, f, T, po, cfg.K, jnp.asarray(0.0), height=H, width=W,
            n_levels=NLEV, n_local_kf=NKF, n_local_pt=4096, obs_A=obs_A,
        )
        return (res.T_cw, res.obs_point)

    scan_time("track_frame (varying feats)", body_track, (T0, prev_obs))

    # --- pose optimization (varying pose through carry) ---
    from orbslam2_with_quadrics_tpu.ops import pose_opt

    obs_uvr = jnp.concatenate([feats0.uv_und, jnp.zeros((NFEAT, 1))], axis=-1)

    def body_pose(T):
        Tn, _, _ = pose_opt.pose_optimization(
            T, cfg.K, jnp.asarray(0.0), pts[:NFEAT], obs_uvr + T[0] * 1e-9,
            jnp.zeros((NFEAT,)), jnp.ones((NFEAT,)), jnp.ones((NFEAT,)),
        )
        return Tn

    scan_time("pose_optimization 4x5", body_pose, T0)

    # --- guided matching, both stage shapes ---
    def match_body(q, carry):
        T, po = carry
        d = feats0.desc ^ po[:1].astype(jnp.uint32)[0]
        reps = q // NFEAT
        mi, md = matching.match_by_projection(
            proj_uv=jnp.tile(feats0.uv_und, (reps, 1)) + T[0] * 1e-9,
            proj_valid=jnp.ones((q,), bool),
            pred_level=jnp.zeros((q,), jnp.int32),
            query_desc=m.pt_desc[:q],
            query_angle=jnp.zeros((q,)),
            feats_uv=feats0.uv_und, feats_level=feats0.level, feats_desc=d,
            feats_angle=feats0.angle, feats_valid=feats0.valid,
            radius=15.0, scale_factors=sf, th=matching.TH_HIGH,
        )
        return (T + jnp.sum(md) * 1e-15, (po + mi[0]) % NPTS)

    scan_time("match [1024q x 1024t]", lambda c: match_body(1024, c), (T0, prev_obs))
    scan_time("match [4096q x 1024t]", lambda c: match_body(4096, c), (T0, prev_obs))

    # --- local window selection ---
    def body_sel(carry):
        T, po = carry
        ids, km = tr.select_local_points(m, po % NPTS, NKF, 4096, obs_A)
        return (T + jnp.sum(ids) * 1e-15, (po + km[0]) % NPTS)

    scan_time("select_local_points (mxu)", body_sel, (T0, prev_obs))


if __name__ == "__main__":
    main()
