"""Per-stage timing of the frame hot path on the current JAX platform.

Usage: python scripts/bench_profile.py          # TPU via tunnel
       JAX_PLATFORMS=cpu PYTHONPATH= python scripts/bench_profile.py
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
from orbslam2_with_quadrics_tpu.ops import lie, orb


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1e3:8.2f} ms")
    return out


def main():
    H, W, NFEAT, NLEV = 480, 640, 1024, 8
    NPTS, NKF = 8192, 64
    cfg = fe.FrontendConfig(height=H, width=W, n_features=NFEAT, n_levels=NLEV,
                            fx=520.9, fy=521.0, cx=325.1, cy=249.7)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255.0)

    print(f"platform: {jax.devices()[0].platform}")

    # frontend stages
    shapes = orb.pyramid_shapes(H, W, NLEV, 1.2)
    counts = orb.per_level_counts(NFEAT, NLEV, 1.2)
    pyr = timeit("pyramid", jax.jit(lambda im: orb.build_pyramid(im, shapes)), img)

    lvl0 = pyr[0]
    timeit("fast_score L0", jax.jit(orb.fast_score), lvl0)
    timeit("nms3 L0", jax.jit(orb.nms3), jax.jit(orb.fast_score)(lvl0))
    det = jax.jit(lambda im: orb.detect_level(im, counts[0]))
    yx, sc, valid = timeit("detect_level L0", det, lvl0)
    timeit("ic_angle L0", jax.jit(orb.ic_angle), lvl0, yx, valid)
    ang = orb.ic_angle(lvl0, yx, valid)
    blur = timeit("gaussian_blur7 L0", jax.jit(orb.gaussian_blur7), lvl0)
    timeit("brief L0", jax.jit(orb.brief_descriptors), blur, yx, ang, valid)

    timeit(
        "extract_mono (full)",
        lambda im: fe.extract_mono(cfg, im),
        img,
    )

    # tracking
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
    feats = fe.extract_mono(cfg, img)
    T = lie.se3_identity()
    prev_obs = jnp.arange(NFEAT, dtype=jnp.int32)

    track = jax.jit(
        lambda m, f, T, po: tr.track_frame(
            m, f, T, po, cfg.K, jnp.asarray(0.0), height=H, width=W,
            n_levels=NLEV, n_local_kf=NKF, n_local_pt=4096,
        )
    )
    timeit("track_frame (full)", track, m, feats, T, prev_obs)

    # pose opt alone
    from orbslam2_with_quadrics_tpu.ops import pose_opt

    obs_uvr = jnp.concatenate([feats.uv_und, jnp.zeros((NFEAT, 1))], axis=-1)
    timeit(
        "pose_optimization",
        lambda: pose_opt.pose_optimization(
            T, cfg.K, jnp.asarray(0.0), pts[:NFEAT], obs_uvr,
            jnp.zeros((NFEAT,)), jnp.ones((NFEAT,)), jnp.ones((NFEAT,)),
        ),
    )

    # matching alone
    from orbslam2_with_quadrics_tpu.ops import matching

    timeit(
        "hamming 4096x1024",
        jax.jit(matching.hamming_matrix),
        desc[:4096], feats.desc,
    )
    timeit(
        "hamming_mxu 4096x1024",
        jax.jit(matching.hamming_matrix_mxu),
        desc[:4096], feats.desc,
    )


if __name__ == "__main__":
    main()
