"""Isolate the cost centers of the dense-Schur local BA (VERDICT r03 weak #2).

Times each sub-computation of ops/ba.ba_solve_dense on a bench-shaped
local-BA problem (C=49 cams, N=1024 kps, P=8192 pool) to find where the
325 ms goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import ba, residuals


def timed(fn, *args, reps=5, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1e3:9.2f} ms")
    return out


def main():
    C, N, P = 49, 1024, 8192
    O = C * N
    rng = np.random.RandomState(0)
    poses = np.tile([1.0, 0, 0, 0, 0, 0, 0], (C, 1)).astype(np.float32)
    poses[:, 4:] += rng.randn(C, 3) * 0.1
    points = rng.uniform([-3, -2, 2], [3, 2, 10], (P, 3)).astype(np.float32)
    cam_idx = np.repeat(np.arange(C, dtype=np.int32), N)
    pnt_idx = ((np.arange(O) * 7919) % P).astype(np.int32)
    uvr = rng.rand(O, 3).astype(np.float32) * 400
    prob = ba.BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(points),
        K=jnp.asarray([520.9, 521.0, 325.1, 249.7]), bf=jnp.asarray(0.0),
        cam_idx=jnp.asarray(cam_idx), pnt_idx=jnp.asarray(pnt_idx),
        uvr=jnp.asarray(uvr), is_stereo=jnp.zeros((O,)),
        inv_sigma2=jnp.ones((O,)), valid=jnp.ones((O,)),
        fixed_cam=jnp.zeros((C,)).at[0].set(1.0), fixed_pnt=jnp.zeros((P,)),
    )
    h2 = jnp.asarray(residuals.CHI2_STEREO)
    lam = jnp.asarray(1e-4)
    cam_grid = (C, N)

    timed(jax.jit(lambda p: ba._edge_terms(p, h2)[5]), prob,
          label="edge_terms (res+jac+cost)")
    timed(jax.jit(lambda p: ba._build_system(p, h2, lam, cam_grid=cam_grid)[0]),
          prob, label="build_system (Hcc,Hpp-inv,Wcp)")
    loc_ids, ploc = jax.jit(
        lambda p: ba._local_point_table(p, 8192, cam_grid))(prob)
    jax.block_until_ready((loc_ids, ploc))
    timed(jax.jit(lambda p: ba._local_point_table(p, 8192, cam_grid)[0]), prob,
          label="local_point_table (unique)")

    timed(jax.jit(lambda p: ba._dense_schur_step(
        p, p.poses, p.points, lam, h2, loc_ids, ploc, cam_grid)[1]), prob,
          label="one full dense LM step")

    timed(jax.jit(lambda p: ba.ba_solve_dense(
        p, n_iters=4, n_local_pts=8192, use_huber=True, cam_grid=cam_grid)[1]),
          prob, reps=2, label="ba_solve_dense 4 iters")

    # segment_sum into P segments (Hpp path) alone
    vals = jnp.ones((O, 3, 3))
    timed(jax.jit(lambda v, p: jax.ops.segment_sum(
        v, p.pnt_idx, num_segments=P)), vals, prob,
          label="segment_sum O->P [3,3]")
    timed(jax.jit(lambda v, p: jax.ops.segment_sum(
        v.reshape(O, 9)[:, :3], p.pnt_idx, num_segments=P)), vals, prob,
          label="segment_sum O->P [3]")
    # Hpp inverse
    Hpp = jnp.tile(jnp.eye(3), (P, 1, 1))
    timed(jax.jit(jnp.linalg.inv), Hpp, label="linalg.inv [P,3,3]")




def slope():
    """Per-iteration device cost via n_iters slope (cancels tunnel RT)."""
    C, N, P = 49, 1024, 8192
    O = C * N
    rng = np.random.RandomState(0)
    poses = np.tile([1.0, 0, 0, 0, 0, 0, 0], (C, 1)).astype(np.float32)
    poses[:, 4:] += rng.randn(C, 3) * 0.1
    points = rng.uniform([-3, -2, 2], [3, 2, 10], (P, 3)).astype(np.float32)
    cam_idx = np.repeat(np.arange(C, dtype=np.int32), N)
    pnt_idx = ((np.arange(O) * 7919) % P).astype(np.int32)
    uvr = rng.rand(O, 3).astype(np.float32) * 400
    prob = ba.BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(points),
        K=jnp.asarray([520.9, 521.0, 325.1, 249.7]), bf=jnp.asarray(0.0),
        cam_idx=jnp.asarray(cam_idx), pnt_idx=jnp.asarray(pnt_idx),
        uvr=jnp.asarray(uvr), is_stereo=jnp.zeros((O,)),
        inv_sigma2=jnp.ones((O,)), valid=jnp.ones((O,)),
        fixed_cam=jnp.zeros((C,)).at[0].set(1.0), fixed_pnt=jnp.zeros((P,)),
    )
    cam_grid = (C, N)
    ts = {}
    for n in (1, 5, 9):
        f = jax.jit(lambda p, n=n: ba.ba_solve_dense(
            p, n_iters=n, n_local_pts=8192, use_huber=True, cam_grid=cam_grid)[1])
        jax.block_until_ready(f(prob))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f(prob))
        ts[n] = (time.perf_counter() - t0) / 3
        print(f"ba_solve_dense n_iters={n}: {ts[n]*1e3:.2f} ms")
    print(f"per-iter slope: {(ts[9]-ts[1])/8*1e3:.2f} ms; overhead+1iter: {ts[1]*1e3:.2f}")

    # piece slopes inside fori_loop
    h2 = jnp.asarray(residuals.CHI2_STEREO)
    lam = jnp.asarray(1e-4)
    loc_ids, ploc = jax.jit(
        lambda p: ba._local_point_table(p, 8192, cam_grid))(prob)
    jax.block_until_ready((loc_ids, ploc))

    def loopn(body, n):
        def f(p):
            def b(i, acc):
                return acc + body(p, i)
            return jax.lax.fori_loop(0, n, b, 0.0)
        return jax.jit(f)

    pieces = {
        "edge_terms": lambda p, i: ba._edge_terms(
            p._replace(valid=p.valid + 0e-9 * i), h2)[5],
        "build_system": lambda p, i: ba._build_system(
            p._replace(valid=p.valid + 0e-9 * i), h2, lam, cam_grid=cam_grid)[0].sum(),
        "segsum_P_33": lambda p, i: jax.ops.segment_sum(
            jnp.ones((O, 3, 3)) + 0e-9 * i, p.pnt_idx, num_segments=P).sum(),
        "inv_P33": lambda p, i: jnp.linalg.inv(
            jnp.tile(jnp.eye(3) * (1 + 0e-9 * i), (P, 1, 1))).sum(),
        "unique_table": lambda p, i: ba._local_point_table(
            p._replace(valid=p.valid + 0e-9 * i), 8192, cam_grid,
        )[1].sum().astype(jnp.float32),
    }
    for name, body in pieces.items():
        f1, f9 = loopn(body, 1), loopn(body, 9)
        jax.block_until_ready(f1(prob)); jax.block_until_ready(f9(prob))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f1(prob))
        a = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f9(prob))
        b = (time.perf_counter() - t0) / 3
        print(f"{name:20s} per-iter {(b-a)/8*1e3:8.2f} ms")


if __name__ == "__main__":
    slope() if "--slope" in sys.argv else main()
