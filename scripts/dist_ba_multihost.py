"""Multi-process distributed-BA check: N processes x M virtual CPU
devices each, joined via jax.distributed into one global mesh, must
produce the SAME solution as a single process with N*M devices.

This is the multi-host posture test the sandbox allows (no second host
exists): the jax.distributed handshake, the process-spanning Mesh, and
cross-process collectives all run for real over the gRPC coordinator —
only the transport differs from a TPU pod (TCP loopback vs ICI/DCN).

Launcher mode (default):
    python scripts/dist_ba_multihost.py [--procs 2] [--local-devices 4]
spawns the workers, runs the single-process reference solve, compares,
and writes DIST_BA_MULTIHOST.json.

Worker mode (spawned): _DIST_BA_ROLE=worker with coordinator/pid env.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_problem(n_cams=64, n_pts=4096, n_obs=32768):
    import jax
    import jax.numpy as jnp

    from orbslam2_with_quadrics_tpu.ops import ba, camera, lie

    key = jax.random.PRNGKey(0)
    Kc = jnp.asarray([718.856, 718.856, 607.19, 185.2])
    bf = jnp.asarray(386.1448)
    pts = jax.random.uniform(
        key, (n_pts, 3),
        minval=jnp.asarray([-20.0, -5.0, 5.0]),
        maxval=jnp.asarray([20.0, 5.0, 60.0]),
    )
    poses = lie.se3_exp(
        jax.random.normal(key, (n_cams, 6))
        * jnp.asarray([0.01] * 3 + [0.5, 0.1, 0.5])
    )
    cam_idx = jax.random.randint(key, (n_obs,), 0, n_cams)
    pnt_idx = jax.random.randint(jax.random.PRNGKey(7), (n_obs,), 0, n_pts)
    uvr, _ = camera.project_stereo(
        Kc, bf, lie.se3_apply(poses[cam_idx], pts[pnt_idx])
    )
    return ba.BAProblem(
        poses=poses, points=pts + 0.05, K=Kc, bf=bf,
        cam_idx=cam_idx, pnt_idx=pnt_idx,
        uvr=uvr + 0.3 * jax.random.normal(key, uvr.shape),
        is_stereo=jnp.ones((n_obs,)), inv_sigma2=jnp.ones((n_obs,)),
        valid=jnp.ones((n_obs,)),
        fixed_cam=jnp.zeros((n_cams,)).at[0].set(1.0),
        fixed_pnt=jnp.zeros((n_pts,)),
    )


def solve(mesh):
    import jax

    from orbslam2_with_quadrics_tpu.parallel import dist_ba

    prob = build_problem()
    probd = dist_ba.shard_problem(prob, mesh)
    out, cost = dist_ba.dist_ba_solve(probd, mesh, n_iters=5, cg_iters=30)
    jax.block_until_ready(out.poses)
    return out, float(cost)


def worker():
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    from orbslam2_with_quadrics_tpu.parallel import dist_ba

    mesh = dist_ba.initialize_multihost(
        coordinator_address=os.environ["_DIST_BA_COORD"],
        num_processes=int(os.environ["_DIST_BA_NPROCS"]),
        process_id=int(os.environ["_DIST_BA_PID"]),
    )
    print(json.dumps(dist_ba.process_local_report(mesh)), flush=True)
    out, cost = solve(mesh)
    if jax.process_index() == 0:
        # fully-addressable? poses are replicated, so process 0 holds them
        np.savez(
            os.environ["_DIST_BA_OUT"],
            poses=np.asarray(jax.device_get(out.poses)),
            points=np.asarray(jax.device_get(out.points)),
            cost=cost,
        )
    return 0


def launcher(n_procs, local_devices):
    import numpy as np

    total = n_procs * local_devices
    outfile = os.path.join(tempfile.mkdtemp(), "multiproc.npz")
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env_base["_DIST_BA_ROLE"] = "worker"
    env_base["_DIST_BA_COORD"] = "127.0.0.1:19765"
    env_base["_DIST_BA_NPROCS"] = str(n_procs)
    env_base["_DIST_BA_OUT"] = outfile

    procs = []
    t0 = time.time()
    for pid in range(n_procs):
        env = dict(env_base)
        env["_DIST_BA_PID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        logs.append(out)
        if p.returncode != 0:
            print("WORKER FAILED:\n", out)
            return 1
    t_multi = time.time() - t0
    if not os.path.exists(outfile + ".npz") and not os.path.exists(outfile):
        print("no worker output written"); print(logs[0]); return 1
    mp = np.load(outfile if os.path.exists(outfile) else outfile + ".npz")

    # single-process reference with the same total device count
    env = dict(env_base)
    env.pop("_DIST_BA_ROLE"); env.pop("_DIST_BA_PID", None)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={total}"
    env["_DIST_BA_SINGLE_OUT"] = outfile + ".single.npz"
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single"], env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        print("SINGLE-PROC FAILED:\n", r.stdout, r.stderr)
        return 1
    sp = np.load(env["_DIST_BA_SINGLE_OUT"])

    dp = float(np.max(np.abs(mp["poses"] - sp["poses"])))
    pt_d = np.abs(mp["points"] - sp["points"])
    dx = float(np.max(pt_d))
    dx99 = float(np.percentile(pt_d, 99))
    dcost = abs(float(mp["cost"]) - float(sp["cost"])) / max(
        float(sp["cost"]), 1e-9
    )
    # psum reduction order differs between process topologies, so deep,
    # weakly-constrained points can move mm-cm between equally-optimal
    # solutions; equality is judged on poses, the cost, and the point
    # distribution, not the single worst point
    ok = dp < 1e-3 and dx99 < 1e-2 and dcost < 1e-4
    result = {
        "check": "multi_process_dist_ba_equals_single_process",
        "processes": n_procs,
        "devices_per_process": local_devices,
        "max_pose_delta": dp,
        "max_point_delta": dx,
        "p99_point_delta": dx99,
        "rel_cost_delta": dcost,
        "cost_multi": float(mp["cost"]),
        "cost_single": float(sp["cost"]),
        "wall_multi_s": round(t_multi, 1),
        "pass": bool(ok),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "DIST_BA_MULTIHOST.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0 if ok else 1


def single():
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    from orbslam2_with_quadrics_tpu.parallel import dist_ba

    mesh = dist_ba.make_ba_mesh()
    out, cost = solve(mesh)
    np.savez(
        os.environ["_DIST_BA_SINGLE_OUT"],
        poses=np.asarray(out.poses), points=np.asarray(out.points), cost=cost,
    )
    return 0


if __name__ == "__main__":
    if os.environ.get("_DIST_BA_ROLE") == "worker":
        raise SystemExit(worker())
    if "--single" in sys.argv:
        raise SystemExit(single())
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    a = ap.parse_args()
    raise SystemExit(launcher(a.procs, a.local_devices))
