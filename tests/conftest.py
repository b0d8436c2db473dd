"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharded code paths are
validated on 8 virtual CPU devices (the JAX-sanctioned substitute), and the
driver separately dry-run-compiles the multi-chip path via
``__graft_entry__.dryrun_multichip``.
"""

import os
import sys

# NOTE: the escape from the TPU-tunnel environment (PYTHONPATH
# sitecustomize + JAX_PLATFORMS=axon) lives in the ROOT conftest.py —
# it must run before pytest's capture plugin starts.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compile cache — first full-suite run is slow on the 2-core CI
# host, repeats are fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
