"""Root conftest: force local-CPU JAX before any backend initializes.

The environment injects a TPU-tunnel PJRT plugin (sitecustomize on
PYTHONPATH) and sets JAX_PLATFORMS=axon; left alone, tests silently run
through a network relay to a remote chip, ~50x slower. jax reads
JAX_PLATFORMS lazily at first backend use, so overriding the env here —
before any test touches a device — pins the whole run to local CPU even
though the plugin was already registered at interpreter start.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# belt-and-braces: if jax got imported by a plugin already, update configs
try:
    import sys

    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
