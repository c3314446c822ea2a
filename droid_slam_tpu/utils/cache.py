"""Persistent XLA compilation cache setup.

The SLAM runtime compiles a few dozen distinct jit graphs (motion filter,
update cores, BA capacities, filler); on a remote-compile TPU setup the
first run can take many minutes.  Enabling JAX's persistent cache makes
every later process start warm.  Call once before the first jit.
"""

import os


def enable_compilation_cache(path=None):
    import jax

    # make the JAX_PLATFORMS env var authoritative: some environments
    # install a sitecustomize hook that re-pins jax_platforms to a remote
    # accelerator plugin AFTER the env var is read — CI/CPU runs must be
    # able to opt out without claiming the device
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    path = path or os.environ.get(
        "DROID_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
