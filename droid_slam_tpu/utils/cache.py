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

    # On the tunneled axon TPU the CLIENT-side persistent cache is a net
    # LOSS (measured, PERF.md round 5): the relay keeps its own
    # server-side compile cache (an empty-client-cache process gets
    # frame-1 in 5.3 s), and executables restored through the client
    # cache's deserialize path run 25-50% SLOWER than server-compiled
    # ones (bench_4 15.4 kf/s / 19.6 ingest fps vs bench_5 20.3 kf/s /
    # 38.0 fps, same relay window).  So: client cache only on local
    # backends (cpu today), unless DROID_TPU_CACHE explicitly forces a
    # path.  Startup across processes stays amortized by the relay.
    forced = os.environ.get("DROID_TPU_CACHE")
    if not (path or forced) and jax.default_backend() not in ("cpu",):
        return None
    path = path or forced or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
