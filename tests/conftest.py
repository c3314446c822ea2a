"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
CPU backend with 8 host platform devices (the driver's dryrun_multichip does
the same for the training step).

Note: this session's environment installs a sitecustomize hook that registers
a remote TPU PJRT plugin and sets ``jax_platforms="axon,cpu"`` via jax.config
(overriding the JAX_PLATFORMS env var).  Unit tests must NOT claim that
remote chip — initializing it costs ~2 minutes of wall time per process —
so we both set the env var (for hook-free environments) and force the config
back to cpu after import (for hooked environments).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
