"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Mirrors the multi-chip validation strategy from SURVEY.md §4: sharding is
tested on a virtual CPU mesh (the driver separately dry-runs
``__graft_entry__.dryrun_multichip``).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms=axon at interpreter start;
# the config update (not the env var) is what actually wins here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
