"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic
(mesh, shard_map, collectives) is exercised hermetically without TPU
hardware, per SURVEY.md §4's test plan.  Must run before any backend is
initialized.

Note: the ambient environment force-registers a remote TPU platform plugin
that overrides JAX_PLATFORMS at import time, so we override via
jax.config *after* import — that wins and keeps tests local and fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
