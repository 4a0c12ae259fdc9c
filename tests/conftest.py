"""Test config: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md §4: the x265 analog of
'multi-node without a cluster').

Note: this machine sets JAX_PLATFORMS=axon globally and the plugin wins
over the env var, so we must use jax.config.update before first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
