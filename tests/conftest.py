"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4).  The container's
sitecustomize force-registers the axon TPU plugin, so the platform override
must go through jax.config, not the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
