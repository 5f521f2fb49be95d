"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding logic is tested the standard way — CPU host platform
with `--xla_force_host_platform_device_count=8` (SURVEY.md §4).

Note: the environment's sitecustomize registers a remote TPU PJRT plugin
("axon") and overrides the JAX_PLATFORMS env var, so we must force the
`jax_platforms` *config* after import (backends initialize lazily at first
use, which is later than this conftest).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
