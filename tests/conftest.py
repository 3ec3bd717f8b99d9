"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference validated multi-device behavior using the always-available CPU
OpenCL device (SURVEY.md §4); the TPU-world analog is XLA's virtual host
devices. XLA_FLAGS must be set before jax initializes its backends; the
platform choice is forced through jax.config because the environment's TPU
plugin overrides the JAX_PLATFORMS env var at interpreter start.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
