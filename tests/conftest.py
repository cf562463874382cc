"""Test configuration: run on a simulated 8-device CPU mesh with float64.

Tests exercise the same numerical oracles as the reference's test suite
(which runs in fp64 on GPU); on TPU hardware the library is used in fp32/bf16,
but correctness tests need fp64, so we force the CPU backend and enable x64
before JAX initialises.  The 8 virtual devices let multi-chip sharding tests
run without a pod (standard JAX collectives-testing setup).
"""

import os

# Force CPU: the environment may pin JAX_PLATFORMS to a TPU plugin (and a
# sitecustomize hook may already have set jax_platforms programmatically),
# but the correctness suite needs fp64 and a simulated multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
