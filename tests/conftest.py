"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the reference had no
equivalent — SURVEY.md §4)."""
import os

# Must be set before jax is imported anywhere. Force (not setdefault):
# the sandbox exports JAX_PLATFORMS=axon (one real TPU via a tunnel) and
# the test suite must stay off that shared chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# The sandbox pins jax_platforms to "axon,cpu" at the CONFIG level (a
# sitecustomize hook), which overrides the env var — force it back so the
# suite never touches the shared remote TPU chip.
jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# XLA:CPU AOT cache entries record host CPU features and reloading them
# after a feature-detection change SIGILLs the test process.
