"""Tests run on a virtual 8-device CPU mesh (no TPU needed), mirroring the
survey's recommendation (SURVEY.md §4): exercise all sharding paths with
XLA_FLAGS=--xla_force_host_platform_device_count=8.

Must run before jax is imported anywhere.
"""
import os
import sys

# Force-set (not setdefault): the harness presets JAX_PLATFORMS=axon (TPU
# tunnel), which would make every test compile over the tunnel and time out.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize's register() overrides jax_platforms to "axon,cpu"
# via jax.config at interpreter start, which beats the env var.  Re-assert
# CPU here, before any test imports jax.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
