"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's only multi-device simulation affordance
(partitioner.py:get_cpu_mesh:310-315) but applied to the whole test suite:
XLA_FLAGS forces 8 host devices so DP/TP sharding is exercised without TPUs
(SURVEY.md §4 implication (b)).

Must run before jax initialises its backends, hence env vars at import time.
"""

import os
import sys

# The session environment pins JAX_PLATFORMS to the TPU plugin; tests must
# override it (not setdefault) to get the deterministic fp32 CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A site hook in this image force-appends the TPU plugin to jax_platforms,
# ignoring the env var — override the config directly before any backend
# initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
