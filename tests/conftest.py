"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on a
virtual host-platform mesh (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

# Host platform must be configured before the CPU client initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu" (overriding the JAX_PLATFORMS env var), which
# routes every test through the remote-compile tunnel.  Pin the config back
# to the in-process CPU so tests run locally on the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache for CPU tests: XLA:CPU AOT cache entries
# round-trip through a machine-feature check that mis-handles the
# prefer-no-scatter/gather pseudo-features on this image — loading (and
# racing) such entries segfaulted the suite twice.  CPU compiles are
# seconds; correctness beats the cache win.

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_state():
    """Clear jit caches after every test module.

    The full suite segfaulted twice inside XLA:CPU *executions* around the
    ~165th test (test_replication's HNSW mono-jits) while every file passes
    in isolation and in 5-file tails — cumulative compiled-program state on
    the 8-virtual-device CPU client is the only plausible driver.  CPU
    compiles are seconds, so dropping caches between modules trades a
    little wall-clock for suite stability."""
    yield
    import jax

    jax.clear_caches()
