"""Test configuration: force CPU with a virtual 8-device mesh.

Must run before jax is imported anywhere (SURVEY.md §4: simulated multi-host
meshes let distributed BA be tested single-machine; collectives run
identically on the simulated mesh).
"""

import os

# Force CPU: the harness exports JAX_PLATFORMS=axon (a tunneled TPU chip);
# unit tests must run on the local virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The harness registers a tunneled-TPU PJRT plugin ("axon") via
# sitecustomize, which also routes compiles through a remote service —
# making CPU tests ~20x slower. Deregister it before any backend init.
try:  # pragma: no cover
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# sitecustomize imported jax before this file ran and latched
# JAX_PLATFORMS=axon from the env; override through the config API.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e tests")
