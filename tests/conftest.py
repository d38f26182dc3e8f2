"""Test configuration: force an 8-virtual-device CPU backend.

Must run before the first `import jax` resolves a backend, hence the env
mutation at module import time. Multi-chip sharding tests use this virtual
mesh (the TPU equivalent of a fake backend).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin pre-sets jax_platforms to "axon,cpu" which
# overrides the env var — force CPU through the config API instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    A full green run accumulates hundreds of XLA:CPU executables; at that
    state the bundled XLA:CPU compiler segfaults deterministically partway
    through tests/test_svd_operators.py (reproduced twice at the same test;
    the same file passes standalone and in any smaller subset). Dropping
    the jit caches at module boundaries keeps the process well under the
    crash threshold; modules share few cache hits, so the recompile cost is
    small next to the suite's runtime."""
    yield
    jax.clear_caches()
