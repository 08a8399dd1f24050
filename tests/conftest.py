"""Test configuration: CPU backend with a virtual 8-device mesh.

Mirrors the reference's tiered test strategy (``tests/conftest.py:9-34``): the
core suite needs no accelerator. Multi-device sharding tests run on 8 virtual
CPU devices via ``xla_force_host_platform_device_count`` (the TPU-native
replacement for the reference's spawn-NCCL-process-group harness,
``fastgen/utils/test_utils.py:157-336``).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# tests exercise encoder plumbing offline; the HashTokenizer stand-in is
# explicitly opted into here (production default is to fail loudly)
os.environ.setdefault("FASTGEN_ALLOW_HASH_TOKENIZER", "1")

# Force CPU: the session env may point JAX at a tunneled TPU (JAX_PLATFORMS=axon)
# whose sitecustomize force-sets the jax_platforms *config* — so the env var is
# not enough; we must update the config after import. Set FASTGEN_TEST_TPU=1 to
# opt in to the real device for @pytest.mark.tpu tests.
if not os.environ.get("FASTGEN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--run-integration", action="store_true", default=False,
                     help="run integration tests that need real data")


def pytest_configure(config):
    config.addinivalue_line("markers", "integration: needs real data / long runtime")
    config.addinivalue_line("markers", "large_model: downloads or builds large models")
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line(
        "markers", "slow: >60s on the single-core dev box; excluded from "
        "`make pytest`, included in `make pytest-all`")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-integration"):
        return
    skip = pytest.mark.skip(reason="needs --run-integration")
    for item in items:
        if "integration" in item.keywords:
            item.add_marker(skip)
