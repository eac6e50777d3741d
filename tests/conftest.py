"""Test config: force CPU backend with an 8-device virtual mesh so
multi-chip sharding tests run anywhere (the driver separately validates
on real TPU hardware)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not reliable when a TPU platform plugin is
# registered; force the CPU backend explicitly
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/khmer_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402

REFERENCE_DIR = os.environ.get("KHMER_REFERENCE_DIR", "/root/reference")
REF_TEST_DATA = os.path.join(REFERENCE_DIR, "tests", "test-data")
REF_DATA = os.path.join(REFERENCE_DIR, "data")


def pytest_collection_modifyitems(config, items):
    """Default-deselect known_failing/huge/jenkins — the reference's
    pytest.ini behavior (reference pytest.ini:1-7)."""
    skip_kf = pytest.mark.skip(reason="known_failing (deselected by "
                                      "default, reference pytest.ini)")
    skip_huge = pytest.mark.skip(reason="huge (deselected by default)")
    for item in items:
        if "known_failing" in item.keywords:
            item.add_marker(skip_kf)
        if "huge" in item.keywords:
            item.add_marker(skip_huge)
        if "jenkins" in item.keywords:
            item.add_marker(pytest.mark.skip(reason="jenkins-only"))


@pytest.fixture
def ref_test_data():
    if not os.path.isdir(REF_TEST_DATA):
        pytest.skip("reference test-data tree not available")
    return REF_TEST_DATA


@pytest.fixture
def ref_data():
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data tree not available")
    return REF_DATA
