"""Test harness: run everything on CPU with 8 virtual devices.

This is the TPU-native answer to multi-chip testing without a pod slice
(SURVEY.md §4): JAX's host-platform device-count spoof lets sharding /
collective code compile and execute exactly as it would on 8 real chips.

Note: this machine's site customization pre-registers a TPU PJRT plugin and
pins JAX_PLATFORMS, so the env var alone is not enough — we must override
via jax.config after import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the model graphs are compile-heavy on CPU;
# caching makes repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(51)  # the reference's eval seed


def pytest_collection_modifyitems(config, items):
    """Skip slow tests unless markers were chosen explicitly (-m).

    Done here instead of an `addopts = -m 'not slow'` so that naming the
    slow file directly (`pytest tests/test_train_eval_loop.py`) collects
    and visibly SKIPS instead of deselecting everything and exiting 5.
    """
    if config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow closed-loop test — run with `pytest -m slow`")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
