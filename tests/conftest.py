"""Test configuration: run every test on a virtual 8-device CPU mesh.

Note: this environment's sitecustomize imports jax at interpreter startup
(so JAX_PLATFORMS env edits here are too late), but backend initialization
is lazy — jax.config.update still selects the platform reliably.
"""
import os
import sys

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# The suite is compile-dominated (hundreds of small jitted programs); the
# on-disk compilation cache makes repeat runs hit warm executables.
from loner_tpu.common.jax_setup import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.expanduser("~/.cache/jax_test_compilation"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    # Suite tiers (README "Running the tests"): the fast suite is
    #   python -m pytest tests/ -q -m "not slow"
    # and finishes in well under 5 minutes on the 1-core CPU host; the
    # full suite adds the slow/e2e drives (~10+ min total).
    config.addinivalue_line(
        "markers",
        "slow: takes >~30s on the 1-core CPU host; excluded from the "
        "fast suite (-m 'not slow')",
    )
    config.addinivalue_line(
        "markers",
        "e2e: full-pipeline drive (threaded SLAM, CLI subprocess, camera "
        "training); all e2e tests are also slow",
    )
