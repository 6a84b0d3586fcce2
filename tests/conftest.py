"""Test harness config: CPU backend, 8 virtual devices, float64.

Unit/parity tests run on a virtual 8-device CPU mesh (the multi-chip sharding
path is validated without real TPU chips, per SURVEY.md section 4); the real-
TPU path is exercised by bench.py.  Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the harness presets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is insufficient if jax was imported before this conftest
# (jax snapshots JAX_PLATFORMS into its config at import time).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Compiles in this environment go through a slow remote helper; cache them.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"
PROBLEM21 = os.path.join(REFERENCE_DATA, "problem-21-11315-pre.txt")
PROBLEM39 = os.path.join(REFERENCE_DATA, "problem-39-18060-pre.txt")


@pytest.fixture(scope="session")
def problem21():
    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem

    return load_bal_problem(PROBLEM21)


def make_synthetic_problem(
    n_cameras=4, n_points=12, obs_per_point=3, seed=0, noise=5e-3,
    inlier_threshold=0.5,
):
    """Small random BA problem with BAL-like conventions for unit tests."""
    from bundleadjustment_benchmarks_tpu.utils.synthetic import (
        make_synthetic_problem as _make,
    )

    return _make(
        n_cameras=n_cameras,
        n_points=n_points,
        obs_per_point=obs_per_point,
        seed=seed,
        noise=noise,
        inlier_threshold=inlier_threshold,
    )


@pytest.fixture()
def synthetic_problem():
    return make_synthetic_problem()
