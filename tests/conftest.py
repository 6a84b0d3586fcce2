"""Test harness config: CPU backend, 8 virtual devices, float64.

Unit/parity tests run on a virtual 8-device CPU mesh (the multi-chip sharding
path is validated without real TPU chips, per SURVEY.md section 4); the real-
TPU path is exercised by bench.py.  Must run before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

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


def make_synthetic_problem(n_cameras=4, n_points=12, obs_per_point=3, seed=0, noise=5e-3):
    """Small random BA problem with BAL-like conventions for unit tests."""
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.io.bal import BalDataset
    from bundleadjustment_benchmarks_tpu.models.problem import from_bal_dataset
    from bundleadjustment_benchmarks_tpu.ops import rodrigues

    rng = np.random.default_rng(seed)
    # Cameras looking roughly down -z at points near origin (BAL convention).
    omega = rng.normal(scale=0.1, size=(n_cameras, 3))
    translation = rng.normal(scale=0.2, size=(n_cameras, 3))
    translation[:, 2] += 2.0  # points end up at z ~ +2 in camera frame
    focal = rng.uniform(400.0, 600.0, size=n_cameras)
    k1 = rng.normal(scale=1e-8, size=n_cameras)
    k2 = rng.normal(scale=1e-14, size=n_cameras)
    points = rng.normal(scale=0.5, size=(n_points, 3))

    cam_idx = []
    pt_idx = []
    for p in range(n_points):
        cams = rng.choice(n_cameras, size=min(obs_per_point, n_cameras), replace=False)
        for c in cams:
            cam_idx.append(c)
            pt_idx.append(p)
    cam_idx = np.array(cam_idx, dtype=np.int32)
    pt_idx = np.array(pt_idx, dtype=np.int32)

    # Generate measurements by projecting with the reference conventions
    # (negative focal, prescaled distortion), plus noise.
    R = np.asarray(rodrigues.exp_rodrigues(jnp.asarray(omega)))
    meas = []
    for c, p in zip(cam_idx, pt_idx):
        XX = R[c] @ points[p] + translation[c]
        xu = XX[:2] / XX[2]
        r2 = float(xu @ xu)
        pk1 = k1[c] * focal[c] ** 2
        pk2 = k2[c] * focal[c] ** 4
        kr = 1 + pk1 * r2 + pk2 * r2 * r2
        meas.append(-focal[c] * kr * xu)
    meas = np.array(meas) + rng.normal(scale=noise, size=(len(cam_idx), 2))

    ds = BalDataset(
        cam_idx=cam_idx,
        pt_idx=pt_idx,
        measurements=meas,
        omega=omega,
        translation=translation,
        focal=focal,
        k1=k1,
        k2=k2,
        points=points + rng.normal(scale=1e-3, size=points.shape),
    )
    return from_bal_dataset(ds)


@pytest.fixture()
def synthetic_problem():
    return make_synthetic_problem()
