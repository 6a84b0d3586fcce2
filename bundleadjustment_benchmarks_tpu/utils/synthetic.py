"""Synthetic BA problem generator (tests, compile checks, dry runs).

Generates a random multi-view problem with BAL-like conventions (negative
focal, prescaled distortion — reference bundle_adjustment_large.cpp:88-98) by
projecting ground-truth geometry and perturbing it, so LM has a realistic
basin to descend.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.io.bal import BalDataset
from bundleadjustment_benchmarks_tpu.models.problem import BAProblem, from_bal_dataset
from bundleadjustment_benchmarks_tpu.ops import rodrigues


def make_synthetic_problem(
    n_cameras: int = 4,
    n_points: int = 12,
    obs_per_point: int = 3,
    seed: int = 0,
    noise: float = 5e-3,
    dtype=jnp.float64,
) -> BAProblem:
    rng = np.random.default_rng(seed)
    omega = rng.normal(scale=0.1, size=(n_cameras, 3))
    translation = rng.normal(scale=0.2, size=(n_cameras, 3))
    translation[:, 2] += 2.0  # points end up at positive depth
    focal = rng.uniform(400.0, 600.0, size=n_cameras)
    k1 = rng.normal(scale=1e-8, size=n_cameras)
    k2 = rng.normal(scale=1e-14, size=n_cameras)
    points = rng.normal(scale=0.5, size=(n_points, 3))

    cam_idx = []
    pt_idx = []
    for p in range(n_points):
        cams = rng.choice(
            n_cameras, size=min(obs_per_point, n_cameras), replace=False
        )
        for c in cams:
            cam_idx.append(c)
            pt_idx.append(p)
    cam_idx = np.array(cam_idx, dtype=np.int32)
    pt_idx = np.array(pt_idx, dtype=np.int32)

    R = np.asarray(
        rodrigues.exp_rodrigues(jnp.asarray(omega, dtype=jnp.float64))
    )
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
    return from_bal_dataset(ds, dtype=dtype)
