"""BAL ingestion tests (reference parser: bundle_adjustment_large.cpp:59-108)."""

import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.io import bal
from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem

from conftest import PROBLEM21, PROBLEM39


def test_read_problem21_header():
    ds = bal.read_bal(PROBLEM21)
    assert ds.n_cameras == 21
    assert ds.n_points == 11315
    assert ds.n_observations == 36455


def test_read_problem39_header():
    ds = bal.read_bal(PROBLEM39)
    assert ds.n_cameras == 39
    assert ds.n_points == 18060
    assert ds.n_observations == 63551


def test_first_observation_values():
    ds = bal.read_bal(PROBLEM21)
    # First line of problem-21: "0 0  1.597070e+03 4.733700e+02".
    assert ds.cam_idx[0] == 0 and ds.pt_idx[0] == 0
    np.testing.assert_allclose(ds.measurements[0], [1597.07, 473.37])


def test_roundtrip(tmp_path):
    ds = bal.read_bal(PROBLEM21)
    # Subsample for a quick roundtrip.
    sub = bal.BalDataset(
        cam_idx=ds.cam_idx[:100],
        pt_idx=ds.pt_idx[:100],
        measurements=ds.measurements[:100],
        omega=ds.omega,
        translation=ds.translation,
        focal=ds.focal,
        k1=ds.k1,
        k2=ds.k2,
        points=ds.points[:50],
    )
    sub.pt_idx[:] = np.clip(sub.pt_idx, 0, 49)
    path = str(tmp_path / "rt.txt")
    bal.write_bal(path, sub)
    back = bal.read_bal(path)
    np.testing.assert_allclose(back.measurements, sub.measurements, rtol=1e-10)
    np.testing.assert_allclose(back.omega, sub.omega, rtol=1e-14)
    np.testing.assert_allclose(back.points, sub.points, rtol=1e-14)


def test_problem_conventions():
    """Reference model conventions: K=diag(-f,-f,1), k1*f^2/k2*f^4 prescale."""
    ds = bal.read_bal(PROBLEM21)
    prob = load_bal_problem(PROBLEM21)
    st = prob.state
    np.testing.assert_allclose(np.asarray(st.K)[:, 0, 0], -ds.focal)
    np.testing.assert_allclose(np.asarray(st.K)[:, 1, 1], -ds.focal)
    np.testing.assert_allclose(np.asarray(st.K)[:, 2, 2], 1.0)
    np.testing.assert_allclose(np.asarray(st.k1), ds.k1 * ds.focal**2)
    np.testing.assert_allclose(np.asarray(st.k2), ds.k2 * ds.focal**4)
    # Observations sorted by point with a valid gather table.
    pt = np.asarray(prob.obs.pt_idx)
    assert (np.diff(pt) >= 0).all()
    table = np.asarray(prob.pt_obs_idx)
    counts = np.asarray(prob.pt_obs_count)
    assert counts.sum() == prob.n_observations
    for p in [0, 1, 5000, prob.n_points - 1]:
        rows = table[p][table[p] < prob.n_observations]
        assert len(rows) == counts[p]
        assert (pt[rows] == p).all()


def test_bad_file_rejected(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("2 2 2\n0 0 1.0 2.0\n")
    with pytest.raises(ValueError):
        bal.read_bal(path)
