"""Tests for the BAL stand-in generator and the committed data files.

The reference strips four large BAL blobs (.MISSING_LARGE_BLOBS); the repo
ships generated substitutes (data/*.txt.gz, utils/balgen.py) whose structural
statistics are matched to the two bundled real files. These tests pin that
the committed files parse, have the advertised shapes, and stay in the
measured statistical regime of real BAL data (so benchmarks on them are
meaningful)."""

import os

import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.io import bal
from bundleadjustment_benchmarks_tpu.utils import balgen

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def test_generator_structure_and_regime():
    ds = balgen.generate_bal_like(12, 2000, seed=3, mean_degree=3.3)
    assert ds.n_cameras == 12 and ds.n_points == 2000
    deg = np.bincount(ds.pt_idx, minlength=2000)
    assert deg.min() >= 1
    assert 2.5 < deg.mean() < 4.5
    # Every observation's true-geometry projection is finite and in-frame-ish.
    assert np.isfinite(ds.measurements).all()
    assert np.abs(ds.measurements).max() < 2.5e3


@pytest.mark.parametrize("name", sorted(balgen.STRIPPED_CONFIGS))
def test_committed_standins_parse_with_advertised_shapes(name):
    path = os.path.join(DATA_DIR, name)
    assert os.path.exists(path), f"missing committed stand-in {name}"
    ds = bal.read_bal(path)
    n, m, _, _ = balgen.STRIPPED_CONFIGS[name]
    assert ds.n_cameras == n
    assert ds.n_points == m
    deg = np.bincount(ds.pt_idx, minlength=m)
    assert deg.min() >= 1 and 2.5 < deg.mean() < 4.5


def test_standin_prestats_match_real_regime():
    """Pre-optimization statistics in the regime measured on the real
    bundled files (problem-21: mean err 2.33, 33% inliers at 0.5)."""
    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.utils import stats

    problem = load_bal_problem(
        os.path.join(DATA_DIR, "problem-16-22106-pre.txt.gz")
    )
    s = stats.error_statistics(problem.state, problem.obs, 1.0, 0.5)
    assert 1.0 < float(s.mean_reprojection_error) < 5.0
    frac = int(s.n_inliers) / s.n_observations
    assert 0.2 < frac < 0.55
