"""table_segment_sum (scatter-free segment sum) unit tests."""

import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.models.problem import _index_table
from bundleadjustment_benchmarks_tpu.solvers.schur import table_segment_sum


def reference_segment_sum(values, idx, n_segments):
    out = np.zeros((n_segments,) + values.shape[1:], values.dtype)
    np.add.at(out, idx, values)
    return out


def test_matches_segment_sum_unsorted():
    rng = np.random.default_rng(0)
    k, n = 500, 37
    idx = rng.integers(0, n, size=k).astype(np.int32)
    values = rng.normal(size=(k, 3, 3))
    table = _index_table(idx, n)
    got = np.asarray(table_segment_sum(jnp.asarray(values), jnp.asarray(table)))
    np.testing.assert_allclose(got, reference_segment_sum(values, idx, n), rtol=1e-12)


def test_empty_segments():
    idx = np.array([5, 5, 5], dtype=np.int32)  # only segment 5 populated
    values = np.ones((3, 2))
    table = _index_table(idx, 8)
    got = np.asarray(table_segment_sum(jnp.asarray(values), jnp.asarray(table)))
    expected = np.zeros((8, 2))
    expected[5] = 3.0
    np.testing.assert_array_equal(got, expected)


def test_wide_segments_chunked():
    """Segments wider than the slot chunk exercise the scan path."""
    rng = np.random.default_rng(1)
    k, n = 4000, 3
    idx = rng.integers(0, n, size=k).astype(np.int32)
    values = rng.normal(size=(k, 2))
    table = _index_table(idx, n)
    assert table.shape[1] > 512  # must exceed default slot_chunk
    got = np.asarray(
        table_segment_sum(jnp.asarray(values), jnp.asarray(table), slot_chunk=256)
    )
    np.testing.assert_allclose(
        got, reference_segment_sum(values, idx, n), rtol=1e-10
    )
