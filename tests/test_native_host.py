"""Native C++ host data-prep kernels vs NumPy references.

The module degrades gracefully without a toolchain, so these tests skip when
the shared library can't be built."""

import numpy as np
import pytest

from poismf_tpu.native import host


@pytest.fixture(scope="module")
def lib_available():
    if host._load() is None:
        pytest.skip("native host library unavailable (no g++?)")
    return True


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_sort_by_row(lib_available, rng, dtype):
    n = 50_000
    rows = rng.integers(0, 700, n).astype(np.int32)
    cols = rng.integers(0, 300, n).astype(np.int32)
    vals = rng.random(n).astype(dtype)
    out = host.sort_by_row(rows, cols, vals, 700)
    assert out is not None
    r, c, v, counts = out
    order = np.argsort(rows, kind="stable")
    np.testing.assert_array_equal(r, rows[order])
    np.testing.assert_array_equal(c, cols[order])
    np.testing.assert_array_equal(v, vals[order])
    np.testing.assert_array_equal(counts, np.bincount(rows, minlength=700))


def test_sort_by_row_rejects_out_of_range(lib_available):
    rows = np.array([0, 5], dtype=np.int32)
    cols = np.array([0, 0], dtype=np.int32)
    vals = np.array([1.0, 1.0], dtype=np.float32)
    assert host.sort_by_row(rows, cols, vals, 3) is None


def test_dedupe_pairs(lib_available, rng):
    n = 20_000
    rows = rng.integers(0, 100, n).astype(np.int32)
    cols = rng.integers(0, 80, n).astype(np.int32)
    keep = host.dedupe_pairs(rows, cols, 80)
    assert keep is not None
    key = rows.astype(np.int64) * 80 + cols
    _, first = np.unique(key, return_index=True)
    np.testing.assert_array_equal(np.sort(keep), np.sort(first))
    # keeps FIRST occurrences in order
    assert np.all(np.diff(keep) > 0)


def test_ingestion_uses_native_sort(lib_available, rng):
    """build_counts through the native path matches the NumPy path."""
    from poismf_tpu import sparse as sp_mod

    rows = rng.integers(0, 50, 500).astype(np.int32)
    cols = rng.integers(0, 30, 500).astype(np.int32)
    vals = (rng.poisson(2.0, 500) + 1.0).astype(np.float32)
    native = sp_mod.build_counts(rows, cols, vals, 50, 30, to_device=False)
    saved = sp_mod._native_host
    try:
        sp_mod._native_host = None
        fallback = sp_mod.build_counts(
            rows, cols, vals, 50, 30, to_device=False
        )
    finally:
        sp_mod._native_host = saved
    np.testing.assert_array_equal(native.row_ids, fallback.row_ids)
    np.testing.assert_array_equal(native.col_ids, fallback.col_ids)
    np.testing.assert_array_equal(native.vals, fallback.vals)
    np.testing.assert_array_equal(native.row_nnz, fallback.row_nnz)
