"""Sparse counts-data layer: host-side ingestion -> device-resident flat COO.

TPU-native replacement for the reference's dual CSR+CSC requirement
(/root/reference/src/poismf.c:435-442 takes ``Xr``/``Xc`` in both orientations;
/root/reference/poismf/__init__.py:376-416 builds them with SciPy).

Instead of compressed-row pointers walked serially per row, we keep the
nonzeros as three flat, *row-sorted* arrays (``row_ids``, ``col_ids``,
``vals``) padded to a static length.  Every solver kernel then runs over the
whole nnz stream at once (gather + segment-sum), which is the layout XLA/TPU
wants: static shapes, no per-row control flow, contiguous DMA.

Both orientations are kept, mirroring the reference: the "by-user" view for
updating A and the "by-item" view for updating B.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np

try:  # the native C++ host kernels are optional; NumPy fallback always works
    from .native import host as _native_host
except Exception:  # pragma: no cover - absence of the compiled extension
    _native_host = None

# Pad the flat nnz stream up to a multiple of this so that repeated fits with
# slightly different data sizes reuse the same compiled program.
NNZ_PAD_MULTIPLE = 1024
# Pad row counts to a multiple of this (TPU sublane granularity for f32).
ROW_PAD_MULTIPLE = 8


def _pad_to(n: int, multiple: int) -> int:
    return ((max(n, 1) + multiple - 1) // multiple) * multiple


@dataclasses.dataclass(frozen=True)
class CountsMatrix:
    """One orientation of a sparse counts matrix as padded flat COO.

    ``row_ids`` is sorted ascending.  Padding entries carry ``row_id ==
    n_rows`` (an extra dummy segment), ``col_id == 0`` and ``val == 0`` so
    they contribute nothing to segment reductions.
    """

    row_ids: Any  # [nnz_pad] int32, sorted, pad = n_rows
    col_ids: Any  # [nnz_pad] int32, pad = 0
    vals: Any  # [nnz_pad] dtype, pad = 0
    row_nnz: Any  # [n_rows_pad] int32 - nonzero count per (padded) row
    n_rows: int
    n_cols: int
    nnz: int

    @property
    def n_rows_pad(self) -> int:
        return int(self.row_nnz.shape[0])

    @property
    def nnz_pad(self) -> int:
        return int(self.row_ids.shape[0])

    def tree_flatten(self):  # registered below
        return (self.row_ids, self.col_ids, self.vals, self.row_nnz), (
            self.n_rows,
            self.n_cols,
            self.nnz,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        row_ids, col_ids, vals, row_nnz = children
        n_rows, n_cols, nnz = aux
        return cls(row_ids, col_ids, vals, row_nnz, n_rows, n_cols, nnz)


def _register_pytree():
    import jax

    jax.tree_util.register_pytree_node(
        CountsMatrix, CountsMatrix.tree_flatten, CountsMatrix.tree_unflatten
    )


_register_pytree()


def _sort_by_row(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n_rows: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Counting-sort the triplets by row; returns sorted arrays + row counts.

    Uses the native C++ host kernel when available (O(nnz) counting sort),
    otherwise ``np.argsort``.
    """
    if _native_host is not None and rows.size > 0:
        out = _native_host.sort_by_row(rows, cols, vals, n_rows)
        if out is not None:
            return out
    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    cols_s = cols[order]
    vals_s = vals[order]
    counts = np.bincount(rows_s, minlength=n_rows).astype(np.int32)
    return rows_s, cols_s, vals_s, counts


def dedupe_sum(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, n_cols: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sum values of duplicate (row, col) pairs, like the reference's
    ``coo.tocsr()`` ingestion does (poismf/__init__.py:405-414).

    Duplicates matter beyond the (linear) objective: per-row nnz counts and
    the weighted-Bsum adjustment count each edge once, so dirty input with
    repeated pairs must be aggregated before layout building.  No-op (and
    allocation-free) when there are no duplicates.
    """
    if rows.size == 0:
        return rows, cols, vals
    key = rows.astype(np.int64) * np.int64(n_cols) + cols
    uniq, inv = np.unique(key, return_inverse=True)
    if uniq.size == rows.size:
        return rows, cols, vals
    summed = np.zeros(uniq.size, dtype=vals.dtype)
    np.add.at(summed, inv, vals)
    return (
        (uniq // n_cols).astype(rows.dtype),
        (uniq % n_cols).astype(cols.dtype),
        summed,
    )


def build_counts(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_cols: int,
    dtype=np.float32,
    to_device: bool = True,
    aggregate_duplicates: bool = True,
) -> CountsMatrix:
    """Build one orientation (row-major-sorted flat COO) of the counts matrix."""
    rows = np.asarray(rows, dtype=np.int32).reshape(-1)
    cols = np.asarray(cols, dtype=np.int32).reshape(-1)
    vals = np.asarray(vals, dtype=dtype).reshape(-1)
    nnz = int(rows.shape[0])
    if nnz:
        if rows.min(initial=0) < 0 or (nnz and rows.max(initial=0) >= n_rows):
            raise ValueError("row indices out of range")
        if cols.min(initial=0) < 0 or (nnz and cols.max(initial=0) >= n_cols):
            raise ValueError("column indices out of range")
    if aggregate_duplicates:
        rows, cols, vals = dedupe_sum(rows, cols, vals, n_cols)
        nnz = int(rows.shape[0])

    rows_s, cols_s, vals_s, counts = _sort_by_row(rows, cols, vals, n_rows)

    nnz_pad = _pad_to(nnz, NNZ_PAD_MULTIPLE)
    n_rows_pad = _pad_to(n_rows, ROW_PAD_MULTIPLE)

    row_ids = np.full(nnz_pad, n_rows_pad, dtype=np.int32)
    col_ids = np.zeros(nnz_pad, dtype=np.int32)
    data = np.zeros(nnz_pad, dtype=dtype)
    row_ids[:nnz] = rows_s
    col_ids[:nnz] = cols_s
    data[:nnz] = vals_s

    row_nnz = np.zeros(n_rows_pad, dtype=np.int32)
    row_nnz[:n_rows] = counts

    host = (row_ids, col_ids, data)
    if to_device:
        import jax.numpy as jnp

        row_ids = jnp.asarray(row_ids)
        col_ids = jnp.asarray(col_ids)
        data = jnp.asarray(data)
        row_nnz = jnp.asarray(row_nnz)

    cm = CountsMatrix(
        row_ids=row_ids,
        col_ids=col_ids,
        vals=data,
        row_nnz=row_nnz,
        n_rows=n_rows,
        n_cols=n_cols,
        nnz=nnz,
    )
    # keep the host triplets alongside the device copies: layout builders
    # (ops.ell) do O(nnz) host work and would otherwise pull the arrays back
    # over the (25 MB/s) tunnel.  Not part of the pytree — a CountsMatrix
    # reconstructed from traced leaves simply lacks the attribute.
    object.__setattr__(cm, "host_triplets", host)
    return cm


def build_both_orientations(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_cols: int,
    dtype=np.float32,
    to_device: bool = True,
) -> Tuple[CountsMatrix, CountsMatrix]:
    """(by-row, by-col) views - the CSR+CSC pair of the reference."""
    rows = np.asarray(rows, dtype=np.int32).reshape(-1)
    cols = np.asarray(cols, dtype=np.int32).reshape(-1)
    vals = np.asarray(vals, dtype=dtype).reshape(-1)
    # aggregate once here rather than per-orientation
    rows, cols, vals = dedupe_sum(rows, cols, vals, n_cols)
    by_row = build_counts(rows, cols, vals, n_rows, n_cols, dtype, to_device,
                          aggregate_duplicates=False)
    by_col = build_counts(cols, rows, vals, n_cols, n_rows, dtype, to_device,
                          aggregate_duplicates=False)
    return by_row, by_col


# ---------------------------------------------------------------------------
# High-level ingestion (DataFrame / SciPy COO / raw triplets), with the same
# reindexing semantics as PoisMF._process_data
# (/root/reference/poismf/__init__.py:376-416).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class IngestResult:
    by_user: CountsMatrix
    by_item: CountsMatrix
    n_users: int
    n_items: int
    user_mapping: Optional[np.ndarray]
    item_mapping: Optional[np.ndarray]


def ingest(
    X,
    reindex: bool = True,
    dtype=np.float32,
    to_device: bool = True,
) -> IngestResult:
    """Accepts a pandas DataFrame(UserId, ItemId, Count), a SciPy COO
    matrix/array, or a (rows, cols, vals, shape) tuple."""
    user_mapping = None
    item_mapping = None

    if hasattr(X, "tocoo") and hasattr(X, "shape") and not _is_dataframe(X):
        coo = X.tocoo()
        rows, cols, vals = coo.row, coo.col, coo.data
        n_users, n_items = coo.shape
    elif _is_dataframe(X):
        import pandas as pd

        required = ["UserId", "ItemId", "Count"]
        missing = [c for c in required if c not in X.columns]
        if missing:
            raise ValueError("'X' should have columns: " + ", ".join(required))
        if reindex:
            user_codes, user_mapping = pd.factorize(X["UserId"])
            item_codes, item_mapping = pd.factorize(X["ItemId"])
            user_mapping = np.asarray(user_mapping).reshape(-1)
            item_mapping = np.asarray(item_mapping).reshape(-1)
            rows = np.asarray(user_codes)
            cols = np.asarray(item_codes)
        else:
            rows = X["UserId"].to_numpy()
            cols = X["ItemId"].to_numpy()
        vals = X["Count"].to_numpy()
        n_users = int(rows.max()) + 1 if rows.size else 0
        n_items = int(cols.max()) + 1 if cols.size else 0
    elif isinstance(X, tuple) and len(X) == 4:
        rows, cols, vals, (n_users, n_items) = X
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
    else:
        raise ValueError(
            "'X' must be a pandas DataFrame, SciPy COO matrix, or "
            "(rows, cols, vals, shape) tuple."
        )

    vals = np.asarray(vals)
    if vals.size and float(np.min(vals)) <= 0:
        raise ValueError("Counts must all be greater than zero.")

    by_user, by_item = build_both_orientations(
        rows, cols, vals, n_users, n_items, dtype=dtype, to_device=to_device
    )
    return IngestResult(
        by_user=by_user,
        by_item=by_item,
        n_users=n_users,
        n_items=n_items,
        user_mapping=user_mapping,
        item_mapping=item_mapping,
    )


def _is_dataframe(X) -> bool:
    return type(X).__name__ == "DataFrame"


def csr_like(mat: CountsMatrix) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Export (indptr, indices, data) NumPy CSR views (testing/interop)."""
    row_ids = np.asarray(mat.row_ids[: mat.nnz])
    indptr = np.zeros(mat.n_rows + 1, dtype=np.int64)
    np.add.at(indptr, row_ids + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, np.asarray(mat.col_ids[: mat.nnz]), np.asarray(mat.vals[: mat.nnz])
