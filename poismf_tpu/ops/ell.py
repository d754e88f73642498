"""Planar-ELL sparse layout and gather-free objective kernels.

Motivation (measured on v5e): XLA TPU gathers/scatters run ~13x slower per
byte than linear reads, and the flat-COO kernels in :mod:`.objective` gather
``B[cols]`` and scatter per-row sums in EVERY solver pass.  Since the fixed
factor matrix does not change within a half-update, we instead:

  1. bucket rows by nonzero count (powers of two, rows sorted by nnz so each
     bucket is a contiguous row range in the permuted order) — the TPU answer
     to the reference's per-row ``for (ix = st_ix_a; ...)`` loops over CSR
     (/root/reference/src/poismf.c:194-273) under a power-law nnz
     distribution;
  2. gather the fixed matrix's rows ONCE per half-update into per-bucket
     "planes" ``bg[k, P, R_b]`` (k outermost, row dim on vector lanes);
  3. run every objective/gradient/HVP evaluation as elementwise ops plus
     reductions over the small leading dims — zero gathers, zero scatters,
     reading ``bg`` at streaming bandwidth.

The planar orientation matters: with ``R_b`` on lanes and ``P`` on sublanes,
the reduction over nonzeros (P) is a cheap sublane reduction and the
reduction over features (k) is a sequential accumulation of [P, R_b] planes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

# Row-count padding within a bucket (TPU lane granularity).
ROW_TILE = 128
# Smallest nnz bucket width.
MIN_P = 4
# Rows with more nonzeros than this are SPLIT into chunks of P_MAX
# ("extension" virtual rows that scatter-add into the primary row's slot).
# Caps the worst-case bucket padding at 128 * P_MAX entries under power-law
# row lengths — the TPU answer to the reference's "long-context" axis
# (SURVEY.md section 5: nnz-per-row is the scaling dimension here).
P_MAX = 2048


@dataclasses.dataclass(frozen=True)
class EllBucket:
    """One nnz bucket: virtual rows at ELL slots [offset, offset + n_rows),
    each holding at most P nonzeros.  ``cols`` is row-major [R_b, P] for the
    one-off gather; ``vals`` is planar [P, R_b] for the kernels.  Padding
    entries have ``col == 0`` and ``val == 0``.

    ``src`` is None for a pure-primary bucket (slots are their own rows);
    otherwise ``src[i]`` is the ELL slot holding the factor vector this
    bucket row reads from / accumulates into (long-row extension chunks
    point at their primary slot; padding rows point at the zero tail).

    ``ext``/``ext_src`` (set at build time for the full ELL) list the REAL
    extension rows only: ``ext[j]`` is the bucket-local position of the
    j-th long-row extension chunk and ``ext_src[j]`` its primary's ELL
    slot.  Primary rows always satisfy ``src[i] == offset + i``, so with
    ``ext`` known the per-bucket gather/scatter degenerates to a
    contiguous slice plus a TINY extension-only fixup — the full-index
    scatter of ``src`` (82k ids on the bench item side for a bucket with
    a handful of extension chunks) measured ~0.7 ms per assemble and was
    the single largest cost of the TNCG line-search round (profiled on
    v5e: 8 scatter fusions per multi-candidate round vs 0.5 ms of ray
    kernels).  ``ext=None`` with ``src`` set (per-round compact sub-ELLs,
    sharded per-device ELLs) keeps the full-scatter path."""

    offset: int
    n_rows: int  # padded to ROW_TILE
    P: int
    cols: Any  # [R_b, P] int32
    vals: Any  # [P, R_b] dtype
    src: Any = None  # Optional [R_b] int32
    ext: Any = None  # Optional [n_ext] int32 (bucket-local positions)
    ext_src: Any = None  # Optional [n_ext] int32 (primary ELL slots)

    def tree_flatten(self):
        return (self.cols, self.vals, self.src, self.ext, self.ext_src), (
            self.offset, self.n_rows, self.P,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals, src, ext, ext_src = children
        offset, n_rows, P = aux
        return cls(offset, n_rows, P, cols, vals, src, ext, ext_src)


@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Bucketed planar-ELL view of a sparse counts matrix.

    Nonempty rows are sorted by descending nonzero count and laid out bucket
    by bucket in their own padded "ELL row space" of size ``n_rows_ell``
    (= sum of padded bucket rows + a zero tail).  ``perm[i]`` is the original
    row id at ELL position ``i`` (padding slots carry the sentinel
    ``n_rows_pad``, which :func:`permute_rows` turns into zero rows);
    ``inv_perm`` maps original row ids back to ELL positions (empty rows
    point at the zero tail)."""

    buckets: Tuple[EllBucket, ...]
    perm: Any  # [n_rows_ell] int32 (device), pad slots = n_rows_pad sentinel
    inv_perm: Any  # [n_rows_pad] int32 (device)
    row_nnz_perm: Any  # [n_rows_ell] int32 (device) nnz per ELL slot
    n_rows: int
    n_cols: int
    nnz: int
    n_rows_pad: int
    n_rows_ell: int

    def tree_flatten(self):
        return (self.buckets, self.perm, self.inv_perm, self.row_nnz_perm), (
            self.n_rows, self.n_cols, self.nnz, self.n_rows_pad,
            self.n_rows_ell,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        buckets, perm, inv_perm, row_nnz_perm = children
        return cls(tuple(buckets), perm, inv_perm, row_nnz_perm, *aux)


def _register():
    import jax

    jax.tree_util.register_pytree_node(
        EllBucket, EllBucket.tree_flatten, EllBucket.tree_unflatten
    )
    jax.tree_util.register_pytree_node(
        EllMatrix, EllMatrix.tree_flatten, EllMatrix.tree_unflatten
    )


_register()


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# Bucket-count ceiling and padding budget for the merge pass below.  Every
# bucket instantiates its own kernels in EVERY solver program (fgh, line
# search, HVP, ...), so bucket count is a direct multiplier on compiled
# program size — and over a remote-compiler TPU tunnel, on cold-start wall
# time.  Merging the small tail octaves trades a few % of padded nnz for
# ~40% smaller programs.
MAX_BUCKETS = 6
MERGE_PAD_BUDGET = 0.06  # max extra padded slots from merging, vs unmerged


def _plan_buckets(counts_sorted: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Bucket spans over nnz-descending-sorted rows.

    Returns [(start, end, P, ell_offset)] where rows [start, end) of the
    sorted order form a bucket of width P at ELL row offset ``ell_offset``
    (buckets padded to ROW_TILE rows).  One span per power-of-two octave,
    then adjacent spans are greedily merged (cheapest padding increase
    first) until at most MAX_BUCKETS remain, within MERGE_PAD_BUDGET."""
    n_nonempty = int(np.count_nonzero(counts_sorted))
    spans: List[Tuple[int, int, int]] = []  # (start, end, P)
    start = 0
    while start < n_nonempty:
        c = int(counts_sorted[start])
        P = max(MIN_P, 1 << (c - 1).bit_length())
        lo_width = P // 2 if P > MIN_P else 0
        end = int(
            np.searchsorted(-counts_sorted, -(lo_width + 1), side="right")
        )
        end = max(end, start + 1)
        spans.append((start, end, P))
        start = end

    def cost(s: int, e: int, P: int) -> int:
        return _ceil_to(e - s, ROW_TILE) * P

    base = sum(cost(s, e, P) for s, e, P in spans)
    budget = MERGE_PAD_BUDGET * base
    added = 0.0
    while len(spans) > 1:
        best_i, best_d = -1, None
        for i in range(len(spans) - 1):
            (s1, e1, P1), (s2, e2, P2) = spans[i], spans[i + 1]
            d = cost(s1, e2, P1) - cost(s1, e1, P1) - cost(s2, e2, P2)
            if best_d is None or d < best_d:
                best_i, best_d = i, d
        free = best_d <= 0  # merged tile padding can shrink total
        over_count = len(spans) > MAX_BUCKETS
        if not (free or (over_count and added + best_d <= budget)):
            break
        s1, e1, P1 = spans[best_i]
        s2, e2, P2 = spans[best_i + 1]
        spans[best_i : best_i + 2] = [(s1, e2, P1)]
        added += max(best_d, 0)

    out: List[Tuple[int, int, int, int]] = []
    ell_off = 0
    for s, e, P in spans:
        out.append((s, e, P, ell_off))
        ell_off += _ceil_to(e - s, ROW_TILE)
    return out


def build_ell(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_cols: int,
    n_rows_pad: int,
    dtype=np.float32,
    to_device: bool = True,
    col_positions: Optional[np.ndarray] = None,
    rows_sorted: bool = False,
) -> EllMatrix:
    """Build the bucketed planar-ELL layout from COO triplets.

    Rows are sorted by descending nnz; bucket widths are powers of two (>=
    MIN_P), so total padding is < 2x nnz.  Rows with zero nonzeros (and the
    padding rows up to ``n_rows_pad``) are appended at the end and belong to
    no bucket.

    ``col_positions``, when given, remaps every column id through it (used to
    point this orientation's columns at the OTHER orientation's permuted row
    positions, so both factor matrices can live in their permuted orders for
    the whole fit with no per-epoch permutes).
    """
    rows = np.asarray(rows, dtype=np.int64).reshape(-1)
    cols = np.asarray(cols, dtype=np.int64).reshape(-1)
    if col_positions is not None:
        cols = np.asarray(col_positions, dtype=np.int64)[cols]
    vals = np.asarray(vals, dtype=dtype).reshape(-1)
    nnz = int(rows.shape[0])

    counts = np.bincount(rows, minlength=n_rows).astype(np.int64)

    # ---- virtual rows: rows longer than P_MAX split into chunks ----
    n_chunks = -(-counts // P_MAX)  # ceil; 0 for empty rows
    v_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=v_offsets[1:])
    n_virtual = int(v_offsets[-1])
    orig_of_v = np.repeat(
        np.arange(n_rows, dtype=np.int64), n_chunks
    )
    chunk_of_v = np.arange(n_virtual, dtype=np.int64) - v_offsets[orig_of_v]
    vcounts = np.minimum(P_MAX, counts[orig_of_v] - chunk_of_v * P_MAX)
    primary_of_v = v_offsets[orig_of_v]

    # CSR-style slot within each original row for every nonzero
    if rows_sorted and nnz and not bool(np.all(rows[:-1] <= rows[1:])):
        # cheap O(nnz) guard: the slot computation below silently corrupts
        # the layout if the promised sorted-ascending invariant is violated
        # (e.g. a CountsMatrix assembled by hand) — fall back to sorting
        rows_sorted = False
    if rows_sorted:
        r_sorted = rows
        cols_s = cols
        vals_s = vals
    else:
        sort_idx = np.argsort(rows, kind="stable")
        r_sorted = rows[sort_idx]
        cols_s = cols[sort_idx]
        vals_s = vals[sort_idx]
    starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(nnz, dtype=np.int64) - starts[r_sorted]
    vrow_e = v_offsets[r_sorted] + slot // P_MAX  # virtual row per edge
    vslot_e = slot % P_MAX

    order = np.argsort(-vcounts, kind="stable").astype(np.int64)
    pos_of_v = np.empty(n_virtual, dtype=np.int64)
    pos_of_v[order] = np.arange(n_virtual, dtype=np.int64)
    counts_sorted = vcounts[order]

    spans = _plan_buckets(counts_sorted)
    covered = (spans[-1][3] + _ceil_to(spans[-1][1] - spans[-1][0], ROW_TILE)
               ) if spans else 0
    n_rows_ell = covered + ROW_TILE

    # ELL slot of every virtual row
    ell_of_pos = np.full(n_virtual, n_rows_ell - 1, dtype=np.int64)
    for s, e, _P, off in spans:
        ell_of_pos[s:e] = off + np.arange(e - s, dtype=np.int64)
    ell_of_v = ell_of_pos[pos_of_v]
    src_of_v = ell_of_v[primary_of_v]
    is_primary = chunk_of_v == 0

    perm = np.full(n_rows_ell, n_rows_pad, dtype=np.int64)  # pad sentinel
    inv_perm = np.full(n_rows_pad, n_rows_ell - 1, dtype=np.int64)
    row_nnz_perm = np.zeros(n_rows_ell, dtype=np.int32)
    perm[ell_of_v[is_primary]] = orig_of_v[is_primary]
    inv_perm[orig_of_v[is_primary]] = ell_of_v[is_primary]
    row_nnz_perm[ell_of_v[is_primary]] = counts[orig_of_v[is_primary]]

    # single vectorized scatter of every edge into flat per-bucket storage
    # (one O(nnz) pass instead of an O(nnz) boolean scan per bucket)
    pos_e = pos_of_v[vrow_e]  # sorted position of each edge's virtual row
    span_starts = np.array([s for s, _e, _P, _o in spans], dtype=np.int64)
    span_P = np.array([P for _s, _e, P, _o in spans], dtype=np.int64)
    span_Rb = np.array(
        [_ceil_to(e - s, ROW_TILE) for s, e, _P, _o in spans], dtype=np.int64
    )
    flat_off = np.zeros(len(spans) + 1, dtype=np.int64)
    np.cumsum(span_Rb * span_P, out=flat_off[1:])
    b_e = np.searchsorted(span_starts, pos_e, side="right") - 1
    dest = (
        flat_off[b_e]
        + (pos_e - span_starts[b_e]) * span_P[b_e]
        + vslot_e
    )
    flat_cols = np.zeros(int(flat_off[-1]), dtype=np.int32)
    flat_vals = np.zeros(int(flat_off[-1]), dtype=dtype)
    flat_cols[dest] = cols_s
    flat_vals[dest] = vals_s

    buckets: List[EllBucket] = []
    for i, (s, e, P, off) in enumerate(spans):
        Rb = int(span_Rb[i])
        sl = slice(int(flat_off[i]), int(flat_off[i + 1]))
        bcols = flat_cols[sl].reshape(Rb, P)
        bvals = flat_vals[sl].reshape(Rb, P)
        is_prim_b = is_primary[order[s:e]]
        all_primary = bool(np.all(is_prim_b))
        if all_primary:
            src = ext = ext_src = None
        else:
            src = np.full(Rb, n_rows_ell - 1, dtype=np.int32)
            src[: e - s] = src_of_v[order[s:e]].astype(np.int32)
            # real extension chunks only (padding rows excluded): with
            # these known statically, _bucket_x/_assemble run as
            # contiguous slices + a tiny fixup instead of full-bucket
            # gathers/scatters (see EllBucket docstring)
            ext = np.nonzero(~is_prim_b)[0].astype(np.int32)
            ext_src = src[ext]
        buckets.append(
            EllBucket(
                offset=off, n_rows=Rb, P=P,
                cols=bcols, vals=np.ascontiguousarray(bvals.T), src=src,
                ext=ext, ext_src=ext_src,
            )
        )

    host_src = [b.src for b in buckets]
    if to_device:
        import jax.numpy as jnp

        buckets = [
            EllBucket(
                b.offset, b.n_rows, b.P,
                jnp.asarray(b.cols), jnp.asarray(b.vals),
                None if b.src is None else jnp.asarray(b.src),
                None if b.ext is None else jnp.asarray(b.ext),
                None if b.ext_src is None else jnp.asarray(b.ext_src),
            )
            for b in buckets
        ]
        perm_d = jnp.asarray(perm.astype(np.int32))
        inv_perm_d = jnp.asarray(inv_perm.astype(np.int32))
        row_nnz_d = jnp.asarray(row_nnz_perm)
    else:
        perm_d = perm.astype(np.int32)
        inv_perm_d = inv_perm.astype(np.int32)
        row_nnz_d = row_nnz_perm

    ell = EllMatrix(
        buckets=tuple(buckets),
        perm=perm_d,
        inv_perm=inv_perm_d,
        row_nnz_perm=row_nnz_d,
        n_rows=n_rows,
        n_cols=n_cols,
        nnz=nnz,
        n_rows_pad=n_rows_pad,
        n_rows_ell=n_rows_ell,
    )
    # Host copies of the cascade-planning metadata (train._make_aux).  A
    # device->host pull right after queueing the bucket uploads stalls for
    # MINUTES over the 25 MB/s tunnel (the read waits behind every queued
    # transfer); keeping the numpy originals makes it free.  Not part of the
    # pytree — absent on matrices reconstructed from traced leaves.
    object.__setattr__(
        ell, "host_aux", dict(row_nnz_perm=row_nnz_perm, src=host_src)
    )
    return ell


def row_positions(
    rows: np.ndarray, n_rows: int, n_rows_pad: int
) -> np.ndarray:
    """ELL-space position of each original row id — the ``inv_perm`` that
    :func:`build_ell` will produce for the same row set (empty rows point at
    the zero tail)."""
    counts = np.bincount(
        np.asarray(rows, dtype=np.int64), minlength=n_rows
    ).astype(np.int64)
    n_chunks = -(-counts // P_MAX)
    v_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=v_offsets[1:])
    n_virtual = int(v_offsets[-1])
    orig_of_v = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks)
    chunk_of_v = np.arange(n_virtual, dtype=np.int64) - v_offsets[orig_of_v]
    vcounts = np.minimum(P_MAX, counts[orig_of_v] - chunk_of_v * P_MAX)

    order = np.argsort(-vcounts, kind="stable")
    pos_of_v = np.empty(n_virtual, dtype=np.int64)
    pos_of_v[order] = np.arange(n_virtual, dtype=np.int64)
    spans = _plan_buckets(vcounts[order])
    covered = (spans[-1][3] + _ceil_to(spans[-1][1] - spans[-1][0], ROW_TILE)
               ) if spans else 0
    n_rows_ell = covered + ROW_TILE
    ell_of_pos = np.full(n_virtual, n_rows_ell - 1, dtype=np.int64)
    for s, e, _P, off in spans:
        ell_of_pos[s:e] = off + np.arange(e - s, dtype=np.int64)
    ell_of_v = ell_of_pos[pos_of_v]
    is_primary = chunk_of_v == 0
    pos = np.full(n_rows_pad, n_rows_ell - 1, dtype=np.int64)
    pos[orig_of_v[is_primary]] = ell_of_v[is_primary]
    return pos


def _host_triplets(X):
    """Host (rows, cols, vals) of a CountsMatrix without padding — from the
    cached host copies when present (sparse.build_counts attaches them; a
    device pull over the tunnel costs ~10 s at Last.FM scale otherwise)."""
    host = getattr(X, "host_triplets", None)
    if host is not None:
        r, c, v = host
        return r[: X.nnz], c[: X.nnz], v[: X.nnz]
    return (
        np.asarray(X.row_ids[: X.nnz]),
        np.asarray(X.col_ids[: X.nnz]),
        np.asarray(X.vals[: X.nnz]),
    )


def ell_from_counts(X, dtype=None, col_positions=None) -> EllMatrix:
    """Build from a flat-COO :class:`~poismf_tpu.sparse.CountsMatrix`."""
    rows, cols, vals = _host_triplets(X)
    return build_ell(
        rows, cols, vals, X.n_rows, X.n_cols, X.n_rows_pad,
        dtype=dtype or vals.dtype, col_positions=col_positions,
        rows_sorted=True,  # CountsMatrix invariant (sparse.py docstring)
    )


def ell_pair_from_counts(by_user, by_item, dtype=None):
    """Build BOTH orientations with cross-referenced permuted column ids:
    the by-user ELL's columns index the by-item permuted order and vice
    versa, so A and B stay in permuted order for the whole fit."""
    pos_u = row_positions(
        _host_triplets(by_user)[0], by_user.n_rows, by_user.n_rows_pad,
    )
    pos_i = row_positions(
        _host_triplets(by_item)[0], by_item.n_rows, by_item.n_rows_pad,
    )
    ell_user = ell_from_counts(by_user, dtype=dtype, col_positions=pos_i)
    ell_item = ell_from_counts(by_item, dtype=dtype, col_positions=pos_u)
    return ell_user, ell_item


def adjusted_bsum_ell(
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    w_mult: float,
):
    """Per-row weighted Bsum in permuted order:
    ``Bsum + (w_mult - 1) * sum_{i in nnz(r)} B_i`` (adjustment_Bsum,
    poismf.c:85-123).  Uses the pre-gathered planes; padding entries are
    masked via ``vals > 0``.  Returns [n_rows_pad, k]."""
    import jax.numpy as jnp

    parts = []
    for b, bg in zip(ell.buckets, planes):
        # accumulate in the Bsum dtype (planes may be bf16)
        valid = (b.vals > 0).astype(Bsum.dtype)  # [P, R_b]
        parts.append(jnp.sum(valid[None] * bg, axis=1).T)  # [R_b, k]
    k = planes[0].shape[0] if planes else Bsum.shape[-1]
    row_b = _assemble(ell, parts, (k,), Bsum.dtype)
    return Bsum[None, :] + (w_mult - 1.0) * row_b


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def gather_planes(
    M: "Any", ell: EllMatrix, dtype: Optional[Any] = None
) -> Tuple[Any, ...]:
    """One-off per half-update: gather the FIXED matrix's rows for every
    nonzero into planar per-bucket tensors ``bg[k, P, R_b]``.

    This is the ONLY gather on the critical path; every subsequent solver
    pass streams these planes linearly.  ``dtype=jnp.bfloat16`` halves the
    dominant HBM traffic of the whole fit (values promote back to f32 inside
    the fused loops, so only the stored B values lose mantissa bits)."""
    return _gather_planes_jit(M, ell, _dtype_name(dtype))


def _dtype_name(dtype) -> Optional[str]:
    return None if dtype is None else str(np.dtype(dtype))


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _gather_planes_compiled(dtype_name):
    import jax

    def run(M, ell):
        import jax.numpy as jnp

        # Cast BEFORE gathering: the gather then writes (and the transpose
        # reads+writes) half the bytes, and the cast commutes with the
        # gather exactly (elementwise), so results are bitwise identical.
        # Isolated measurement (scripts/gather_bench.py, v5e, k=50, 2.5 GB
        # of bf16 planes): f32-gather-then-cast 751 ms, bf16-first 174 ms.
        # End-to-end the tncg fit is UNCHANGED (A/B same-day: 40.1 s vs
        # 40.5 s median) — the fit is solver-pass-bound and the async
        # dispatch stream absorbs the standalone gather's latency — so this
        # is kept for the lower peak HBM footprint, not for fit wall time.
        if dtype_name is not None:
            M = M.astype(dtype_name)
        planes = []
        for b in ell.buckets:
            bg = jnp.take(M, b.cols, axis=0)  # [R_b, P, k]
            bg = jnp.transpose(bg, (2, 1, 0))  # [k, P, R_b]
            planes.append(bg)
        return tuple(planes)

    return jax.jit(run)


def _gather_planes_jit(M, ell, dtype_name):
    return _gather_planes_compiled(dtype_name)(M, ell)


def _self_mask(b: EllBucket):
    """[R_b] bool: bucket rows whose slot IS their own primary row (i.e.
    everything except long-row extension chunks and padding rows).  Cheap
    in-graph elementwise compare; fuses into whatever consumes it."""
    import jax.numpy as jnp

    return b.src == (b.offset + jnp.arange(b.n_rows, dtype=b.src.dtype))


def _bucket_x(A_perm, b: EllBucket):
    """The factor rows a bucket reads: its own contiguous slot range for
    pure-primary buckets; for mixed buckets with static ``ext`` metadata,
    the same contiguous slice with extension rows overwritten by their
    primary's vector (and padding rows zeroed — the zero-tail row they
    used to read is identically zero); otherwise the full ``src`` gather
    (compact sub-ELLs / sharded per-device ELLs)."""
    import jax.numpy as jnp
    from jax import lax

    if b.src is None:
        return lax.dynamic_slice_in_dim(A_perm, b.offset, b.n_rows, axis=0)
    if b.ext is not None:
        base = lax.dynamic_slice_in_dim(A_perm, b.offset, b.n_rows, axis=0)
        base = jnp.where(_self_mask(b)[:, None], base, 0)
        prim = jnp.take(A_perm, b.ext_src, axis=0)
        return base.at[b.ext].set(prim)
    return jnp.take(A_perm, b.src, axis=0)


def _assemble(ell: EllMatrix, pieces: Sequence[Any], shape, dtype):
    """Per-bucket row outputs -> [n_rows_ell, ...].  Pure-primary buckets
    write their contiguous slot range; mixed buckets with static ``ext``
    metadata write their primary rows as a contiguous slice and
    scatter-ADD only the (few) extension-chunk rows into their primary
    slots; mixed buckets without it scatter-ADD the whole bucket through
    ``src``.  All scatter-adds run AFTER every slice write (extension
    targets live inside other buckets' slot ranges — the long-row heads)."""
    import jax.numpy as jnp
    from jax import lax

    out = jnp.zeros((ell.n_rows_ell,) + shape, dtype=dtype)
    deferred = []  # (target slots, updates) applied after all slices
    for b, part in zip(ell.buckets, pieces):
        if b.src is None:
            out = lax.dynamic_update_slice(
                out, part.astype(dtype), (b.offset,) + (0,) * len(shape)
            )
        elif b.ext is not None:
            sm = _self_mask(b).reshape((-1,) + (1,) * len(shape))
            base = jnp.where(sm, part.astype(dtype), 0)
            out = lax.dynamic_update_slice(
                out, base, (b.offset,) + (0,) * len(shape)
            )
            deferred.append(
                (b.ext_src, jnp.take(part, b.ext, axis=0).astype(dtype))
            )
        else:
            deferred.append((b.src, part.astype(dtype)))
    for idx, upd in deferred:
        out = out.at[idx].add(upd)
    return out


PRED_EPS = 1e-30

# Pallas fused-kernel backend: "auto" (on for TPU backends), "on",
# "interpret" (for CPU correctness tests), or "off" (pure jax.numpy).
import os as _os

_PALLAS_MODE = _os.environ.get("POISMF_PALLAS", "auto")


def _pallas_state():
    if _PALLAS_MODE == "off":
        return None
    if _PALLAS_MODE == "interpret":
        return "interpret"
    if _PALLAS_MODE == "on":
        return "compiled"
    import jax

    return "compiled" if jax.default_backend() == "tpu" else None


def _bucket_data_fgh(b: EllBucket, bg, A_T, w_mult: float,
                     want_pred: bool = True):
    """One bucket's fused data terms; Pallas single-plane-read kernel on TPU,
    jnp fallback elsewhere.  Returns (neg_llk [R], grad [R,k], diag [R,k],
    w2 [P,R], pred [P,R] or None).  ``pred`` is the raw (unfloored)
    prediction plane consumed by the ray line search (see f_gtd_ray_ell);
    ``want_pred=False`` skips its HBM write (only CG's fused non-ray
    mode passes False; both ray solvers read it)."""
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and bg.dtype != jnp.float64:
        from . import pallas_kernels as pk

        nll, grad, diag, w2, pred = pk.fgh_bucket(
            bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
            w_mult=float(w_mult), want_pred=want_pred,
            interpret=(mode == "interpret"),
        )
        dt = A_T.dtype
        return (nll.astype(dt), grad.T.astype(dt), diag.T.astype(dt),
                w2.astype(dt),
                pred.astype(dt) if want_pred else None)

    pred = jnp.sum(bg * A_T[:, None, :], axis=0)  # [P, R_b]
    safe = jnp.maximum(pred, PRED_EPS)
    valid = b.vals > 0
    logt = jnp.where(valid, b.vals * jnp.log(safe), 0.0)
    w = jnp.where(valid, b.vals / safe, 0.0)
    w2 = jnp.where(valid, w_mult * b.vals / (safe * safe), 0.0)
    return (
        -jnp.sum(logt, axis=0),
        -jnp.sum(w[None] * bg, axis=1).T,
        jnp.sum(w2[None] * (bg * bg), axis=1).T,
        w2,
        pred if want_pred else None,
    )


def _bucket_data_f(b: EllBucket, bg, A_T):
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and bg.dtype != jnp.float64:
        from . import pallas_kernels as pk

        nll = pk.f_bucket(
            bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
            interpret=(mode == "interpret"),
        )
        return nll.astype(A_T.dtype)
    pred = jnp.sum(bg * A_T[:, None, :], axis=0)
    logt = jnp.where(b.vals > 0, b.vals * jnp.log(pred), 0.0)
    return -jnp.sum(logt, axis=0)


def _bucket_data_f_gtd(b: EllBucket, bg, A_T, bd_b):
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and bg.dtype != jnp.float64:
        from . import pallas_kernels as pk

        nll, gud = pk.f_gtd_bucket(
            bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
            bd_b.astype(jnp.float32), interpret=(mode == "interpret"),
        )
        return nll.astype(A_T.dtype), gud.astype(A_T.dtype)
    pred = jnp.sum(bg * A_T[:, None, :], axis=0)  # [P, R_b]
    logt = jnp.where(b.vals > 0, b.vals * jnp.log(pred), 0.0)
    nll = -jnp.sum(logt, axis=0)
    ratio = jnp.where(
        b.vals > 0, b.vals * bd_b / jnp.maximum(pred, PRED_EPS), 0.0
    )
    gud = jnp.sum(ratio, axis=0)
    return nll, gud


def bdot_ell(D_perm, planes: Sequence[Any], ell: EllMatrix):
    """Per-bucket ``<B_col, d_row>`` planes [P, R_b] for a direction D_perm -
    computed once per line search (see poisson_bdot)."""
    import jax.numpy as jnp

    out = []
    for b, bg in zip(ell.buckets, planes):
        D_T = _bucket_x(D_perm, b).T  # [k, R_b]
        out.append(jnp.sum(bg * D_T[:, None, :], axis=0))
    return tuple(out)


def f_gtd_ell(
    A_perm,
    D_perm,
    bds,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """Objective and directional derivative ``g(trial) . d`` per row in one
    plane sweep (ELL twin of objective.poisson_f_gtd)."""
    import jax.numpy as jnp

    dtype = A_perm.dtype
    nlls, guds = [], []
    for b, bg, bd_b in zip(ell.buckets, planes, bds):
        A_T = _bucket_x(A_perm, b).T
        nll, gud = _bucket_data_f_gtd(b, bg, A_T, bd_b)
        nlls.append(nll)
        guds.append(gud)
    nll = _assemble(ell, nlls, (), dtype)
    gud = _assemble(ell, guds, (), dtype)
    from .objective import combine_f_gtd

    return combine_f_gtd(nll, gud, A_perm, D_perm, Bsum, l2_reg, w_mult,
                         l2_in_f)


def _bucket_data_f_gtd_fused(b: EllBucket, bg, A_T, D_T):
    """One bucket's (f, g.d) data terms with the ``<B, d>`` factors computed
    from the in-register bg block — no hoisted bd plane (see
    pallas_kernels.f_gtd_fused_bucket)."""
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and bg.dtype != jnp.float64:
        from . import pallas_kernels as pk

        nll, gud = pk.f_gtd_fused_bucket(
            bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
            D_T.astype(jnp.float32), interpret=(mode == "interpret"),
        )
        return nll.astype(A_T.dtype), gud.astype(A_T.dtype)
    pred = jnp.sum(bg * A_T[:, None, :], axis=0)  # [P, R_b]
    bd = jnp.sum(bg * D_T[:, None, :], axis=0)
    logt = jnp.where(b.vals > 0, b.vals * jnp.log(pred), 0.0)
    nll = -jnp.sum(logt, axis=0)
    ratio = jnp.where(
        b.vals > 0, b.vals * bd / jnp.maximum(pred, PRED_EPS), 0.0
    )
    gud = jnp.sum(ratio, axis=0)
    return nll, gud


def f_gtd_fused_ell(
    A_perm,
    D_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """Objective and directional derivative ``g(trial) . d`` per row in one
    plane sweep with ``<B, d>`` computed in-register — the bd-plane-free
    twin of :func:`f_gtd_ell`.  RETAINED FOR TESTS/REFERENCE: since the
    round-4 ray-search restore no solver calls this (the ray kernels read
    cached px/pd planes instead); the kernel-parity tests keep it honest.  The kernels are HBM-bound, so the second
    k-deep dot per slot is free while the hoisted-bd scheme cost a full
    extra plane sweep per line search (bdot) plus 4 B/slot per trial."""
    import jax.numpy as jnp

    dtype = A_perm.dtype
    nlls, guds = [], []
    for b, bg in zip(ell.buckets, planes):
        A_T = _bucket_x(A_perm, b).T
        D_T = _bucket_x(D_perm, b).T
        nll, gud = _bucket_data_f_gtd_fused(b, bg, A_T, D_T)
        nlls.append(nll)
        guds.append(gud)
    nll = _assemble(ell, nlls, (), dtype)
    gud = _assemble(ell, guds, (), dtype)
    from .objective import combine_f_gtd

    return combine_f_gtd(nll, gud, A_perm, D_perm, Bsum, l2_reg, w_mult,
                         l2_in_f)


def f_gtd_multi_ell(
    alphas,
    X_perm,
    D_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """COMPLETE (f, g(trial).d) at C projected-trial steps
    ``max(0, x + alphas[c]*d)`` in ONE plane stream per bucket — the
    round-3.5 projected-trial TNCG line search's multi-candidate round,
    RETAINED FOR TESTS/REFERENCE only: the projected search was reverted
    on quality evidence (see solvers/tncg.py module doc) and no solver
    reaches this kernel anymore (see
    pallas_kernels.f_gtd_multi_bucket).  ``alphas`` [C, n_rows_ell] ->
    (f [C, n_rows_ell], gtd [C, n_rows_ell]); linear/l2/Bsum terms folded
    in-kernel on the primary buckets (extension buckets contribute data
    terms only).  Same inf/nan poisoning as the single-trial kernels."""
    import jax.numpy as jnp

    C = alphas.shape[0]
    k = X_perm.shape[1]
    dtype = X_perm.dtype
    mode = _pallas_state()
    use_pk = (
        mode is not None
        and planes
        and planes[0].dtype != jnp.float64
        and dtype != jnp.float64
    )
    if use_pk:
        from . import pallas_kernels as pk

        fs, gs = [], []
        for b, bg in zip(ell.buckets, planes):
            X_T = _bucket_x(X_perm, b).T.astype(jnp.float32)
            D_T = _bucket_x(D_perm, b).T.astype(jnp.float32)
            al_b = _bucket_x(alphas.T, b).T.astype(jnp.float32)  # [C, R_b]
            if Bsum.ndim == 1:
                bsum_b = jnp.broadcast_to(
                    Bsum.astype(jnp.float32)[:, None], X_T.shape
                )
            else:
                bsum_b = _bucket_x(Bsum, b).T.astype(jnp.float32)
            f_b, g_b = pk.f_gtd_multi_bucket(
                bg, b.vals.astype(jnp.float32), X_T, D_T, al_b, bsum_b,
                jnp.asarray(l2_reg, dtype=jnp.float32),
                w_mult=float(w_mult),
                l2_in_f=l2_in_f, fold_linear=b.src is None,
                interpret=(mode == "interpret"),
            )
            fs.append(f_b)
            gs.append(g_b)
        f_out, g_out = [], []
        for c in range(C):
            f_out.append(_assemble(ell, [p[c] for p in fs], (), dtype))
            g_out.append(_assemble(ell, [p[c] for p in gs], (), dtype))
        return jnp.stack(f_out), jnp.stack(g_out)

    # jnp fallback: per-candidate data terms + the shared combine tail —
    # the independent reference the kernel parity tests compare against
    from .objective import combine_f_gtd

    f_out, g_out = [], []
    for c in range(C):
        trial = jnp.maximum(X_perm + alphas[c][:, None] * D_perm, 0.0)
        nlls, guds = [], []
        for b, bg in zip(ell.buckets, planes):
            T_T = _bucket_x(trial, b).T
            D_T = _bucket_x(D_perm, b).T
            nll, gud = _bucket_data_f_gtd_fused(b, bg, T_T, D_T)
            nlls.append(nll)
            guds.append(gud)
        nll = _assemble(ell, nlls, (), dtype)
        gud = _assemble(ell, guds, (), dtype)
        f_c, g_c = combine_f_gtd(nll, gud, trial, D_perm, Bsum, l2_reg,
                                 w_mult, l2_in_f)
        f_out.append(f_c)
        g_out.append(g_c)
    return jnp.stack(f_out), jnp.stack(g_out)


def _bucket_data_ray(b: EllBucket, px, pd, a_b):
    """One bucket's ray-trial data terms from cached prediction planes:
    ``pred_t = px + alpha * pd`` (exact while the step stays within the
    first bound crossing — the reference's stepMax/getptc xbnd contract,
    tnc.c:795,1861-1864).  No [k,P,R] plane read."""
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and px.dtype != jnp.float64:
        from . import pallas_kernels as pk

        nll, gud = pk.ray_bucket(
            px.astype(jnp.float32), pd.astype(jnp.float32),
            b.vals.astype(jnp.float32), a_b.astype(jnp.float32),
            interpret=(mode == "interpret"),
        )
        return nll, gud
    pred = px + a_b * pd  # [P, R_b] (a_b broadcasts from [1, R_b])
    valid = b.vals > 0
    logt = jnp.where(valid, b.vals * jnp.log(pred), 0.0)
    nll = -jnp.sum(logt, axis=0)
    ratio = jnp.where(
        valid, b.vals * pd / jnp.maximum(pred, PRED_EPS), 0.0
    )
    gud = jnp.sum(ratio, axis=0)
    return nll, gud


def _bucket_data_ray_multi(b: EllBucket, px, pd, a_b):
    """One bucket's f-only ray data terms at C candidate steps in ONE
    px/pd/vals stream (see pallas_kernels.rayf_multi_bucket).  ``a_b``
    [C, R_b] -> neg_llk [C, R_b]."""
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and px.dtype != jnp.float64:
        from . import pallas_kernels as pk

        return pk.rayf_multi_bucket(
            px.astype(jnp.float32), pd.astype(jnp.float32),
            b.vals.astype(jnp.float32), a_b.astype(jnp.float32),
            interpret=(mode == "interpret"),
        )
    pred = px[None] + a_b[:, None, :] * pd[None]  # [C, P, R_b]
    valid = (b.vals > 0)[None]
    logt = jnp.where(valid, b.vals[None] * jnp.log(pred), 0.0)
    return -jnp.sum(logt, axis=1)


def f_ray_multi_ell(
    alphas,
    coef,
    pxs: Sequence[Any],
    bds: Sequence[Any],
    ell: EllMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """Trial objective at C candidate steps along the ray in ONE plane
    stream per bucket — CG's fixed backtracking sequence (x0.25 per
    rejection, nonnegcg.c:290-327) lets one round evaluate the next C
    candidates for the same px/pd/vals bandwidth as one.  ``alphas``
    [C, n_rows_ell] -> f [C, n_rows_ell] (same poisoning semantics as the
    single-candidate ray)."""
    import jax.numpy as jnp

    from .objective import combine_f_ray

    C = alphas.shape[0]
    dtype = alphas.dtype
    per_bucket = []
    for b, px, pd in zip(ell.buckets, pxs, bds):
        a_b = _bucket_x(alphas.T, b).T  # [C, R_b] (src-aware long rows)
        per_bucket.append(_bucket_data_ray_multi(b, px, pd, a_b))
    fs = []
    for c in range(C):
        nll_c = _assemble(ell, [n[c] for n in per_bucket], (), dtype)
        fs.append(combine_f_ray(nll_c, alphas[c], coef, l2_reg, w_mult,
                                l2_in_f))
    return jnp.stack(fs)


def _bucket_data_raygtd_multi(b: EllBucket, px, pd, a_b):
    """One bucket's (f, g.d) ray data terms at C candidate steps in ONE
    px/pd/vals stream (see pallas_kernels.raygtd_multi_bucket).  ``a_b``
    [C, R_b] -> (neg_llk [C, R_b], gud [C, R_b])."""
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and px.dtype != jnp.float64:
        from . import pallas_kernels as pk

        return pk.raygtd_multi_bucket(
            px.astype(jnp.float32), pd.astype(jnp.float32),
            b.vals.astype(jnp.float32), a_b.astype(jnp.float32),
            interpret=(mode == "interpret"),
        )
    pred = px[None] + a_b[:, None, :] * pd[None]  # [C, P, R_b]
    valid = (b.vals > 0)[None]
    logt = jnp.where(valid, b.vals[None] * jnp.log(pred), 0.0)
    nll = -jnp.sum(logt, axis=1)
    ratio = jnp.where(
        valid, b.vals[None] * pd[None] / jnp.maximum(pred, PRED_EPS), 0.0
    )
    gud = jnp.sum(ratio, axis=1)
    return nll, gud


def f_gtd_ray_multi_ell(
    alphas,
    coef,
    pxs: Sequence[Any],
    bds: Sequence[Any],
    ell: EllMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """COMPLETE (f, g(trial).d) at C candidate steps along the ray
    ``x + alpha*d`` in ONE px/pd/vals stream per bucket — the TNCG line
    search's multi-candidate round with every step capped at the first
    bound crossing (the reference's stepMax contract, tnc.c:795), so the
    trial is EXACTLY the ray point and its predictions the cached-plane
    linear combination.  ``alphas`` [C, n_rows_ell] ->
    (f [C, n_rows_ell], gtd [C, n_rows_ell]); same poisoning semantics as
    :func:`f_gtd_ray_ell`."""
    import jax.numpy as jnp

    from .objective import combine_f_gtd_ray

    C = alphas.shape[0]
    dtype = alphas.dtype
    per_bucket = []
    for b, px, pd in zip(ell.buckets, pxs, bds):
        a_b = _bucket_x(alphas.T, b).T  # [C, R_b] (src-aware long rows)
        per_bucket.append(_bucket_data_raygtd_multi(b, px, pd, a_b))
    fs, gs = [], []
    for c in range(C):
        nll_c = _assemble(ell, [n[c] for n, _ in per_bucket], (), dtype)
        gud_c = _assemble(ell, [g[c] for _, g in per_bucket], (), dtype)
        f_c, g_c = combine_f_gtd_ray(nll_c, gud_c, alphas[c], coef,
                                     l2_reg, w_mult, l2_in_f)
        fs.append(f_c)
        gs.append(g_c)
    return jnp.stack(fs), jnp.stack(gs)


def f_gtd_ray_ell(
    alpha,
    coef,
    pxs: Sequence[Any],
    bds: Sequence[Any],
    ell: EllMatrix,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """Line-search trial objective + directional derivative along the ray
    ``x + alpha*d`` WITHOUT re-reading the [k,P,R] planes and WITHOUT any
    [R,k] work: predictions are linear in the factor vector, so
    ``pred(trial) = px + alpha*pd`` with ``px`` cached by fgh_ell and
    ``pd`` from bdot_ell; the linear/l2 terms are exact quadratics in
    alpha via the per-row ``coef`` from
    :func:`poismf_tpu.ops.objective.ray_coef` (computed once per line
    search).  Exact as long as the step never crosses a bound (the solver
    caps alpha at the reference's stepMax distance, tnc.c:795).  Per-trial
    traffic: three [P,R] f32 streams + O(R) scalars vs a full plane sweep
    — 8-9x less at k=50 bf16.  ``alpha`` is the per-row step
    [n_rows_ell]."""
    dtype = alpha.dtype
    a_col = alpha[:, None]
    nlls, guds = [], []
    for b, px, pd in zip(ell.buckets, pxs, bds):
        a_b = _bucket_x(a_col, b).T  # [1, R_b] (src-aware for long rows)
        nll, gud = _bucket_data_ray(b, px, pd, a_b)
        nlls.append(nll)
        guds.append(gud)
    nll = _assemble(ell, nlls, (), dtype)
    gud = _assemble(ell, guds, (), dtype)
    from .objective import combine_f_gtd_ray

    return combine_f_gtd_ray(nll, gud, alpha, coef, l2_reg, w_mult,
                             l2_in_f)


def _bucket_data_hvp(bg, w2, V_T):
    import jax.numpy as jnp

    mode = _pallas_state()
    if mode is not None and bg.dtype != jnp.float64:
        from . import pallas_kernels as pk

        out = pk.hvp_bucket(
            bg, w2.astype(jnp.float32), V_T.astype(jnp.float32),
            interpret=(mode == "interpret"),
        )
        return out.T.astype(V_T.dtype)
    bv = jnp.sum(bg * V_T[:, None, :], axis=0)  # [P, R_b]
    return jnp.sum((w2 * bv)[None] * bg, axis=1).T


def fgh_ell(
    A_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
    want_px: bool = True,
):
    """Fused f / grad / HVP-weights / Hessian-diagonal over all buckets.
    ``l2_in_f=False`` omits the l2 penalty from f only, matching the
    reference TNCG objective calc_fun_and_grad (poismf.c:242-273) whose f
    lacks the penalty its own gradient carries.

    ``A_perm``: [n_rows_pad, k] in permuted row order.  ``Bsum`` is [k]
    (shared) or [n_rows_pad, k] (per-row, ALREADY permuted).  Returns
    ``(f [R], g [R,k], w2 (per-bucket [P,R_b] tuple), diag [R,k],
    px (per-bucket raw prediction planes, or None))`` — ``px`` feeds ray
    line searches (both TNCG and CG pass ``want_px=True``); ``want_px=
    False`` (CG's fused non-ray mode) skips the plane's HBM write
    entirely.

    Same math as :func:`poismf_tpu.ops.objective.poisson_fgh` (see the
    reference's calc_fun_and_grad, poismf.c:242-273), reorganized so every
    tensor is read linearly.
    """
    import jax.numpy as jnp

    k = A_perm.shape[1]
    dtype = A_perm.dtype
    neg_llks, grads, diags, w2s, preds = [], [], [], [], []
    for b, bg in zip(ell.buckets, planes):
        A_T = _bucket_x(A_perm, b).T  # [k, R_b]
        nll, gd, dd, w2, pred = _bucket_data_fgh(b, bg, A_T, w_mult,
                                                 want_pred=want_px)
        neg_llks.append(nll)  # [R_b]
        grads.append(gd)  # [R_b, k]
        diags.append(dd)  # [R_b, k]
        w2s.append(w2)
        if want_px:
            preds.append(pred)

    neg_llk = _assemble(ell, neg_llks, (), dtype)
    grad_data = _assemble(ell, grads, (k,), dtype)
    diag_data = _assemble(ell, diags, (k,), dtype)

    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
        grad_data = w_mult * grad_data
    if Bsum.ndim == 1:
        lin = A_perm @ Bsum
        g_lin = Bsum[None, :]
    else:
        lin = jnp.sum(A_perm * Bsum, axis=-1)
        g_lin = Bsum
    if l2_in_f:
        lin = lin + l2_reg * jnp.sum(A_perm * A_perm, axis=-1)
    f = lin + neg_llk
    g = g_lin + 2.0 * l2_reg * A_perm + grad_data
    diag = 2.0 * l2_reg + diag_data
    return f, g, tuple(w2s), diag, (tuple(preds) if want_px else None)


def f_ell(
    A_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    l2_in_f: bool = True,
):
    """Objective only (line-search trials).  No eps floor: a non-positive
    prediction at a positive count poisons the row with +inf, matching the
    reference's Inf-rejected line search (nonnegcg.c:223-226, 308).
    ``l2_in_f=False`` matches calc_fun_and_grad's f (see fgh_ell)."""
    import jax.numpy as jnp

    dtype = A_perm.dtype
    neg_llks = []
    for b, bg in zip(ell.buckets, planes):
        A_T = _bucket_x(A_perm, b).T
        neg_llks.append(_bucket_data_f(b, bg, A_T))
    neg_llk = _assemble(ell, neg_llks, (), dtype)
    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
    if Bsum.ndim == 1:
        lin = A_perm @ Bsum
    else:
        lin = jnp.sum(A_perm * Bsum, axis=-1)
    if l2_in_f:
        lin = lin + l2_reg * jnp.sum(A_perm * A_perm, axis=-1)
    return lin + neg_llk


def fg_ell(
    A_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    Bsum,
    l2_reg: float,
    w_mult: float = 1.0,
    want_px: bool = True,
):
    """Objective + gradient only (no Hessian data) — the CG solver's
    evaluation (calc_fun_single / calc_grad_single, poismf.c:194-223,
    batched).  One streaming read of the planes; also returns the raw
    per-bucket prediction planes ``px`` that seed the CG ray line search
    (f_gtd_ray_ell): ``pred(x + a*d) = px + a*pd``.  ``want_px=False``
    (fused, non-ray callers) returns px=None and skips the pallas
    prediction-plane write (a real HBM output XLA cannot eliminate)."""
    import jax.numpy as jnp

    k = A_perm.shape[1]
    dtype = A_perm.dtype
    neg_llks, grads, preds = [], [], []
    mode = _pallas_state()
    for b, bg in zip(ell.buckets, planes):
        A_T = _bucket_x(A_perm, b).T
        if mode is not None and bg.dtype != jnp.float64:
            from . import pallas_kernels as pk

            nll, gd, pred = pk.fg_bucket(
                bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
                w_mult=1.0, want_pred=want_px,
                interpret=(mode == "interpret"),
            )
            neg_llks.append(nll.astype(dtype))
            grads.append(gd.T.astype(dtype))
            if want_px:
                preds.append(pred.astype(dtype))
            continue
        pred = jnp.sum(bg * A_T[:, None, :], axis=0)
        safe = jnp.maximum(pred, PRED_EPS)
        valid = b.vals > 0
        # unfloored log: trial-grade f with inf/nan poisoning at pred <= 0
        # (nonnegcg.c:223-226, 308); the gradient weights keep the floor
        logt = jnp.where(valid, b.vals * jnp.log(pred), 0.0)
        w = jnp.where(valid, b.vals / safe, 0.0)
        neg_llks.append(-jnp.sum(logt, axis=0))
        grads.append(-jnp.sum(w[None] * bg, axis=1).T)
        if want_px:
            preds.append(pred)
    neg_llk = _assemble(ell, neg_llks, (), dtype)
    grad_data = _assemble(ell, grads, (k,), dtype)
    if w_mult != 1.0:
        neg_llk = w_mult * neg_llk
        grad_data = w_mult * grad_data
    if Bsum.ndim == 1:
        lin = A_perm @ Bsum
        g_lin = Bsum[None, :]
    else:
        lin = jnp.sum(A_perm * Bsum, axis=-1)
        g_lin = Bsum
    f = lin + l2_reg * jnp.sum(A_perm * A_perm, axis=-1) + neg_llk
    g = g_lin + 2.0 * l2_reg * A_perm + grad_data
    return f, g, (tuple(preds) if want_px else None)


def pg_grad_ell(
    A_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
):
    """``sum_i (x_i / pred_i) * B_i`` per row — the PG data term
    (calc_grad_pgd, poismf.c:126-133, batched, gather-free)."""
    import jax.numpy as jnp

    k = A_perm.shape[1]
    parts = []
    mode = _pallas_state()
    for b, bg in zip(ell.buckets, planes):
        A_T = _bucket_x(A_perm, b).T
        if mode is not None and bg.dtype != jnp.float64:
            from . import pallas_kernels as pk

            gd = pk.pg_bucket(
                bg, b.vals.astype(jnp.float32), A_T.astype(jnp.float32),
                interpret=(mode == "interpret"),
            )
            parts.append(gd.T.astype(A_perm.dtype))
            continue
        pred = jnp.sum(bg * A_T[:, None, :], axis=0)
        w = jnp.where(
            b.vals > 0, b.vals / jnp.maximum(pred, PRED_EPS), 0.0
        )
        parts.append(jnp.sum(w[None] * bg, axis=1).T)
    return _assemble(ell, parts, (k,), A_perm.dtype)


def hvp_ell(
    V_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    w2s: Sequence[Any],
    l2_reg: float,
):
    """Exact Hessian-vector product with cached curvature weights ``w2``:
    ``(H v)_r = 2*l2*v_r + sum_i w2_ri * <B_i, v_r> * B_i``."""
    import jax.numpy as jnp

    k = V_perm.shape[1]
    outs = []
    for b, bg, w2 in zip(ell.buckets, planes, w2s):
        V_T = _bucket_x(V_perm, b).T
        outs.append(_bucket_data_hvp(bg, w2, V_T))  # [R_b, k]
    data = _assemble(ell, outs, (k,), V_perm.dtype)
    return 2.0 * l2_reg * V_perm + data


# ---------------------------------------------------------------------------
# Inner-CG <B,d> accumulation (ROADMAP #0): the TNCG line search's pd plane
# is  <B, d> = <B, sum_i alpha_i p_i> = sum_i alpha_i <B, p_i>,  and every
# inner-CG HVP already computes <B, p_i> in registers — writing it out
# (+4 B/slot) and folding  pd += alpha_i * bv_i  (12 B/slot) replaces the
# standalone bdot sweep (a FULL plane read, ~k*itemsize+8 B/slot) whenever
# the inner-CG cap is small (the cascade's max_cg=3 bulk rounds).  The
# solver keeps a first-iteration (d1, bd1) snapshot for rows whose final CG
# direction must be discarded (feasible-cone violation / junk fallback) —
# d1 = alpha_0 * p_0 provably never violates the cone, so NO gather/scatter
# correction pass is ever needed (see solvers/tncg.py).
# ---------------------------------------------------------------------------


def hvp_bv_ell(
    V_perm,
    planes: Sequence[Any],
    ell: EllMatrix,
    w2s: Sequence[Any],
    l2_reg: float,
):
    """:func:`hvp_ell` that also returns the per-bucket ``<B, v>`` planes
    ([P, R_b] f32 tuple, same layout as :func:`bdot_ell`'s output)."""
    import jax.numpy as jnp

    k = V_perm.shape[1]
    outs, bvs = [], []
    mode = _pallas_state()
    for b, bg, w2 in zip(ell.buckets, planes, w2s):
        V_T = _bucket_x(V_perm, b).T
        if mode is not None and bg.dtype != jnp.float64:
            from . import pallas_kernels as pk

            out, bv = pk.hvp_bv_bucket(
                bg, w2.astype(jnp.float32), V_T.astype(jnp.float32),
                interpret=(mode == "interpret"),
            )
            outs.append(out.T.astype(V_T.dtype))
            bvs.append(bv.astype(V_T.dtype))
        else:
            bv = jnp.sum(bg * V_T[:, None, :], axis=0)  # [P, R_b]
            outs.append(jnp.sum((w2 * bv)[None] * bg, axis=1).T)
            bvs.append(bv)
    data = _assemble(ell, outs, (k,), V_perm.dtype)
    return 2.0 * l2_reg * V_perm + data, tuple(bvs)


def bd_zeros_ell(ell: EllMatrix, dtype=None):
    """Zeroed per-bucket [P, R_b] planes (the pd accumulator's init)."""
    import jax.numpy as jnp

    return tuple(
        jnp.zeros(b.vals.shape, dtype=dtype or jnp.float32)
        for b in ell.buckets
    )


def bd_axpy_ell(bds: Sequence[Any], m, bvs: Sequence[Any],
                ell: EllMatrix):
    """``bd += m[row] * bv`` per bucket, with the per-row multiplier ``m``
    ([n_rows_ell]) read through each bucket's source mapping (extension
    chunks take their primary row's multiplier, padding rows 0)."""
    out = []
    for b, bd, bv in zip(ell.buckets, bds, bvs):
        m_b = _bucket_x(m[:, None], b)[:, 0]  # [R_b]
        out.append(bd + m_b[None, :] * bv)
    return tuple(out)


def bd_select_ell(use_first, bd1s: Sequence[Any], bds: Sequence[Any],
                  ell: EllMatrix):
    """Per-row plane select: rows flagged in ``use_first`` ([n_rows_ell]
    bool) take their ``bd1`` plane slice, the rest keep ``bd``."""
    import jax.numpy as jnp

    out = []
    uf = use_first.astype(jnp.float32)
    for b, bd1, bd in zip(ell.buckets, bd1s, bds):
        u_b = _bucket_x(uf[:, None], b)[:, 0] > 0.5  # [R_b]
        out.append(jnp.where(u_b[None, :], bd1, bd))
    return tuple(out)


# ---------------------------------------------------------------------------
# Active-set compaction: after a few outer iterations of a warm-started
# solve, only a small tail of rows remains active; a compact sub-ELL with
# STATIC capacities (1/8 of each bucket, so one extra compiled program)
# lets the solver finish the tail at a fraction of the per-pass cost.
# This is the batched answer to the reference's per-row adaptive iteration
# counts (each OpenMP thread simply stops on converged rows).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CompactPlan:
    """Static capacities of the compact sub-ELL (fixed per parent ELL so the
    stage-2 solver compiles exactly once)."""

    caps: Tuple[int, ...]  # rows per compact bucket
    offsets: Tuple[int, ...]  # compact slot offset per bucket
    n_slots: int  # total compact slots (incl. zero tail)
    denom: int  # capacity divisor used


def plan_compact(ell: EllMatrix, denom: int = 8) -> CompactPlan:
    caps = []
    offsets = []
    off = 0
    for b in ell.buckets:
        cap = _ceil_to(max(b.n_rows // denom, 1), ROW_TILE)
        offsets.append(off)
        caps.append(cap)
        off += cap
    return CompactPlan(
        caps=tuple(caps), offsets=tuple(offsets),
        n_slots=off + ROW_TILE, denom=denom,
    )


def _ladder_ceil(want: int) -> int:
    """Smallest member of the ROW_TILE-multiple ladder {128, 256, 384, 512,
    768, 1024, 1536, ...} (1.5x spacing above 256) that is >= want."""
    if want <= ROW_TILE:
        return ROW_TILE
    v = 2 * ROW_TILE
    while v < want:
        v3 = v + v // 2  # 1.5x, a ROW_TILE multiple for v >= 2*ROW_TILE
        if v3 >= want:
            return v3
        v <<= 1
    return v


def plan_compact_from_profile(
    ell: EllMatrix,
    per_bucket_active,
    margin: float = 2.0,
    max_slot_frac: float = 0.7,
) -> Optional[CompactPlan]:
    """A compact plan sized from an OBSERVED per-bucket active-row profile
    (uniform-denominator plans reject tails whose stragglers cluster in one
    bucket — typically the long-row heads, which converge slowest).  Caps
    are ``margin`` times the observed counts, tile-rounded and clamped to
    the bucket size.  Returns None when the plan would cost more than
    ``max_slot_frac`` of the full structure's slots (not worth another
    compiled program)."""
    caps = []
    offsets = []
    off = 0
    cost = 0
    full_cost = 0
    for b, c in zip(ell.buckets, per_bucket_active):
        want = max(int(margin * int(c)), ROW_TILE)
        # quantize caps to the ROW_TILE-multiple ladder {128, 256, 384,
        # 512, 768, ...}: profiles drift a little between fits,
        # and un-quantized caps would make every drift a NEW program set
        # (compiled mid-timed-fit); snapped caps hit both the in-process
        # jit cache and the persistent XLA cache across runs, and the
        # 1.5-step ladder overshoots the profile by <= 50% above 256 (a pure pow2
        # ladder overshot 2x and pushed plans past the cost gate)
        cap = min(b.n_rows, _ladder_ceil(want))
        offsets.append(off)
        caps.append(cap)
        off += cap
        cost += cap * b.P
        full_cost += b.n_rows * b.P
    if cost >= max_slot_frac * full_cost:
        return None
    return CompactPlan(
        caps=tuple(caps), offsets=tuple(offsets),
        n_slots=off + ROW_TILE, denom=0,  # 0 marks a profile-derived plan
    )


def select_active(
    ell: EllMatrix,
    plan: CompactPlan,
    active: np.ndarray,
    row_nnz_host: np.ndarray,
    src_host: Sequence[Optional[np.ndarray]],
):
    """Host-side selection of the still-active rows into the compact layout.

    ``active`` is the [n_rows_ell] bool mask from the stage-1 solve (host).
    A bucket row is selected iff its source row (itself, or its long-row
    primary) is active.  Returns None if any bucket overflows its capacity
    (caller falls back to a full-batch continuation), else host index
    arrays for the device-side gathers:
      (sel [per bucket], src_c [per bucket or None], slot_map, row_nnz_c).
    """
    compact_of_orig = np.full(ell.n_rows_ell, plan.n_slots - 1, dtype=np.int64)
    sels = []
    selected = []  # per bucket: (idx, orig_src or None)
    slot_map = np.full(plan.n_slots, ell.n_rows_ell - 1, dtype=np.int32)
    row_nnz_c = np.zeros(plan.n_slots, dtype=np.int32)
    n_primary = 0
    # pass 1: selection, compact slot assignment for every PRIMARY row
    for b, cap, coff, srch in zip(
        ell.buckets, plan.caps, plan.offsets, src_host
    ):
        if srch is None:
            m = active[b.offset : b.offset + b.n_rows]
        else:
            m = active[srch]
        idx = np.nonzero(m)[0]
        if idx.shape[0] > cap:
            return None
        sel = np.full(cap, b.n_rows, dtype=np.int32)  # fill -> OOB (take fill)
        sel[: idx.shape[0]] = idx
        sels.append(sel)
        if srch is None:
            orig_slots = b.offset + idx.astype(np.int64)
            compact_slots = coff + np.arange(idx.shape[0], dtype=np.int64)
            compact_of_orig[orig_slots] = compact_slots
            slot_map[compact_slots] = orig_slots
            row_nnz_c[compact_slots] = row_nnz_host[orig_slots]
            n_primary += idx.shape[0]
            selected.append((idx, None))
        else:
            orig_src = srch[idx].astype(np.int64)
            own = orig_src == (b.offset + idx.astype(np.int64))
            compact_slots = coff + np.arange(idx.shape[0], dtype=np.int64)
            prim_slots = compact_slots[own]
            orig_prim = orig_src[own]
            compact_of_orig[orig_prim] = prim_slots
            slot_map[prim_slots] = orig_prim
            row_nnz_c[prim_slots] = row_nnz_host[orig_prim]
            n_primary += int(own.sum())
            selected.append((idx, orig_src))
    # pass 2: src remap through the now-complete compact slot table
    src_cs = []
    for (idx, orig_src), cap in zip(selected, plan.caps):
        if orig_src is None:
            src_cs.append(None)
        else:
            src_c = np.full(cap, plan.n_slots - 1, dtype=np.int32)
            src_c[: idx.shape[0]] = compact_of_orig[orig_src].astype(np.int32)
            src_cs.append(src_c)
    return sels, src_cs, slot_map, row_nnz_c, n_primary


def build_compact(
    ell: EllMatrix,
    plan: CompactPlan,
    sels,
    src_cs,
    slot_map,
    row_nnz_c,
    n_primary: int = 0,
) -> Tuple[EllMatrix, Any]:
    """Assemble the compact EllMatrix (device) from host selection indices.
    Edge data is gathered ON DEVICE from the parent buckets — only the small
    index arrays cross the host-device boundary.

    Traceable (callable under jit with the index arrays as traced operands).
    The compact matrix's static aux fields are all derived from the PLAN,
    never from the round's selection — ``n_rows`` in particular is pinned to
    0 so every cascade round of a given plan shares one compiled program
    (``n_rows`` only feeds the early-stop share, which compact solves
    ignore).  ``n_primary`` is accepted for API compatibility and unused."""
    import jax.numpy as jnp

    del n_primary
    buckets = []
    for b, cap, coff, sel, src_c in zip(
        ell.buckets, plan.caps, plan.offsets, sels, src_cs
    ):
        sel_d = jnp.asarray(sel)
        cols_c = jnp.take(b.cols, sel_d, axis=0, mode="fill", fill_value=0)
        vals_c = jnp.take(b.vals, sel_d, axis=1, mode="fill", fill_value=0)
        buckets.append(
            EllBucket(
                offset=coff, n_rows=cap, P=b.P, cols=cols_c, vals=vals_c,
                src=None if src_c is None else jnp.asarray(src_c),
            )
        )
    slot_map_d = jnp.asarray(slot_map)
    compact = EllMatrix(
        buckets=tuple(buckets),
        perm=slot_map_d,  # compact slot -> parent ELL slot (doubles as perm)
        inv_perm=slot_map_d,  # unused by the solver
        row_nnz_perm=jnp.asarray(row_nnz_c),
        n_rows=0,
        n_cols=ell.n_cols,
        nnz=ell.nnz,
        n_rows_pad=ell.n_rows_ell,
        n_rows_ell=plan.n_slots,
    )
    return compact, slot_map_d


def scatter_back(x_full, x_compact, slot_map, row_nnz_c):
    """Write the compact solve's rows back into the full ELL-space matrix.
    Fill slots map to the parent zero tail and carry zeros."""
    import jax.numpy as jnp

    valid = (row_nnz_c > 0)[:, None]
    return x_full.at[slot_map].set(
        jnp.where(valid, x_compact, jnp.zeros_like(x_compact))
    )


def permute_rows(M, perm):
    """M[perm] with out-of-range (sentinel) positions yielding zero rows —
    moves factor matrices between original and ELL row order."""
    import jax.numpy as jnp

    return jnp.take(M, perm, axis=0, mode="fill", fill_value=0)
