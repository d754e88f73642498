"""Row-sharded multi-device training on the planar-ELL layout.

Combines the two performance pillars: the 1D device mesh of
:mod:`.mesh` (updated matrix sharded by row, fixed matrix replicated, each
device solving its own rows with no mid-solve collectives) and the
gather-free planar-ELL hot loop of :mod:`..ops.ell`.

``shard_map`` requires every device to run the SAME program, so the
per-shard ELL layouts are unified: one bucket per nonzero-width level with
the max row count over shards (shards without rows at a level get an
all-padding bucket), and a level carries explicit ``src`` indirection if ANY
shard needs it (identity src for the others).  Shard-local columns reference
the replicated fixed matrix in ORIGINAL row order, so no cross-orientation
permutation is needed.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse import CountsMatrix
from ..ops import ell as ell_ops
from ..train import FitParams
from .mesh import AXIS, _ceil_to, pad_rows_for_mesh

ROW_TILE = ell_ops.ROW_TILE


@dataclasses.dataclass(frozen=True)
class ShardedEll:
    """Uniform per-device planar-ELL: arrays carry a leading device axis."""

    cols: Tuple[jnp.ndarray, ...]  # per level [D, Rb, P]
    vals: Tuple[jnp.ndarray, ...]  # per level [D, P, Rb]
    srcs: Tuple[Optional[jnp.ndarray], ...]  # per level [D, Rb] or None
    perm: jnp.ndarray  # [D, n_slots] local row id per slot (pad = rps)
    inv_perm: jnp.ndarray  # [D, rps] slot per local row
    row_nnz: jnp.ndarray  # [D, n_slots]
    Ps: Tuple[int, ...]
    Rbs: Tuple[int, ...]
    offsets: Tuple[int, ...]
    n_slots: int
    rps: int  # rows per shard
    n_shards: int
    n_rows: int  # true global rows
    n_cols: int

    def tree_flatten(self):
        return (
            self.cols, self.vals, self.srcs, self.perm, self.inv_perm,
            self.row_nnz,
        ), (
            self.Ps, self.Rbs, self.offsets, self.n_slots, self.rps,
            self.n_shards, self.n_rows, self.n_cols,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals, srcs, perm, inv_perm, row_nnz = children
        return cls(tuple(cols), tuple(vals), tuple(srcs), perm, inv_perm,
                   row_nnz, *aux)

    def local_ell(self, cols, vals, srcs, perm, inv_perm, row_nnz
                  ) -> ell_ops.EllMatrix:
        """Wrap ONE device's (squeezed) slices as a local EllMatrix."""
        buckets = []
        for Pw, Rb, off, c, v, s in zip(
            self.Ps, self.Rbs, self.offsets, cols, vals, srcs
        ):
            buckets.append(
                ell_ops.EllBucket(
                    offset=off, n_rows=Rb, P=Pw, cols=c[0], vals=v[0],
                    src=None if s is None else s[0],
                )
            )
        return ell_ops.EllMatrix(
            buckets=tuple(buckets),
            perm=perm[0],
            inv_perm=inv_perm[0],
            row_nnz_perm=row_nnz[0],
            n_rows=self.rps,
            n_cols=self.n_cols,
            nnz=0,
            n_rows_pad=self.rps,
            n_rows_ell=self.n_slots,
        )


jax.tree_util.register_pytree_node(
    ShardedEll, ShardedEll.tree_flatten, ShardedEll.tree_unflatten
)


def shard_ell(X: CountsMatrix, n_shards: int) -> ShardedEll:
    """Partition a CountsMatrix into contiguous row ranges and build a
    shape-unified planar-ELL per shard."""
    rows = np.asarray(X.row_ids[: X.nnz])
    cols = np.asarray(X.col_ids[: X.nnz])
    vals = np.asarray(X.vals[: X.nnz])

    rps = _ceil_to(max(X.n_rows, 1), n_shards * ROW_TILE) // n_shards
    bounds = np.searchsorted(rows, np.arange(n_shards + 1) * rps)

    locals_: List[ell_ops.EllMatrix] = []
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        locals_.append(
            ell_ops.build_ell(
                rows[lo:hi] - d * rps, cols[lo:hi], vals[lo:hi],
                n_rows=rps, n_cols=X.n_cols, n_rows_pad=rps,
                dtype=vals.dtype, to_device=False,
            )
        )

    # ---- unify levels across shards ----
    all_P = sorted({b.P for e in locals_ for b in e.buckets}, reverse=True)
    Rbs = []
    has_src = []
    for Pw in all_P:
        rb = ROW_TILE
        hs = False
        for e in locals_:
            for b in e.buckets:
                if b.P == Pw:
                    rb = max(rb, b.n_rows)
                    hs = hs or (b.src is not None)
        Rbs.append(rb)
        has_src.append(hs)
    offsets = []
    off = 0
    for rb in Rbs:
        offsets.append(off)
        off += rb
    n_slots = off + ROW_TILE

    D = n_shards
    lcols = [np.zeros((D, rb, Pw), dtype=np.int32)
             for Pw, rb in zip(all_P, Rbs)]
    lvals = [np.zeros((D, Pw, rb), dtype=vals.dtype)
             for Pw, rb in zip(all_P, Rbs)]
    lsrcs = [
        (np.full((D, rb), n_slots - 1, dtype=np.int32) if hs else None)
        for rb, hs in zip(Rbs, has_src)
    ]
    perm = np.full((D, n_slots), rps, dtype=np.int32)
    inv_perm = np.full((D, rps), n_slots - 1, dtype=np.int32)
    row_nnz = np.zeros((D, n_slots), dtype=np.int32)

    for d, e in enumerate(locals_):
        # old slot -> new slot map for this shard
        old2new = np.full(e.n_rows_ell, n_slots - 1, dtype=np.int64)
        for b in e.buckets:
            li = all_P.index(b.P)
            old2new[b.offset : b.offset + b.n_rows] = (
                offsets[li] + np.arange(b.n_rows)
            )
        for b in e.buckets:
            li = all_P.index(b.P)
            noff = offsets[li]
            lcols[li][d, : b.n_rows] = b.cols
            lvals[li][d, :, : b.n_rows] = b.vals
            if lsrcs[li] is not None:
                if b.src is None:
                    lsrcs[li][d, : b.n_rows] = (
                        noff + np.arange(b.n_rows, dtype=np.int32)
                    )
                else:
                    lsrcs[li][d, : b.n_rows] = old2new[b.src].astype(
                        np.int32
                    )
            sl = slice(noff, noff + b.n_rows)
            old_sl = slice(b.offset, b.offset + b.n_rows)
            perm[d, sl] = np.where(
                np.asarray(e.perm[old_sl]) >= rps,  # sentinel
                rps,
                np.asarray(e.perm[old_sl]),
            )
            row_nnz[d, sl] = np.asarray(e.row_nnz_perm[old_sl])
        inv_perm[d] = old2new[np.asarray(e.inv_perm)].astype(np.int32)

    return ShardedEll(
        cols=tuple(jnp.asarray(c) for c in lcols),
        vals=tuple(jnp.asarray(v) for v in lvals),
        srcs=tuple(None if s is None else jnp.asarray(s) for s in lsrcs),
        perm=jnp.asarray(perm),
        inv_perm=jnp.asarray(inv_perm),
        row_nnz=jnp.asarray(row_nnz),
        Ps=tuple(all_P),
        Rbs=tuple(Rbs),
        offsets=tuple(offsets),
        n_slots=n_slots,
        rps=rps,
        n_shards=n_shards,
        n_rows=X.n_rows,
        n_cols=X.n_cols,
    )


# ---------------------------------------------------------------------------
# Sharded half-update and driver
# ---------------------------------------------------------------------------


def _local_update_ell(p: FitParams, se: ShardedEll, plane_dtype,
                      step_size, target_loc, fixed,
                      cols, vals, srcs, perm, inv_perm, row_nnz):
    """Per-device body: permute the local row block into local-ELL order,
    run the same batched solver as the single-chip ELL path, unpermute."""
    ell = se.local_ell(cols, vals, srcs, perm, inv_perm, row_nnz)
    x = ell_ops.permute_rows(target_loc, ell.perm)
    planes = ell_ops.gather_planes(fixed, ell, plane_dtype)
    Bsum = jnp.sum(fixed, axis=0) + p.l1_reg
    bsum_in = Bsum
    if p.w_mult != 1.0:
        bsum_in = ell_ops.adjusted_bsum_ell(planes, ell, Bsum, p.w_mult)

    if p.method == "pg":
        from ..solvers.pg import pg_update_ell

        # step_size is a [2] vector: [step, div_step] (see parallel/mesh.py)
        x = pg_update_ell(
            x, planes, ell, bsum_in,
            jnp.asarray(p.l2_reg, dtype=x.dtype),
            step_size[0].astype(x.dtype),
            w_mult=p.w_mult, maxupd=p.maxupd,
            div_step=step_size[1].astype(x.dtype),
        )
    elif p.method == "cg":
        from ..solvers.cg import cg_update_ell

        x = cg_update_ell(
            x, planes, ell, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            limit_step=p.limit_step,
        )
    else:
        from ..solvers.tncg import tncg_update_ell

        x, _ = tncg_update_ell(
            x, planes, ell, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            reuse_prev=p.reuse_prev, track_unchanged=False,
        )
    return jnp.take(x, ell.inv_perm, axis=0)


def sharded_half_update_ell(
    mesh: Mesh,
    p: FitParams,
    target: jnp.ndarray,
    fixed: jnp.ndarray,
    se: ShardedEll,
    step_size,
) -> jnp.ndarray:
    import functools

    plane_dtype = None if p.plane_dtype is None else jnp.dtype(p.plane_dtype)
    body = functools.partial(_local_update_ell, p, se, plane_dtype)

    src_specs = tuple(
        P() if s is None else P(AXIS, None) for s in se.srcs
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),                                   # step_size
            P(AXIS, None),                         # target rows
            P(),                                   # fixed (replicated)
            tuple(P(AXIS, None, None) for _ in se.cols),
            tuple(P(AXIS, None, None) for _ in se.vals),
            src_specs,
            P(AXIS, None),                         # perm
            P(AXIS, None),                         # inv_perm
            P(AXIS, None),                         # row_nnz
        ),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return fn(step_size, target, fixed, se.cols, se.vals, se.srcs,
              se.perm, se.inv_perm, se.row_nnz)


def run_poismf_ell_sharded(
    A: jnp.ndarray,
    B: jnp.ndarray,
    by_user: CountsMatrix,
    by_item: CountsMatrix,
    params: FitParams,
    mesh: Mesh,
    handle_interrupt: bool = True,
    callback=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Multi-device alternating driver on the planar-ELL layout."""
    p = params.resolved()
    D = int(np.prod(mesh.devices.shape))
    su = shard_ell(by_user, D)
    si = shard_ell(by_item, D)

    A = pad_rows_for_mesh(A, su.rps, D)
    B = pad_rows_for_mesh(B, si.rps, D)
    A = jax.device_put(A, NamedSharding(mesh, P(AXIS, None)))
    B = jax.device_put(B, NamedSharding(mesh, P(AXIS, None)))

    n_users, n_items = by_user.n_rows, by_item.n_rows
    step_size = p.initial_step
    status = 0
    converged_A = converged_B = False

    def unchanged_share(old, new, n_true):
        delta = (new - old)[:n_true]
        small = jnp.sum((delta * delta).sum(axis=1) <= 1e-4)
        return float(small) / max(n_true, 1)

    early = p.early_stop and p.method == "tncg"
    try:
        for epoch in range(p.niter):
            div_step = step_size
            steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_B:
                B_old = B
                B = sharded_half_update_ell(mesh, p, B, A, si, steps)
                if early:
                    converged_B = unchanged_share(B_old, B, n_items) >= 0.95
            if p.method == "pg":
                # halved between the halves (poismf.c:532); A keeps the
                # pre-halving step in its proximal divisor (poismf.c:511)
                step_size *= 0.5
                steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_A:
                A_old = A
                A = sharded_half_update_ell(mesh, p, A, B, su, steps)
                if early:
                    converged_A = unchanged_share(A_old, A, n_users) >= 0.95
            if callback is not None:
                callback(epoch, A, B)
            if p.method == "tncg" and converged_A and converged_B:
                break
    except KeyboardInterrupt:
        status = 2
        jax.block_until_ready((A, B))
        if not handle_interrupt:
            raise
    return A, B, status
