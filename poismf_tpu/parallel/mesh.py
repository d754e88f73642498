"""Multi-device data parallelism over rows via ``jax.sharding`` + shard_map.

The reference's ONLY parallelism is OpenMP ``parallel for`` over rows of a
shared-memory CSR (poismf.c:159, 296, 352; SURVEY.md section 2.4).  The
TPU-native equivalent built here:

  * a 1D ``Mesh`` over devices, axis ``"rows"``;
  * the matrix being UPDATED is sharded by row; the opposing (fixed) matrix is
    replicated - XLA inserts the all-gather over ICI when it was produced
    sharded by the previous half-step;
  * the nonzero stream is partitioned host-side by row range so each device
    owns exactly the edges of its rows (:func:`shard_counts`) - the moral
    equivalent of OpenMP giving each thread a disjoint slice of rows;
  * ``Bsum`` (colsums + l1) is computed on the replicated fixed matrix -
    no communication needed; early-stop votes are computed on the gathered
    factors at the driver level (the reference's `psum`-like reduction).

Inside ``shard_map`` each device runs the SAME batched solver as the
single-chip path on its local rows; the per-device ``while_loop`` stops as
soon as the local rows converge (no collectives inside solver loops, so
devices never wait on each other mid-solve).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse import CountsMatrix, ROW_PAD_MULTIPLE
from ..ops import objective as obj
from ..train import FitParams

AXIS = "rows"


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (AXIS,))


def _ceil_to(n, m):
    return ((n + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ShardedCounts:
    """Row-partitioned flat COO: device d owns rows
    [d*rows_per_shard, (d+1)*rows_per_shard).  All arrays have a leading
    device axis of size n_shards; within a shard, ``row_ids`` are LOCAL
    (0..rows_per_shard-1; padding = rows_per_shard)."""

    row_ids: jnp.ndarray  # [D, E] int32 local ids
    col_ids: jnp.ndarray  # [D, E] int32
    vals: jnp.ndarray  # [D, E] dtype
    row_nnz: jnp.ndarray  # [D, rows_per_shard] int32
    n_rows: int  # true global rows
    n_cols: int
    rows_per_shard: int
    n_shards: int

    def tree_flatten(self):
        return (self.row_ids, self.col_ids, self.vals, self.row_nnz), (
            self.n_rows, self.n_cols, self.rows_per_shard, self.n_shards,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def local_counts(self, d_row_ids, d_col_ids, d_vals, d_row_nnz
                     ) -> CountsMatrix:
        """Wrap ONE device's (squeezed) slices as a local CountsMatrix."""
        return CountsMatrix(
            row_ids=d_row_ids,
            col_ids=d_col_ids,
            vals=d_vals,
            row_nnz=d_row_nnz,
            n_rows=self.rows_per_shard,
            n_cols=self.n_cols,
            nnz=int(d_row_ids.shape[0]),
        )


jax.tree_util.register_pytree_node(
    ShardedCounts, ShardedCounts.tree_flatten, ShardedCounts.tree_unflatten
)


def shard_counts(X: CountsMatrix, n_shards: int) -> ShardedCounts:
    """Host-side partition of a CountsMatrix into contiguous row ranges.

    Row ids are randomized upstream (user/item order), so equal row ranges
    also balance nnz to first order for power-law data; the per-shard edge
    arrays are padded to the max shard load."""
    rows = np.asarray(X.row_ids[: X.nnz])
    cols = np.asarray(X.col_ids[: X.nnz])
    vals = np.asarray(X.vals[: X.nnz])

    rps = _ceil_to(max(X.n_rows, 1), n_shards * ROW_PAD_MULTIPLE) // n_shards
    # shard boundaries in the row-sorted edge stream
    bounds = np.searchsorted(rows, np.arange(n_shards + 1) * rps)
    per_shard = np.diff(bounds)
    E = int(_ceil_to(max(int(per_shard.max(initial=1)), 1), 128))

    row_ids = np.full((n_shards, E), rps, dtype=np.int32)
    col_ids = np.zeros((n_shards, E), dtype=np.int32)
    data = np.zeros((n_shards, E), dtype=vals.dtype)
    row_nnz = np.zeros((n_shards, rps), dtype=np.int32)
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        m = hi - lo
        row_ids[d, :m] = rows[lo:hi] - d * rps
        col_ids[d, :m] = cols[lo:hi]
        data[d, :m] = vals[lo:hi]
        counts = np.bincount(rows[lo:hi] - d * rps, minlength=rps)
        row_nnz[d] = counts.astype(np.int32)

    return ShardedCounts(
        row_ids=jnp.asarray(row_ids),
        col_ids=jnp.asarray(col_ids),
        vals=jnp.asarray(data),
        row_nnz=jnp.asarray(row_nnz),
        n_rows=X.n_rows,
        n_cols=X.n_cols,
        rows_per_shard=rps,
        n_shards=n_shards,
    )


def pad_rows_for_mesh(M: jnp.ndarray, rows_per_shard: int, n_shards: int
                      ) -> jnp.ndarray:
    """Re-pad a factor matrix to rows_per_shard * n_shards rows."""
    target = rows_per_shard * n_shards
    if M.shape[0] == target:
        return M
    if M.shape[0] > target:
        return M[:target]
    return jnp.concatenate(
        [M, jnp.zeros((target - M.shape[0], M.shape[1]), M.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# Sharded half-update
# ---------------------------------------------------------------------------


def _local_update(p: FitParams, rows_per_shard: int, n_cols: int,
                  step_size, target_loc, fixed, Bsum,
                  row_ids, col_ids, vals, row_nnz):
    """Body executed per device: same batched solvers as single-chip, on the
    local row block."""
    X_loc = CountsMatrix(
        row_ids=row_ids[0],
        col_ids=col_ids[0],
        vals=vals[0],
        row_nnz=row_nnz[0],
        n_rows=rows_per_shard,
        n_cols=n_cols,
        nnz=int(row_ids.shape[1]),
    )
    bsum_in = Bsum
    if p.w_mult != 1.0:
        bsum_in = obj.adjusted_bsum(fixed, Bsum, X_loc, p.w_mult)

    if p.method == "pg":
        from ..solvers.pg import pg_update

        # step_size is a [2] vector: [step, div_step] (the reference halves
        # the step between the B and A halves but keeps the proximal divisor
        # from the pre-halving step, poismf.c:511,532)
        new = pg_update(
            target_loc, fixed, X_loc, bsum_in,
            jnp.asarray(p.l2_reg, dtype=target_loc.dtype),
            step_size[0].astype(target_loc.dtype),
            w_mult=p.w_mult, maxupd=p.maxupd, nnz_chunk=p.nnz_chunk,
            div_step=step_size[1].astype(target_loc.dtype),
        )
    elif p.method == "cg":
        from ..solvers.cg import cg_update

        new = cg_update(
            target_loc, fixed, X_loc, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            limit_step=p.limit_step, nnz_chunk=p.nnz_chunk,
        )
    else:
        from ..solvers.tncg import tncg_update

        new, _ = tncg_update(
            target_loc, fixed, X_loc, bsum_in,
            l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
            reuse_prev=p.reuse_prev, track_unchanged=False,
            nnz_chunk=p.nnz_chunk, max_cg=p.max_cg,
        )
    return new


def sharded_half_update(
    mesh: Mesh,
    p: FitParams,
    target: jnp.ndarray,
    fixed: jnp.ndarray,
    sx: ShardedCounts,
    fixed_n_rows: int,
    step_size,
) -> jnp.ndarray:
    """Update ``target`` (sharded by rows over the mesh) against ``fixed``
    (replicated), using the sharded nonzero stream ``sx``."""
    Bsum = obj.make_bsum(fixed, fixed_n_rows, p.l1_reg)

    body = functools.partial(_local_update, p, sx.rows_per_shard, sx.n_cols)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),               # step_size (replicated scalar)
            P(AXIS, None),     # target rows
            P(),               # fixed (replicated / all-gathered)
            P(),               # Bsum
            P(AXIS, None),     # row_ids
            P(AXIS, None),     # col_ids
            P(AXIS, None),     # vals
            P(AXIS, None),     # row_nnz
        ),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return fn(step_size, target, fixed, Bsum,
              sx.row_ids, sx.col_ids, sx.vals, sx.row_nnz)


def run_poismf_sharded(
    A: jnp.ndarray,
    B: jnp.ndarray,
    by_user: CountsMatrix,
    by_item: CountsMatrix,
    params: FitParams,
    mesh: Mesh,
    handle_interrupt: bool = True,
    callback=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Sharded alternating driver - the multi-chip twin of train.run_poismf.

    A is sharded over users, B over items; each half-step all-gathers the
    fixed side over ICI (inserted by XLA from the sharding specs).  With
    ``layout="ell"`` (the default) the per-device solvers run on the
    gather-free planar-ELL layout (see .ell_mesh); ``layout="coo"`` keeps
    the flat sorted-COO per-device path."""
    p = params.resolved()
    if p.layout == "ell":
        from .ell_mesh import run_poismf_ell_sharded

        return run_poismf_ell_sharded(
            A, B, by_user, by_item, p, mesh,
            handle_interrupt=handle_interrupt, callback=callback,
        )
    D = int(np.prod(mesh.devices.shape))
    su = shard_counts(by_user, D)
    si = shard_counts(by_item, D)

    A = pad_rows_for_mesh(A, su.rows_per_shard, D)
    B = pad_rows_for_mesh(B, si.rows_per_shard, D)
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

    try:
        for epoch in range(p.niter):
            div_step = step_size
            steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_B:
                B_old = B
                B = sharded_half_update(mesh, p, B, A, si, n_users, steps)
                if p.method == "tncg" and p.early_stop:
                    converged_B = unchanged_share(B_old, B, n_items) >= 0.95
            if p.method == "pg":
                # halved between the halves (poismf.c:532); A keeps the
                # pre-halving step in its proximal divisor (poismf.c:511)
                step_size *= 0.5
                steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_A:
                A_old = A
                A = sharded_half_update(mesh, p, A, B, su, n_items, steps)
                if p.method == "tncg" and p.early_stop:
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
