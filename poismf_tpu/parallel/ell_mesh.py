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
import functools
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse import CountsMatrix
from ..ops import ell as ell_ops
from ..train import FitParams
from .mesh import AXIS, _ceil_to, pad_rows_for_mesh

ROW_TILE = ell_ops.ROW_TILE

# When set to a list (by tests), the sharded tncg cascade appends one
# (round, structure, active_in, active_out) tuple per round — the
# observability hook proving that passes shrink after rows converge, like
# the single-chip cascade.  POISMF_CASCADE_LOG=1 independently prints one
# stderr line per round.
CASCADE_TRACE: Optional[list] = None


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

    se = ShardedEll(
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
    # host copies of the cascade-planning metadata (cf. EllMatrix.host_aux):
    # per-device row_nnz and src indirection, so the round loop's active-row
    # selection never pulls them back off the devices
    object.__setattr__(
        se, "host_aux",
        dict(row_nnz=row_nnz, srcs=[s for s in lsrcs]),
    )
    return se


# ---------------------------------------------------------------------------
# Sharded tncg annealing cascade
#
# The multi-chip port of train._run_poismf_ell's cascade: the round loop and
# the active-row selection stay on the HOST (exactly like single-chip), but
# every round is one shard_map program over the mesh — each device compacts
# and solves ITS OWN still-active tail, so converged rows stop costing HBM
# bandwidth on every chip (the reference's per-row early exit scales with
# OpenMP threads for free, poismf.c:393-403; this is the batched equivalent).
# The fixed side's planes are gathered ONCE per half-update and stay
# device-resident across rounds.
# ---------------------------------------------------------------------------


class _MetaBucket(NamedTuple):
    offset: int
    n_rows: int
    P: int


class _MetaEll(NamedTuple):
    """Duck-typed stand-in for EllMatrix in the host-side planning helpers
    (ell_ops.plan_compact / select_active only touch bucket geometry)."""

    buckets: Tuple[_MetaBucket, ...]
    n_rows_ell: int


def _meta_ell(se: ShardedEll) -> _MetaEll:
    return _MetaEll(
        buckets=tuple(
            _MetaBucket(off, rb, Pw)
            for off, rb, Pw in zip(se.offsets, se.Rbs, se.Ps)
        ),
        n_rows_ell=se.n_slots,
    )


def _make_se_aux(se: ShardedEll) -> dict:
    from .. import train as train_mod

    meta = _meta_ell(se)
    ha = getattr(se, "host_aux", None)
    if ha is None:  # reconstructed ShardedEll: pull once
        ha = dict(
            row_nnz=np.asarray(se.row_nnz),
            srcs=[None if s is None else np.asarray(s) for s in se.srcs],
        )
    return dict(
        meta=meta,
        plans=[ell_ops.plan_compact(meta, d)
               for d in train_mod.COMPACT_DENOMS],
        row_nnz=ha["row_nnz"],
        srcs=ha["srcs"],
    )


def _prep_tncg_body(p, se: ShardedEll, plane_dtype,
                    target_loc, fixed, Bsum,
                    cols, vals, srcs, perm, inv_perm, row_nnz):
    """Once per half-update: permute the local rows into ELL order and gather
    the fixed side's planes (device-resident for every cascade round)."""
    ell = se.local_ell(cols, vals, srcs, perm, inv_perm, row_nnz)
    x = ell_ops.permute_rows(target_loc, ell.perm)
    planes = ell_ops.gather_planes(fixed, ell, plane_dtype)
    if p.w_mult != 1.0:
        bsum = ell_ops.adjusted_bsum_ell(planes, ell, Bsum, p.w_mult)
    else:
        bsum = jnp.zeros((1, 1), dtype=x.dtype)  # unused placeholder
    return x, tuple(bg[None] for bg in planes), bsum


def _full_round_body(p, se: ShardedEll, max_cg,
                     reuse_prev, max_outer, x, active, nfe, Bsum, bsum2d,
                     planes, cols, vals, srcs, perm, inv_perm, row_nnz):
    from ..solvers.tncg import _tncg_update_ell_jit

    ell = se.local_ell(cols, vals, srcs, perm, inv_perm, row_nnz)
    planes_l = tuple(bg[0] for bg in planes)
    bsum_l = bsum2d if p.w_mult != 1.0 else Bsum
    from ..solvers.tncg import _bd_accum_default

    x_new, _, st = _tncg_update_ell_jit(
        x, planes_l, ell, bsum_l, reuse_prev, max_outer, active, nfe,
        l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
        max_cg=max_cg, bd_accum=_bd_accum_default(),
    )
    return x_new, st["active"], st["nfeval"]


def _compact_round_body(p, se: ShardedEll, plan, dtype_name, max_cg,
                        max_outer, x, nfe, fixed, Bsum, bsum2d,
                        sels, src_cs, slot_map, row_nnz_c,
                        cols, vals, srcs, perm, inv_perm, row_nnz):
    from ..solvers.tncg import _tncg_update_ell_jit

    ell = se.local_ell(cols, vals, srcs, perm, inv_perm, row_nnz)
    sels_l = tuple(s[0] for s in sels)
    src_cs_l = tuple(None if s is None else s[0] for s in src_cs)
    compact, slot_map_d = ell_ops.build_compact(
        ell, plan, sels_l, src_cs_l, slot_map[0], row_nnz_c[0]
    )
    planes_c = ell_ops.gather_planes(
        fixed, compact, None if dtype_name is None else dtype_name
    )
    bsum_c = (
        jnp.take(bsum2d, slot_map_d, axis=0) if p.w_mult != 1.0 else Bsum
    )
    x_c = jnp.take(x, slot_map_d, axis=0)
    nfe_c = jnp.take(nfe, slot_map_d)
    from ..solvers.tncg import _bd_accum_default

    x_new, _, st = _tncg_update_ell_jit(
        x_c, planes_c, compact, bsum_c,
        jnp.asarray(True), max_outer,
        jnp.ones((x_c.shape[0],), dtype=bool),
        nfe_c,
        l2_reg=p.l2_reg, w_mult=p.w_mult, maxupd=p.maxupd,
        max_cg=max_cg, bd_accum=_bd_accum_default(),
    )
    x_out = ell_ops.scatter_back(x, x_new, compact.perm,
                                 compact.row_nnz_perm)
    # thread the feval budget back (fill slots all write the zero tail's
    # own carried value — deterministic duplicate writes)
    nfe_out = nfe.at[slot_map_d].set(
        jnp.where(compact.row_nnz_perm > 0, st["nfeval"],
                  jnp.take(nfe, slot_map_d))
    )
    return x_out, st["active"], nfe_out


def _unpermute_body(se: ShardedEll, x, inv_perm):
    return jnp.take(x, inv_perm[0], axis=0, mode="fill", fill_value=0)


def _src_specs(srcs):
    return tuple(P() if s is None else P(AXIS, None) for s in srcs)


def _update_se_profile(se: ShardedEll, aux: dict, active) -> None:
    """Record the per-bucket shape of a rejected tail (MAX over devices —
    shard_map needs shared static capacities).  Mirrors
    train._update_profile's size-class split."""
    n = se.n_slots
    cnt = int(np.count_nonzero(active))
    if cnt > n // 2:
        return
    cls = "small" if cnt <= n // 6 else "mid"
    counts = np.zeros(len(se.Ps), dtype=np.int64)
    for d in range(se.n_shards):
        for li, (off, rb) in enumerate(zip(se.offsets, se.Rbs)):
            src = aux["srcs"][li]
            if src is None:
                c = int(np.count_nonzero(active[d, off:off + rb]))
            else:
                c = int(np.count_nonzero(active[d][src[d]]))
            counts[li] = max(counts[li], c)
    profs = aux.setdefault("profiles", {})
    prof = profs.get(cls)
    profs[cls] = counts if prof is None else np.maximum(prof, counts)


def _maybe_build_se_adaptive_plans(se: ShardedEll, aux: dict) -> None:
    """Sharded twin of train._maybe_build_adaptive_plan: per size class,
    build a compact plan sized to the recorded rejection profile (shared
    caps across devices), bounded rebuilds, ladder-quantized caps."""
    import os as _os

    from .. import train as train_mod

    if _os.environ.get("POISMF_ADAPTIVE_PLAN") == "0":
        return
    profs = aux.get("profiles")
    if not profs:
        return
    rebuilt = False
    for cls, prof in profs.items():
        caps = aux.get("adaptive_caps", {}).get(cls)
        if caps is not None and np.all(prof <= caps):
            continue
        if aux.setdefault("adaptive_rebuilds", {}).get(cls, 0) >= \
                train_mod.MAX_ADAPTIVE_REBUILDS:
            continue
        plan = ell_ops.plan_compact_from_profile(aux["meta"], prof)
        if plan is None:
            continue
        aux["adaptive_rebuilds"][cls] = (
            aux["adaptive_rebuilds"].get(cls, 0) + 1
        )
        aux.setdefault("adaptive_caps", {})[cls] = np.asarray(plan.caps)
        aux.setdefault("adaptive_plans", {})[cls] = plan
        rebuilt = True
    if rebuilt:
        plans = (
            [pl for pl in aux["plans"] if pl.denom != 0]
            + list(aux.get("adaptive_plans", {}).values())
        )
        plans.sort(key=lambda pl: sum(
            c * Pw for c, Pw in zip(pl.caps, se.Ps)
        ))
        aux["plans"] = plans


def sharded_tncg_cascade_half(
    mesh: Mesh,
    p: FitParams,
    target: jnp.ndarray,
    fixed: jnp.ndarray,
    se: ShardedEll,
    aux: dict,
    early_stop: bool,
) -> Tuple[jnp.ndarray, bool]:
    """One tncg half-update over the mesh with active-set compaction.

    Mirrors the single-chip cascade's round schedule (train._run_poismf_ell):
    a short full-structure round, then rounds on the smallest per-device
    compact structure the still-active tail fits, with the final tail solved
    unbounded.  Returns (new_target_rows, converged_flag)."""
    from .. import train as train_mod
    from ..utils.transfer import fetch_host

    D = se.n_shards
    plane_dtype = None if p.plane_dtype is None else jnp.dtype(p.plane_dtype)
    dtype_name = None if plane_dtype is None else str(np.dtype(plane_dtype))

    # fold any rejection profiles from previous half-updates into adaptive
    # compact plans (one extra compiled program set per build, shared caps
    # across devices)
    _maybe_build_se_adaptive_plans(se, aux)

    Bsum = (jnp.sum(fixed, axis=0) + p.l1_reg).astype(target.dtype)

    ell_specs = (
        tuple(P(AXIS, None, None) for _ in se.cols),
        tuple(P(AXIS, None, None) for _ in se.vals),
        _src_specs(se.srcs),
        P(AXIS, None),  # perm
        P(AXIS, None),  # inv_perm
        P(AXIS, None),  # row_nnz
    )
    ell_args = (se.cols, se.vals, se.srcs, se.perm, se.inv_perm, se.row_nnz)

    # Build the shard_map programs ONCE per (se, mesh): the wrapped partial's
    # identity is the jit cache key, so rebuilding it per half-update would
    # retrace and recompile every round.
    progs = aux.get("programs")
    if progs is None or progs["mesh"] is not mesh:
        progs = {"mesh": mesh, "compact": {}}
        progs["prep"] = jax.shard_map(
            functools.partial(_prep_tncg_body, p, se, plane_dtype),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(), P()) + ell_specs,
            out_specs=(
                P(AXIS, None),
                tuple(P(AXIS, None, None, None) for _ in se.cols),
                P(AXIS, None),
            ),
            check_vma=False,
        )
        # bulk rounds run the tuned inner-CG cap; FINAL rounds polish with
        # the reference maxCGit (max_cg=None) — same hybrid as the
        # single-chip cascade (train.py half())
        progs["full"] = jax.shard_map(
            functools.partial(_full_round_body, p, se, p.max_cg),
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None), P(AXIS), P(AXIS), P(),
                      P(AXIS, None),
                      tuple(P(AXIS, None, None, None) for _ in se.cols))
            + ell_specs,
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
            check_vma=False,
        )
        progs["full_final"] = jax.shard_map(
            functools.partial(_full_round_body, p, se, None),
            mesh=mesh,
            in_specs=(P(), P(), P(AXIS, None), P(AXIS), P(AXIS), P(),
                      P(AXIS, None),
                      tuple(P(AXIS, None, None, None) for _ in se.cols))
            + ell_specs,
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
            check_vma=False,
        )
        progs["unperm"] = jax.shard_map(
            functools.partial(_unpermute_body, se),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=P(AXIS, None),
            check_vma=False,
        )
        aux["programs"] = progs

    x0, planes, bsum2d = progs["prep"](target, fixed, Bsum, *ell_args)

    def full_round_fn(last):
        return progs["full_final"] if last else progs["full"]

    def compact_round_fn(plan, last=False):
        key = (id(plan), bool(last))
        if key not in progs["compact"]:
            progs["compact"][key] = jax.shard_map(
                functools.partial(_compact_round_body, p, se, plan,
                                  dtype_name,
                                  None if last else p.max_cg),
                mesh=mesh,
                in_specs=(
                    P(), P(AXIS, None), P(AXIS), P(), P(), P(AXIS, None),
                    tuple(P(AXIS, None) for _ in se.cols),  # sels
                    _src_specs(se.srcs),                    # src_cs
                    P(AXIS, None),                          # slot_map
                    P(AXIS, None),                          # row_nnz_c
                ) + ell_specs,
                out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
                check_vma=False,
            )
        return progs["compact"][key]

    MAX_ROUNDS = 8
    ROUND_ITERS = 4
    round0_iters = 3
    # share-adaptive bounded round length, same policy as the single-chip
    # cascade (train.py half()): long full rounds while most rows are
    # live, short rounds once a compactable tail is plausible
    BIG_SHARE, BIG_ITERS = 0.35, 8
    unbounded = max(4, p.maxupd // 3)
    n_slots = se.n_slots
    import os as _os
    import time as _time

    from ..train import _round_with_redispatch

    log_env = bool(_os.environ.get("POISMF_CASCADE_LOG"))
    t_last = [_time.time()]

    x = x0
    active = None  # host [D, n_slots] bool; None = all rows (first round)
    # per-row feval budget threaded across rounds (same semantics as the
    # single-chip cascade, train.py half())
    nfe = jnp.zeros((D * n_slots,), dtype=jnp.int32)
    for rnd in range(MAX_ROUNDS):
        last = rnd == MAX_ROUNDS - 1
        sel = plan = None
        if active is not None:
            for plan in aux["plans"]:  # smallest capacity first
                per_dev = []
                for d in range(D):
                    s = ell_ops.select_active(
                        aux["meta"], plan, active[d], aux["row_nnz"][d],
                        [None if sh is None else sh[d]
                         for sh in aux["srcs"]],
                    )
                    if s is None:
                        per_dev = None
                        break
                    per_dev.append(s)
                if per_dev is not None:
                    sel = per_dev
                    break
            if sel is None:
                # rejected tail: record its per-device/bucket shape so the
                # next half-update can add a right-sized adaptive plan
                # (mirrors train._update_profile)
                _update_se_profile(se, aux, active)
        n_in = D * n_slots if active is None else int(
            np.count_nonzero(active)
        )
        if sel is not None:
            if plan is aux["plans"][0]:
                last = True  # smallest structure: finish unbounded
            sels = tuple(
                jnp.asarray(np.stack([s[0][li] for s in sel]))
                for li in range(len(se.cols))
            )
            src_cs = tuple(
                None if sel[0][1][li] is None
                else jnp.asarray(np.stack([s[1][li] for s in sel]))
                for li in range(len(se.cols))
            )
            slot_map_h = np.stack([s[2] for s in sel])  # [D, n_slots_c]
            row_nnz_c = jnp.asarray(np.stack([s[3] for s in sel]))

            def round_compact(x_in):
                return compact_round_fn(plan, last)(
                    jnp.asarray(unbounded if last else ROUND_ITERS,
                                dtype=jnp.int32),
                    x_in, nfe, fixed, Bsum, bsum2d,
                    sels, src_cs, jnp.asarray(slot_map_h), row_nnz_c,
                    *ell_args,
                )

            if last:
                x, _, _ = round_compact(x)
                act_next = None
            else:
                # re-dispatch on lost execution rpcs, like single-chip
                x, act_c, nfe = _round_with_redispatch(round_compact, x)
                act_c = np.asarray(act_c).reshape(D, plan.n_slots)
                act_next = np.zeros((D, n_slots), dtype=bool)
                for d in range(D):
                    sm = slot_map_h[d]
                    live = act_c[d] & (sm != n_slots - 1)
                    act_next[d][sm[live]] = True
            structure = f"compact/{plan.denom}"
        else:
            mask = (
                np.ones((D, n_slots), dtype=bool) if active is None
                else active
            )

            bounded_iters = (
                BIG_ITERS if n_in > BIG_SHARE * D * n_slots else ROUND_ITERS
            )

            def round_full(x_in):
                return full_round_fn(last)(
                    jnp.asarray(bool(p.reuse_prev) if rnd == 0 else True),
                    jnp.asarray(unbounded if last
                                else (round0_iters if rnd == 0
                                      else bounded_iters),
                                dtype=jnp.int32),
                    x_in, jnp.asarray(mask.reshape(-1)), nfe, Bsum, bsum2d,
                    planes, *ell_args,
                )

            if last:
                x, _, _ = round_full(x)
                act_next = None
            else:
                x, act, nfe = _round_with_redispatch(round_full, x)
                act_next = np.asarray(act).reshape(D, n_slots)
            structure = "full"
        n_out = 0 if act_next is None else int(np.count_nonzero(act_next))
        if CASCADE_TRACE is not None:
            CASCADE_TRACE.append((rnd, structure, n_in, n_out))
        if log_env:
            import sys as _sys

            now = _time.time()
            print(
                f"#   sh-cascade[{se.n_rows}r x{D}d] rnd {rnd} "
                f"{structure:>10} {'final ' if last else ''}{n_in} -> "
                f"{n_out} active ({now - t_last[0]:.2f}s)",
                file=_sys.stderr, flush=True,
            )
            t_last[0] = now
        if act_next is None or not act_next.any():
            break
        active = act_next

    converged = False
    if early_stop:
        from ..utils.transfer import FetchStalled

        has = se.row_nnz.reshape(-1) > 0
        delta = x - x0
        small = jnp.sum(
            (jnp.sum(delta * delta, axis=1) <= 1e-4) & has
        )
        try:
            converged = (
                float(fetch_host(small, give_up=True)) / max(se.n_rows, 1)
            ) >= 0.95
        except FetchStalled:
            converged = False  # lost read on a diagnostic: not-converged

    return progs["unperm"](x, se.inv_perm), converged


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
            max_cg=p.max_cg,
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

    src_specs = _src_specs(se.srcs)
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
    """Multi-device alternating driver on the planar-ELL layout.

    With ``method="tncg"`` and ``compact_tail=True`` (the defaults) each
    half-update runs the annealing cascade (:func:`sharded_tncg_cascade_half`)
    so every device compacts its converged rows away, and the early-stop vote
    comes from the cascade's own on-device unchanged count — no full-matrix
    host pulls."""
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
        # mask (not slice) so the computation stays sharded over the mesh
        real = jnp.arange(new.shape[0]) < n_true
        delta = new - old
        small = jnp.sum((jnp.sum(delta * delta, axis=1) <= 1e-4) & real)
        return float(small) / max(n_true, 1)

    cascade = p.method == "tncg" and p.compact_tail
    aux_u = _make_se_aux(su) if cascade else None
    aux_i = _make_se_aux(si) if cascade else None

    early = p.early_stop and p.method == "tncg"
    try:
        for epoch in range(p.niter):
            div_step = step_size
            steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_B:
                if cascade:
                    B, converged_B = sharded_tncg_cascade_half(
                        mesh, p, B, A, si, aux_i, early
                    )
                else:
                    B_old = B
                    B = sharded_half_update_ell(mesh, p, B, A, si, steps)
                    if early:
                        converged_B = (
                            unchanged_share(B_old, B, n_items) >= 0.95
                        )
            if p.method == "pg":
                # halved between the halves (poismf.c:532); A keeps the
                # pre-halving step in its proximal divisor (poismf.c:511)
                step_size *= 0.5
                steps = jnp.asarray([step_size, div_step], dtype=A.dtype)
            if not converged_A:
                if cascade:
                    A, converged_A = sharded_tncg_cascade_half(
                        mesh, p, A, B, su, aux_u, early
                    )
                else:
                    A_old = A
                    A = sharded_half_update_ell(mesh, p, A, B, su, steps)
                    if early:
                        converged_A = (
                            unchanged_share(A_old, A, n_users) >= 0.95
                        )
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
