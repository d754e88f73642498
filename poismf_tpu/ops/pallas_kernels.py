"""Pallas TPU kernels for the planar-ELL objective evaluations.

The XLA lowering of :func:`poismf_tpu.ops.ell.fgh_ell` reads each bucket's
plane ``bg[k, P, R]`` roughly three times (prediction, gradient reduction,
Hessian-diagonal reduction).  These kernels fuse the WHOLE evaluation into a
single streaming read of the plane per grid block:

  fgh :  pred -> log/weights -> { -sum_p x*log(pred),            [R]
                                  -sum_p (x/pred) * bg,          [k, R]
                                   sum_p (x/pred^2) * bg^2,      [k, R]
                                   w2 = w_mult * x/pred^2 }      [P, R]
  f   :  pred -> -sum_p x*log(pred)  (NO eps floor: a non-positive
         prediction poisons the row with +inf/NaN, matching the line-search
         rejection semantics of the reference, nonnegcg.c:223-226)
  hvp :  bv = sum_k bg*v ;  out = sum_p (w2*bv) * bg

Grid layout per bucket: rows (lanes) outer x nonzero-slots (sublanes) inner,
with the k axis kept whole inside the block; the [k, R] accumulators live in
VMEM across the inner P sweep (the revisited-output accumulation pattern).
All arithmetic is f32 regardless of the plane storage dtype (bf16 planes
upcast in registers).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PRED_EPS = 1e-30

# Block policy (measured, scripts/kernel_sweep.py on v5e, k=50 bf16):
# R on lanes (multiples of 128), P on sublanes.  Grid-step count is a real
# cost (each step carries fixed DMA/loop overhead), so prefer the LARGEST
# R tile whose bg block [k, TILE_P, tr] fits the byte budget — (tp=16,
# tr=1024) measured f 335 / f_gtd 334 / hvp 323 GB/s vs 237-307 at the old
# (64, 256), against a 601 GB/s practical ceiling (xla_sum of the same
# bytes).  The budget keeps the double-buffered block + [k,tr] accumulators
# well inside the 16 MB scoped VMEM for f32 planes too.
TILE_R = 1024
TILE_P = 16
TILE_BYTES = 2 << 20


def _div_tile(Rb: int, cap: int) -> int:
    """Largest multiple of 128 that DIVIDES Rb and is <= cap.  Rb is a
    multiple of 128 but not a power of two (bucket rows are padded to
    ROW_TILE=128), so the old halving search (1024 -> 512 -> ...) missed
    divisors like 896 = 7*128 and collapsed tr to 128 on most real
    buckets — e.g. the bench item-side P=2048 x Rb=896 head (31% of all
    slots) ran a (16, 128)-block grid of 896 steps per fgh sweep at
    ~144 GB/s (measured, scripts/tncg_decomp.py) because grid-step
    overhead, not bandwidth, was the cost."""
    m = Rb // 128
    best = 1
    d = 2
    while d * 128 <= cap:
        if m % d == 0:
            best = d
        d += 1
    return best * 128


def _tiles(P: int, Rb: int, k: int, itemsize: int = 4) -> Tuple[int, int]:
    # P is a power of two; Rb a multiple of 128 — tile sizes must DIVIDE
    # the dims (grid uses exact division).  Policy: largest divisor tr
    # within the byte budget, then GROW tp toward P while the block still
    # fits — small-Rb buckets otherwise degenerate to tiny blocks whose
    # per-grid-step overhead dominates the stream (the decomp probe
    # measured the real item-side fgh at 144 GB/s vs 241+ at ideal
    # shapes; see _div_tile).
    tp = min(P, TILE_P)
    cap = TILE_R
    tr = _div_tile(Rb, cap)
    while k * tp * tr * itemsize > TILE_BYTES and tr > 128:
        tr = _div_tile(Rb, tr - 128)
    while tp < P and k * (2 * tp) * tr * itemsize <= TILE_BYTES:
        tp *= 2
    return tp, tr


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# fused f / grad / diag / w2 (data terms only; linear+L2 added by the caller)
# ---------------------------------------------------------------------------


def _fgh_kernel(w_mult, want_pred, bg_ref, vals_ref, at_ref,
                nll_ref, grad_ref, diag_ref, w2_ref, pred_ref=None):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        grad_ref[...] = jnp.zeros_like(grad_ref)
        diag_ref[...] = jnp.zeros_like(diag_ref)

    bg = _f32(bg_ref[...])  # [k, TP, TR]
    a = at_ref[...]  # [k, TR]
    vals = vals_ref[...]  # [TP, TR]
    pred = jnp.sum(bg * a[:, None, :], axis=0)  # [TP, TR]
    safe = jnp.maximum(pred, PRED_EPS)
    valid = vals > 0
    logt = jnp.where(valid, vals * jnp.log(safe), 0.0)
    # one reciprocal shared by the 1/pred and 1/pred^2 weights (the VPU
    # divide is the costliest per-slot op after log; measured in the
    # kernel sweep)
    recip = 1.0 / safe
    w = jnp.where(valid, vals * recip, 0.0)
    w2 = jnp.where(valid, (w_mult * vals) * (recip * recip), 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]
    grad_ref[...] += jnp.sum((-w)[None] * bg, axis=1)
    diag_ref[...] += jnp.sum(w2[None] * (bg * bg), axis=1)
    w2_ref[...] = w2
    if want_pred:
        pred_ref[...] = pred  # raw (unfloored) - ray trials must poison


@functools.partial(
    jax.jit, static_argnames=("w_mult", "want_pred", "interpret")
)
def fgh_bucket(bg, vals, a_t, w_mult: float = 1.0, want_pred: bool = True,
               interpret: bool = False):
    """Fused data-term evaluation for one bucket.

    bg [k, P, R] (any float dtype), vals [P, R] f32, a_t [k, R] f32 ->
    (neg_llk [R], grad_data [k, R], diag_data [k, R], w2 [P, R],
    pred [P, R] or None).  ``pred`` is the raw (unfloored) prediction plane
    consumed by ray line searches (see ray_bucket); solvers that evaluate
    projected trials instead (TNCG) pass ``want_pred=False`` — pallas
    outputs are real HBM writes XLA cannot dead-code-eliminate, ~4 B/slot
    of avoidable traffic per fgh refresh.
    """
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    out_specs = [
        pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        jax.ShapeDtypeStruct((k, Rb), jnp.float32),
        jax.ShapeDtypeStruct((k, Rb), jnp.float32),
        jax.ShapeDtypeStruct((P, Rb), jnp.float32),
    ]
    if want_pred:
        out_specs.append(pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((P, Rb), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fgh_kernel, w_mult, want_pred),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(bg, vals, a_t)
    nll, grad, diag, w2 = out[:4]
    return nll[0], grad, diag, w2, (out[4] if want_pred else None)


# ---------------------------------------------------------------------------
# f + grad (CG evaluations; no Hessian data)
# ---------------------------------------------------------------------------


def _fg_kernel(w_mult, want_pred, bg_ref, vals_ref, at_ref, nll_ref,
               grad_ref, pred_ref=None):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        grad_ref[...] = jnp.zeros_like(grad_ref)

    bg = _f32(bg_ref[...])
    a = at_ref[...]
    vals = vals_ref[...]
    pred = jnp.sum(bg * a[:, None, :], axis=0)
    safe = jnp.maximum(pred, PRED_EPS)
    valid = vals > 0
    # unfloored log: trial-grade f with inf/nan poisoning at pred <= 0
    # (nonnegcg.c:223-226, 308); the gradient weights keep the floor
    logt = jnp.where(valid, vals * jnp.log(pred), 0.0)
    w = jnp.where(valid, vals / safe, 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]
    grad_ref[...] += jnp.sum((-w)[None] * bg, axis=1)
    if want_pred:
        pred_ref[...] = pred  # cached planes for the CG ray line search


@functools.partial(
    jax.jit, static_argnames=("w_mult", "want_pred", "interpret")
)
def fg_bucket(bg, vals, a_t, w_mult: float = 1.0, want_pred: bool = True,
              interpret: bool = False):
    """``want_pred=False`` (the fused, non-ray CG mode) skips the [P, Rb]
    prediction-plane output — pallas outputs are real HBM writes that XLA
    cannot dead-code-eliminate, ~4 B/slot of avoidable traffic per trial."""
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    out_specs = [
        pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        jax.ShapeDtypeStruct((k, Rb), jnp.float32),
    ]
    if want_pred:
        out_specs.append(pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((P, Rb), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fg_kernel, w_mult, want_pred),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(bg, vals, a_t)
    return out[0][0], out[1], (out[2] if want_pred else None)


# ---------------------------------------------------------------------------
# PG data term: sum_p (x/pred) * bg  (gradient numerator only)
# ---------------------------------------------------------------------------


def _pg_kernel(bg_ref, vals_ref, at_ref, grad_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    bg = _f32(bg_ref[...])
    a = at_ref[...]
    vals = vals_ref[...]
    pred = jnp.sum(bg * a[:, None, :], axis=0)
    w = jnp.where(vals > 0, vals / jnp.maximum(pred, PRED_EPS), 0.0)
    grad_ref[...] += jnp.sum(w[None] * bg, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pg_bucket(bg, vals, a_t, interpret: bool = False):
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    return pl.pallas_call(
        _pg_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Rb), jnp.float32),
        interpret=interpret,
    )(bg, vals, a_t)


# ---------------------------------------------------------------------------
# objective only (line-search trials; inf-poisoning preserved)
# ---------------------------------------------------------------------------


def _f_kernel(bg_ref, vals_ref, at_ref, nll_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)

    bg = _f32(bg_ref[...])
    a = at_ref[...]
    vals = vals_ref[...]
    pred = jnp.sum(bg * a[:, None, :], axis=0)
    logt = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def f_bucket(bg, vals, a_t, interpret: bool = False):
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    out = pl.pallas_call(
        _f_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        interpret=interpret,
    )(bg, vals, a_t)
    return out[0]


# ---------------------------------------------------------------------------
# objective + directional derivative (one plane read; the B.d factors come in
# as a precomputed [P, R] plane, so each line-search trial costs the same
# plane traffic as the f-only kernel)
# ---------------------------------------------------------------------------


def _f_gtd_kernel(bg_ref, vals_ref, at_ref, bd_ref, nll_ref, gud_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        gud_ref[...] = jnp.zeros_like(gud_ref)

    bg = _f32(bg_ref[...])
    a = at_ref[...]
    vals = vals_ref[...]
    bd = bd_ref[...]
    pred = jnp.sum(bg * a[:, None, :], axis=0)
    logt = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]
    ratio = jnp.where(vals > 0, vals * bd / jnp.maximum(pred, PRED_EPS), 0.0)
    gud_ref[...] += jnp.sum(ratio, axis=0)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def f_gtd_bucket(bg, vals, a_t, bd, interpret: bool = False):
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    nll, gud = pl.pallas_call(
        _f_gtd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(bg, vals, a_t, bd)
    return nll[0], gud[0]


# ---------------------------------------------------------------------------
# f + directional derivative with the <B, d> dot computed IN-REGISTER from
# the same bg block the prediction dot already loaded.  Replaces the hoisted
# bd-plane scheme (bdot sweep + 4 B/slot bd read per trial) for the TNCG
# projected-trial line search: the kernels are HBM-bound (measured ~335 of a
# 601 GB/s practical ceiling) so the second k-deep dot is free, while the
# bdot sweep cost a FULL extra plane read per line search (ROADMAP #0 /
# round-3 verdict item 5).  The d operand is a [k, R] block like a_t —
# ~1/P of the plane traffic, invisible.
# ---------------------------------------------------------------------------


def _f_gtd_fused_kernel(bg_ref, vals_ref, at_ref, dt_ref, nll_ref, gud_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        gud_ref[...] = jnp.zeros_like(gud_ref)

    bg = _f32(bg_ref[...])  # [k, TP, TR]
    a = at_ref[...]  # [k, TR]
    d = dt_ref[...]  # [k, TR]
    vals = vals_ref[...]
    pred = jnp.sum(bg * a[:, None, :], axis=0)  # [TP, TR]
    bd = jnp.sum(bg * d[:, None, :], axis=0)  # [TP, TR]
    logt = jnp.where(vals > 0, vals * jnp.log(pred), 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]
    ratio = jnp.where(vals > 0, vals * bd / jnp.maximum(pred, PRED_EPS), 0.0)
    gud_ref[...] += jnp.sum(ratio, axis=0)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def f_gtd_fused_bucket(bg, vals, a_t, d_t, interpret: bool = False):
    """Trial f and g.d data terms with the ``<B, d>`` factors computed from
    the in-register bg block (no separate bd plane).

    bg [k, P, R], vals [P, R] f32, a_t [k, R] f32 (the trial), d_t [k, R]
    f32 (the direction) -> (neg_llk [R], gud [R]).
    """
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    nll, gud = pl.pallas_call(
        _f_gtd_fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(bg, vals, a_t, d_t)
    return nll[0], gud[0]


# ---------------------------------------------------------------------------
# multi-candidate projected-trial evaluation: COMPLETE (f, g.d) at C steps
# along the PROJECTED ray max(0, x + a_c * d) in ONE bg/vals stream.  The
# TNCG line search's whole-batch round count is its dominant cost (the
# max-over-rows bracketing tail runs to MAX_LS nearly every outer
# iteration); evaluating C candidates per round costs the same plane
# bandwidth as one trial — the extra work is C-1 more dot/log chains on
# data already in registers, and the kernels are not flop-bound (f and fgh
# measure the same GB/s at 3x different arithmetic).  Unlike the CG ray
# kernels the trials here are PROJECTED (max(0,.) zeroes many coordinates
# per accepted step), so predictions are NOT linear in alpha and each
# candidate needs its own k-deep dot.  The linear/l2/Bsum terms are folded
# in ON THE pj==0 BLOCK (once per row tile), so the output is the finished
# (f, gtd) pair and the solver does NO per-candidate [R, k] work.
# ---------------------------------------------------------------------------


def _f_gtd_multi_kernel(C, w_mult, l2_in_f, fold_linear,
                        l2_ref, bg_ref, vals_ref, xt_ref, dt_ref, al_ref,
                        bsum_ref, f_ref, gtd_ref):
    pj = pl.program_id(1)
    # l2_reg rides in as a traced SMEM scalar (NOT a static kernel
    # constant): the enclosing solver jits trace it, and baking it in
    # would both crash on the tracer and recompile per l2 value (the
    # serving paths solve with caller-chosen regularization)
    l2_reg = l2_ref[0]
    bg = _f32(bg_ref[...])  # [k, TP, TR]
    x = xt_ref[...]  # [k, TR]
    d = dt_ref[...]  # [k, TR]
    vals = vals_ref[...]  # [TP, TR]
    al = al_ref[...]  # [C, TR]
    valid = vals > 0
    bd = jnp.sum(bg * d[:, None, :], axis=0)  # [TP, TR]

    @pl.when(pj == 0)
    def _():
        # fold_linear=False (long-row EXTENSION buckets, whose data terms
        # are scatter-ADDED into their primary rows): init only, so the
        # linear terms enter exactly once via the primary bucket
        if not fold_linear:
            f_ref[...] = jnp.zeros_like(f_ref)
            gtd_ref[...] = jnp.zeros_like(gtd_ref)
            return
        bsum = bsum_ref[...]  # [k, TR] ([k] broadcast or per-row 2D)
        lin_d = jnp.sum(d * bsum, axis=0)  # [TR]
        f0, g0 = [], []
        for c in range(C):
            trial = jnp.maximum(x + al[c][None, :] * d, 0.0)  # [k, TR]
            lin = jnp.sum(trial * bsum, axis=0)
            if l2_in_f:
                lin = lin + l2_reg * jnp.sum(trial * trial, axis=0)
            f0.append(lin)
            g0.append(lin_d + 2.0 * l2_reg * jnp.sum(trial * d, axis=0))
        f_ref[...] = jnp.stack(f0)
        gtd_ref[...] = jnp.stack(g0)

    facc, gacc = [], []
    for c in range(C):
        trial = jnp.maximum(x + al[c][None, :] * d, 0.0)
        pred = jnp.sum(bg * trial[:, None, :], axis=0)  # [TP, TR]
        # unfloored log: non-positive predictions poison f with inf/nan
        # exactly like the single-trial kernels (nonnegcg.c:223-226)
        logt = jnp.where(valid, vals * jnp.log(pred), 0.0)
        facc.append(-w_mult * jnp.sum(logt, axis=0))
        ratio = jnp.where(
            valid, vals * bd / jnp.maximum(pred, PRED_EPS), 0.0
        )
        gacc.append(-w_mult * jnp.sum(ratio, axis=0))
    f_ref[...] += jnp.stack(facc)
    gtd_ref[...] += jnp.stack(gacc)


@functools.partial(
    jax.jit,
    static_argnames=("w_mult", "l2_in_f", "fold_linear", "interpret"),
)
def f_gtd_multi_bucket(bg, vals, x_t, d_t, alphas, bsum_t, l2_reg,
                       w_mult: float, l2_in_f: bool,
                       fold_linear: bool = True, interpret: bool = False):
    """COMPLETE (f, g(trial).d) at C projected-trial steps for one bucket.

    bg [k, P, R], vals [P, R] f32, x_t/d_t [k, R] f32, alphas [C, R] f32,
    bsum_t [k, R] f32 (a 1D Bsum pre-broadcast by the caller),
    l2_reg a traced f32 scalar ->
    (f [C, R], gtd [C, R]) with the linear + l2 + Bsum terms already folded
    in (computed once per row tile on the pj==0 block).
    ``fold_linear=False`` emits data terms only (long-row extension
    buckets, which scatter-add into their primary rows).
    """
    C = alphas.shape[0]
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    l2_s = jnp.asarray(l2_reg, dtype=jnp.float32).reshape(1)
    f, gtd = pl.pallas_call(
        functools.partial(_f_gtd_multi_kernel, C, w_mult, l2_in_f,
                          fold_linear),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Rb), jnp.float32),
            jax.ShapeDtypeStruct((C, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(l2_s, bg, vals, x_t, d_t, alphas, bsum_t)
    return f, gtd


# ---------------------------------------------------------------------------
# ray line-search trial: f + directional derivative WITHOUT a plane read.
# The prediction is linear in the factor vector, so with the step capped at
# the first bound crossing (the reference's stepMax/getptc xbnd contract,
# tnc.c:795,1861-1864) every trial's predictions are exactly
# pred(x) + alpha * pred(d) - three [P, R] streams instead of the full
# [k, P, R] plane (8-9x less HBM traffic per trial at k=50).
# ---------------------------------------------------------------------------


def _ray_tiles(P: int, Rb: int) -> Tuple[int, int]:
    # Ray rounds stream only px/pd/vals (3 x f32, no k axis), so blocks
    # are tiny unless tp grows aggressively: the decomp probe measured the
    # multi-candidate ray round at 31 GB/s (2.3 ms for 73 MB!) on the real
    # bench buckets under the old (tp<=64, tr-halving) policy — pure
    # grid-step overhead, and the single largest wall item of the whole
    # tncg fit (~9.6 LS rounds per outer iteration).  Same divisor-then-
    # grow policy as _tiles.
    tp = min(P, 64)
    tr = _div_tile(Rb, TILE_R)
    while 3 * tp * tr * 4 > TILE_BYTES and tr > 128:
        tr = _div_tile(Rb, tr - 128)
    while tp < P and 3 * (2 * tp) * tr * 4 <= TILE_BYTES:
        tp *= 2
    return tp, tr


def _ray_kernel(px_ref, pd_ref, vals_ref, alpha_ref, nll_ref, gud_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        gud_ref[...] = jnp.zeros_like(gud_ref)

    px = px_ref[...]  # [TP, TR]
    pd = pd_ref[...]
    vals = vals_ref[...]
    a = alpha_ref[...]  # [1, TR]
    pred = px + a * pd
    valid = vals > 0
    # no eps floor on the log: a non-positive trial prediction poisons the
    # row with +inf/NaN exactly like the full f kernel
    logt = jnp.where(valid, vals * jnp.log(pred), 0.0)
    nll_ref[...] += -jnp.sum(logt, axis=0)[None, :]
    ratio = jnp.where(
        valid, vals * pd / jnp.maximum(pred, PRED_EPS), 0.0
    )
    gud_ref[...] += jnp.sum(ratio, axis=0)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ray_bucket(px, pd, vals, alpha, interpret: bool = False):
    """Trial f and g.d data terms along the search ray for one bucket.

    px, pd, vals [P, R] f32, alpha [1, R] f32 (per-row step) ->
    (neg_llk [R], gud [R]).
    """
    P, Rb = px.shape
    tp, tr = _ray_tiles(P, Rb)
    grid = (Rb // tr, P // tp)
    nll, gud = pl.pallas_call(
        _ray_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
            jax.ShapeDtypeStruct((1, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(px, pd, vals, alpha)
    return nll[0], gud[0]


# ---------------------------------------------------------------------------
# multi-candidate ray trial (CG): f-only at C steps along the ray in ONE
# px/pd/vals stream.  CG's backtracking sequence is FIXED (x0.25 per
# rejection, nonnegcg.c:290-327), so evaluating the next C candidates per
# round costs the same plane bandwidth as one trial (the extra work is
# C-1 more pred/log chains on data already in registers) and cuts the
# whole-batch LS round count ~Cx.
# ---------------------------------------------------------------------------


def _rayf_multi_kernel(C, px_ref, pd_ref, vals_ref, alphas_ref, nll_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)

    px = px_ref[...]  # [TP, TR]
    pd = pd_ref[...]
    vals = vals_ref[...]
    a = alphas_ref[...]  # [C, TR]
    valid = vals > 0
    acc = []
    for c in range(C):
        pred = px + a[c][None, :] * pd
        # unfloored log: non-positive trial predictions poison with
        # inf/nan exactly like the single-candidate kernels
        logt = jnp.where(valid, vals * jnp.log(pred), 0.0)
        acc.append(-jnp.sum(logt, axis=0))
    nll_ref[...] += jnp.stack(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rayf_multi_bucket(px, pd, vals, alphas, interpret: bool = False):
    """Trial f data terms at C steps for one bucket.

    px, pd, vals [P, R] f32, alphas [C, R] f32 -> neg_llk [C, R].
    """
    C = alphas.shape[0]
    P, Rb = px.shape
    tp, tr = _ray_tiles(P, Rb)
    grid = (Rb // tr, P // tp)
    nll = pl.pallas_call(
        functools.partial(_rayf_multi_kernel, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Rb), jnp.float32),
        interpret=interpret,
    )(px, pd, vals, alphas)
    return nll


def _raygtd_multi_kernel(C, px_ref, pd_ref, vals_ref, alphas_ref,
                         nll_ref, gud_ref):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        nll_ref[...] = jnp.zeros_like(nll_ref)
        gud_ref[...] = jnp.zeros_like(gud_ref)

    px = px_ref[...]  # [TP, TR]
    pd = pd_ref[...]
    vals = vals_ref[...]
    a = alphas_ref[...]  # [C, TR]
    valid = vals > 0
    nacc, gacc = [], []
    for c in range(C):
        pred = px + a[c][None, :] * pd
        # unfloored log: non-positive trial predictions poison with
        # inf/nan exactly like the single-candidate kernels
        logt = jnp.where(valid, vals * jnp.log(pred), 0.0)
        nacc.append(-jnp.sum(logt, axis=0))
        ratio = jnp.where(
            valid, vals * pd / jnp.maximum(pred, PRED_EPS), 0.0
        )
        gacc.append(jnp.sum(ratio, axis=0))
    nll_ref[...] += jnp.stack(nacc)
    gud_ref[...] += jnp.stack(gacc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def raygtd_multi_bucket(px, pd, vals, alphas, interpret: bool = False):
    """Trial f AND g(trial).d data terms at C ray steps for one bucket —
    the TNCG line search's multi-candidate round on cached prediction
    planes (ray twin of :func:`f_gtd_multi_bucket`; same candidate packing
    as :func:`rayf_multi_bucket` plus the derivative stream).

    px, pd, vals [P, R] f32, alphas [C, R] f32 ->
    (neg_llk [C, R], gud [C, R]).
    """
    C = alphas.shape[0]
    P, Rb = px.shape
    tp, tr = _ray_tiles(P, Rb)
    grid = (Rb // tr, P // tp)
    nll, gud = pl.pallas_call(
        functools.partial(_raygtd_multi_kernel, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Rb), jnp.float32),
            jax.ShapeDtypeStruct((C, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(px, pd, vals, alphas)
    return nll, gud


# ---------------------------------------------------------------------------
# Hessian-vector product (one plane read; bv and the w2-weighted reduction
# both consume the in-register block)
# ---------------------------------------------------------------------------


def _hvp_kernel(bg_ref, w2_ref, vt_ref, out_ref, bv_ref=None):
    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bg = _f32(bg_ref[...])
    v = vt_ref[...]
    w2 = w2_ref[...]
    bv = jnp.sum(bg * v[:, None, :], axis=0)  # [TP, TR]
    out_ref[...] += jnp.sum((w2 * bv)[None] * bg, axis=1)
    if bv_ref is not None:
        # inner-CG <B,d> accumulation (ROADMAP #0): the per-slot dot the
        # HVP already holds in registers, written out (4 B/slot) so the
        # line search's pd plane is the running sum  sum_i alpha_i <B,p_i>
        # instead of a standalone full-plane bdot sweep
        bv_ref[...] = bv


@functools.partial(jax.jit, static_argnames=("interpret",))
def hvp_bucket(bg, w2, v_t, interpret: bool = False):
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    out = pl.pallas_call(
        _hvp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, Rb), jnp.float32),
        interpret=interpret,
    )(bg, w2, v_t)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def hvp_bv_bucket(bg, w2, v_t, interpret: bool = False):
    """HVP that ALSO writes the per-slot ``<B, v>`` plane (ROADMAP #0).

    bg [k, P, R], w2 [P, R] f32, v_t [k, R] f32 ->
    (out [k, R] f32, bv [P, R] f32).  Same stream as :func:`hvp_bucket`
    plus a 4 B/slot bv write; the TNCG inner CG accumulates
    ``pd += alpha * bv`` so the line search's direction plane costs no
    standalone bdot sweep."""
    k, P, Rb = bg.shape
    tp, tr = _tiles(P, Rb, k, bg.dtype.itemsize)
    grid = (Rb // tr, P // tp)
    out, bv = pl.pallas_call(
        _hvp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, tp, tr), lambda ri, pj: (0, pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tr), lambda ri, pj: (0, ri),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, tr), lambda ri, pj: (pj, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, Rb), jnp.float32),
            jax.ShapeDtypeStruct((P, Rb), jnp.float32),
        ],
        interpret=interpret,
    )(bg, w2, v_t)
    return out, bv
