"""Golden-parity harness: compile the ACTUAL reference C implementation
(/root/reference/src) against a tiny self-contained CBLAS shim and expose
``run_poismf`` via ctypes, so the TPU rebuild's fit trajectories can be
checked against the original bit-for-bit C solvers on identical data and
identical initialization.

The reference sources are compiled in place (read-only) — nothing is copied
into this repository; only the shim (our code) lives here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_SRC = "/root/reference/src"
_LIB_PATH = os.path.join(tempfile.gettempdir(), "libpoismf_ref.so")
_SOURCES = ["poismf.c", "nonnegcg.c", "tnc.c", "pred.c", "topN.c"]

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    srcs = [os.path.join(_REF_SRC, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        return False
    cmd = [
        "gcc", "-O2", "-std=c99", "-fPIC", "-shared", "-fopenmp",
        "-o", _LIB_PATH,
        os.path.join(_HERE, "cblas_shim.c"), *srcs,
        "-I" + _REF_SRC, "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the reference library; None if a toolchain
    or the reference tree is unavailable (tests skip gracefully)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    stp = ctypes.POINTER(ctypes.c_size_t)
    lib.topN.restype = ctypes.c_int
    lib.topN.argtypes = [
        dp, dp, ctypes.c_int,        # a_vec, B, k
        stp, ctypes.c_size_t,        # include_ix, n_include
        stp, ctypes.c_size_t,        # exclude_ix, n_exclude
        stp, dp,                     # outp_ix, outp_score
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int,  # n_top, n, nthreads
    ]
    lib.run_poismf.restype = ctypes.c_int
    lib.run_poismf.argtypes = [
        dp, dp, stp, stp,            # A, Xr, Xr_indptr, Xr_indices
        dp, dp, stp, stp,            # B, Xc, Xc_indptr, Xc_indices
        ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,  # dimA dimB k
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # l2 l1 w_mult
        ctypes.c_double,             # step_size
        ctypes.c_int,                # method enum: tncg=1 cg=2 pg=3
        ctypes.c_bool, ctypes.c_size_t, ctypes.c_size_t,  # limit_step numiter maxupd
        ctypes.c_bool, ctypes.c_bool,  # early_stop reuse_prev
        ctypes.c_bool, ctypes.c_int,   # handle_interrupt nthreads
    ]
    lib.predict_multiple.restype = None
    lib.predict_multiple.argtypes = [
        dp, dp, dp,                  # out, A, B
        stp, stp,                    # ixA, ixB
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int,  # n, k, nthreads
    ]
    lib.factors_multiple.restype = ctypes.c_int
    lib.factors_multiple.argtypes = [
        dp, dp, dp, dp,              # A, B, Bsum, Amean
        dp, stp, stp,                # Xr, Xr_indptr, Xr_indices
        ctypes.c_int, ctypes.c_size_t,  # k, dimA
        ctypes.c_double, ctypes.c_double,  # l2_reg, w_mult
        ctypes.c_double, ctypes.c_size_t, ctypes.c_size_t,  # step niter maxupd
        ctypes.c_int, ctypes.c_bool, ctypes.c_bool,  # method limit_step reuse_mean
        ctypes.c_int,                # nthreads
    ]
    lib.factors_single.restype = ctypes.c_int
    lib.factors_single.argtypes = [
        dp, ctypes.c_size_t,         # out, k
        dp, ctypes.c_bool,           # Amean, reuse_mean
        dp, stp, ctypes.c_size_t,    # X, X_ind, nnz
        dp, dp,                      # B, Bsum
        ctypes.c_int, ctypes.c_double,  # maxupd, l2_reg
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # l1_new l1_old w_mult
    ]
    _lib = lib
    return _lib


_METHOD_ENUM = {"tncg": 1, "cg": 2, "pg": 3}


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def run_poismf_reference(
    A: np.ndarray,
    B: np.ndarray,
    csr,
    csc,
    *,
    method: str,
    l2_reg: float,
    l1_reg: float = 0.0,
    w_mult: float = 1.0,
    step_size: float = 1e-7,
    limit_step: bool = True,
    numiter: int = 10,
    maxupd: int = 750,
    early_stop: bool = True,
    reuse_prev: bool = False,
    nthreads: int = 1,
) -> int:
    """Run the reference C ``run_poismf`` (poismf.c:435-632) IN PLACE on
    float64 A [dimA,k], B [dimB,k] with SciPy CSR/CSC data.  Returns the C
    status code (0 ok / 1 oom / 2 interrupted)."""
    lib = load()
    assert lib is not None
    assert A.dtype == np.float64 and A.flags.c_contiguous
    assert B.dtype == np.float64 and B.flags.c_contiguous
    dimA, k = A.shape
    dimB = B.shape[0]

    Xr = np.ascontiguousarray(csr.data, dtype=np.float64)
    Xr_indptr = np.ascontiguousarray(csr.indptr, dtype=np.uintp)
    Xr_indices = np.ascontiguousarray(csr.indices, dtype=np.uintp)
    Xc = np.ascontiguousarray(csc.data, dtype=np.float64)
    Xc_indptr = np.ascontiguousarray(csc.indptr, dtype=np.uintp)
    Xc_indices = np.ascontiguousarray(csc.indices, dtype=np.uintp)

    return lib.run_poismf(
        _ptr(A, ctypes.c_double), _ptr(Xr, ctypes.c_double),
        _ptr(Xr_indptr, ctypes.c_size_t), _ptr(Xr_indices, ctypes.c_size_t),
        _ptr(B, ctypes.c_double), _ptr(Xc, ctypes.c_double),
        _ptr(Xc_indptr, ctypes.c_size_t), _ptr(Xc_indices, ctypes.c_size_t),
        dimA, dimB, k,
        l2_reg, l1_reg, w_mult, step_size,
        _METHOD_ENUM[method],
        limit_step, numiter, maxupd,
        early_stop, reuse_prev,
        True, nthreads,
    )


def predict_multiple_reference(A, B, ixA, ixB):
    """Reference ``predict_multiple`` (pred.c:42-64): out[t] = <A[ixA], B[ixB]>."""
    lib = load()
    assert lib is not None
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    ixA = np.ascontiguousarray(ixA, dtype=np.uintp)
    ixB = np.ascontiguousarray(ixB, dtype=np.uintp)
    out = np.zeros(ixA.shape[0], dtype=np.float64)
    lib.predict_multiple(
        _ptr(out, ctypes.c_double), _ptr(A, ctypes.c_double),
        _ptr(B, ctypes.c_double), _ptr(ixA, ctypes.c_size_t),
        _ptr(ixB, ctypes.c_size_t), ixA.shape[0], A.shape[1], 1,
    )
    return out


def factors_multiple_reference(
    B, Bsum, Amean, csr, *, method, l2_reg, w_mult=1.0, step_size=1e-7,
    niter, maxupd, limit_step=True, reuse_mean=True,
):
    """Reference ``factors_multiple`` (pred.c:66-199): batch out-of-sample
    factors with B fixed; ``Bsum`` must already include the training l1."""
    lib = load()
    assert lib is not None
    B = np.ascontiguousarray(B, dtype=np.float64)
    Bsum = np.ascontiguousarray(Bsum, dtype=np.float64)
    Amean = np.ascontiguousarray(Amean, dtype=np.float64)
    dimA = csr.shape[0]
    k = B.shape[1]
    A = np.zeros((dimA, k), dtype=np.float64)
    Xr = np.ascontiguousarray(csr.data, dtype=np.float64)
    Xr_indptr = np.ascontiguousarray(csr.indptr, dtype=np.uintp)
    Xr_indices = np.ascontiguousarray(csr.indices, dtype=np.uintp)
    rc = lib.factors_multiple(
        _ptr(A, ctypes.c_double), _ptr(B, ctypes.c_double),
        _ptr(Bsum, ctypes.c_double), _ptr(Amean, ctypes.c_double),
        _ptr(Xr, ctypes.c_double), _ptr(Xr_indptr, ctypes.c_size_t),
        _ptr(Xr_indices, ctypes.c_size_t),
        k, dimA, l2_reg, w_mult, step_size, niter, maxupd,
        _METHOD_ENUM[method], limit_step, reuse_mean, 1,
    )
    assert rc == 0
    return A


def factors_single_reference(
    B, Bsum, Amean, item_ix, counts, *, l2_reg, maxupd=1000,
    l1_new=0.0, l1_old=0.0, w_mult=1.0, reuse_mean=True,
):
    """Reference ``factors_single`` (pred.c:201-304): one new row, always
    via the TNC solver."""
    lib = load()
    assert lib is not None
    B = np.ascontiguousarray(B, dtype=np.float64)
    Bsum = np.ascontiguousarray(Bsum, dtype=np.float64)
    Amean = np.ascontiguousarray(Amean, dtype=np.float64)
    X = np.ascontiguousarray(counts, dtype=np.float64)
    X_ind = np.ascontiguousarray(item_ix, dtype=np.uintp)
    k = B.shape[1]
    out = np.zeros(k, dtype=np.float64)
    rc = lib.factors_single(
        _ptr(out, ctypes.c_double), k,
        _ptr(Amean, ctypes.c_double), reuse_mean,
        _ptr(X, ctypes.c_double), _ptr(X_ind, ctypes.c_size_t),
        X_ind.shape[0],
        _ptr(B, ctypes.c_double), _ptr(Bsum, ctypes.c_double),
        maxupd, l2_reg, l1_new, l1_old, w_mult,
    )
    assert rc == 0
    return out
