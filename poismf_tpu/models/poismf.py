"""User-facing ``PoisMF`` class - API-parity layer with the reference's
Python class (/root/reference/poismf/__init__.py:9-1121), backed by the
TPU-native batched solvers.

Constructor signature, "auto" hyperparameter tables, reindexing semantics,
and method surface (fit / fit_unsafe / predict / predict_factors / transform /
topN / topN_new) mirror the reference one-for-one; float32/float64 selection
maps to jnp dtypes instead of twin C extensions.
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np

import jax
import jax.numpy as jnp

from .. import serve, train
from ..ops import objective as obj
from ..utils.transfer import fetch_host
from ..sparse import (
    CountsMatrix,
    IngestResult,
    build_counts,
    ingest,
)
from ..train import FitParams

__all__ = ["PoisMF"]

# predict() streams pair lists longer than this through fixed-size padded
# chunks (one compiled program, bounded device memory)
PREDICT_CHUNK = 4_194_304


def _as_1d(x):
    return np.require(x, requirements=["ENSUREARRAY"]).reshape(-1)


def _scoped(fn):
    """Run a compute method under a SCOPED x64 context when the model is
    float64 (``use_float=False``), instead of flipping the process-global
    ``jax_enable_x64`` flag (the reference selects dtype per-extension,
    poismf/__init__.py:294; here the jnp dtype plus this scope is the
    equivalent without global side effects)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._x64_scope():
            return fn(self, *args, **kwargs)

    return wrapper


class PoisMF:
    """Fast non-Bayesian Poisson factorization of sparse counts, TPU-native.

    Parameters mirror the reference class (poismf/__init__.py:205-304):

    k, method ('tncg'|'cg'|'pg'), l2_reg ('auto' -> {tncg:1e3, cg:1e4,
    pg:1e9}), l1_reg, niter ('auto' -> {tncg:10, cg:30, pg:10}), maxupd
    ('auto' -> {tncg:15*k, cg:5, pg:10}), limit_step, initial_step,
    early_stop, reuse_prev, weight_mult, random_state, reindex, copy_data,
    produce_dicts, use_float, handle_interrupt.

    ``nthreads``/``n_jobs`` are accepted for drop-in compatibility but have no
    effect: parallelism comes from the XLA runtime and, when a device mesh is
    passed, from sharding rows across TPU chips.

    TPU-specific knobs: ``mesh`` (a ``jax.sharding.Mesh`` — rows sharded
    across its devices), ``layout`` ('auto'|'ell'|'coo' — planar-ELL is the
    gather-free fast path and the default), ``plane_dtype`` ('bfloat16'
    halves hot-loop HBM traffic at ~1e-4 relative LL impact), and
    ``nnz_chunk`` (bounds peak memory on the flat-COO backend).
    """

    def __init__(self, k=50, method="tncg",
                 l2_reg="auto", l1_reg=0.0,
                 niter="auto", maxupd="auto",
                 limit_step=True, initial_step=1e-7,
                 early_stop=True, reuse_prev=False,
                 weight_mult=1.0, random_state=1,
                 reindex=True, copy_data=True, produce_dicts=False,
                 use_float=True, handle_interrupt=True,
                 nthreads=-1, n_jobs=None,
                 mesh=None, nnz_chunk=None, layout="auto",
                 plane_dtype=None, max_cg="auto"):
        self.k = k
        self.method = method
        self.l2_reg = l2_reg
        self.l1_reg = l1_reg
        self.niter = niter
        self.maxupd = maxupd
        self.limit_step = limit_step
        self.initial_step = initial_step
        self.early_stop = early_stop
        self.reuse_prev = reuse_prev
        self.weight_mult = weight_mult
        self.random_state = random_state
        self.reindex = reindex
        self.copy_data = copy_data
        self.produce_dicts = produce_dicts
        self.use_float = use_float
        self.handle_interrupt = handle_interrupt
        self.nthreads = nthreads
        self.n_jobs = n_jobs
        self.mesh = mesh
        self.nnz_chunk = nnz_chunk
        self.layout = layout
        self.plane_dtype = plane_dtype
        # TPU-specific inner-CG cap for tncg training (see FitParams.max_cg);
        # "auto" = TPU-tuned 3, None = the reference's maxCGit =
        # clamp(k/2, 1, 50)
        self.max_cg = max_cg
        self._reset_state()

    # ------------------------------------------------------------------ state

    def _reset_state(self):
        self._A = None  # device array [n_users_pad, k]
        self._B = None  # device array [n_items_pad, k]
        self._by_user = None  # training data (device), absent after load()
        self._by_item = None
        self._fit_status = None
        self.user_mapping_ = np.empty(0, dtype=object)
        self.item_mapping_ = np.empty(0, dtype=object)
        self.user_dict_ = dict()
        self.item_dict_ = dict()
        self.nusers = 0
        self.nitems = 0
        self.Bsum = None
        self.Amean = None
        self.is_fitted = False

    @property
    def dtype(self):
        return np.float32 if self.use_float else np.float64

    def _x64_scope(self):
        """Scoped x64 for float64 models; a no-op for the float32 default."""
        if self.use_float:
            return contextlib.nullcontext()
        return jax.enable_x64()

    def _params(self) -> FitParams:
        return FitParams(
            k=self.k,
            method=self.method,
            l2_reg=self.l2_reg,
            l1_reg=self.l1_reg,
            niter=self.niter,
            maxupd=self.maxupd,
            limit_step=self.limit_step,
            initial_step=self.initial_step,
            early_stop=self.early_stop,
            reuse_prev=self.reuse_prev,
            w_mult=self.weight_mult,
            nnz_chunk=self.nnz_chunk,
            layout=self.layout,
            plane_dtype=self.plane_dtype,
            max_cg=self.max_cg,
        ).resolved()

    # ------------------------------------------------------------------ fitted
    # factor views (unpadded NumPy, like the reference's .A / .B attributes)

    @property
    def A(self) -> np.ndarray:
        if self._A is None:
            return np.empty((0, 0), dtype=self.dtype)
        return fetch_host(self._A[: self.nusers])

    @property
    def B(self) -> np.ndarray:
        if self._B is None:
            return np.empty((0, 0), dtype=self.dtype)
        return fetch_host(self._B[: self.nitems])

    # ------------------------------------------------------------------- fit

    @_scoped
    def fit(self, X):
        """Fit the model to a counts matrix.

        ``X``: pandas DataFrame(UserId, ItemId, Count), SciPy COO, or a
        ``(rows, cols, vals, (n_users, n_items))`` tuple.  Passing a COO
        forces ``reindex=False`` (like poismf/__init__.py:380-384).
        """
        p = self._params()
        if not _is_df(X):
            self.reindex = False  # COO input forces reindex off (:380-384)
        data = ingest(X, reindex=self.reindex, dtype=self.dtype)
        self._fit_ingested(data, p)
        self._produce_dicts()
        return self

    def _fit_ingested(self, data: IngestResult, p: FitParams):
        self.nusers = data.n_users
        self.nitems = data.n_items
        if data.user_mapping is not None:
            self.user_mapping_ = data.user_mapping
            self.item_mapping_ = data.item_mapping
        rng = _resolve_rng(self.random_state)
        A = train.initialize_factors(
            data.n_users, data.by_user.n_rows_pad, p.k, rng, self.dtype
        )
        B = train.initialize_factors(
            data.n_items, data.by_item.n_rows_pad, p.k, rng, self.dtype
        )
        self._run(A, B, data.by_user, data.by_item, p)

    def _run(self, A, B, by_user, by_item, p: FitParams):
        if self.mesh is not None:
            from ..parallel.mesh import run_poismf_sharded

            A, B, status = run_poismf_sharded(
                A, B, by_user, by_item, p, self.mesh,
                handle_interrupt=self.handle_interrupt,
            )
        else:
            A, B, status = train.run_poismf(
                A, B, by_user, by_item, p,
                handle_interrupt=self.handle_interrupt,
            )
        self._A, self._B = A, B
        self._by_user, self._by_item = by_user, by_item
        self._user_items_csr_cache = None
        # serving-side sufficient statistics (poismf/__init__.py:438-439)
        self.Bsum = obj.make_bsum(B, self.nitems, p.l1_reg)
        self.Amean = jnp.mean(self._A[: self.nusers], axis=0)
        self.is_fitted = True
        self._fit_status = status

    @_scoped
    def fit_unsafe(self, A, B, Xcsr, Xcsc):
        """No-validation fast path taking pre-initialized A [m,k], B [n,k] and
        the data in CSR and CSC (poismf/__init__.py:441-495).  Doubles as the
        warm-start/resume mechanism.  Arrays are used as-is (reindex off)."""
        p = self._params()
        self.reindex = False
        A = np.asarray(A, dtype=self.dtype)
        B = np.asarray(B, dtype=self.dtype)
        self.nusers, self.nitems = A.shape[0], B.shape[0]
        by_user = _counts_from_scipy(Xcsr, self.dtype)
        by_item = _counts_from_scipy(Xcsc.T.tocsr() if hasattr(Xcsc, "T")
                                     else Xcsc, self.dtype)
        A_pad = np.zeros((by_user.n_rows_pad, p.k), dtype=self.dtype)
        A_pad[: self.nusers] = A
        B_pad = np.zeros((by_item.n_rows_pad, p.k), dtype=self.dtype)
        B_pad[: self.nitems] = B
        self._run(jnp.asarray(A_pad), jnp.asarray(B_pad), by_user, by_item, p)
        return self

    def _produce_dicts(self):
        if not self.produce_dicts or not self.reindex:
            return
        self.user_dict_ = {u: i for i, u in enumerate(self.user_mapping_)}
        self.item_dict_ = {it: i for i, it in enumerate(self.item_mapping_)}

    # --------------------------------------------------------------- mapping

    @staticmethod
    def _map_through(ids: np.ndarray, dct: dict, mapping) -> np.ndarray:
        """Id remap via the produced dict (O(1) per id — the reference's
        fast path when produce_dicts=True, poismf/__init__.py:497-500) or
        a pd.Index when no dict was built; unknown ids -> -1 either way."""
        if dct:
            return np.fromiter(
                (dct.get(u, -1) for u in ids), dtype=np.int64,
                count=len(ids),
            )
        import pandas as pd

        return pd.Index(mapping).get_indexer(ids)

    def _map_users(self, user) -> np.ndarray:
        users = _as_1d(user) if not np.isscalar(user) else np.array([user])
        if self.reindex and len(self.user_mapping_):
            return self._map_through(users, self.user_dict_,
                                     self.user_mapping_)
        return users.astype(np.int64)

    def _map_items(self, item) -> np.ndarray:
        items = _as_1d(item) if not np.isscalar(item) else np.array([item])
        if self.reindex and len(self.item_mapping_):
            return self._map_through(items, self.item_dict_,
                                     self.item_mapping_)
        return items.astype(np.int64)

    # --------------------------------------------------------------- predict

    @_scoped
    def predict(self, user, item):
        """Expected counts for user/item pairs; invalid ids -> NaN
        (poismf/__init__.py:726-834)."""
        assert self.is_fitted
        scalar = np.isscalar(user) and np.isscalar(item)
        u = self._map_users(user)
        it = self._map_items(item)
        assert u.shape[0] == it.shape[0]
        bad = (u < 0) | (it < 0) | (u >= self.nusers) | (it >= self.nitems)
        if scalar:
            if bad[0]:
                return np.nan
            return float(
                serve.predict_pairs(
                    self._A, self._B, jnp.asarray(u), jnp.asarray(it)
                )[0]
            )
        out = np.full(u.shape[0], np.nan, dtype=self.dtype)
        ok = ~bad
        if np.any(ok):
            uu = u[ok].astype(np.int32)
            ii = it[ok].astype(np.int32)
            # stream very large pair lists through fixed-size chunks: one
            # program (padded final chunk), bounded device memory, and no
            # oversized single upload on slow links
            CHUNK = PREDICT_CHUNK
            if uu.shape[0] <= CHUNK:
                vals = np.asarray(serve.predict_pairs(
                    self._A, self._B, jnp.asarray(uu), jnp.asarray(ii)
                ))
            else:
                parts = []
                for s in range(0, uu.shape[0], CHUNK):
                    cu = uu[s:s + CHUNK]
                    ci = ii[s:s + CHUNK]
                    if cu.shape[0] < CHUNK:  # pad -> reuse the compiled call
                        pad = CHUNK - cu.shape[0]
                        cu = np.concatenate([cu, np.zeros(pad, np.int32)])
                        ci = np.concatenate([ci, np.zeros(pad, np.int32)])
                        parts.append(np.asarray(serve.predict_pairs(
                            self._A, self._B, jnp.asarray(cu),
                            jnp.asarray(ci)
                        ))[: CHUNK - pad])
                    else:
                        parts.append(np.asarray(serve.predict_pairs(
                            self._A, self._B, jnp.asarray(cu),
                            jnp.asarray(ci)
                        )))
                vals = np.concatenate(parts)
            out[ok] = vals
        return out

    # ------------------------------------------------------------------ topN

    def _process_include_exclude(self, include, exclude):
        """Validation + id remapping (poismf/__init__.py:933-974)."""
        if include is not None and exclude is not None:
            raise ValueError(
                "Can only pass one of 'include' or 'exclude'."
            )

        def _remap(lst):
            arr = self._map_items(_as_1d(lst))
            if np.any(arr < 0) or np.any(arr >= self.nitems):
                raise ValueError(
                    "'include'/'exclude' contains invalid items."
                )
            return arr.astype(np.int32)

        include_ix = _remap(include) if include is not None else None
        exclude_ix = _remap(exclude) if exclude is not None else None
        return include_ix, exclude_ix

    @_scoped
    def topN(self, user, n=10, include=None, exclude=None, output_score=False):
        """Top-N highest-predicted items for an existing user
        (poismf/__init__.py:837-930)."""
        assert self.is_fitted
        u = self._map_users(user)
        if u.shape[0] != 1 or u[0] < 0 or u[0] >= self.nusers:
            raise ValueError("Invalid user.")
        include_ix, exclude_ix = self._process_include_exclude(
            include, exclude
        )
        res = serve.top_n(
            self._A[int(u[0])], self._B, n_top=n,
            include_ix=include_ix, exclude_ix=exclude_ix,
            n_items=self.nitems, output_score=output_score,
        )
        return self._map_topn_out(res, output_score)

    def _map_topn_out(self, res, output_score):
        if output_score:
            idx, score = res
        else:
            idx, score = res, None
        if self.reindex and len(self.item_mapping_):
            idx = np.asarray(self.item_mapping_)[idx]
        if output_score:
            return idx, np.asarray(score)
        return idx

    @_scoped
    def topN_batched(self, users, n=10, exclude_seen=False,
                     output_score=False):
        """Top-N for a BATCH of existing users in one MXU matmul
        (``serve.top_n_batched``) — the high-throughput serving path the
        reference can only emulate by looping ``topN`` per user
        (poismf/__init__.py:837-930 serves one user per C call).

        ``exclude_seen=True`` masks out each user's own training items
        (requires the training data, i.e. a model fitted in this process).
        Returns ``[len(users), n]`` item ids (remapped when ``reindex``),
        plus scores when ``output_score``.
        """
        assert self.is_fitted
        u = self._map_users(users)
        if np.any(u < 0) or np.any(u >= self.nusers):
            raise ValueError("'users' contains invalid users.")
        u = u.astype(np.int32)
        if n > self.nitems:
            raise ValueError("'n' is larger than the number of items.")
        if exclude_seen:
            vals, idx = self._topn_batched_excl_seen(u, n)
        else:
            # padded B rows are masked in-kernel via an iota compare
            # (static n_items) — no [Q, n_items] mask tensor anywhere
            vals, idx = serve.top_n_batched(
                jnp.take(self._A, jnp.asarray(u), axis=0), self._B, n,
                n_items=self.nitems,
            )
            idx = np.asarray(idx)
        if self.reindex and len(self.item_mapping_):
            # exhausted-candidate slots carry the sentinel -1 (see
            # serve.top_n_batched); keep it out of the id remap
            mapped = np.asarray(self.item_mapping_)[np.maximum(idx, 0)]
            if np.any(idx < 0):
                mapped = mapped.astype(object)
                mapped[idx < 0] = -1
            idx = mapped
        if output_score:
            return idx, np.asarray(vals)
        return idx

    # users per exclusion dispatch: bounds the [Qc, n_items_pad] device
    # score buffer (2048 x 160k f32 ~ 1.3 GB at the Last.FM catalog) and
    # keeps one compiled program per (chunk, list-length) shape
    _EXCL_CHUNK = 2048

    def _topn_batched_excl_seen(self, u: np.ndarray, n: int):
        """Device-side ``exclude_seen`` ranking: per chunk of users, build
        the padded [Qc, L] train-item lists VECTORIZED on host (L = the
        chunk's max list length, pow2-quantized so list-length drift reuses
        compiled programs) and scatter -inf on device
        (serve.top_n_batched_excl).  Replaces the old dense [Q, n_items]
        host bool mask + per-user Python loop, which at the bench catalog
        cost ~1.6 GB of host memory and a 10k-iteration loop for 10k users
        (the reference excludes per query in C, topN.c:155-169)."""
        if u.shape[0] == 0:
            # the chunk loop below never runs on an empty query set and
            # np.concatenate([]) would raise; match the dense-mask and
            # exclude_seen=False paths, which return empty results
            return (np.zeros((0, n), dtype=np.float32),
                    np.zeros((0, n), dtype=np.int32))
        indptr, indices = self._user_items_csr()
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        CH = self._EXCL_CHUNK
        idx_parts, val_parts = [], []
        for s in range(0, u.shape[0], CH):
            uu = u[s:s + CH]
            q = uu.shape[0]
            if q < CH and u.shape[0] > CH:
                # pad the tail chunk to the full shape (one program)
                uu = np.concatenate(
                    [uu, np.full(CH - q, uu[0], dtype=uu.dtype)]
                )
            starts = indptr[uu]
            lens = indptr[uu + 1] - starts
            lmax = max(int(lens.max()) if lens.size else 1, 1)
            L = 1 << (lmax - 1).bit_length()
            pos = np.arange(L, dtype=np.int64)[None, :]
            valid = pos < lens[:, None]
            gidx = np.minimum(starts[:, None] + pos, indices.shape[0] - 1)
            items = np.where(valid, indices[gidx], 0).astype(np.int32)
            vals_c, idx_c = serve.top_n_batched_excl(
                jnp.take(self._A, jnp.asarray(uu), axis=0), self._B,
                jnp.asarray(items), jnp.asarray(valid), n,
                n_items=self.nitems,
            )
            idx_parts.append(np.asarray(idx_c)[:q])
            val_parts.append(np.asarray(vals_c)[:q])
        return np.concatenate(val_parts), np.concatenate(idx_parts)

    def _user_items_csr(self):
        """Host CSR (indptr, indices) of the training by-user matrix, cached
        after the first call (one device->host transfer)."""
        if self._by_user is None:
            raise ValueError(
                "No training data attached to this model (e.g. it was "
                "restored from a checkpoint); 'exclude_seen' is unavailable."
            )
        cached = getattr(self, "_user_items_csr_cache", None)
        if cached is None:
            from ..sparse import csr_like

            indptr, indices, _ = csr_like(self._by_user)
            cached = (indptr, indices)
            self._user_items_csr_cache = cached
        return cached

    @_scoped
    def topN_new(self, X, n=10, include=None, exclude=None,
                 output_score=False, l2_reg=None, l1_reg=None,
                 weight_mult=None, maxupd=None):
        """Top-N for a NEW user given their item counts: cold-start factors
        (always TNCG) + ranking (poismf/__init__.py:977-1075)."""
        a_vec = self.predict_factors(
            X, l2_reg=l2_reg, l1_reg=l1_reg, weight_mult=weight_mult,
            maxupd=maxupd,
        )
        include_ix, exclude_ix = self._process_include_exclude(
            include, exclude
        )
        res = serve.top_n(
            jnp.asarray(a_vec), self._B, n_top=n,
            include_ix=include_ix, exclude_ix=exclude_ix,
            n_items=self.nitems, output_score=output_score,
        )
        return self._map_topn_out(res, output_score)

    # ------------------------------------------ out-of-sample factor solving

    def _process_data_single(self, X):
        """(ItemId, Count) arrays for one user (poismf/__init__.py:578-608)."""
        import pandas as pd

        if isinstance(X, pd.DataFrame):
            assert X.shape[0] > 0
            if "ItemId" not in X.columns or "Count" not in X.columns:
                raise ValueError("'X' must have columns ItemId, Count")
            items = X["ItemId"].to_numpy()
            counts = X["Count"].to_numpy()
        elif isinstance(X, (tuple, list)):
            items = np.asarray(X[0]).reshape(-1)
            counts = np.asarray(X[1]).reshape(-1)
            if items.shape[0] != counts.shape[0]:
                raise ValueError(
                    "'X' must have the same number of entries for items "
                    "and counts."
                )
        else:
            raise ValueError("'X' must be a DataFrame or tuple.")
        items = self._map_items(items)
        if items.min(initial=0) < 0 or items.max(initial=0) >= self.nitems:
            raise ValueError("'X' contains invalid items.")
        return items.astype(np.int32), counts.astype(self.dtype)

    @_scoped
    def predict_factors(self, X, l2_reg=None, l1_reg=None, weight_mult=None,
                        maxupd=None):
        """Latent factors for one NEW user - always uses TNCG regardless of
        the training method (poismf/__init__.py:502-576; pred.c:201-304)."""
        assert self.is_fitted
        p = self._params()
        l2 = p.l2_reg if l2_reg is None else float(l2_reg)
        l1_new = p.l1_reg if l1_reg is None else float(l1_reg)
        w = p.w_mult if weight_mult is None else float(weight_mult)
        mu = max(1000, p.maxupd) if maxupd is None else int(maxupd)
        items, counts = self._process_data_single(X)
        out = serve.factors_single(
            self._B, self.Bsum, self.Amean, items, counts,
            l2_reg=l2, l1_new=l1_new, l1_old=p.l1_reg, w_mult=w,
            # init from Amean only when reuse_prev, else 1e-3 — matching the
            # reference's plumb-through (__init__.py:567; pred.c:273-279)
            maxupd=mu, reuse_mean=self.reuse_prev, n_items=self.nitems,
        )
        out = np.asarray(out)
        if np.any(np.isnan(out)):
            raise ValueError(
                "NaNs encountered in the result. Failed to produce factors."
            )
        if np.max(out) <= 0:
            raise ValueError(
                "Optimization failed. Could not calculate factors."
            )
        return out

    @_scoped
    def transform(self, X, y=None):
        """Latent factors for a BATCH of new users, same method and
        hyperparameters as fit (poismf/__init__.py:619-692).

        DataFrame input returns ``(A_new, user_mapping)``; CSR/COO input
        returns ``A_new`` row-matched to X."""
        assert self.is_fitted
        p = self._params()
        import pandas as pd

        user_mapping = np.empty(0, dtype=object)
        if isinstance(X, pd.DataFrame):
            required = ["UserId", "ItemId", "Count"]
            if any(c not in X.columns for c in required):
                raise ValueError(
                    "'X' must contain columns " + ", ".join(required)
                )
            codes, user_mapping = pd.factorize(X["UserId"])
            items = self._map_items(X["ItemId"].to_numpy())
            if np.any(items < 0):
                raise ValueError("'X' contains invalid items.")
            counts = X["Count"].to_numpy()
            n_new = int(codes.max()) + 1
            X_new = build_counts(
                np.asarray(codes, dtype=np.int32), items.astype(np.int32),
                counts, n_new, self.nitems, dtype=self.dtype,
            )
        else:
            if self.reindex and len(self.item_mapping_):
                raise ValueError(
                    "'X' must be a DataFrame if using 'reindex=True'."
                )
            csr = X.tocsr() if hasattr(X, "tocsr") else X
            if csr.shape[1] > self.nitems:
                raise ValueError(
                    "'X' must have the same columns (items) as passed to "
                    "'fit'."
                )
            X_new = _counts_from_scipy(csr, self.dtype)
            n_new = csr.shape[0]

        A_new = serve.factors_multiple(
            self._B, self.Bsum, self.Amean, X_new, p,
            reuse_mean=self.reuse_prev or self.method != "tncg",
        )
        A_new = np.asarray(A_new[:n_new])
        if user_mapping.shape[0]:
            return A_new, np.asarray(user_mapping)
        return A_new

    # ------------------------------------------------------------ evaluation

    @_scoped
    def eval_llk(self, X=None, full_llk=False, include_missing=False):
        """Poisson log-likelihood of the fitted model on its training data (or
        on new triplets) - the reference declares this in its C API
        (poismf.h:258-269) but never shipped an implementation."""
        assert self.is_fitted
        if X is None:
            if self._by_user is None:
                raise ValueError(
                    "No training data attached to this model (e.g. it was "
                    "restored from a checkpoint). Pass X=(users, items, "
                    "counts) triplets to evaluate."
                )
            return float(
                obj.eval_llk(self._A, self._B, self._by_user,
                             full_llk=full_llk,
                             include_missing=include_missing)
            )
        u = self._map_users(X[0]).astype(np.int32)
        it = self._map_items(X[1]).astype(np.int32)
        vals = jnp.asarray(np.asarray(X[2], dtype=self.dtype))
        return float(
            obj.eval_llk_entries(
                self._A, self._B, jnp.asarray(u), jnp.asarray(it), vals,
                full_llk=full_llk,
            )
        )

    # ---------------------------------------------------------- persistence

    def save(self, path: str):
        from ..io.checkpoint import save_model

        save_model(self, path)

    @classmethod
    def load(cls, path: str) -> "PoisMF":
        from ..io.checkpoint import load_model

        return load_model(cls, path)

    def __repr__(self):
        status = "fitted" if self.is_fitted else "not fitted"
        return (
            f"PoisMF(k={self.k}, method='{self.method}', {status}, "
            f"users={self.nusers}, items={self.nitems})"
        )

    __str__ = __repr__


def _is_df(X) -> bool:
    return type(X).__name__ == "DataFrame"


def _resolve_rng(random_state):
    if isinstance(random_state, np.random.Generator):
        return random_state
    if random_state is None:
        return np.random.default_rng()
    if isinstance(random_state, np.random.RandomState):
        return np.random.default_rng(random_state.randint(2**31 - 1))
    return np.random.default_rng(int(random_state))


def _counts_from_scipy(csr, dtype) -> CountsMatrix:
    coo = csr.tocoo()
    return build_counts(
        coo.row.astype(np.int32), coo.col.astype(np.int32), coo.data,
        coo.shape[0], coo.shape[1], dtype=dtype,
    )
