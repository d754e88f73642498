"""Model persistence: checkpoint/resume of the full serving state.

The reference has NO checkpointing (SURVEY.md section 5) - its only resume
mechanism is re-passing A/B through ``fit_unsafe``.  Here we persist the whole
model {A, B, Bsum, Amean, id mappings, hyperparameters} to a single ``.npz``
so a fit can be resumed (via ``fit_unsafe``) or served from a cold start.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

_HYPERPARAMS = [
    "k", "method", "l2_reg", "l1_reg", "niter", "maxupd", "limit_step",
    "initial_step", "early_stop", "reuse_prev", "weight_mult", "random_state",
    "reindex", "copy_data", "produce_dicts", "use_float", "handle_interrupt",
    "nnz_chunk", "layout", "plane_dtype", "max_cg",
]

# v1 (round 1-2) lacked layout/plane_dtype; v2 added them plus this key;
# v3 adds max_cg.  Loading is forward-tolerant: unknown constructor keys
# would be a hard error, so a version newer than ours raises with a clear
# message (missing keys in OLDER checkpoints fall back to constructor
# defaults).
_FORMAT_VERSION = 3


def save_model(model, path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    hp = {"__format_version__": _FORMAT_VERSION}
    for name in _HYPERPARAMS:
        v = getattr(model, name)
        if isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        if isinstance(v, (int, float, str, bool)) or v is None:
            hp[name] = v
    arrays = dict(
        A=np.asarray(model.A),
        B=np.asarray(model.B),
        nusers=np.asarray(model.nusers),
        nitems=np.asarray(model.nitems),
        hyperparams=np.frombuffer(
            json.dumps(hp).encode("utf-8"), dtype=np.uint8
        ),
        is_fitted=np.asarray(model.is_fitted),
    )
    if model.Bsum is not None:
        arrays["Bsum"] = np.asarray(model.Bsum)
        arrays["Amean"] = np.asarray(model.Amean)
    if len(model.user_mapping_):
        arrays["user_mapping"] = np.asarray(model.user_mapping_)
        arrays["item_mapping"] = np.asarray(model.item_mapping_)
    np.savez_compressed(path, **arrays)


def load_model(cls, path: str):
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=True) as data:
        hp = json.loads(bytes(data["hyperparams"]).decode("utf-8"))
        version = hp.pop("__format_version__", 1)
        if version > _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format v{version} is newer than this build "
                f"(v{_FORMAT_VERSION}); upgrade poismf_tpu to load it"
            )
        model = cls(**hp)
        # float64 checkpoints need the scoped x64 context or jnp.asarray
        # below would silently downcast the factors to f32
        with model._x64_scope():
            _restore(model, data)
    return model


def _restore(model, data):
    model.nusers = int(data["nusers"])
    model.nitems = int(data["nitems"])
    model.is_fitted = bool(data["is_fitted"])
    if model.is_fitted:
        from ..sparse import _pad_to, ROW_PAD_MULTIPLE

        A = data["A"]
        B = data["B"]
        A_pad = np.zeros(
            (_pad_to(model.nusers, ROW_PAD_MULTIPLE), A.shape[1]),
            dtype=A.dtype,
        )
        A_pad[: model.nusers] = A
        B_pad = np.zeros(
            (_pad_to(model.nitems, ROW_PAD_MULTIPLE), B.shape[1]),
            dtype=B.dtype,
        )
        B_pad[: model.nitems] = B
        model._A = jnp.asarray(A_pad)
        model._B = jnp.asarray(B_pad)
        if "Bsum" in data:
            model.Bsum = jnp.asarray(data["Bsum"])
            model.Amean = jnp.asarray(data["Amean"])
    if "user_mapping" in data:
        model.user_mapping_ = data["user_mapping"]
        model.item_mapping_ = data["item_mapping"]
        model._produce_dicts()
