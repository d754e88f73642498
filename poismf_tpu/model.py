"""Backwards-compatible alias for :mod:`poismf_tpu.models.poismf`."""

from .models.poismf import PoisMF

__all__ = ["PoisMF"]
