"""Pallas TPU kernels for the hot per-pixel loops (SURVEY.md §2 #14, #16).

Each kernel has a pure-XLA twin in dvo_tpu.models/ops; `interpret=True`
makes them runnable (slowly) on CPU for unit tests.
"""

from dvo_tpu.ops.pallas.gn import gn_terms_pallas
from dvo_tpu.ops.pallas.epipolar import epipolar_update_pallas

__all__ = ["gn_terms_pallas", "epipolar_update_pallas"]
