"""Executable oracles: naive NumPy/Python re-implementations of every stage
(the reference's debug/*.py pattern) plus a full model of the banzai
algorithm — quirks included — used for size-parity anchors in tests/bench.
"""

from .stages import naive_bwt, numpy_bwt, naive_mtf_rle2
from .banzai_model import banzai_compress

__all__ = ["naive_bwt", "numpy_bwt", "naive_mtf_rle2", "banzai_compress"]
