"""Numeric primitives: circular correlation, gradient aggregation, kernels."""

from skge_tpu.ops.circulant import ccorr, cconv
from skge_tpu.ops.aggregate import (
    DenseGrads,
    UniqueGrads,
    segment_mean_dense,
    segment_mean_unique,
)
from skge_tpu.ops.pallas_segment import segment_sum_pallas

__all__ = [
    "ccorr",
    "cconv",
    "DenseGrads",
    "UniqueGrads",
    "segment_mean_dense",
    "segment_mean_unique",
    "segment_sum_pallas",
]
