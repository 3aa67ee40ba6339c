"""`skge.util` — numeric utilities of the reference surface."""
from skge_tpu.util import (  # noqa: F401
    ccorr,
    cconv,
    grad_sum_matrix,
    init_nvecs,
    to_tensor,
    unzip_triples,
)
