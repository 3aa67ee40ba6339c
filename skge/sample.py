"""`skge.sample` — host sampler module of the reference import surface."""
from skge_tpu.sample import (  # noqa: F401
    BernoulliSampler,
    CorruptedSampler,
    LCWASampler,
    RandomModeSampler,
    Sampler,
    type_index,
)
