"""`skge.base` — Model/trainer module of the reference surface."""
from skge_tpu.compat import (  # noqa: F401
    Config,
    Model,
    PairwiseStochasticTrainer,
    StochasticTrainer,
)
