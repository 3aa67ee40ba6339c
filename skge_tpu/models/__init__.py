"""KGE model family: TransE, RESCAL, HolE, ER-MLP (SURVEY.md §2.1 #6-9)."""

from skge_tpu.models.base import KGEModel, activation, nunif, normal
from skge_tpu.models.transe import TransE
from skge_tpu.models.rescal import RESCAL
from skge_tpu.models.hole import HolE
from skge_tpu.models.ermlp import ERMLP

MODELS = {m.name: m for m in (TransE, RESCAL, HolE, ERMLP)}

__all__ = [
    "KGEModel",
    "TransE",
    "RESCAL",
    "HolE",
    "ERMLP",
    "MODELS",
    "activation",
    "nunif",
    "normal",
]
