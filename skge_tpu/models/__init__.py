"""KGE model family: the reference roster TransE, RESCAL, HolE, ER-MLP
(SURVEY.md §2.1 #6-9) plus DistMult and ComplEx (standard production
baselines beyond the reference — see their module docstrings)."""

from skge_tpu.models.base import KGEModel, activation, nunif, normal
from skge_tpu.models.transe import TransE
from skge_tpu.models.rescal import RESCAL
from skge_tpu.models.hole import HolE
from skge_tpu.models.ermlp import ERMLP
from skge_tpu.models.distmult import DistMult
from skge_tpu.models.complexe import ComplEx

MODELS = {m.name: m for m in (TransE, RESCAL, HolE, ERMLP, DistMult, ComplEx)}

__all__ = [
    "KGEModel",
    "TransE",
    "RESCAL",
    "HolE",
    "ERMLP",
    "DistMult",
    "ComplEx",
    "MODELS",
    "activation",
    "nunif",
    "normal",
]
