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
from skge_tpu.models.rotate import RotatE

MODELS = {m.name: m for m in (TransE, RESCAL, HolE, ERMLP, DistMult, ComplEx, RotatE)}

__all__ = [
    "KGEModel",
    "TransE",
    "RESCAL",
    "HolE",
    "ERMLP",
    "DistMult",
    "ComplEx",
    "RotatE",
    "MODELS",
    "activation",
    "nunif",
    "normal",
]
