"""KGE model family: the reference roster TransE, RESCAL, HolE, ER-MLP
(SURVEY.md §2.1 #6-9) plus DistMult, ComplEx, RotatE, TransH, TransR and
TuckER (standard production baselines beyond the reference — see their
module docstrings)."""

from skge_tpu.models.base import KGEModel, activation, nunif, normal
from skge_tpu.models.transe import TransE
from skge_tpu.models.rescal import RESCAL
from skge_tpu.models.hole import HolE
from skge_tpu.models.ermlp import ERMLP
from skge_tpu.models.distmult import DistMult
from skge_tpu.models.complexe import ComplEx
from skge_tpu.models.rotate import RotatE
from skge_tpu.models.transh import TransH
from skge_tpu.models.transr import TransR
from skge_tpu.models.tucker import TuckER

MODELS = {
    m.name: m
    for m in (
        TransE, RESCAL, HolE, ERMLP, DistMult, ComplEx, RotatE,
        TransH, TransR, TuckER,
    )
}

__all__ = [
    "KGEModel",
    "TransE",
    "RESCAL",
    "HolE",
    "ERMLP",
    "DistMult",
    "ComplEx",
    "RotatE",
    "TransH",
    "TransR",
    "TuckER",
    "MODELS",
    "activation",
    "nunif",
    "normal",
]
