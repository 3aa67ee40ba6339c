"""KGE model family: the reference roster TransE, RESCAL, HolE, ER-MLP
(SURVEY.md §2.1 #6-9) plus DistMult, ComplEx, RotatE, TransH, TransR,
TuckER, SimplE, QuatE and PairRE (standard production baselines beyond
the reference — see their module docstrings)."""

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
from skge_tpu.models.simple import SimplE
from skge_tpu.models.quate import QuatE
from skge_tpu.models.pairre import PairRE
from skge_tpu.models.conve import ConvE

MODELS = {
    m.name: m
    for m in (
        TransE, RESCAL, HolE, ERMLP, DistMult, ComplEx, RotatE,
        TransH, TransR, TuckER, SimplE, QuatE, PairRE, ConvE,
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
    "SimplE",
    "QuatE",
    "PairRE",
    "ConvE",
    "MODELS",
    "activation",
    "nunif",
    "normal",
]
