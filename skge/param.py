"""`skge.param` — parameter/optimizer module of the reference surface."""
from skge_tpu.param import (  # noqa: F401
    AdaGrad,
    Parameter,
    ParameterUpdate,
    SGD,
    normal,
    normless1,
    nunif,
)
