"""`skge.actfun` — activation classes of the reference surface."""
from skge_tpu.actfun import Linear, ReLU, Sigmoid, Tanh  # noqa: F401
