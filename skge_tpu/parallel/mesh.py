"""Device mesh construction and parameter PartitionSpecs.

Parallelism layout (SURVEY.md §2.3 / §5 "long-context equivalent"):

- axis 'data'  — batch (edge-partitioned triples): pure data parallelism.
- axis 'model' — entity-table rows: the entity dimension is this domain's
  long axis (up to millions of rows), so `E` (and its AdaGrad accumulator)
  is row-sharded across 'model'. Gathers of remote rows and the scatter-add
  of their gradients become XLA collectives over ICI; relation tables are
  replicated and their gradients psum-ed implicitly by SPMD.

Everything is expressed once as NamedSharding; `jax.jit` inserts the
collectives (GSPMD). A (1, 1) mesh degenerates to the single-chip program.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skge_tpu.models.base import KGEModel
from skge_tpu.training import TrainState

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """2-D ('data', 'model') mesh. Default shape: model axis gets 2 when the
    device count is even, else 1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        model = 2 if n % 2 == 0 and n >= 2 else 1
        shape = (n // model, model)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_specs(model: KGEModel) -> Dict[str, P]:
    """Entity tables row-sharded over 'model'; everything else replicated."""
    specs: Dict[str, P] = {}
    for _, pname, role in model.slot_spec():
        if role in ("s", "o"):
            nd = 2  # entity tables are (n_e, d)
            specs[pname] = P(MODEL_AXIS, *([None] * (nd - 1)))
        else:
            specs.setdefault(pname, P())  # relation tables replicated
    for pname in model.dense_param_names:
        specs[pname] = P()
    return specs


def state_shardings(model: KGEModel, mesh: Mesh) -> TrainState:
    """NamedShardings pytree matching a TrainState for this model."""
    specs = param_specs(model)

    def ns(spec):
        return NamedSharding(mesh, spec)

    params_sh = {k: ns(specs[k]) for k in specs}
    opt_sh = {k: {"p2": ns(specs[k])} for k in specs}
    return TrainState(
        params=params_sh,
        opt_state=opt_sh,
        key=ns(P()),
        step=ns(P()),
    )


def shard_state(state: TrainState, model: KGEModel, mesh: Mesh) -> TrainState:
    """Place an existing state onto the mesh with the canonical shardings."""
    sh = state_shardings(model, mesh)
    opt_sh = {
        k: {kk: sh.opt_state[k]["p2"] for kk in state.opt_state[k]}
        for k in state.opt_state
    }
    return TrainState(
        params={
            k: jax.device_put(v, sh.params[k]) for k, v in state.params.items()
        },
        opt_state={
            k: {
                kk: jax.device_put(vv, opt_sh[k][kk])
                for kk, vv in state.opt_state[k].items()
            }
            for k in state.opt_state
        },
        key=jax.device_put(state.key, sh.key),
        step=jax.device_put(state.step, sh.step),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))
