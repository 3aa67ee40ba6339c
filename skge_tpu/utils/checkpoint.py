"""Checkpoint / resume — fixes the reference's gaps by design.

The reference pickles the whole model object (`Model.save/load`,
skge/base.py ~75-95) WITHOUT optimizer state or RNG position (SURVEY.md
§3.5). Here a checkpoint is the complete deterministic-resume tuple

    (params, optimizer accumulators, PRNG key, step, metadata)

stored as a single `.npz` (host-count-independent: arrays are saved
unsharded and re-placed on load per the current mesh) plus a JSON metadata
blob. Resuming mid-training reproduces the exact same trajectory as an
uninterrupted run (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skge_tpu.training import TrainState

_SEP = "::"  # flat key separator inside the npz


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}{_SEP}{k}" if prefix else k, v))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(
    path: str, state: TrainState, meta: Optional[Dict[str, Any]] = None
) -> None:
    """Atomic write of the full training state."""
    arrays = {}
    arrays.update(_flatten("params", jax.device_get(state.params)))
    arrays.update(_flatten("opt", jax.device_get(state.opt_state)))
    arrays["key"] = np.asarray(jax.random.key_data(state.key))
    arrays["step"] = np.asarray(state.step)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Tuple[TrainState, Dict[str, Any]]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("meta_json").tobytes()).decode() or "{}")
    key = jax.random.wrap_key_data(jnp.asarray(flat.pop("key")))
    step = jnp.asarray(flat.pop("step"))
    params_flat = {
        k.split(_SEP, 1)[1]: v for k, v in flat.items() if k.startswith("params" + _SEP)
    }
    opt_flat = {
        k.split(_SEP, 1)[1]: v for k, v in flat.items() if k.startswith("opt" + _SEP)
    }
    params = {k: jnp.asarray(v) for k, v in _unflatten(params_flat).items()}
    opt_state = jax.tree.map(jnp.asarray, _unflatten(opt_flat))
    return TrainState(params, opt_state, key, step), meta
