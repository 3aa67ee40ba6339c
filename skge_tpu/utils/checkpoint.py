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


def _flatten(prefix: str, tree, keep: bool = False) -> Dict[str, np.ndarray]:
    """Flatten a nested dict to 'a::b::c' keys. `keep=True` leaves device
    arrays as-is (sharding preserved) instead of pulling them to host."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(
                _flatten(f"{prefix}{_SEP}{k}" if prefix else k, v, keep)
            )
    else:
        out[prefix] = tree if keep else np.asarray(tree)
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


def _snapshot_arrays(
    state: TrainState, meta: Optional[Dict[str, Any]]
) -> Dict[str, np.ndarray]:
    """Host-resident copies of the full training state (one D2H transfer
    per leaf; the snapshot is immutable once taken, so training may donate
    or mutate device buffers immediately afterwards)."""
    arrays = {}
    arrays.update(_flatten("params", jax.device_get(state.params)))
    arrays.update(_flatten("opt", jax.device_get(state.opt_state)))
    arrays["key"] = np.asarray(jax.random.key_data(state.key))
    arrays["step"] = np.asarray(state.step)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    return arrays


def _write_npz_atomic(path: str, arrays: Dict[str, np.ndarray]) -> None:
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


def save_checkpoint(
    path: str, state: TrainState, meta: Optional[Dict[str, Any]] = None
) -> None:
    """Atomic write of the full training state."""
    _write_npz_atomic(path, _snapshot_arrays(state, meta))


class AsyncCheckpointer:
    """Overlap checkpoint serialization with training (no reference
    counterpart — build-scope, the orbax-style production pattern).

    `save()` takes the host snapshot synchronously (device->host DMA — the
    cheap, correctness-critical part: the snapshot is decoupled from any
    buffer the step loop will donate/overwrite) and hands the npz write to
    a background thread, so the step loop resumes while the file
    serializes. Single-writer discipline: a new `save()` first joins the
    previous write (bounded memory — at most one in-flight snapshot — and
    checkpoints land in order). Write errors surface on the next `save()`
    or `wait()`. Use as a context manager or call `wait()` before exit.
    """

    def __init__(self) -> None:
        self._thread: Optional[Any] = None  # threading.Thread
        self._error: Optional[BaseException] = None

    def save(
        self, path: str, state: TrainState,
        meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        import threading

        self.wait()
        arrays = _snapshot_arrays(state, meta)

        def _write() -> None:
            try:
                _write_npz_atomic(path, arrays)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="skge-ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finishes; re-raise its
        error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, *exc) -> None:
        self.wait()


def save_sharded_checkpoint(
    dirpath: str,
    state: TrainState,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Per-shard checkpoint: no step ever materializes a full entity table
    on one host (the whole point of the partitioned / out-of-core paths —
    a full-table host gather is exactly what they exist to avoid).

    Layout (host-count- AND shard-count-independent):

        dirpath/manifest.json      n_shards, per-leaf row extents, meta
        dirpath/replicated.npz     key, step, replicated leaves (rank 0)
        dirpath/shard_{i:05d}.npz  row-slice of every sharded leaf

    A leaf is "sharded" when its placement splits axis 0 (detected from
    `jax.Array.addressable_shards` — works for any 1-D row sharding, the
    partitioned trainer's layout). Each PROCESS writes only the shards its
    devices own, so saving is distributed too; the manifest + replicated
    file are written by process 0. Loading re-places per the CURRENT mesh
    and shard count (`load_sharded_checkpoint`), reading only the row
    ranges each process needs.
    """
    os.makedirs(dirpath, exist_ok=True)
    flat = {}
    flat.update(_flatten("params", state.params, keep=True))
    flat.update(_flatten("opt", state.opt_state, keep=True))

    sharded_rows: Dict[str, int] = {}   # leaf -> rows per saved shard
    shapes: Dict[str, list] = {}
    per_shard: Dict[int, Dict[str, np.ndarray]] = {}
    replicated: Dict[str, np.ndarray] = {}
    n_shards = 1
    for name, v in flat.items():
        shapes[name] = list(v.shape)
        if (
            not hasattr(v, "addressable_shards")
            or v.sharding.is_fully_replicated
        ):
            replicated[name] = np.asarray(
                v.addressable_shards[0].data
                if hasattr(v, "addressable_shards") else v
            )
            continue
        shards = v.addressable_shards
        assert all(
            (idx.start or 0) == 0
            and idx.stop in (None, v.shape[i + 1])
            for s in shards for i, idx in enumerate(s.index[1:])
        ), f"{name}: only leading-axis (row) sharding is supported"
        rows = v.shape[0]
        seen = set()
        s_rows = None
        for s in shards:
            start = s.index[0].start or 0
            stop = s.index[0].stop if s.index[0].stop is not None else rows
            s_rows = stop - start
            sid = start // s_rows
            if sid in seen:
                continue
            seen.add(sid)
            per_shard.setdefault(sid, {})[name] = np.asarray(s.data)
        sharded_rows[name] = int(s_rows)
        n_shards = max(n_shards, rows // int(s_rows))

    for sid, leaves in per_shard.items():
        _atomic_savez(os.path.join(dirpath, f"shard_{sid:05d}.npz"), leaves)
    # manifest.json is the checkpoint's completion marker: every process
    # must have finished its shard files BEFORE rank 0 writes it, and no
    # process may return (e.g. to be preempted, or to restore()) before
    # the manifest exists
    _barrier("sharded_ckpt_shards_done")
    if jax.process_index() == 0:
        replicated["key"] = np.asarray(jax.random.key_data(state.key))
        replicated["step"] = np.asarray(state.step)
        _atomic_savez(os.path.join(dirpath, "replicated.npz"), replicated)
        manifest = {
            "n_shards": n_shards,
            "sharded_rows": sharded_rows,
            "shapes": shapes,
            "meta": meta or {},
        }
        tmp = os.path.join(dirpath, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(dirpath, "manifest.json"))
    _barrier("sharded_ckpt_manifest_done")


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _atomic_savez(path: str, arrays: Dict[str, np.ndarray]) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_sharded_checkpoint(
    dirpath: str, mesh, shard_axis: str = "shard"
) -> Tuple[TrainState, Dict[str, Any]]:
    """Load a `save_sharded_checkpoint` directory onto `mesh`.

    Sharded leaves are materialized with `jax.make_array_from_callback`:
    each device's row range is read straight from the covering shard
    file(s) — never a full host copy, works across process counts, and
    re-chunks transparently when the current mesh has a different shard
    count than the checkpoint (row ranges just span file boundaries).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    with open(os.path.join(dirpath, "manifest.json")) as f:
        manifest = json.load(f)
    with np.load(os.path.join(dirpath, "replicated.npz")) as z:
        replicated = {k: z[k] for k in z.files}
    key = jax.random.wrap_key_data(jnp.asarray(replicated.pop("key")))
    step = jnp.asarray(replicated.pop("step"))

    files: Dict[int, Any] = {}

    def shard_file(sid: int):
        if sid not in files:
            files[sid] = np.load(
                os.path.join(dirpath, f"shard_{sid:05d}.npz")
            )
        return files[sid]

    def leaf(name: str):
        shape = tuple(manifest["shapes"][name])
        if name in replicated:
            return jax.device_put(
                jnp.asarray(replicated[name]),
                NamedSharding(mesh, PartitionSpec()),
            )
        s_rows = manifest["sharded_rows"][name]
        sharding = NamedSharding(
            mesh, PartitionSpec(shard_axis, *([None] * (len(shape) - 1)))
        )

        def cb(index):
            rs = index[0]
            start = rs.start or 0
            stop = rs.stop if rs.stop is not None else shape[0]
            parts = []
            f0, f1 = start // s_rows, (stop - 1) // s_rows
            for sid in range(f0, f1 + 1):
                arr = shard_file(sid)[name]
                lo = max(start - sid * s_rows, 0)
                hi = min(stop - sid * s_rows, s_rows)
                parts.append(arr[lo:hi])
            out = parts[0] if len(parts) == 1 else np.concatenate(parts)
            rest = tuple(index[1:])
            return out[(slice(None),) + rest] if rest else out

        return jax.make_array_from_callback(shape, sharding, cb)

    # deterministic leaf order: every process must issue the device_put /
    # make_array_from_callback calls for the SAME leaf at the same point
    # (multi-process placement is collective); set() iteration order
    # varies with each interpreter's string-hash seed
    names = sorted(manifest["shapes"])
    tree = _unflatten({n: None for n in names})

    def fill(prefix, node):
        return {
            k: fill(f"{prefix}{_SEP}{k}", node[k])
            if isinstance(node[k], dict)
            else leaf(f"{prefix}{_SEP}{k}")
            for k in sorted(node)  # same collective order on every process
        }

    params = fill("params", tree["params"])
    opt_state = fill("opt", tree["opt"])
    for z in files.values():
        z.close()
    return (
        TrainState(params, opt_state, key, step),
        manifest.get("meta", {}),
    )


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


# ---------------------------------------------------------------------------
# Orbax interop (convenience; NEXT.md round-2 candidate). The native npz
# format above remains canonical — self-contained, host-count-independent,
# sharded, async — but production fleets often standardize on Orbax
# (ocp.StandardCheckpointer) for unified retention/GCS tooling, so a
# TrainState can round-trip through it too. The PRNG key travels as raw
# uint32 key data (Orbax serializes plain arrays, not typed PRNG keys);
# metadata rides as a sibling JSON file, mirroring the npz layout's
# meta_json member.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(
    dirpath: str, state: TrainState, meta: Optional[Dict[str, Any]] = None
) -> None:
    """Write `state` as an Orbax StandardCheckpoint directory."""
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    tree = {
        "params": jax.tree.map(np.asarray, dict(state.params)),
        "opt": jax.tree.map(np.asarray, dict(state.opt_state)),
        "key": np.asarray(jax.random.key_data(state.key)),
        "step": np.asarray(state.step),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(dirpath, tree, force=True)
    with open(dirpath + ".meta.json", "w") as f:
        json.dump(meta or {}, f)


def load_checkpoint_orbax(dirpath: str) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a TrainState saved by `save_checkpoint_orbax` (exact resume:
    params, optimizer accumulators, PRNG position, step)."""
    import orbax.checkpoint as ocp

    dirpath = os.path.abspath(dirpath)
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(dirpath)
    meta_path = dirpath + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    key = jax.random.wrap_key_data(jnp.asarray(tree["key"]))
    return TrainState(
        params={k: jnp.asarray(v) for k, v in tree["params"].items()},
        opt_state=jax.tree.map(jnp.asarray, tree["opt"]),
        key=key,
        step=jnp.asarray(tree["step"]),
    ), meta
