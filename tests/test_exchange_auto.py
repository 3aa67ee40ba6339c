"""Boundary-exchange auto-selection (VERDICT r2 item 8): the calibrated
cost model picks dense+overlap while compute can hide the bytes and ragged
when the cap outgrows it, and PartitionedTrainer(exchange=...) wires each
choice through to a working train step (CPU: ragged runs as the
bit-identical dense emulation)."""

import numpy as np

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, TransE
from skge_tpu.parallel.partitioned import (
    SHARD_AXIS,
    PartitionedTrainer,
    choose_exchange,
)
from jax.sharding import Mesh


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), (SHARD_AXIS,))


def test_cost_model_crossover():
    # small cap + small pool: compute hides the dense bytes entirely
    # (matches the compiled-evidence sweep row d=64 C=256: dense)
    c, r = choose_exchange(d=64, cap=256, k=512, batch_per_shard=2048, p=8)
    assert c == "dense", r
    assert r["exposed_dense_cycles"] == 0
    # big cap: P-fold fewer bytes beats what compute can hide
    # (sweep row d=64 C=2048: ragged)
    c, r = choose_exchange(d=64, cap=2048, k=512, batch_per_shard=2048, p=8)
    assert c == "ragged", r
    assert r["exposed_ragged_cycles"] < r["exposed_dense_cycles"]
    # huge pool: the P*(C+k) gradient return dominates — ragged wins even
    # at a tiny cap
    c, r = choose_exchange(d=128, cap=256, k=8192, batch_per_shard=2048, p=8)
    assert c == "ragged", r
    # monotone in (clamped) cap
    prev = 0.0
    for cap in (256, 512, 1024, 2048):
        _, r = choose_exchange(d=64, cap=cap, k=512,
                               batch_per_shard=2048, p=8)
        assert r["exposed_dense_cycles"] >= prev
        prev = r["exposed_dense_cycles"]
    # cap clamps to the per-shard batch: beyond it the decision is constant
    _, r1 = choose_exchange(d=64, cap=4096, k=512, batch_per_shard=2048, p=8)
    _, r2 = choose_exchange(d=64, cap=65536, k=512, batch_per_shard=2048, p=8)
    assert r1 == r2


def _toy(n_e=4000, n_r=8, n=6000, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.integers(0, n_e, n), rng.integers(0, n_e, n),
        rng.integers(0, n_r, n),
    ], axis=1).astype(np.int32)


def test_trainer_auto_records_choice_and_trains():
    triples = _toy()
    model = TransE(4000, 8, 16)
    tr = PartitionedTrainer(
        model, AdaGrad(lr=0.1), triples, _mesh(), k=64, nbatches=10,
        exchange="auto",
    )
    rep = tr.stats["exchange"]
    assert rep["choice"] in ("dense", "ragged")
    tr.fit(1)
    assert np.isfinite(tr.metrics[-1]["loss"])


def test_trainer_exchange_modes_agree():
    """'dense' and 'ragged' (emulated on CPU) produce identical fp64
    trajectories — the exchange implementation is a pure transport choice."""
    triples = _toy(seed=3)
    states = {}
    for mode in ("dense", "ragged"):
        model = TransE(4000, 8, 16, dtype="float64")
        tr = PartitionedTrainer(
            model, AdaGrad(lr=0.1), triples, _mesh(), k=64, nbatches=10,
            exchange=mode,
        )
        tr.fit(2)
        states[mode] = tr.params()
    for k in states["dense"]:
        np.testing.assert_array_equal(
            np.asarray(states["dense"][k]), np.asarray(states["ragged"][k]),
            err_msg=k,
        )


def test_exchange_and_legacy_ragged_are_exclusive():
    import pytest

    with pytest.raises(ValueError):
        PartitionedTrainer(
            TransE(4000, 8, 16), AdaGrad(lr=0.1), _toy(), _mesh(),
            k=64, nbatches=10, exchange="dense", ragged="emulate",
        )
