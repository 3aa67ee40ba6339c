"""Reference-API compatibility layer tests (skge-style classes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skge_tpu import sample
from skge_tpu.compat import (
    Config,
    ERMLP,
    HolE,
    Model,
    PairwiseStochasticTrainer,
    RESCAL,
    StochasticTrainer,
    TransE,
)
from skge_tpu.data import synthetic_kg

N_E, N_R = 80, 5
SZ = (N_E, N_E, N_R)


@pytest.fixture(scope="module")
def ds():
    return synthetic_kg(N_E, N_R, n_train=600, seed=11)


def xs_list(ds):
    return [tuple(map(int, t)) for t in ds.train]


def test_reference_usage_pattern_pairwise(ds):
    """The README-style flow: model + sampler + pairwise trainer + fit."""
    xs = xs_list(ds)
    ys = [1.0] * len(xs)
    model = TransE(SZ, 24)
    sampler = sample.RandomModeSampler(1, [0, 1], xs, SZ)
    seen = []

    def callback(trainer):
        seen.append(trainer.nviolations)
        return True

    trainer = PairwiseStochasticTrainer(
        model,
        nbatches=10,
        max_epochs=15,
        margin=0.3,
        learning_rate=0.1,
        samplef=sampler.sample,
        post_epoch=[callback],
    )
    trainer.fit(xs, ys)
    assert len(seen) == 15
    assert seen[-1] < 0.6 * seen[0], seen
    # params were written back to the numpy mirrors
    assert np.linalg.norm(model.E, axis=1).max() <= 1.0 + 1e-5


def test_early_stop_contract(ds):
    xs, ys = xs_list(ds), [1.0] * len(ds.train)
    model = HolE(SZ, 16)
    sampler = sample.RandomModeSampler(1, [0, 1], xs, SZ)
    calls = []

    def stop_after_3(trainer):
        calls.append(trainer.epoch)
        return trainer.epoch < 3

    trainer = PairwiseStochasticTrainer(
        model, nbatches=5, max_epochs=50, samplef=sampler.sample,
        post_epoch=[stop_after_3],
    )
    trainer.fit(xs, ys)
    assert calls == [1, 2, 3]


def test_pointwise_trainer_with_lcwa(ds):
    xs, ys = xs_list(ds), [1.0] * len(ds.train)
    model = RESCAL(SZ, 12, rparam=0.01)
    sampler = sample.LCWASampler(1, [0, 1], xs, SZ)
    trainer = StochasticTrainer(
        model, nbatches=8, max_epochs=10, samplef=sampler.sample
    )
    losses = []
    trainer.post_epoch.append(lambda t: losses.append(t.loss) or True)
    trainer.fit(xs, ys)
    assert losses[-1] < losses[0]


def test_host_samplef_fallback(ds):
    """An arbitrary callable (not a recognized sampler) must still work."""
    xs = xs_list(ds)[:200]
    ys = [1.0] * len(xs)
    model = TransE(SZ, 8)
    inner = sample.RandomModeSampler(1, [0, 1], xs, SZ)
    calls = {"n": 0}

    def weird_samplef(xys):
        calls["n"] += 1
        return inner.sample(xys)

    trainer = PairwiseStochasticTrainer(
        model, nbatches=4, max_epochs=2, margin=0.3, samplef=weird_samplef
    )
    trainer.fit(xs, ys)
    assert calls["n"] > 0  # went through the host path
    assert trainer.nviolations >= 0


def test_pairwise_without_samplef_pre_split(ds):
    """samplef=None: labeled negatives are paired with positives."""
    pos = xs_list(ds)[:150]
    rng = np.random.default_rng(0)
    neg = [(int(rng.integers(N_E)), int(rng.integers(N_E)), p) for _, _, p in pos[:50]]
    xs = pos + neg
    ys = [1.0] * len(pos) + [-1.0] * len(neg)
    model = TransE(SZ, 8)
    trainer = PairwiseStochasticTrainer(model, nbatches=4, max_epochs=3, margin=0.3)
    trainer.fit(xs, ys)
    assert trainer.nviolations >= 0


def test_model_save_load_roundtrip(tmp_path, ds):
    model = HolE(SZ, 16, rparam=0.01)
    xs, ys = xs_list(ds), [1.0] * len(ds.train)
    sampler = sample.RandomModeSampler(1, [0, 1], xs, SZ)
    PairwiseStochasticTrainer(
        model, nbatches=5, max_epochs=3, samplef=sampler.sample
    ).fit(xs, ys)
    path = str(tmp_path / "model.bin")
    model.save(path)
    loaded = Model.load(path)
    assert isinstance(loaded, HolE)
    assert loaded.ncomp == 16 and loaded.rparam == 0.01
    test = np.asarray(ds.train[:40])
    np.testing.assert_allclose(
        loaded.score_triples(test), model.score_triples(test), rtol=1e-6
    )


def test_config_save_load(tmp_path, ds):
    model = TransE(SZ, 8)
    trainer = PairwiseStochasticTrainer(model, nbatches=4, max_epochs=1)
    path = str(tmp_path / "config.bin")
    Config(model, trainer).save(path)
    cfg = Config.load(path)
    assert cfg.model.ncomp == 8
    assert cfg.trainer.hyperparams["nbatches"] == 4
    assert isinstance(cfg.trainer, PairwiseStochasticTrainer)


def test_ermlp_compat_trains(ds):
    xs, ys = xs_list(ds), [1.0] * len(ds.train)
    model = ERMLP(SZ, 12, nhidden=8)
    sampler = sample.BernoulliSampler(1, xs, SZ)
    trainer = StochasticTrainer(
        model, nbatches=6, max_epochs=8, samplef=sampler.sample
    )
    losses = []
    trainer.post_epoch.append(lambda t: losses.append(t.loss) or True)
    trainer.fit(xs, ys)
    assert losses[-1] < losses[0]
