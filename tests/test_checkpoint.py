"""Checkpoint/resume: deterministic continuation (SURVEY.md §5 mapping)."""

import numpy as np

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, RandomModeSampler, TransE, init_state
from skge_tpu.data import synthetic_kg
from skge_tpu.trainer import TrainConfig, Trainer
from skge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _trainer(ds, max_epochs, **kw):
    model = TransE(ds.n_entities, ds.n_relations, ncomp=16)
    cfg = TrainConfig(
        max_epochs=max_epochs, nbatches=6, margin=0.3, seed=3, **kw
    )
    return model, Trainer(model, RandomModeSampler(ds.n_entities), cfg)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    ds = synthetic_kg(60, 4, n_train=300, seed=5)
    path = str(tmp_path / "ckpt.npz")

    # uninterrupted: 6 epochs
    _, t_full = _trainer(ds, 6)
    state_full = t_full.fit(ds.train)

    # interrupted: 3 epochs, checkpoint, reload, 3 more
    _, t_a = _trainer(ds, 3)
    state_a = t_a.fit(ds.train)
    save_checkpoint(path, state_a, meta={"epoch": 3})
    restored, meta = load_checkpoint(path)
    assert meta["epoch"] == 3
    assert int(restored.step) == int(state_a.step)

    _, t_b = _trainer(ds, 6)
    state_b = t_b.fit(ds.train, state=restored, start_epoch=3)

    for k in state_full.params:
        np.testing.assert_allclose(
            np.asarray(state_b.params[k]),
            np.asarray(state_full.params[k]),
            rtol=1e-6,
            atol=1e-7,
            err_msg=f"param {k} diverged after resume",
        )
    np.testing.assert_allclose(
        np.asarray(state_b.opt_state["E"]["p2"]),
        np.asarray(state_full.opt_state["E"]["p2"]),
        rtol=1e-6,
    )


def test_checkpoint_saves_optimizer_state_and_key(tmp_path):
    """The reference does NOT save optimizer state (SURVEY.md §3.5); we do."""
    ds = synthetic_kg(40, 3, n_train=100, seed=6)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=8)
    opt = AdaGrad()
    state = init_state(model, opt, jax.random.PRNGKey(9))
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, state, meta={"model": "transe"})
    restored, meta = load_checkpoint(path)
    assert meta["model"] == "transe"
    assert set(restored.opt_state) == {"E", "R"}
    assert restored.opt_state["E"]["p2"].shape == state.params["E"].shape
    # PRNG key restored exactly
    a = jax.random.uniform(state.key, (4,))
    b = jax.random.uniform(restored.key, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_writes_checkpoint_and_metrics(tmp_path):
    ds = synthetic_kg(50, 3, n_train=200, seed=7)
    path = str(tmp_path / "t.npz")
    jsonl = str(tmp_path / "m.jsonl")
    model, trainer = _trainer(
        ds, 2, checkpoint_path=path, metrics_jsonl=jsonl
    )
    trainer.fit(ds.train)
    restored, meta = load_checkpoint(path)
    assert meta["model"] == "transe"
    assert meta["epoch"] == 2
    import json

    lines = [json.loads(l) for l in open(jsonl)]
    assert len(lines) == 2
    assert {"epoch", "loss", "nviolations", "triples_per_second"} <= set(lines[0])
