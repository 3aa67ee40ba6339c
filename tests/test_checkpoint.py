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


def test_sigkill_fault_injection_resume(tmp_path):
    """Real fault injection (SURVEY.md §5): a training PROCESS is SIGKILLed
    mid-run; resuming from its last atomic checkpoint reproduces the
    uninterrupted trajectory exactly."""
    import os
    import signal
    import subprocess
    import sys
    import time

    ckpt = str(tmp_path / "victim.npz")
    marker = str(tmp_path / "epochs.log")
    script = tmp_path / "victim.py"
    script.write_text(
        f"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # match the pytest process
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
from skge_tpu import RandomModeSampler, TransE
from skge_tpu.data import synthetic_kg
from skge_tpu.trainer import TrainConfig, Trainer

ds = synthetic_kg(60, 4, n_train=300, seed=5)
model = TransE(ds.n_entities, ds.n_relations, ncomp=16)
cfg = TrainConfig(max_epochs=6, nbatches=6, margin=0.3, seed=3,
                  checkpoint_path={ckpt!r}, checkpoint_every=1)

def slow_cb(tr):
    with open({marker!r}, "a") as f:
        f.write(f"{{tr.epoch}}\\n")
    time.sleep(0.8)   # window for the killer
    return True

Trainer(model, RandomModeSampler(ds.n_entities), cfg,
        post_epoch=[slow_cb]).fit(ds.train)
"""
    )
    proc = subprocess.Popen([sys.executable, str(script)])
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(marker) and len(open(marker).readlines()) >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError("victim exited before it could be killed")
            time.sleep(0.1)
        else:
            raise AssertionError("victim never reached epoch 2")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == -signal.SIGKILL

    restored, meta = load_checkpoint(ckpt)
    killed_at = meta["epoch"]
    assert 1 <= killed_at < 6

    ds = synthetic_kg(60, 4, n_train=300, seed=5)
    _, t_resume = _trainer(ds, 6)
    state_resumed = t_resume.fit(
        ds.train, state=restored, start_epoch=killed_at
    )
    _, t_full = _trainer(ds, 6)
    state_full = t_full.fit(ds.train)
    for k in state_full.params:
        np.testing.assert_allclose(
            np.asarray(state_resumed.params[k]),
            np.asarray(state_full.params[k]),
            rtol=1e-6, atol=1e-7,
            err_msg=f"param {k} diverged after SIGKILL resume",
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


def test_sharded_checkpoint_partitioned_resume(tmp_path):
    """VERDICT r1 ask 5: a P=4-partitioned state is saved WITHOUT a
    full-table host array (one npz per shard, each holding only its S
    rows), restored onto the same mesh bit-exact, resumed to the same
    trajectory as an uninterrupted run, and re-placed onto a DIFFERENT
    shard count."""
    import os

    from skge_tpu.parallel.partitioned import (
        PartitionedTrainer,
        make_shard_mesh,
    )
    from skge_tpu.utils.checkpoint import load_sharded_checkpoint

    ds = synthetic_kg(60, 4, n_train=400, seed=9, clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=16, dtype="float64")
    opt = AdaGrad(lr=0.1)
    mesh = make_shard_mesh(jax.devices()[:4])

    def mk():
        return PartitionedTrainer(
            model, opt, ds.train, mesh, margin=0.5, k=32, nbatches=5, seed=2
        )

    full = mk().fit(epochs=4)

    t = mk().fit(epochs=2)
    ckdir = str(tmp_path / "sharded")
    t.save(ckdir)

    # layout: per-shard files with only S rows each, no full-table file
    import json

    manifest = json.load(open(os.path.join(ckdir, "manifest.json")))
    assert manifest["n_shards"] == 4
    s_rows = manifest["sharded_rows"]["params::E"]
    assert s_rows * 4 == t.model.n_entities
    shard0 = np.load(os.path.join(ckdir, "shard_00000.npz"))
    assert shard0["params::E"].shape[0] == s_rows
    with np.load(os.path.join(ckdir, "replicated.npz")) as z:
        assert "params::E" not in z.files  # entity table never gathered
        assert "params::R" in z.files

    # restore bit-exact + resume == uninterrupted
    t2 = mk().restore(ckdir)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t2._state.params["E"])),
        np.asarray(jax.device_get(t._state.params["E"])),
    )
    t2.fit(epochs=2)
    for k in full._state.params:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(t2._state.params[k])),
            np.asarray(jax.device_get(full._state.params[k])),
            err_msg=f"{k} diverged after sharded-checkpoint resume",
        )

    # re-place onto a 2-shard mesh: same values, different chunking
    mesh2 = make_shard_mesh(jax.devices()[:2])
    state2, _ = load_sharded_checkpoint(ckdir, mesh2)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state2.params["E"])),
        np.asarray(jax.device_get(t._state.params["E"])),
    )


def test_async_checkpointer_snapshot_isolation(tmp_path):
    """AsyncCheckpointer: the saved file reflects the state AT save() time
    even when training keeps mutating params while the write is in flight;
    back-to-back saves serialize; wait() re-raises writer errors."""
    from skge_tpu.utils.checkpoint import AsyncCheckpointer, load_checkpoint

    import pytest

    model = TransE(50, 4, 8)
    opt = AdaGrad(lr=0.1)
    state = init_state(model, opt, jax.random.PRNGKey(3))
    snap_e = np.asarray(state.params["E"]).copy()

    ck = AsyncCheckpointer()
    p1 = str(tmp_path / "a.npz")
    ck.save(p1, state, meta={"tag": 1})
    # mutate immediately (simulates the donated next step)
    state2 = type(state)(
        {**state.params, "E": state.params["E"] + 1.0},
        state.opt_state, state.key, state.step + 1,
    )
    p2 = str(tmp_path / "b.npz")
    ck.save(p2, state2, meta={"tag": 2})  # joins the first write
    ck.wait()

    l1, m1 = load_checkpoint(p1)
    l2, m2 = load_checkpoint(p2)
    np.testing.assert_array_equal(np.asarray(l1.params["E"]), snap_e)
    np.testing.assert_array_equal(
        np.asarray(l2.params["E"]), snap_e + 1.0
    )
    assert m1["tag"] == 1 and m2["tag"] == 2
    assert int(l2.step) == int(l1.step) + 1

    # error propagation: a FILE blocks the target directory path
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")
    ck.save(str(blocker / "c.npz"), state)
    with pytest.raises(Exception):
        ck.wait()


def test_orbax_roundtrip_resumes_exact_trajectory(tmp_path):
    """Orbax interop (NEXT.md candidate): a TrainState round-trips through
    ocp.StandardCheckpointer — params, optimizer accumulators, PRNG
    position, step, metadata — and resuming from it reproduces the exact
    uninterrupted trajectory, same as the native npz format."""
    import pytest

    ocp = pytest.importorskip("orbax.checkpoint")  # noqa: F841
    from skge_tpu import make_epoch_fn, make_pairwise_step
    from skge_tpu.utils.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax,
    )

    ds = synthetic_kg(80, 5, n_train=400, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, 12, dtype="float64")
    opt = AdaGrad(lr=0.1)
    step = make_pairwise_step(
        model, opt, RandomModeSampler(ds.n_entities), margin=0.5
    )
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 5))
    xs = jnp.asarray(ds.train)

    state = init_state(model, opt, jax.random.PRNGKey(9))
    for _ in range(3):
        state, _ = epoch(state, xs)
    save_checkpoint_orbax(str(tmp_path / "ck"), state, {"epoch": 3})
    for _ in range(2):
        state, _ = epoch(state, xs)  # ground truth: uninterrupted

    resumed, meta = load_checkpoint_orbax(str(tmp_path / "ck"))
    assert meta == {"epoch": 3}
    for _ in range(2):
        resumed, _ = epoch(resumed, xs)
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(state.params[k]), np.asarray(resumed.params[k]),
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(state.key)),
        np.asarray(jax.random.key_data(resumed.key)),
    )
