"""Trainer(mesh=...) trajectory parity (VERDICT r1 ask 7): the mesh epoch
is the same on-device shuffle+scan as the single-device path, and the mesh
steps sample globally from the same key stream — so the sharded trainer
must reproduce the single-device fp64 trajectory.
"""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from skge_tpu import RandomModeSampler, SharedNegativeSampler, TransE  # noqa: E402
from skge_tpu.data import synthetic_kg  # noqa: E402
from skge_tpu.parallel import make_mesh  # noqa: E402
from skge_tpu.trainer import TrainConfig, Trainer  # noqa: E402


def _fit(ds, model, sampler, mesh, **cfg_kw):
    cfg = TrainConfig(max_epochs=3, margin=0.3, seed=11, **cfg_kw)
    t = Trainer(model, sampler, cfg, mesh=mesh)
    state = t.fit(ds.train)
    return state, t


@pytest.mark.parametrize("shape", [(2, 2), (4, 1), (2, 4)])
def test_mesh_trainer_matches_single_device_pairwise(shape):
    # nbatches chosen so batch_size divides the data axis: the masked
    # per-batch padding stays inactive and the comparison is exact.
    ds = synthetic_kg(48, 4, n_train=320, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=12, dtype="float64")
    sampler = RandomModeSampler(ds.n_entities, modes=(0, 1))
    single, t1 = _fit(ds, model, sampler, None, nbatches=4)
    mesh = make_mesh(jax.devices()[: shape[0] * shape[1]], shape=shape)
    sharded, t2 = _fit(ds, model, sampler, mesh, nbatches=4)
    assert t1.nviolations == t2.nviolations
    for k in single.params:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sharded.params[k])),
            np.asarray(single.params[k]),
            rtol=1e-12, atol=1e-13,
            err_msg=f"{k}: mesh {shape} trajectory diverged",
        )


def test_mesh_trainer_padded_batches_match_single_device():
    """Batch size NOT divisible by the data axis: every batch gets masked
    dummy rows. Masked rows contribute exact zeros, and JAX's
    partitionable threefry draws are position-stable under a longer
    shape, so the trajectory still matches bitwise-tight."""
    ds = synthetic_kg(48, 4, n_train=330, seed=3)  # 330/4 = 83 (odd)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=12, dtype="float64")
    sampler = SharedNegativeSampler(ds.n_entities, k=16)
    single, t1 = _fit(ds, model, sampler, None, nbatches=4)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    sharded, t2 = _fit(ds, model, sampler, mesh, nbatches=4)
    assert t1.nviolations == t2.nviolations
    for k in single.params:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sharded.params[k])),
            np.asarray(single.params[k]),
            rtol=1e-12, atol=1e-13,
            err_msg=f"{k}: padded mesh trajectory diverged",
        )


def test_mesh_trainer_pointwise_matches_single_device():
    ds = synthetic_kg(48, 4, n_train=320, seed=5)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=12, dtype="float64")
    sampler = RandomModeSampler(ds.n_entities, modes=(0, 1))
    single, _ = _fit(ds, model, sampler, None, nbatches=4, pairwise=False)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    sharded, _ = _fit(ds, model, sampler, mesh, nbatches=4, pairwise=False)
    for k in single.params:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sharded.params[k])),
            np.asarray(single.params[k]),
            rtol=1e-12, atol=1e-13,
            err_msg=f"{k}: pointwise mesh trajectory diverged",
        )


def test_mesh_trainer_pointwise_pool_matches_single_device():
    """Shared-pool pointwise routes to the explicit-SPMD
    make_shardmap_pointwise_step and reproduces the single-device
    trajectory exactly."""
    ds = synthetic_kg(48, 4, n_train=320, seed=7)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=12, dtype="float64")
    sampler = SharedNegativeSampler(ds.n_entities, k=16)
    single, _ = _fit(ds, model, sampler, None, nbatches=4, pairwise=False)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    sharded, _ = _fit(ds, model, sampler, mesh, nbatches=4, pairwise=False)
    for k in single.params:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sharded.params[k])),
            np.asarray(single.params[k]),
            rtol=1e-12, atol=1e-13,
            err_msg=f"{k}: pool pointwise mesh trajectory diverged",
        )


def test_trainer_mesh_shard_relations_matches_default():
    """TrainConfig(shard_relations=True) on a RESCAL mesh run reproduces the
    replicated-relation trajectory exactly (and actually shards W)."""
    from skge_tpu import RESCAL
    from skge_tpu.parallel.mesh import MODEL_AXIS, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    ds = synthetic_kg(n_entities=48, n_relations=4, n_train=200, seed=3)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))

    def run(flag):
        model = RESCAL(ds.n_entities, ds.n_relations, 8, dtype="float64")
        cfg = TrainConfig(max_epochs=3, nbatches=4, learning_rate=0.1,
                          margin=0.7, seed=0, shard_relations=flag)
        tr = Trainer(model, SharedNegativeSampler(ds.n_entities, k=8),
                     cfg, mesh=mesh)
        tr.fit(ds.train)
        if flag:
            rows = {s.data.shape[0] for s in
                    tr.state.params["W"].addressable_shards}
            assert rows == {ds.n_relations // 2}
        return {k: np.asarray(v) for k, v in tr.state.params.items()}

    a = run(True)
    b = run(False)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, atol=1e-14)


def test_trainer_mesh_selfadv_matches_single_device():
    """Trainer(mesh=..., loss='selfadv') reproduces the single-device
    selfadv trajectory (same global key stream)."""
    from skge_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    ds = synthetic_kg(n_entities=48, n_relations=4, n_train=200, seed=4)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))

    def run(mesh_arg):
        model = TransE(ds.n_entities, ds.n_relations, 8, l1=False,
                       dtype="float64")
        cfg = TrainConfig(max_epochs=3, nbatches=4, learning_rate=0.1,
                          margin=2.0, loss="selfadv", adv_alpha=1.0,
                          aggregate="dense", seed=0)
        tr = Trainer(model, SharedNegativeSampler(ds.n_entities, k=8),
                     cfg, mesh=mesh_arg)
        tr.fit(ds.train)
        return {k: np.asarray(v) for k, v in tr.state.params.items()}

    a = run(mesh)
    b = run(None)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-10, atol=1e-13)


def test_trainer_mesh_sampled_ce_matches_single_device():
    """Trainer(mesh=..., loss='sampled_ce') reproduces the single-device
    sampled-softmax-CE trajectory (same global key stream)."""
    from skge_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    ds = synthetic_kg(n_entities=48, n_relations=4, n_train=200, seed=5)
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))

    def run(mesh_arg):
        model = TransE(ds.n_entities, ds.n_relations, 8, l1=False,
                       dtype="float64")
        cfg = TrainConfig(max_epochs=3, nbatches=4, learning_rate=0.1,
                          loss="sampled_ce", label_smoothing=0.1,
                          aggregate="dense", seed=0)
        tr = Trainer(model, SharedNegativeSampler(ds.n_entities, k=8),
                     cfg, mesh=mesh_arg)
        tr.fit(ds.train)
        return {k: np.asarray(v) for k, v in tr.state.params.items()}

    a = run(mesh)
    b = run(None)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-10, atol=1e-13)
