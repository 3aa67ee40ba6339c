"""Explicit-SPMD (shard_map) step: distributed math must equal the
single-device update exactly.

Deterministic samplers remove RNG from the comparison; the (4, 2) mesh
exercises both collectives (entity-row gather psum over 'model', gradient
table psum over 'data') against the plain single-device apply path.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import AdaGrad, ERMLP, HolE, TransE, init_state, training  # noqa: E402
from skge_tpu.parallel.mesh import make_mesh  # noqa: E402
from skge_tpu.parallel.shardmap_step import (  # noqa: E402
    make_shardmap_pairwise_step,
    shard_state_shardmap,
)

N_E, N_R, D, B = 24, 5, 16, 32


class FixedPool:
    """Deterministic `pool` protocol sampler."""

    modes = (0, 1)

    def __init__(self, pool):
        self._pool = pool

    def pool(self, key, pos, mask):
        return self._pool


class FixedCorruptions:
    """Deterministic `corruptions` protocol sampler.

    Holds global (B,) replacement arrays; inside shard_map (local batch
    smaller than B) each data shard takes its own slice so the distributed
    run corrupts exactly like the single-device one.
    """

    def __init__(self, repls):
        self._repls = repls  # [(mode, (B,) replacement array), ...]

    def corruptions(self, key, pos, mask):
        b = pos.shape[0]
        out = []
        for m, r in self._repls:
            if r.shape[0] != b:
                i = jax.lax.axis_index("data")
                r = jax.lax.dynamic_slice_in_dim(r, i * b, b)
            out.append((m, r, mask))
        return out


def make_model(name):
    if name == "transe":
        return TransE(N_E, N_R, D, dtype="float64")
    if name == "hole":
        return HolE(N_E, N_R, D, dtype="float64", rparam=0.01)
    return ERMLP(N_E, N_R, D, dtype="float64", nhidden=7)


def make_batch(seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack(
            [rng.integers(0, N_E, B), rng.integers(0, N_E, B),
             rng.integers(0, N_R, B)], axis=1
        ).astype(np.int32)
    )


def reference_steps(model, opt, sampler, batch, mask, margin, nsteps):
    """Single-device trajectory through the plain functional path."""
    state = init_state(model, opt, jax.random.PRNGKey(4))
    shared = hasattr(sampler, "pool")
    for _ in range(nsteps):
        if shared:
            loss, nviol, occ, g_dense = training.pairwise_grads_shared(
                model, state.params, batch, sampler.pool(None, batch, mask),
                mask, margin,
            )
        else:
            loss, nviol, occ, g_dense = training.pairwise_grads_fused(
                model, state.params, batch,
                sampler.corruptions(None, batch, mask), mask, margin,
            )
        params, opt_state = training.apply_gradients(
            model, opt, state.params, state.opt_state, occ, g_dense,
            "dense", premasked=True,
        )
        state = training.TrainState(
            params, opt_state, state.key, state.step + 1
        )
    return state, (loss, nviol)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("case", ["transe", "hole", "ermlp"])
def test_shardmap_step_matches_single_device(case, mesh_shape):
    n_dev = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    model = make_model(case)
    opt = AdaGrad(lr=0.1)
    margin = 0.7
    batch = make_batch(5)
    mask = jnp.ones(B, jnp.float64)
    rng = np.random.default_rng(6)

    for sampler in (
        FixedPool(jnp.asarray(rng.integers(0, N_E, 9), jnp.int32)),
        FixedCorruptions([
            (0, jnp.asarray(rng.integers(0, N_E, B), jnp.int32)),
            (1, jnp.asarray(rng.integers(0, N_E, B), jnp.int32)),
        ]),
    ):
        want, (wloss, wnviol) = reference_steps(
            model, opt, sampler, batch, mask, margin, nsteps=3
        )

        mesh = make_mesh(jax.devices()[:n_dev], shape=mesh_shape)
        step = make_shardmap_pairwise_step(model, opt, sampler, margin, mesh)
        state = shard_state_shardmap(
            init_state(model, opt, jax.random.PRNGKey(4)), model, mesh
        )
        for _ in range(3):
            state, m = step(state, batch, mask)

        assert int(m.nviolations) == int(wnviol)
        np.testing.assert_allclose(float(m.loss), float(wloss), rtol=1e-9)
        for k in want.params:
            np.testing.assert_allclose(
                np.asarray(state.params[k]), np.asarray(want.params[k]),
                rtol=1e-9, atol=1e-12, err_msg=f"{case} param {k}",
            )
            for sn in want.opt_state[k]:
                np.testing.assert_allclose(
                    np.asarray(state.opt_state[k][sn]),
                    np.asarray(want.opt_state[k][sn]),
                    rtol=1e-9, atol=1e-12, err_msg=f"{case} opt {k}/{sn}",
                )


def test_trainer_with_mesh_trains_and_checkpoints(tmp_path):
    """High-level Trainer on an 8-device mesh: runs, reduces violations,
    writes a loadable full-state checkpoint."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from skge_tpu import RandomModeSampler
    from skge_tpu.data import synthetic_kg
    from skge_tpu.trainer import TrainConfig, Trainer
    from skge_tpu.utils.checkpoint import load_checkpoint

    ds = synthetic_kg(64, 4, n_train=600, seed=9)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=16)
    mesh = make_mesh(jax.devices()[:8], shape=(4, 2))
    path = str(tmp_path / "mesh.npz")
    trainer = Trainer(
        model,
        RandomModeSampler(ds.n_entities),
        TrainConfig(max_epochs=8, nbatches=5, margin=0.5, seed=2,
                    checkpoint_path=path),
        mesh=mesh,
    )
    trainer.fit(ds.train)
    first = trainer.metrics.history[0]["nviolations"]
    last = trainer.metrics.history[-1]["nviolations"]
    assert last < first, (first, last)
    restored, meta = load_checkpoint(path)
    assert meta["epoch"] == 8
    assert restored.params["E"].shape == (64, 16)
    assert int(restored.step) == 8 * 5


def test_shardmap_rejects_indivisible_entity_count():
    model = TransE(N_E + 1, N_R, D)  # 25 not divisible by model axis 2
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(jax.devices()[:2], shape=(1, 2))
    with pytest.raises(ValueError, match="divisible"):
        make_shardmap_pairwise_step(
            model, AdaGrad(), FixedPool(jnp.zeros(4, jnp.int32)), 1.0, mesh
        )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
@pytest.mark.parametrize("case", ["rescal", "transh"])
def test_shard_relations_matches_single_device(case, mesh_shape):
    """Relation tables row-sharded over 'model' (shard_relations=True):
    the masked-gather + psum('model') on p-rows and the owned-rows scatter
    must reproduce the single-device update exactly — incl. RESCAL's 3-D W
    and TransH's TWO relation tables."""
    from skge_tpu import RESCAL, TransH

    n_dev = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    n_r = 4  # divisible by model axes 2 and 4
    if case == "rescal":
        model = RESCAL(N_E, n_r, 8, dtype="float64", rparam=0.01)
    else:
        model = TransH(N_E, n_r, 8, dtype="float64")
    opt = AdaGrad(lr=0.1)
    margin = 0.7
    rng = np.random.default_rng(11)
    batch = jnp.asarray(
        np.stack(
            [rng.integers(0, N_E, B), rng.integers(0, N_E, B),
             rng.integers(0, n_r, B)], axis=1
        ).astype(np.int32)
    )
    mask = jnp.ones(B, jnp.float64)
    sampler = FixedPool(jnp.asarray(rng.integers(0, N_E, 9), jnp.int32))

    want, (wloss, wnviol) = reference_steps(
        model, opt, sampler, batch, mask, margin, nsteps=3
    )

    mesh = make_mesh(jax.devices()[:n_dev], shape=mesh_shape)
    step = make_shardmap_pairwise_step(
        model, opt, sampler, margin, mesh, shard_relations=True
    )
    state = shard_state_shardmap(
        init_state(model, opt, jax.random.PRNGKey(4)), model, mesh,
        shard_relations=True,
    )
    # relation tables actually sharded
    for pname in ("W",):
        shards = state.params[pname].addressable_shards
        rows = {s.data.shape[0] for s in shards}
        assert rows == {n_r // mesh_shape[1]}
    for _ in range(3):
        state, m = step(state, batch, mask)
    for pname in want.params:
        np.testing.assert_allclose(
            np.asarray(state.params[pname]), np.asarray(want.params[pname]),
            rtol=1e-12, atol=1e-14,
            err_msg=f"{case}/{mesh_shape}/{pname}",
        )
    np.testing.assert_allclose(float(m.loss), float(wloss), rtol=1e-12)
    assert int(m.nviolations) == int(wnviol)


def test_shard_relations_rejects_indivisible_relation_count():
    from skge_tpu import RESCAL

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = RESCAL(N_E, 5, 8)  # 5 relations, model axis 2
    mesh = make_mesh(jax.devices()[:8], shape=(4, 2))
    sampler = FixedPool(jnp.zeros(4, jnp.int32))
    with pytest.raises(ValueError, match="not divisible"):
        make_shardmap_pairwise_step(
            model, AdaGrad(), sampler, 0.5, mesh, shard_relations=True
        )


@pytest.mark.parametrize("mesh_shape", [(1, 1), (4, 2), (2, 4)])
def test_shardmap_selfadv_matches_single_device(mesh_shape):
    """The explicit-SPMD self-adversarial step reproduces the single-device
    make_selfadv_step trajectory exactly (fp64), incl. the element-count
    recombination of dense-param gradient means (ER-MLP's W/C)."""
    from skge_tpu import init_state
    from skge_tpu.parallel.shardmap_step import make_shardmap_selfadv_step
    from skge_tpu.training import make_selfadv_step

    n_dev = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(13)
    # last quarter masked: on the (4, 2) mesh the final data shard is
    # ENTIRELY padding, which pins the raw-count (not clamped-count)
    # global denominator for the dense-param gradients
    mask = jnp.asarray(
        (np.arange(B) < 3 * B // 4).astype(np.float64)
    )
    rng = np.random.default_rng(14)
    pool = jnp.asarray(rng.integers(0, N_E, 9), jnp.int32)

    class Pool:
        modes = (0, 1)
        k = 9

        def pool(self, key, pos, m):
            return pool

    for case in ("transe", "ermlp"):
        model = make_model(case)
        opt = AdaGrad(lr=0.1)
        ref_step = make_selfadv_step(
            model, opt, Pool(), margin=1.0, alpha=1.0, aggregate="dense"
        )
        ref = init_state(model, opt, jax.random.PRNGKey(4))
        for _ in range(3):
            ref, rm = jax.jit(ref_step)(ref, batch, mask)

        mesh = make_mesh(jax.devices()[:n_dev], shape=mesh_shape)
        step = make_shardmap_selfadv_step(
            model, opt, Pool(), margin=1.0, mesh=mesh, alpha=1.0
        )
        state = shard_state_shardmap(
            init_state(model, opt, jax.random.PRNGKey(4)), model, mesh
        )
        for _ in range(3):
            state, m = step(state, batch, mask)
        np.testing.assert_allclose(
            float(m.loss), float(rm.loss), rtol=1e-12,
            err_msg=f"{case}/{mesh_shape} loss",
        )
        for pname in ref.params:
            np.testing.assert_allclose(
                np.asarray(state.params[pname]),
                np.asarray(ref.params[pname]),
                rtol=1e-10, atol=1e-13,
                err_msg=f"{case}/{mesh_shape}/{pname}",
            )


@pytest.mark.parametrize("mesh_shape", [(1, 1), (4, 2), (2, 4)])
def test_shardmap_pointwise_matches_single_device(mesh_shape):
    """The explicit-SPMD shared-pool POINTWISE step reproduces the
    single-device make_pointwise_step trajectory exactly (fp64), incl.
    the element-count recombination of dense-param gradient means
    (ER-MLP's W/C) and a fully-masked data shard."""
    from skge_tpu.parallel.shardmap_step import make_shardmap_pointwise_step
    from skge_tpu.training import make_pointwise_step

    n_dev = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(23)
    mask = jnp.asarray(
        (np.arange(B) < 3 * B // 4).astype(np.float64)
    )
    rng = np.random.default_rng(31)
    pool = jnp.asarray(rng.integers(0, N_E, 9), jnp.int32)

    class Pool:
        modes = (0, 1)
        k = 9

        def pool(self, key, pos, m):
            return pool

    for case in ("transe", "ermlp"):
        model = make_model(case)
        opt = AdaGrad(lr=0.1)
        ref_step = make_pointwise_step(model, opt, Pool(), aggregate="dense")
        ref = init_state(model, opt, jax.random.PRNGKey(4))
        for _ in range(3):
            ref, rm = jax.jit(ref_step)(ref, batch, mask)

        mesh = make_mesh(jax.devices()[:n_dev], shape=mesh_shape)
        step = make_shardmap_pointwise_step(model, opt, Pool(), mesh=mesh)
        state = shard_state_shardmap(
            init_state(model, opt, jax.random.PRNGKey(4)), model, mesh
        )
        for _ in range(3):
            state, m = step(state, batch, mask)
        np.testing.assert_allclose(
            float(m.loss), float(rm.loss), rtol=1e-12,
            err_msg=f"{case}/{mesh_shape} loss",
        )
        for pname in ref.params:
            np.testing.assert_allclose(
                np.asarray(state.params[pname]),
                np.asarray(ref.params[pname]),
                rtol=1e-10, atol=1e-13,
                err_msg=f"{case}/{mesh_shape}/{pname}",
            )


def test_shardmap_pointwise_rejects_iid_sampler():
    from skge_tpu.parallel.shardmap_step import make_shardmap_pointwise_step

    model = make_model("transe")
    mesh = make_mesh(jax.devices()[:2], shape=(2, 1))
    with pytest.raises(ValueError, match="shared-pool"):
        make_shardmap_pointwise_step(
            model, AdaGrad(), FixedCorruptions([]), mesh
        )


@pytest.mark.parametrize("mesh_shape", [(1, 1), (4, 2), (2, 4)])
def test_shardmap_sampled_ce_matches_single_device(mesh_shape):
    """The explicit-SPMD sampled-softmax-CE step reproduces the
    single-device make_sampled_ce_step trajectory exactly (fp64): sum
    semantics over duplicate occurrences, global-mean rescale across data
    shards, unigram log_q proposal correction, label smoothing, and
    dense-param recombination (ER-MLP's W/C)."""
    from skge_tpu import init_state
    from skge_tpu.parallel.shardmap_step import make_shardmap_sampled_ce_step
    from skge_tpu.training import make_sampled_ce_step

    n_dev = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(23)
    # last quarter masked: on the (4, 2) mesh the final data shard is
    # ENTIRELY padding, pinning the raw-count global denominator
    mask = jnp.asarray((np.arange(B) < 3 * B // 4).astype(np.float64))
    rng = np.random.default_rng(24)
    # duplicate ids inside the pool exercise the SUM-combine semantics
    pool = jnp.asarray(
        np.concatenate([rng.integers(0, N_E, 7), [3, 3]]), jnp.int32
    )

    class Pool:
        k = 9

        def pool(self, key, pos, m):
            return pool

    class UnigramPool(Pool):
        logits = np.log(np.arange(1, N_E + 1, dtype=np.float64))

    for case, sampler, ls in (
        ("transe", Pool(), 0.0),
        ("ermlp", Pool(), 0.1),
        ("transe", UnigramPool(), 0.1),
    ):
        model = make_model(case)
        opt = AdaGrad(lr=0.1)
        ref_step = make_sampled_ce_step(
            model, opt, sampler, label_smoothing=ls, aggregate="dense"
        )
        ref = init_state(model, opt, jax.random.PRNGKey(7))
        for _ in range(3):
            ref, rm = jax.jit(ref_step)(ref, batch, mask)

        mesh = make_mesh(jax.devices()[:n_dev], shape=mesh_shape)
        step = make_shardmap_sampled_ce_step(
            model, opt, sampler, mesh, label_smoothing=ls
        )
        state = shard_state_shardmap(
            init_state(model, opt, jax.random.PRNGKey(7)), model, mesh
        )
        for _ in range(3):
            state, m = step(state, batch, mask)
        tag = f"{case}/{type(sampler).__name__}/{mesh_shape}"
        np.testing.assert_allclose(
            float(m.loss), float(rm.loss), rtol=1e-12,
            err_msg=f"{tag} loss",
        )
        for pname in ref.params:
            np.testing.assert_allclose(
                np.asarray(state.params[pname]),
                np.asarray(ref.params[pname]),
                rtol=1e-10, atol=1e-13,
                err_msg=f"{tag}/{pname}",
            )
