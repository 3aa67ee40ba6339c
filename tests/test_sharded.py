"""Distributed tests on the 8-way virtual CPU mesh (SURVEY.md §4 item 4).

The sharded SPMD step must produce the same update as the single-device
dense-aggregation step (same PRNG key => same sampled negatives), and the
parameter layout must actually be sharded across the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, HolE, RandomModeSampler, TransE, init_state
from skge_tpu.data import synthetic_kg
from skge_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    make_sharded_pairwise_step,
    make_sharded_pointwise_step,
    make_sharded_score_all_o,
    param_specs,
    shard_state,
)
from skge_tpu.training import make_pairwise_update, make_pointwise_update


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    return make_mesh(jax.devices()[:8], shape=(4, 2))


@pytest.fixture(scope="module")
def ds():
    return synthetic_kg(n_entities=64, n_relations=4, n_train=256, seed=9)


@pytest.mark.parametrize("model_cls", [TransE, HolE])
def test_sharded_pairwise_matches_single_device(mesh, ds, model_cls):
    model = model_cls(ds.n_entities, ds.n_relations, ncomp=16)
    opt = AdaGrad(lr=0.1)
    sampler = RandomModeSampler(ds.n_entities)
    batch = jnp.asarray(ds.train[:64])
    mask = jnp.ones(64, jnp.float32)

    base = init_state(model, opt, jax.random.PRNGKey(0))

    # single-device dense-aggregation reference
    def ref_step(state, batch, mask):
        key, sk = jax.random.split(state.key)
        pos_rep, neg, pm = sampler(sk, batch, mask)
        state = state._replace(key=key)
        upd = make_pairwise_update(model, opt, 0.5, "dense")
        return upd(state, pos_rep, neg, pm)

    ref_state, ref_m = jax.jit(ref_step)(base, batch, mask)

    sh_state = shard_state(base, model, mesh)
    step = make_sharded_pairwise_step(model, opt, sampler, 0.5, mesh)
    out_state, out_m = step(sh_state, batch, mask)

    assert int(out_m.nviolations) == int(ref_m.nviolations)
    for k in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(out_state.params[k]),
            np.asarray(ref_state.params[k]),
            rtol=2e-5,
            atol=1e-6,
            err_msg=f"param {k}",
        )

    # entity table really is sharded over the model axis
    e_shard = out_state.params["E"].sharding
    assert MODEL_AXIS in (e_shard.spec[0] or ()) or e_shard.spec[0] == MODEL_AXIS


def test_sharded_pointwise_runs_and_matches(mesh, ds):
    model = HolE(ds.n_entities, ds.n_relations, ncomp=16, rparam=0.01)
    opt = AdaGrad(lr=0.1)
    sampler = RandomModeSampler(ds.n_entities)
    batch = jnp.asarray(ds.train[:32])
    mask = jnp.ones(32, jnp.float32)
    base = init_state(model, opt, jax.random.PRNGKey(1))

    def ref_step(state, batch, mask):
        key, sk = jax.random.split(state.key)
        pos_rep, neg, pm = sampler(sk, batch, mask)
        state = state._replace(key=key)
        triples = jnp.concatenate([batch, neg])
        ys = jnp.concatenate([jnp.ones(32), -jnp.ones(neg.shape[0])]).astype(
            jnp.float32
        )
        mm = jnp.concatenate([mask, pm])
        upd = make_pointwise_update(model, opt, "dense")
        return upd(state, triples, ys, mm)

    ref_state, ref_m = jax.jit(ref_step)(base, batch, mask)
    step = make_sharded_pointwise_step(model, opt, sampler, mesh)
    out_state, out_m = step(shard_state(base, model, mesh), batch, mask)
    np.testing.assert_allclose(float(out_m.loss), float(ref_m.loss), rtol=1e-5)
    for k in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(out_state.params[k]),
            np.asarray(ref_state.params[k]),
            rtol=2e-5,
            atol=1e-6,
        )


def test_multi_step_scan_stays_sharded(mesh, ds):
    """Several chained sharded steps keep layouts and keep training."""
    model = TransE(ds.n_entities, ds.n_relations, ncomp=16)
    opt = AdaGrad(lr=0.1)
    sampler = RandomModeSampler(ds.n_entities)
    step = make_sharded_pairwise_step(model, opt, sampler, 0.5, mesh)
    state = shard_state(
        init_state(model, opt, jax.random.PRNGKey(2)), model, mesh
    )
    batch = jnp.asarray(ds.train[:64])
    mask = jnp.ones(64, jnp.float32)
    first = None
    for i in range(6):
        state, m = step(state, batch, mask)
        v = int(m.nviolations)
        first = v if first is None else first
    assert v < first  # learning on a repeated batch
    assert int(state.step) == 6


def test_sharded_eval_matmul(mesh, ds):
    model = HolE(ds.n_entities, ds.n_relations, ncomp=16)
    opt = AdaGrad()
    state = shard_state(
        init_state(model, opt, jax.random.PRNGKey(3)), model, mesh
    )
    score = make_sharded_score_all_o(model, mesh)
    s = jnp.asarray(ds.train[:16, 0])
    p = jnp.asarray(ds.train[:16, 2])
    out = score(state.params, s, p)
    assert out.shape == (16, ds.n_entities)
    # parity with unsharded scoring
    host_params = {k: np.asarray(v) for k, v in state.params.items()}
    want = model.score_all_o(
        {k: jnp.asarray(v) for k, v in host_params.items()}, s, p
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-5)


def test_sharded_adam_matches_single_device(mesh, ds):
    """Adam's rank-mismatched slots (1-D per-row `t` under a 2-D row-sharded
    table) must place and run under the GSPMD path identically to the
    single-device trajectory."""
    from skge_tpu import Adam, SharedNegativeSampler
    from skge_tpu.training import make_pairwise_step

    model = TransE(ds.n_entities, ds.n_relations, ncomp=16)
    opt = Adam(lr=0.01)
    sampler = SharedNegativeSampler(ds.n_entities, k=16)
    batch = jnp.asarray(ds.train[:64])
    mask = jnp.ones(64, jnp.float32)

    base = init_state(model, opt, jax.random.PRNGKey(1))
    ref = jax.jit(make_pairwise_step(model, opt, sampler, 0.5,
                                     aggregate="dense"))
    ref_state, _ = ref(base, batch, mask)

    sh_state = shard_state(base, model, mesh)
    # per-row slot actually sharded over 'model'
    t_shard = sh_state.opt_state["E"]["t"].sharding.spec
    assert t_shard[0] == MODEL_AXIS
    step = make_sharded_pairwise_step(model, opt, sampler, 0.5, mesh)
    out_state, _ = step(sh_state, batch, mask)
    for pname in base.params:
        np.testing.assert_allclose(
            np.asarray(out_state.params[pname]),
            np.asarray(ref_state.params[pname]), rtol=2e-6, atol=1e-7,
        )
    np.testing.assert_allclose(
        np.asarray(out_state.opt_state["E"]["t"]),
        np.asarray(ref_state.opt_state["E"]["t"]), rtol=0, atol=0,
    )
