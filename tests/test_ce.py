"""Full cross-entropy (1-vs-all) training: exactness + sharded parity.

`ce_grads_all` must match an independently-written full-table oracle (fp64
exact); label smoothing must match its closed form; the vocab-parallel
shard_map step must reproduce the single-device trajectory across mesh
shapes; and Trainer(loss='ce') must train to a strong MRR with no sampler.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import (  # noqa: E402
    AdaGrad, DistMult, TransE, init_state, make_ce_step, make_epoch_fn,
    training,
)
from skge_tpu.parallel import make_mesh  # noqa: E402
from skge_tpu.parallel.shardmap_step import (  # noqa: E402
    make_shardmap_ce_step, shard_state_shardmap,
)

N_E, N_R, D, B = 24, 6, 8, 20


def build(model_cls=TransE, seed=0, **kw):
    model = model_cls(N_E, N_R, D, dtype="float64", **kw)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


def make_batch(seed=1):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, B), rng.integers(0, N_E, B),
         rng.integers(0, N_R, B)], axis=1
    ).astype(np.int32)


def oracle_loss(model, pos, mask, directions, ls):
    """Independent formulation: explicit log-softmax + one-hot/smoothed
    target, no shared code path with ce_grads_all's internals."""
    s, o, p = pos[:, 0], pos[:, 1], pos[:, 2]

    def loss(params):
        total = 0.0
        for d in directions:
            if d == "o":
                logits, labels = model.score_all_o(params, s, p), o
            else:
                logits, labels = model.score_all_s(params, o, p), s
            tgt = (1.0 - ls) * jax.nn.one_hot(
                labels, N_E, dtype=logits.dtype
            ) + ls / N_E
            logp = logits - jax.scipy.special.logsumexp(
                logits, axis=1, keepdims=True
            )
            total = total + jnp.sum(-jnp.sum(tgt * logp, axis=1) * mask)
        return total / jnp.maximum(jnp.sum(mask), 1.0)

    return loss


@pytest.mark.parametrize("model_cls,kw", [
    (TransE, {"l1": False}), (DistMult, {}),
])
@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_ce_grads_match_oracle(model_cls, kw, ls):
    model, params = build(model_cls, **kw)
    pos = jnp.asarray(make_batch())
    mask = jnp.asarray((np.arange(B) < B - 4).astype(np.float64))
    loss, grads = training.ce_grads_all(
        model, params, pos, mask, ("o", "s"), label_smoothing=ls
    )
    oracle = oracle_loss(model, pos, mask, ("o", "s"), ls)
    np.testing.assert_allclose(float(loss), float(oracle(params)), rtol=1e-12)
    want = jax.grad(oracle)(params)
    for pname in params:
        np.testing.assert_allclose(
            np.asarray(grads[pname]), np.asarray(want[pname]),
            rtol=1e-9, atol=1e-13, err_msg=pname,
        )


def test_ce_single_direction():
    model, params = build()
    pos = jnp.asarray(make_batch(2))
    mask = jnp.ones(B, jnp.float64)
    loss, grads = training.ce_grads_all(model, params, pos, mask, ("o",))
    oracle = oracle_loss(model, pos, mask, ("o",), 0.0)
    np.testing.assert_allclose(float(loss), float(oracle(params)), rtol=1e-12)
    # subject-direction-only gradients differ from the two-direction ones
    _, g2 = training.ce_grads_all(model, params, pos, mask, ("o", "s"))
    assert not np.allclose(np.asarray(grads["E"]), np.asarray(g2["E"]))


@pytest.mark.parametrize("shape", [(1, 1), (4, 2), (2, 4), (1, 8)])
def test_shardmap_ce_matches_single_device(shape):
    model, _ = build()
    opt = AdaGrad(lr=0.1)
    pos = jnp.asarray(make_batch(4))
    mask = jnp.ones(B, jnp.float64)

    # donation consumes each state, so every path gets a fresh init
    ref_step = jax.jit(make_ce_step(model, opt, ("o", "s"), 0.1))
    ref_state, ref_m = ref_step(
        init_state(model, opt, jax.random.PRNGKey(3)), pos, mask
    )
    for _ in range(2):
        ref_state, ref_m = ref_step(ref_state, pos, mask)

    mesh = make_mesh(jax.devices()[: shape[0] * shape[1]], shape=shape)
    step = make_shardmap_ce_step(model, opt, mesh, ("o", "s"), 0.1)
    st = shard_state_shardmap(
        init_state(model, opt, jax.random.PRNGKey(3)), model, mesh
    )
    st, m = step(st, pos, mask)
    for _ in range(2):
        st, m = step(st, pos, mask)

    # per-step agreement is ~1 ulp; AdaGrad's max(sqrt(p2), eps=1e-6)
    # guard divides early ulp-level reassociation noise by 1e-6, so a
    # 3-step trajectory legitimately drifts to ~1e-11
    np.testing.assert_allclose(float(m.loss), float(ref_m.loss), rtol=1e-12)
    for pname in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(st.params[pname]), np.asarray(ref_state.params[pname]),
            rtol=1e-8, atol=1e-10, err_msg=pname,
        )
        for sn in ref_state.opt_state[pname]:
            np.testing.assert_allclose(
                np.asarray(st.opt_state[pname][sn]),
                np.asarray(ref_state.opt_state[pname][sn]),
                rtol=1e-8, atol=1e-10,
            )


def test_shardmap_ce_masked_batch_rows():
    """Padded (mask=0) rows must not perturb the sharded update."""
    model, _ = build()
    opt = AdaGrad(lr=0.1)
    pos = make_batch(6)
    mask = np.ones(B); mask[-4:] = 0.0
    pos_pad = pos.copy(); pos_pad[-4:] = [[0, 0, 0]] * 4

    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    step = make_shardmap_ce_step(model, opt, mesh)

    def fresh():  # donation consumes each state
        return shard_state_shardmap(
            init_state(model, opt, jax.random.PRNGKey(5)), model, mesh
        )

    st_a, _ = step(fresh(), jnp.asarray(pos_pad), jnp.asarray(mask))
    garbage = pos.copy(); garbage[-4:] = [[N_E - 1, 0, N_R - 1]] * 4
    st_b, _ = step(fresh(), jnp.asarray(garbage), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(st_a.params["E"]), np.asarray(st_b.params["E"]),
        rtol=1e-12, atol=0,
    )


def test_ce_trains_on_latent_kg():
    from skge_tpu.data import latent_kg
    from skge_tpu.evaluation import FilteredRankingEval

    ds = latent_kg(n_entities=400, n_relations=8, n_train=2500,
                   n_valid=0, n_test=80, latent_dim=8, seed=1)
    model = TransE(ds.n_entities, ds.n_relations, 24, l1=False)
    opt = AdaGrad(lr=0.5)
    step = make_ce_step(model, opt, ("o", "s"), 0.0)
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 10),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    losses = []
    for _ in range(25):
        state, m = epoch(state, xs)
        losses.append(float(np.asarray(m.loss).sum()))
    assert losses[-1] < losses[0] * 0.8
    r = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=80)(
        state.params
    )
    assert r.mrr > 10.0 / ds.n_entities


def test_trainer_config_ce_no_sampler():
    from skge_tpu.data import latent_kg
    from skge_tpu.trainer import TrainConfig, Trainer

    ds = latent_kg(n_entities=200, n_relations=6, n_train=800,
                   n_valid=0, n_test=20, latent_dim=6, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False)
    cfg = TrainConfig(max_epochs=5, nbatches=8, learning_rate=0.5,
                      loss="ce", label_smoothing=0.1)
    tr = Trainer(model, sampler=None, config=cfg)
    tr.fit(ds.train)
    assert np.isfinite(tr.loss)
