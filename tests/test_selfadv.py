"""Self-adversarial loss (Sun et al. 2019) correctness.

The occurrence-scattered gradients must SUM to the autodiff gradient of the
same loss written directly over the full parameter tables (fp64 exact);
alpha=0 must reduce to the uniform-weight pool logistic form; and the loss
must train end-to-end through Trainer(loss='selfadv')."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import (  # noqa: E402
    AdaGrad, RandomModeSampler, SharedNegativeSampler, TransE, init_state,
    make_epoch_fn, make_selfadv_step, training,
)

N_E, N_R, D, B, K = 23, 5, 8, 20, 7
MARGIN, ALPHA = 0.6, 1.3


def build(seed=0):
    model = TransE(N_E, N_R, D, dtype="float64", l1=False)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


def make_batch(seed=1):
    rng = np.random.default_rng(seed)
    # duplicates likely: exercises the occurrence scatter
    return np.stack(
        [rng.integers(0, N_E // 2, B), rng.integers(0, N_E // 2, B),
         rng.integers(0, N_R, B)], axis=1
    ).astype(np.int32)


def full_loss(model, margin, alpha, pos, pool, mask):
    """The same loss as a pure function of the FULL tables."""
    s, o, p = pos[:, 0], pos[:, 1], pos[:, 2]

    def loss(params):
        rows = model.gather_rows(params, s, o, p)
        dense = model.dense_params(params)
        f_pos = model.score_from_rows(rows, dense)
        total = jnp.sum(jnp.logaddexp(0.0, -(f_pos + margin)) * mask)
        pool_rows = params["E"][pool]
        for mode in (0, 1):
            f_neg = model.score_pool(rows, pool_rows, dense, mode)
            w = jax.lax.stop_gradient(jax.nn.softmax(alpha * f_neg, axis=1))
            total = total + jnp.sum(
                w * jnp.logaddexp(0.0, f_neg + margin) * mask[:, None]
            )
        return total

    return loss


def test_occ_grads_sum_to_full_autodiff():
    model, params = build()
    pos = make_batch()
    rng = np.random.default_rng(2)
    pool = jnp.asarray(rng.integers(0, N_E, K))
    mask = jnp.asarray((np.arange(B) < B - 3).astype(np.float64))  # masked tail

    loss, occ, g_dense = training.selfadv_grads_shared(
        model, params, jnp.asarray(pos), pool, mask, MARGIN, ALPHA
    )
    oracle = full_loss(model, MARGIN, ALPHA, jnp.asarray(pos), pool, mask)
    want_loss = oracle(params)
    want_grads = jax.grad(oracle)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-12)
    for pname, (idx, grads, counts) in occ.items():
        table = np.zeros_like(np.asarray(params[pname]))
        np.add.at(table, np.asarray(idx), np.asarray(grads))
        np.testing.assert_allclose(
            table, np.asarray(want_grads[pname]), rtol=1e-9, atol=1e-12,
            err_msg=f"scattered {pname} grads != full-table autodiff",
        )
    assert not g_dense  # TransE has no dense params


def test_occurrence_counts_convention():
    """cnt(s)=1+K (object-mode negs reuse s), cnt(o)=1+K, cnt(p)=1+2K,
    cnt(pool_k)=2*n_valid — the pointwise_grads_shared element-count
    convention."""
    model, params = build()
    pos = make_batch(seed=3)
    pool = jnp.arange(K)
    mask = jnp.ones(B, jnp.float64)
    _, occ, _ = training.selfadv_grads_shared(
        model, params, jnp.asarray(pos), pool, mask, MARGIN, ALPHA
    )
    idx_e, _, cnt_e = occ["E"]
    # layout: [s rows (B), o rows (B), pool rows (K)]
    np.testing.assert_allclose(np.asarray(cnt_e[:B]), 1.0 + K)
    np.testing.assert_allclose(np.asarray(cnt_e[B:2 * B]), 1.0 + K)
    np.testing.assert_allclose(np.asarray(cnt_e[2 * B:]), 2.0 * B)
    _, _, cnt_r = occ["R"]
    np.testing.assert_allclose(np.asarray(cnt_r), 1.0 + 2 * K)


def test_alpha_zero_is_uniform_weights():
    model, params = build(seed=4)
    pos = make_batch(seed=5)
    rng = np.random.default_rng(6)
    pool = jnp.asarray(rng.integers(0, N_E, K))
    mask = jnp.ones(B, jnp.float64)
    loss, _, _ = training.selfadv_grads_shared(
        model, params, jnp.asarray(pos), pool, mask, MARGIN, alpha=0.0
    )
    # direct formula: softplus positives + (1/K) sum softplus negatives
    s, o, p = pos[:, 0], pos[:, 1], pos[:, 2]
    rows = model.gather_rows(params, s, o, p)
    dense = model.dense_params(params)
    f_pos = np.asarray(model.score_from_rows(rows, dense))
    want = np.sum(np.logaddexp(0.0, -(f_pos + MARGIN)))
    for mode in (0, 1):
        f_neg = np.asarray(
            model.score_pool(rows, params["E"][pool], dense, mode)
        )
        want += np.sum(np.logaddexp(0.0, f_neg + MARGIN)) / K
    np.testing.assert_allclose(float(loss), want, rtol=1e-12)


def test_selfadv_requires_pool_sampler():
    model, _ = build()
    with pytest.raises(ValueError, match="pool"):
        make_selfadv_step(
            model, AdaGrad(lr=0.1), RandomModeSampler(N_E), margin=0.5
        )


def test_trains_on_latent_kg():
    from skge_tpu.data import latent_kg
    from skge_tpu.evaluation import FilteredRankingEval

    ds = latent_kg(n_entities=400, n_relations=6, n_train=2000,
                   n_valid=0, n_test=60, latent_dim=8, seed=1)
    model = TransE(ds.n_entities, ds.n_relations, 24, l1=False)
    opt = AdaGrad(lr=0.3)
    sampler = SharedNegativeSampler(ds.n_entities, k=64)
    step = make_selfadv_step(model, opt, sampler, margin=3.0, alpha=1.0,
                             aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 10),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    losses = []
    for e in range(30):
        state, m = epoch(state, xs)
        losses.append(float(np.asarray(m.loss).sum()))
    assert losses[-1] < losses[0] * 0.8
    r = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=64)(
        state.params
    )
    assert r.mrr > 5.0 / ds.n_entities


def test_trainer_config_selfadv():
    from skge_tpu.data import latent_kg
    from skge_tpu.trainer import TrainConfig, Trainer

    ds = latent_kg(n_entities=200, n_relations=6, n_train=800,
                   n_valid=0, n_test=20, latent_dim=6, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False)
    cfg = TrainConfig(max_epochs=5, nbatches=8, learning_rate=0.3,
                      margin=3.0, loss="selfadv", adv_alpha=1.0)
    tr = Trainer(model, SharedNegativeSampler(ds.n_entities, k=32), cfg)
    tr.fit(ds.train)
    assert np.isfinite(tr.loss)
