"""Triple classification (Socher et al. 2013 / TransH protocol — beyond
reference): exact per-relation threshold search, filtered negative
generation, global-threshold fallback, and an end-to-end accuracy gate on
a trained model."""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import AdaGrad, TransE, init_state  # noqa: E402
from skge_tpu.evaluation import (  # noqa: E402
    _best_threshold, classification_negatives, triple_classification,
)


def test_best_threshold_exact_vs_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(20):
        s = rng.normal(size=30)
        y = np.where(rng.random(30) < 0.5, 1.0, -1.0)
        tau = _best_threshold(s, y)
        got = np.mean(np.where(s >= tau, 1.0, -1.0) == y)
        # brute force over all candidate cuts
        cands = np.concatenate([[-np.inf, np.inf], (np.sort(s)[:-1] + np.sort(s)[1:]) / 2])
        best = max(np.mean(np.where(s >= t, 1.0, -1.0) == y) for t in cands)
        assert got == best


def test_best_threshold_separable():
    s = np.array([-3.0, -2.0, -1.0, 1.0, 2.0, 3.0])
    y = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    tau = _best_threshold(s, y)
    assert -1.0 < tau < 1.0
    # all-positive labels -> threshold open at the bottom
    assert _best_threshold(s, np.ones(6)) == -np.inf
    assert _best_threshold(s, -np.ones(6)) == np.inf


def test_classification_negatives_filtered():
    rng = np.random.default_rng(1)
    n_e, n_r = 40, 3
    pos = np.stack([rng.integers(0, n_e, 200), rng.integers(0, n_e, 200),
                    rng.integers(0, n_r, 200)], axis=1).astype(np.int32)
    known = pos
    neg = classification_negatives(pos, n_e, known, seed=2)
    assert neg.shape == pos.shape
    # no generated negative is a known triple
    known_set = {tuple(t) for t in known.tolist()}
    hits = sum(tuple(t) in known_set for t in neg.tolist())
    assert hits == 0
    # exactly one slot changed per triple, relation untouched
    diff = (neg != pos).sum(axis=1)
    assert np.all(diff <= 1)  # a resample CAN collide with the original id
    np.testing.assert_array_equal(neg[:, 2], pos[:, 2])


def test_end_to_end_accuracy_on_trained_model():
    from skge_tpu import SharedNegativeSampler, make_epoch_fn, make_pairwise_step
    from skge_tpu.data import latent_kg

    ds = latent_kg(n_entities=300, n_relations=6, n_train=1400, n_valid=100,
                   n_test=100, latent_dim=8, seed=4)
    model = TransE(ds.n_entities, ds.n_relations, 24, l1=False)
    opt = AdaGrad(lr=0.2)
    step = make_pairwise_step(
        model, opt, SharedNegativeSampler(ds.n_entities, k=64),
        margin=1.0, aggregate="dense",
    )
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 10),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(40):
        state, _ = epoch(state, xs)

    known = ds.all_triples()
    v_neg = classification_negatives(ds.valid, ds.n_entities, known, seed=5)
    t_neg = classification_negatives(ds.test, ds.n_entities, known, seed=6)
    out = triple_classification(
        model, state.params, ds.valid, v_neg, ds.test, t_neg
    )
    assert out["accuracy"] > 0.7  # well above the 0.5 coin flip
    assert set(out["per_relation"]) <= set(range(ds.n_relations))
    # untrained params ~ chance
    fresh = init_state(model, opt, jax.random.PRNGKey(9)).params
    base = triple_classification(model, fresh, ds.valid, v_neg, ds.test, t_neg)
    assert base["accuracy"] < out["accuracy"] - 0.1


def test_best_threshold_skips_unrealizable_tied_cuts():
    """Regression: the cut between two EQUAL scores is unrealizable (the
    midpoint equals the scores; `>=` flips the lower item) — the returned
    threshold's realized accuracy must match what the search counted."""
    s = np.array([1.0, 1.0])
    y = np.array([-1.0, 1.0])
    tau = _best_threshold(s, y)
    realized = np.mean(np.where(s >= tau, 1.0, -1.0) == y)
    assert realized == 0.5  # no threshold separates equal scores
    assert tau in (-np.inf, np.inf)
    # and generally: realized accuracy == brute-force max over REAL taus
    rng = np.random.default_rng(3)
    for _ in range(10):
        s = rng.integers(0, 4, 20).astype(float)  # heavy ties
        y = np.where(rng.random(20) < 0.5, 1.0, -1.0)
        tau = _best_threshold(s, y)
        realized = np.mean(np.where(s >= tau, 1.0, -1.0) == y)
        cands = np.concatenate([[-np.inf, np.inf], np.unique(s)])
        best = max(np.mean(np.where(s >= t, 1.0, -1.0) == y) for t in cands)
        assert realized == best


def test_classification_negatives_raises_on_exhaustion():
    """Regression: a near-universal relation must fail loudly instead of
    returning known-true triples as 'negatives'."""
    import pytest

    n_e = 3
    s, o = np.meshgrid(np.arange(n_e), np.arange(n_e))
    known = np.stack(
        [s.ravel(), o.ravel(), np.zeros(n_e * n_e, int)], axis=1
    ).astype(np.int32)  # EVERY possible triple of relation 0 is true
    with pytest.raises(ValueError, match="collide"):
        classification_negatives(known[:4], n_e, known, seed=0, ntries=5)
