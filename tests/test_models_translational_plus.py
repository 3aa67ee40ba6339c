"""TransH + TransR + TuckER (beyond-reference families): NumPy scoring
oracles, defining structural properties, eval-sweep parity, shared-pool
exactness against the expanded pair list, and end-to-end learning —
the same contract surface test_models_extra.py pins for
DistMult/ComplEx/RotatE."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import (  # noqa: E402
    AdaGrad, RESCAL, TransE, TransH, TransR, TuckER, init_state, training,
)
from test_shared import expanded_pairs  # noqa: E402

N_E, N_R, D, B, K = 29, 4, 6, 24, 9


def build(cls, seed=0, **kw):
    model = cls(N_E, N_R, D, dtype="float64", **kw)
    params = model.init_params(jax.random.PRNGKey(seed))
    if cls is TransR:
        # identity init degenerates to TransE-L2; randomize M so the oracle
        # checks the full projection math
        rng = np.random.default_rng(seed + 100)
        params = dict(params)
        params["M"] = jnp.asarray(
            rng.normal(size=np.asarray(params["M"]).shape) * 0.5
        )
    return model, params


def batch(seed=1, b=B):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, b), rng.integers(0, N_E, b),
         rng.integers(0, N_R, b)], axis=1
    ).astype(np.int32)


def numpy_scores(cls, params, s, o, p):
    E = np.asarray(params["E"])
    R = np.asarray(params["R"])
    if cls is TransH:
        W = np.asarray(params["W"])
        w = W[p] / np.linalg.norm(W[p], axis=-1, keepdims=True)
        proj = lambda e: e - np.sum(e * w, -1, keepdims=True) * w  # noqa: E731
        d = proj(E[s]) + R[p] - proj(E[o])
        return -np.sum(d * d, axis=-1)
    if cls is TransR:
        M = np.asarray(params["M"])
        d = (
            np.einsum("bij,bj->bi", M[p], E[s])
            + R[p]
            - np.einsum("bij,bj->bi", M[p], E[o])
        )
        return -np.sum(d * d, axis=-1)
    W = np.asarray(params["W"])
    m = np.einsum("bk,kij->bij", R[p], W)
    return np.einsum("bi,bij,bj->b", E[s], m, E[o])


CASES = [TransH, TransR, TuckER]


@pytest.mark.parametrize("cls", CASES)
def test_scores_match_numpy_oracle(cls):
    model, params = build(cls)
    t = batch()
    got = np.asarray(model.score_triples(params, jnp.asarray(t)))
    want = numpy_scores(cls, params, t[:, 0], t[:, 1], t[:, 2])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("cls", CASES)
def test_score_all_matches_per_triple(cls):
    model, params = build(cls)
    t = batch(seed=2)
    s, o, p = t[:, 0], t[:, 1], t[:, 2]
    ao = np.asarray(model.score_all_o(params, jnp.asarray(s), jnp.asarray(p)))
    as_ = np.asarray(model.score_all_s(params, jnp.asarray(o), jnp.asarray(p)))
    for e in range(N_E):
        np.testing.assert_allclose(
            ao[:, e], numpy_scores(cls, params, s, np.full(B, e), p),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            as_[:, e], numpy_scores(cls, params, np.full(B, e), o, p),
            rtol=1e-9, atol=1e-11,
        )


def test_transh_invariant_along_normal():
    """TransH's defining property: moving an entity ALONG the relation's
    hyperplane normal never changes the score (the projection removes that
    component) — exactly what lets one entity behave differently per
    relation."""
    model, params = build(TransH)
    # disjoint subject/object ids so each row's shift touches only that row
    s = np.arange(6, dtype=np.int32)
    o = np.arange(10, 16, dtype=np.int32)
    p = np.array([0, 1, 2, 3, 0, 1], dtype=np.int32)
    base = np.asarray(model.score(params, s, o, p))
    E = np.asarray(params["E"]).copy()
    W = np.asarray(params["W"])
    for b in range(6):
        w = W[p[b]] / np.linalg.norm(W[p[b]])
        E[s[b]] = E[s[b]] + 0.37 * w  # shift along the normal only
    p2 = dict(params)
    p2["E"] = jnp.asarray(E)
    shifted = np.asarray(model.score(p2, s, o, p))
    np.testing.assert_allclose(shifted, base, rtol=1e-9, atol=1e-11)


def test_transr_identity_init_is_transe_l2():
    """With the paper's identity-matrix init, TransR scores ARE TransE-L2
    scores — the documented starting point."""
    model = TransR(N_E, N_R, D, dtype="float64")
    params = model.init_params(jax.random.PRNGKey(3))
    te = TransE(N_E, N_R, D, dtype="float64", l1=False)
    t = batch(seed=7)
    got = np.asarray(model.score_triples(params, jnp.asarray(t)))
    want = np.asarray(
        te.score_triples(
            {"E": params["E"], "R": params["R"]}, jnp.asarray(t)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_tucker_one_hot_core_is_rescal():
    """With one-hot relation rows, TuckER's mixed bilinear form selects a
    core slice — exactly RESCAL with W = core."""
    model = TuckER(N_E, N_R, D, rcomp=N_R, dtype="float64")
    params = dict(model.init_params(jax.random.PRNGKey(4)))
    params["R"] = jnp.eye(N_R, dtype=jnp.float64)
    rescal = RESCAL(N_E, N_R, D, dtype="float64")
    t = batch(seed=8)
    got = np.asarray(model.score_triples(params, jnp.asarray(t)))
    want = np.asarray(
        rescal.score_triples(
            {"E": params["E"], "W": params["W"]}, jnp.asarray(t)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("cls", CASES)
def test_shared_pool_equals_expanded_generic(cls):
    model, params = build(cls, seed=5)
    opt = AdaGrad(lr=0.1)
    pos = batch(seed=6)
    rng = np.random.default_rng(7)
    pool = rng.integers(0, N_E, K)
    margin = 0.7
    mask = jnp.ones(B, jnp.float64)

    sl, sn, socc, sdense = training.pairwise_grads_shared(
        model, params, jnp.asarray(pos), jnp.asarray(pool), mask, margin
    )
    pxs, nxs = expanded_pairs(pos, pool, (0, 1))
    gl, gn, gocc, gdense = training.pairwise_grads(
        model, params, jnp.asarray(np.asarray(pxs, np.int32)),
        jnp.asarray(np.asarray(nxs, np.int32)),
        jnp.ones(len(pxs), jnp.float64), margin,
    )
    np.testing.assert_allclose(float(sl), float(gl), rtol=1e-12)
    assert int(sn) == int(gn)
    a = training.apply_gradients(
        model, opt, params, opt.init(params), socc, sdense, "dense",
        premasked=True,
    )
    b = training.apply_gradients(
        model, opt, params, opt.init(params), gocc, gdense, "dense",
        premasked=False,
    )
    for kk in params:
        np.testing.assert_allclose(
            np.asarray(a[0][kk]), np.asarray(b[0][kk]), rtol=1e-9, atol=1e-12
        )


@pytest.mark.parametrize("cls", CASES)
def test_trains_on_latent_kg(cls):
    from skge_tpu import SharedNegativeSampler, make_epoch_fn, make_pairwise_step
    from skge_tpu.data import latent_kg
    from skge_tpu.evaluation import FilteredRankingEval

    ds = latent_kg(n_entities=400, n_relations=6, n_train=2000,
                   n_valid=0, n_test=60, latent_dim=8, seed=1)
    model = cls(ds.n_entities, ds.n_relations, 24)
    opt = AdaGrad(lr=0.3)
    sampler = SharedNegativeSampler(ds.n_entities, k=64)
    step = make_pairwise_step(model, opt, sampler, margin=0.5, aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 10),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    first = last = None
    for e in range(30):
        state, m = epoch(state, xs)
        nv = float(np.asarray(m.nviolations).sum())
        first = nv if first is None else first
        last = nv
    assert last < first * 0.7
    r = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=64)(
        state.params
    )
    assert r.mrr > 5.0 / ds.n_entities
