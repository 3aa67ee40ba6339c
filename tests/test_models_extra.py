"""DistMult + ComplEx + RotatE (beyond-reference baselines): scoring oracles,
pool/eval sweep parity, shared-path exactness, end-to-end learning."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import AdaGrad, ComplEx, DistMult, RotatE, init_state, training  # noqa: E402
from test_shared import expanded_pairs  # noqa: E402

N_E, N_R, D, B, K = 29, 4, 6, 24, 9


def build(cls, seed=0):
    model = cls(N_E, N_R, D, dtype="float64")
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


def batch(seed=1, b=B):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, b), rng.integers(0, N_E, b),
         rng.integers(0, N_R, b)], axis=1
    ).astype(np.int32)


def numpy_scores(cls, params, s, o, p):
    """Independent NumPy oracle for the score functions."""
    E, R = np.asarray(params["E"]), np.asarray(params["R"])
    if cls is DistMult:
        return np.sum(E[s] * R[p] * E[o], axis=-1)
    if cls is RotatE:
        d = E.shape[1] // 2
        Ec = E[:, :d] + 1j * E[:, d:]
        rot = np.exp(1j * R)
        diff = Ec[s] * rot[p] - Ec[o]
        return -np.sum(np.abs(diff) ** 2, axis=-1)
    d = E.shape[1] // 2
    Ec = E[:, :d] + 1j * E[:, d:]
    Rc = R[:, :d] + 1j * R[:, d:]
    return np.real(np.sum(Rc[p] * Ec[s] * np.conj(Ec[o]), axis=-1))


@pytest.mark.parametrize("cls", [DistMult, ComplEx, RotatE])
def test_scores_match_numpy_oracle(cls):
    model, params = build(cls)
    t = batch()
    got = np.asarray(model.score_triples(params, jnp.asarray(t)))
    want = numpy_scores(cls, params, t[:, 0], t[:, 1], t[:, 2])
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("cls", [DistMult, ComplEx, RotatE])
def test_score_all_matches_per_triple(cls):
    model, params = build(cls)
    t = batch(seed=2)
    s, o, p = t[:, 0], t[:, 1], t[:, 2]
    ao = np.asarray(model.score_all_o(params, jnp.asarray(s), jnp.asarray(p)))
    as_ = np.asarray(model.score_all_s(params, jnp.asarray(o), jnp.asarray(p)))
    for e in range(N_E):
        np.testing.assert_allclose(
            ao[:, e], numpy_scores(cls, params, s, np.full(B, e), p),
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            as_[:, e], numpy_scores(cls, params, np.full(B, e), o, p),
            rtol=1e-10, atol=1e-12,
        )


def test_rotate_composes_rotations():
    """RotatE's defining pattern: if r3 = r1 + r2 (phase addition), then
    scoring with r3 equals rotating twice — the compositionality that
    translations/bilinear forms lack jointly."""
    model, params = build(RotatE, seed=9)
    E = np.asarray(params["E"])
    R = np.asarray(params["R"])
    R = R.copy()
    R[2] = R[0] + R[1]  # r3 = r1 ∘ r2
    d = E.shape[1] // 2
    Ec = E[:, :d] + 1j * E[:, d:]
    x = Ec[3] * np.exp(1j * R[0]) * np.exp(1j * R[1])
    twice = -np.sum(np.abs(x - Ec[5]) ** 2)
    p2 = dict(params)
    p2["R"] = jnp.asarray(R)
    once = float(model.score(p2, np.array([3]), np.array([5]), np.array([2]))[0])
    np.testing.assert_allclose(once, twice, rtol=1e-10)


def test_complex_handles_asymmetric_relations():
    """ComplEx must distinguish (s, o, p) from (o, s, p); DistMult cannot."""
    model, params = build(ComplEx, seed=3)
    t = batch(seed=4)
    fwd = np.asarray(model.score(params, t[:, 0], t[:, 1], t[:, 2]))
    bwd = np.asarray(model.score(params, t[:, 1], t[:, 0], t[:, 2]))
    assert np.max(np.abs(fwd - bwd)) > 1e-6

    dm, dparams = build(DistMult, seed=3)
    fwd = np.asarray(dm.score(dparams, t[:, 0], t[:, 1], t[:, 2]))
    bwd = np.asarray(dm.score(dparams, t[:, 1], t[:, 0], t[:, 2]))
    np.testing.assert_allclose(fwd, bwd, rtol=1e-12)


@pytest.mark.parametrize("cls", [DistMult, ComplEx, RotatE])
def test_shared_pool_equals_expanded_generic(cls):
    """pairwise_grads_shared == generic pairwise_grads over the fully
    expanded (positive, pool, mode) pair list — same contract test_shared.py
    pins for the reference models, here jax-vs-jax in fp64."""
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


@pytest.mark.parametrize("cls", [DistMult, ComplEx, RotatE])
def test_trains_on_latent_kg(cls):
    from skge_tpu import SharedNegativeSampler, make_epoch_fn, make_pairwise_step
    from skge_tpu.data import latent_kg
    from skge_tpu.evaluation import FilteredRankingEval

    ds = latent_kg(n_entities=400, n_relations=6, n_train=2000,
                   n_valid=0, n_test=60, latent_dim=8, seed=1)
    model = cls(ds.n_entities, ds.n_relations, 24, rparam=0.0)
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
