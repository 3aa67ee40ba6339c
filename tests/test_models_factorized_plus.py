"""SimplE + QuatE + PairRE (beyond-reference families): NumPy scoring
oracles, defining structural properties, eval-sweep parity, shared-pool
exactness against the expanded pair list, and end-to-end learning — the
same contract surface test_models_extra.py / test_models_translational_plus.py
pin for the other round-2 families."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import (  # noqa: E402
    AdaGrad, PairRE, QuatE, SimplE, init_state, training,
)
from test_shared import expanded_pairs  # noqa: E402

N_E, N_R, D, B, K = 29, 4, 6, 24, 9


def build(cls, seed=0, **kw):
    model = cls(N_E, N_R, D, dtype="float64", **kw)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


def batch(seed=1, b=B):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, b), rng.integers(0, N_E, b),
         rng.integers(0, N_R, b)], axis=1
    ).astype(np.int32)


def _quat_split(x):
    d = x.shape[-1] // 4
    return x[..., :d], x[..., d:2 * d], x[..., 2 * d:3 * d], x[..., 3 * d:]


def numpy_scores(cls, params, s, o, p):
    """Independent NumPy oracles (no shared code with the JAX models)."""
    E = np.asarray(params["E"])
    R = np.asarray(params["R"])
    if cls is SimplE:
        d = E.shape[1] // 2
        h, t = E[:, :d], E[:, d:]
        r, rinv = R[:, :d], R[:, d:]
        return 0.5 * (
            np.sum(h[s] * r[p] * t[o], axis=-1)
            + np.sum(h[o] * rinv[p] * t[s], axis=-1)
        )
    if cls is PairRE:
        d = E.shape[1]
        rh, rt = R[:, :d], R[:, d:]
        diff = E[s] * rh[p] - E[o] * rt[p]
        return -np.sum(diff * diff, axis=-1)
    # QuatE: per-component quaternion algebra in NumPy
    a1, b1, c1, d1 = _quat_split(E[s])
    ar, br, cr, dr = _quat_split(R[p])
    n = np.sqrt(ar * ar + br * br + cr * cr + dr * dr)
    ar, br, cr, dr = ar / n, br / n, cr / n, dr / n
    ra = a1 * ar - b1 * br - c1 * cr - d1 * dr
    rb = a1 * br + b1 * ar + c1 * dr - d1 * cr
    rc = a1 * cr - b1 * dr + c1 * ar + d1 * br
    rd = a1 * dr + b1 * cr - c1 * br + d1 * ar
    a2, b2, c2, d2 = _quat_split(E[o])
    return np.sum(ra * a2 + rb * b2 + rc * c2 + rd * d2, axis=-1)


CASES = [SimplE, QuatE, PairRE]


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


def test_simple_inverse_symmetry():
    """SimplE's defining property: swapping (s, o) while swapping a
    relation's forward/inverse halves leaves the score unchanged —
    score(s, o, r) = score(o, s, r with halves swapped)."""
    model, params = build(SimplE)
    t = batch(seed=3)
    s, o, p = t[:, 0], t[:, 1], t[:, 2]
    base = np.asarray(model.score(params, s, o, p))
    R = np.asarray(params["R"])
    d = R.shape[1] // 2
    swapped = dict(params)
    swapped["R"] = jnp.asarray(np.concatenate([R[:, d:], R[:, :d]], axis=1))
    got = np.asarray(model.score(swapped, o, s, p))
    np.testing.assert_allclose(got, base, rtol=1e-12)


def test_quate_rotation_is_isometry():
    """The relation rotation preserves entity norms: <s⊗r̂, s⊗r̂> = <s, s>
    (the property that makes the mode-0 adjoint query exact)."""
    model, params = build(QuatE)
    E, R = params["E"], params["R"]
    s = jnp.asarray(np.arange(8, dtype=np.int32))
    p = jnp.asarray(np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32))
    rot = QuatE._hamilton(E[s], QuatE._unit(R[p]))
    np.testing.assert_allclose(
        np.sum(np.asarray(rot) ** 2, axis=-1),
        np.sum(np.asarray(E[s]) ** 2, axis=-1),
        rtol=1e-12,
    )


def test_quate_scalar_quaternions_are_complex():
    """With zero c/d components QuatE degenerates to a ComplEx-like real
    bilinear form: the Hamilton product restricted to the (a, b) plane IS
    complex multiplication, so score = Re<(s·r̂), conj-free o-dot> matches
    a hand-built complex computation."""
    model = QuatE(N_E, N_R, D, dtype="float64")
    params = dict(model.init_params(jax.random.PRNGKey(7)))
    E = np.asarray(params["E"]).copy()
    R = np.asarray(params["R"]).copy()
    d = D
    E[:, 2 * d:] = 0.0
    R[:, 2 * d:] = 0.0
    params["E"], params["R"] = jnp.asarray(E), jnp.asarray(R)
    t = batch(seed=9)
    s, o, p = t[:, 0], t[:, 1], t[:, 2]
    got = np.asarray(model.score(params, s, o, p))
    ec = E[:, :d] + 1j * E[:, d:2 * d]
    rc = R[:, :d] + 1j * R[:, d:2 * d]
    rc = rc / np.abs(rc)
    # complex multiply then R^2 dot: <s·r̂, o> componentwise
    want = np.sum(
        np.real(ec[s] * rc[p]) * np.real(ec[o])
        + np.imag(ec[s] * rc[p]) * np.imag(ec[o]),
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-11)


def test_pairre_equal_pair_is_symmetric():
    """With r^H = r^T the score is symmetric in (s, o) — the pattern PairRE
    uses to encode symmetric relations."""
    model, params = build(PairRE)
    R = np.asarray(params["R"])
    d = R.shape[1] // 2
    sym = dict(params)
    sym["R"] = jnp.asarray(np.concatenate([R[:, :d], R[:, :d]], axis=1))
    t = batch(seed=4)
    s, o, p = t[:, 0], t[:, 1], t[:, 2]
    a = np.asarray(model.score(sym, s, o, p))
    b = np.asarray(model.score(sym, o, s, p))
    np.testing.assert_allclose(a, b, rtol=1e-12)


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
