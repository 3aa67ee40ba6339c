"""ConvE (beyond-reference family): independent NumPy conv oracle,
reciprocal-relation routing, eval-sweep parity, shared-pool exactness
(object-side corruption), reciprocal data augmentation, and end-to-end
CE training — the round-2 model-contract surface plus the directional
quirks unique to ConvE."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import AdaGrad, ConvE, init_state, training  # noqa: E402
from skge_tpu.data import add_reciprocal_relations, latent_kg  # noqa: E402
from test_shared import expanded_pairs  # noqa: E402

N_E, N_R2, D, B, K = 29, 8, 6, 24, 9  # N_R2 = doubled (reciprocal) count
C = 4  # filters


def build(seed=0, **kw):
    model = ConvE(N_E, N_R2, D, nfilters=C, dtype="float64", **kw)
    params = dict(model.init_params(jax.random.PRNGKey(seed)))
    # randomize the zero-initialized biases (incl. the entity bias column)
    # so the oracle exercises every term
    rng = np.random.default_rng(seed + 50)
    E = np.asarray(params["E"]).copy()
    E[:, -1] = rng.normal(size=N_E) * 0.3
    params["E"] = jnp.asarray(E)
    params["bF"] = jnp.asarray(rng.normal(size=C) * 0.1)
    params["bW"] = jnp.asarray(rng.normal(size=D) * 0.1)
    return model, params


def batch(seed=1, b=B, n_r=N_R2):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, b), rng.integers(0, N_E, b),
         rng.integers(0, n_r, b)], axis=1
    ).astype(np.int32)


def numpy_hidden(model, params, s, p):
    """Direct NumPy reimplementation of the ConvE feature pipeline."""
    E, R = np.asarray(params["E"]), np.asarray(params["R"])
    F, bF = np.asarray(params["F"]), np.asarray(params["bF"])
    W, bW = np.asarray(params["W"]), np.asarray(params["bW"])
    d, k = model.ncomp, model.ksize
    h, w = model.grid
    b = len(s)
    img = np.concatenate(
        [E[s, :d].reshape(b, h, w), R[p].reshape(b, h, w)], axis=1
    )  # (B, 2h, w)
    oh, ow = model.conv_out
    c = F.shape[0]
    out = np.zeros((b, c, oh, ow))
    fm = F.reshape(c, -1)  # (C, k*k)
    for i in range(oh):
        for j in range(ow):
            patch = img[:, i:i + k, j:j + k].reshape(b, -1)
            out[:, :, i, j] = patch @ fm.T
    out = np.maximum(out + bF[None, :, None, None], 0.0)
    return np.maximum(out.reshape(b, -1) @ W + bW, 0.0)


def numpy_scores(model, params, s, o, p):
    E = np.asarray(params["E"])
    d = model.ncomp
    hid = numpy_hidden(model, params, s, p)
    return np.sum(hid * E[o, :d], axis=-1) + E[o, d]


def test_scores_match_numpy_oracle():
    model, params = build()
    t = batch()
    got = np.asarray(model.score_triples(params, jnp.asarray(t)))
    want = numpy_scores(model, params, t[:, 0], t[:, 1], t[:, 2])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_score_all_o_matches_per_triple():
    model, params = build(seed=2)
    t = batch(seed=2)
    s, p = t[:, 0], t[:, 2]
    ao = np.asarray(model.score_all_o(params, jnp.asarray(s), jnp.asarray(p)))
    for e in range(N_E):
        np.testing.assert_allclose(
            ao[:, e], numpy_scores(model, params, s, np.full(B, e), p),
            rtol=1e-9, atol=1e-11,
        )


def test_score_all_s_routes_through_inverse():
    """Reciprocal convention: subject-candidate scores ARE object-candidate
    scores under the inverse relation id (p + n_r/2, involutive)."""
    model, params = build(seed=3)
    t = batch(seed=3, n_r=N_R2 // 2)  # original (forward) ids only
    o, p = t[:, 1], t[:, 2]
    as_ = np.asarray(model.score_all_s(params, jnp.asarray(o), jnp.asarray(p)))
    for e in range(N_E):
        np.testing.assert_allclose(
            as_[:, e],
            numpy_scores(model, params, o, np.full(B, e), p + N_R2 // 2),
            rtol=1e-9, atol=1e-11,
        )
    # involution: inv(inv(p)) == p
    pj = jnp.asarray(np.arange(N_R2, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(model._inv(model._inv(pj))), np.arange(N_R2)
    )


def test_score_all_s_nonreciprocal_per_relation_sweep():
    """reciprocal=False subject sweeps (round 4): the per-relation
    candidate-hidden-table scan scores every (candidate, o, p) exactly
    like per-triple scoring — the former NotImplementedError edge."""
    import dataclasses

    model, params = build(seed=5)
    model = dataclasses.replace(model, reciprocal=False)
    t = batch(seed=5)
    o, p = t[:, 1], t[:, 2]
    as_ = np.asarray(model.score_all_s(params, jnp.asarray(o), jnp.asarray(p)))
    for e in range(N_E):
        np.testing.assert_allclose(
            as_[:, e],
            numpy_scores(model, params, np.full(B, e), o, p),
            rtol=1e-6, atol=1e-8,
        )
    # FB15k-shape smoke (round 5, VERDICT r4 item 6): the sweep scans the
    # batch's UNIQUE relations, so 1,345 relations — the old 256 gate's
    # cliff — cost only what the batch touches; exactness unchanged
    big = ConvE(N_E, 1345, D, nfilters=C, dtype="float64",
                reciprocal=False)
    bparams = big.init_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(77)
    ob = rng.integers(0, N_E, 5).astype(np.int32)
    pb = np.array([0, 1344, 700, 700, 3], np.int32)
    sweep = np.asarray(
        big.score_all_s(bparams, jnp.asarray(ob), jnp.asarray(pb))
    )
    for e in range(0, N_E, 7):
        np.testing.assert_allclose(
            sweep[:, e],
            numpy_scores(big, bparams, np.full(5, e), ob, pb),
            rtol=1e-6, atol=1e-8,
        )


def test_mode0_pool_rejected():
    model, params = build()
    with pytest.raises(ValueError, match="OBJECT"):
        rows = model.gather_rows(
            params, jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
            jnp.zeros(2, jnp.int32),
        )
        model.score_pool(
            rows, params["E"][:3], model.dense_params(params), mode=0
        )


def test_shared_pool_equals_expanded_generic():
    model, params = build(seed=5)
    opt = AdaGrad(lr=0.1)
    pos = batch(seed=6)
    rng = np.random.default_rng(7)
    pool = rng.integers(0, N_E, K)
    margin = 0.7
    mask = jnp.ones(B, jnp.float64)

    sl, sn, socc, sdense = training.pairwise_grads_shared(
        model, params, jnp.asarray(pos), jnp.asarray(pool), mask, margin,
        modes=(1,),
    )
    pxs, nxs = expanded_pairs(pos, pool, (1,))
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


def test_add_reciprocal_relations():
    ds = latent_kg(n_entities=150, n_relations=3, n_train=200, n_valid=10,
                   n_test=20, latent_dim=4, seed=0)
    aug = add_reciprocal_relations(ds)
    assert aug.n_relations == 6
    assert aug.train.shape[0] == 2 * ds.train.shape[0]
    # inverse block: (o, s, p+3) for each original (s, o, p)
    orig, inv = aug.train[:200], aug.train[200:]
    np.testing.assert_array_equal(orig, ds.train)
    np.testing.assert_array_equal(inv[:, 0], ds.train[:, 1])
    np.testing.assert_array_equal(inv[:, 1], ds.train[:, 0])
    np.testing.assert_array_equal(inv[:, 2], ds.train[:, 2] + 3)
    # eval sets untouched
    np.testing.assert_array_equal(aug.valid, ds.valid)
    np.testing.assert_array_equal(aug.test, ds.test)


def test_validation_errors():
    with pytest.raises(ValueError, match="DOUBLED"):
        ConvE(10, 3, D)  # odd relation count under reciprocal
    with pytest.raises(ValueError, match="factor"):
        ConvE(10, 4, 7, eh=2)
    with pytest.raises(ValueError, match="kernel"):
        ConvE(10, 4, 4, eh=1, ksize=5)  # 2x4 image, 5x5 kernel


def test_trains_with_ce_on_reciprocal_kg():
    from skge_tpu import make_ce_step, make_epoch_fn
    from skge_tpu.evaluation import FilteredRankingEval

    ds = add_reciprocal_relations(
        latent_kg(n_entities=300, n_relations=6, n_train=1200, n_valid=0,
                  n_test=50, latent_dim=6, seed=1)
    )
    model = ConvE(ds.n_entities, ds.n_relations, 24, nfilters=8)
    opt = AdaGrad(lr=0.3)
    step = make_ce_step(model, opt, directions=("o",), label_smoothing=0.1)
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 8),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    first = last = None
    for e in range(25):
        state, m = epoch(state, xs)
        loss = float(np.asarray(m.loss).mean())
        first = loss if first is None else first
        last = loss
    assert last < first * 0.8
    r = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=64)(
        state.params
    )
    assert r.mrr > 5.0 / ds.n_entities


def test_conve_trains_on_partitioned_trainer():
    """ConvE reaches the partitioned trainer (VERDICT r3 item 6): the
    reciprocal CE protocol on the entity-sharded layout — dense conv/FC
    params replicate, the candidate sweep runs mode-1 only."""
    from skge_tpu import Adam
    from skge_tpu.parallel.partitioned import (
        SHARD_AXIS, PartitionedTrainer,
    )
    from jax.sharding import Mesh

    ds = latent_kg(n_entities=300, n_relations=6, n_train=700, n_test=40,
                   latent_dim=6, seed=7)
    aug = add_reciprocal_relations(ds)
    model = ConvE(aug.n_entities, aug.n_relations, D)
    mesh = Mesh(np.asarray(jax.devices()[:4]), (SHARD_AXIS,))
    tr = PartitionedTrainer(
        model, Adam(lr=5e-3), aug.train, mesh, nbatches=8, seed=0,
        loss="ce", reciprocal=True, label_smoothing=0.1,
    ).fit(epochs=10)
    losses = [m["loss"] for m in tr.metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    res = tr.evaluate(ds.test, aug.all_triples(), batch_size=32)
    assert res.mrr > 3.0 / ds.n_entities


def test_conve_trains_on_outofcore_trainer():
    """ConvE reaches the out-of-core trainer: reciprocal CE over resident
    candidates (dense conv params device-resident, entity table host)."""
    from skge_tpu import Adam
    from skge_tpu.outofcore import OutOfCoreTrainer

    ds = latent_kg(n_entities=300, n_relations=6, n_train=700, n_test=40,
                   latent_dim=6, seed=7)
    aug = add_reciprocal_relations(ds)
    model = ConvE(aug.n_entities, aug.n_relations, D)
    ooc = OutOfCoreTrainer(
        model, Adam(lr=5e-3), aug.train, n_parts=2, nbatches=8, seed=0,
        loss="ce", label_smoothing=0.1, ce_directions=("o",),
    ).fit(epochs=10)
    losses = [m["loss"] for m in ooc.metrics]
    assert losses[-1] < losses[0] * 0.9, losses
    res = ooc.evaluate(ds.test, aug.all_triples(), batch_size=32,
                       reciprocal=True)
    assert res.mrr > 3.0 / ds.n_entities


def test_rparam_leaves_output_bias_column_unregularized():
    """SGD-linearity oracle: (step with rparam) - (step with rparam=0) must
    equal -lr * rparam * E with the trailing bias column ZEROED (the paper
    leaves output biases unregularized — reg_grad_rows masks column d),
    and exactly -lr * rparam * R on the relation table."""
    from skge_tpu import SGD, make_ce_step

    LR, RP = 0.1, 0.07
    deltas = {}
    for rp in (RP, 0.0):
        model, params = build(rparam=rp)
        opt = SGD(lr=LR)
        step = make_ce_step(model, opt, directions=("o",))
        state = init_state(model, opt, jax.random.PRNGKey(0))
        state = state._replace(params=params)
        pos = jnp.asarray(batch())
        new_state, _ = jax.jit(step)(state, pos, jnp.ones(B, jnp.float64))
        deltas[rp] = new_state.params
    for pname, mask_last in (("E", True), ("R", False)):
        p0 = np.asarray(deltas[0.0][pname])  # same init both runs
        d = np.asarray(deltas[RP][pname]) - p0
        model, params = build(rparam=RP)
        expect = -LR * RP * np.asarray(params[pname])
        if mask_last:
            expect[:, -1] = 0.0
        # remove the shared CE-gradient part: both runs share it exactly
        # only under SGD, where updates are linear in the gradient
        np.testing.assert_allclose(d, expect, rtol=1e-11, atol=1e-13)
