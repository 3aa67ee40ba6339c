"""Parity: JAX functional core vs the NumPy reference oracle.

For every model (TransE, RESCAL, HolE, ER-MLP) this checks, in float64 so
agreement is essentially exact:

- triple scores;
- ONE FULL pointwise (logistic) AdaGrad update step: gradients with
  duplicate-index AVERAGING, `rparam` row regularization, AdaGrad
  accumulator, dense W/C handling — params and accumulators must match the
  oracle table-for-table (both the 'unique' and 'dense' aggregation paths);
- ONE FULL pairwise (margin ranking) update step including the
  sigmoid-before-margin transform (HolE), violation filtering, `normless1`
  projection of touched rows only (TransE), and the zero-violation no-op.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu.models import ERMLP, HolE, RESCAL, TransE  # noqa: E402
from skge_tpu.optim import AdaGrad  # noqa: E402
from skge_tpu import training  # noqa: E402
from oracle import oracle_numpy as orc  # noqa: E402

N_E, N_R, D = 23, 5, 16
B = 40
LR = 0.1
RNG = np.random.default_rng


def make_params(model_name, seed=0):
    rng = RNG(seed)
    E = rng.normal(size=(N_E, D)) * 0.5
    if model_name == "transe":
        return {"E": E, "R": rng.normal(size=(N_R, D)) * 0.5}
    if model_name == "hole":
        return {"E": E, "R": rng.normal(size=(N_R, D)) * 0.5}
    if model_name == "rescal":
        return {"E": E, "W": rng.normal(size=(N_R, D, D)) * 0.3}
    if model_name == "ermlp":
        return {
            "E": E,
            "R": rng.normal(size=(N_R, D)) * 0.5,
            "W": rng.normal(size=(3 * D, 7)) * 0.3,
            "C": rng.normal(size=(7,)) * 0.5,
        }
    raise ValueError(model_name)


def make_batch(seed=1, b=B):
    """Triples with plenty of duplicate entities/relations."""
    rng = RNG(seed)
    s = rng.integers(0, N_E // 2, b)  # duplicates likely
    o = rng.integers(0, N_E, b)
    p = rng.integers(0, N_R, b)
    return np.stack([s, o, p], 1).astype(np.int64)


CASES = {
    "transe": (
        lambda: TransE(N_E, N_R, D, dtype="float64", l1=True),
        lambda prm, **kw: orc.TransEOracle(prm["E"], prm["R"], l1=True, **kw),
    ),
    "transe_l2": (
        lambda: TransE(N_E, N_R, D, dtype="float64", l1=False),
        lambda prm, **kw: orc.TransEOracle(prm["E"], prm["R"], l1=False, **kw),
    ),
    "hole": (
        lambda: HolE(N_E, N_R, D, dtype="float64", rparam=0.01),
        lambda prm, **kw: orc.HolEOracle(prm["E"], prm["R"], rparam=0.01, **kw),
    ),
    "rescal": (
        lambda: RESCAL(N_E, N_R, D, dtype="float64", rparam=0.02),
        lambda prm, **kw: orc.RESCALOracle(prm["E"], prm["W"], rparam=0.02, **kw),
    ),
    "ermlp": (
        lambda: ERMLP(N_E, N_R, D, dtype="float64", nhidden=7),
        lambda prm, **kw: orc.ERMLPOracle(
            prm["E"], prm["R"], prm["W"], prm["C"], **kw
        ),
    ),
}

POINTWISE = ["hole", "rescal", "ermlp"]  # TransE is pairwise-only in the ref


def to_jax(prm):
    return {k: jnp.asarray(v) for k, v in prm.items()}


def oracle_apply(oracle_grads, prm, model):
    """Apply the oracle AdaGrad update in place; return (params, p2)."""
    p2 = {k: np.zeros_like(v) for k, v in prm.items()}
    for name, g in oracle_grads.items():
        post = None
        if model.post_constraints.get(name) == "normless1":
            post = orc.normless1
        upd = orc.AdaGradOracle(prm[name], lr=LR, post=post)
        if isinstance(g, tuple):
            grad, idx = g
            upd.update(grad, idx)
        else:
            upd.update(g, slice(None) if g.ndim == prm[name].ndim else None)
        p2[name] = upd.p2
    return prm, p2


@pytest.mark.parametrize("case", list(CASES))
def test_scores(case):
    model = CASES[case][0]()
    prm = make_params(model.name)
    oracle = CASES[case][1](prm)
    xs = make_batch()
    got = np.asarray(model.score_triples(to_jax(prm), jnp.asarray(xs)))
    want = oracle.scores(xs[:, 0], xs[:, 1], xs[:, 2])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("case", POINTWISE)
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_pointwise_update(case, aggregate):
    model = CASES[case][0]()
    prm = make_params(model.name)
    oracle = CASES[case][1](prm)
    xs = make_batch()
    rng = RNG(2)
    ys = np.where(rng.uniform(size=B) < 0.5, 1.0, -1.0)
    xys = [((int(s), int(o), int(p)), float(y)) for (s, o, p), y in zip(xs, ys)]

    grads, loss = oracle.gradients(xys)
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    jloss, occ, g_dense = training.pointwise_grads(
        model,
        jprm,
        jnp.asarray(xs),
        jnp.asarray(ys),
        jnp.ones(B, jnp.float64),
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, aggregate
    )

    np.testing.assert_allclose(float(jloss), loss, rtol=1e-10)
    for k in prm:
        np.testing.assert_allclose(
            np.asarray(new_prm[k]), want_prm[k], rtol=1e-9, atol=1e-11,
            err_msg=f"param {k}",
        )
        np.testing.assert_allclose(
            np.asarray(new_ost[k]["p2"]), want_p2[k], rtol=1e-9, atol=1e-11,
            err_msg=f"p2 {k}",
        )


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_pairwise_update(case, aggregate):
    model = CASES[case][0]()
    margin = 0.8
    prm = make_params(model.name)
    oracle = CASES[case][1](prm, margin=margin)
    pos = make_batch(seed=3)
    neg = make_batch(seed=4)
    neg[:, 2] = pos[:, 2]  # negatives share the relation (corruption)

    pxs = [tuple(map(int, t)) for t in pos]
    nxs = [tuple(map(int, t)) for t in neg]
    grads, nviol = oracle.pairwise_gradients(pxs, nxs)
    assert nviol > 0, "test setup should produce violations"
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    _, jnviol, occ, g_dense = training.pairwise_grads(
        model,
        jprm,
        jnp.asarray(pos),
        jnp.asarray(neg),
        jnp.ones(B, jnp.float64),
        margin,
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, aggregate
    )

    assert int(jnviol) == nviol
    for k in prm:
        np.testing.assert_allclose(
            np.asarray(new_prm[k]), want_prm[k], rtol=1e-9, atol=1e-11,
            err_msg=f"param {k}",
        )
        np.testing.assert_allclose(
            np.asarray(new_ost[k]["p2"]), want_p2[k], rtol=1e-9, atol=1e-11,
            err_msg=f"p2 {k}",
        )


@pytest.mark.parametrize("case", ["transe", "hole", "ermlp"])
def test_pairwise_zero_violations_is_noop(case):
    """Reference skips the whole batch when nothing violates the margin."""
    model = CASES[case][0]()
    prm = make_params(model.name)
    pos = make_batch(seed=5)
    neg = make_batch(seed=6)
    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    # margin so low that no pair violates
    _, nviol, occ, g_dense = training.pairwise_grads(
        model, jprm, jnp.asarray(pos), jnp.asarray(neg),
        jnp.ones(B, jnp.float64), -1e6,
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, "unique"
    )
    assert int(nviol) == 0
    for k in prm:
        np.testing.assert_array_equal(np.asarray(new_prm[k]), prm[k])
        np.testing.assert_array_equal(
            np.asarray(new_ost[k]["p2"]), np.zeros_like(prm[k])
        )


@pytest.mark.parametrize("case", ["transe", "hole", "rescal"])
def test_padding_mask_equivalence(case):
    """Masked padding rows must not change the update at all."""
    model = CASES[case][0]()
    margin = 0.8
    prm = make_params(model.name)
    pos = make_batch(seed=7)
    neg = make_batch(seed=8)
    neg[:, 2] = pos[:, 2]
    opt = AdaGrad(lr=LR)

    def run(pos_a, neg_a, mask):
        jprm = to_jax(prm)
        ost = opt.init(jprm)
        _, nv, occ, gd = training.pairwise_grads(
            model, jprm, jnp.asarray(pos_a), jnp.asarray(neg_a),
            jnp.asarray(mask), margin,
        )
        return training.apply_gradients(model, opt, jprm, ost, occ, gd, "unique")

    base_prm, _ = run(pos, neg, np.ones(B))
    # append garbage rows with mask 0
    pad = 9
    pos_p = np.concatenate([pos, pos[:pad]])
    neg_p = np.concatenate([neg, pos[:pad]])  # neg==pos would "violate"
    mask_p = np.concatenate([np.ones(B), np.zeros(pad)])
    pad_prm, _ = run(pos_p, neg_p, mask_p)
    for k in prm:
        np.testing.assert_allclose(
            np.asarray(pad_prm[k]), np.asarray(base_prm[k]), rtol=1e-12
        )
