"""Shared-negative-pool path parity.

`pairwise_grads_shared` (training.py) never materializes the B*K*|modes|
pair list, but must be EXACTLY the reference math (violation filtering,
pairwise_af-before-margin, duplicate-occurrence averaging, AdaGrad +
normless1) over that fully expanded list. The oracle sees the expansion.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu.optim import AdaGrad  # noqa: E402
from skge_tpu import training  # noqa: E402
from skge_tpu.sampling import SharedNegativeSampler  # noqa: E402
from test_parity import (  # noqa: E402
    B, CASES, LR, N_E, make_batch, make_params, oracle_apply, to_jax,
)

K = 9


def expanded_pairs(pos, pool, modes, keep=None):
    """Reference-style (pxs, nxs) lists for every (positive, pool, mode)."""
    pxs, nxs = [], []
    rows = range(pos.shape[0]) if keep is None else keep
    for mode in modes:
        for k in range(len(pool)):
            for b in rows:
                neg = pos[b].copy()
                neg[mode] = pool[k]
                pxs.append(tuple(map(int, pos[b])))
                nxs.append(tuple(map(int, neg)))
    return pxs, nxs


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_shared_pool_matches_oracle(case, aggregate):
    model = CASES[case][0]()
    margin = 0.8
    prm = make_params(model.name)
    oracle = CASES[case][1](prm, margin=margin)
    pos = make_batch(seed=23)
    rng = np.random.default_rng(24)
    pool = rng.integers(0, N_E, K)

    pxs, nxs = expanded_pairs(pos, pool, (0, 1))
    grads, nviol = oracle.pairwise_gradients(pxs, nxs)
    assert nviol > 0
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    _, jnviol, occ, g_dense = training.pairwise_grads_shared(
        model, jprm, jnp.asarray(pos), jnp.asarray(pool),
        jnp.ones(B, jnp.float64), margin,
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, aggregate, premasked=True
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


def test_shared_pool_respects_batch_mask():
    """Masked-out positives contribute nothing — exactly as if absent."""
    model = CASES["transe"][0]()
    margin = 0.8
    prm = make_params("transe")
    oracle = CASES["transe"][1](prm, margin=margin)
    pos = make_batch(seed=31)
    rng = np.random.default_rng(32)
    pool = rng.integers(0, N_E, K)
    mask = np.ones(B)
    mask[::3] = 0.0
    keep = [b for b in range(B) if mask[b] > 0]

    pxs, nxs = expanded_pairs(pos, pool, (0, 1), keep=keep)
    grads, nviol = oracle.pairwise_gradients(pxs, nxs)
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    _, jnviol, occ, g_dense = training.pairwise_grads_shared(
        model, jprm, jnp.asarray(pos), jnp.asarray(pool),
        jnp.asarray(mask), margin,
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, "unique", premasked=True
    )
    assert int(jnviol) == nviol
    for k in prm:
        np.testing.assert_allclose(
            np.asarray(new_prm[k]), want_prm[k], rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(new_ost[k]["p2"]), want_p2[k], rtol=1e-9, atol=1e-11
        )


@pytest.mark.parametrize("case", ["hole", "rescal", "ermlp"])
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_shared_pool_pointwise_matches_oracle(case, aggregate):
    """Logistic loss over the (positives + all pool corruptions) expansion."""
    model = CASES[case][0]()
    prm = make_params(model.name)
    oracle = CASES[case][1](prm)
    pos = make_batch(seed=41)
    rng = np.random.default_rng(42)
    pool = rng.integers(0, N_E, K)
    mask = np.ones(B)
    mask[::4] = 0.0
    keep = [b for b in range(B) if mask[b] > 0]

    xys = [(tuple(map(int, pos[b])), 1.0) for b in keep]
    for mode in (0, 1):
        for k in range(K):
            for b in keep:
                neg = pos[b].copy()
                neg[mode] = pool[k]
                xys.append((tuple(map(int, neg)), -1.0))
    grads, _ = oracle.gradients(xys)
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    _, occ, g_dense = training.pointwise_grads_shared(
        model, jprm, jnp.asarray(pos), jnp.asarray(pool), jnp.asarray(mask)
    )
    new_prm, new_ost = training.apply_gradients(
        model, opt, jprm, ost, occ, g_dense, aggregate, premasked=True
    )
    for k in prm:
        np.testing.assert_allclose(
            np.asarray(new_prm[k]), want_prm[k], rtol=1e-9, atol=1e-11,
            err_msg=f"param {k}",
        )
        np.testing.assert_allclose(
            np.asarray(new_ost[k]["p2"]), want_p2[k], rtol=1e-9, atol=1e-11,
            err_msg=f"p2 {k}",
        )


@pytest.mark.parametrize("case", ["transe", "transe_l2", "hole"])
def test_shared_step_equals_expanded_generic_step(case):
    """Same PRNG key => the pool step and the generic step over the sampler's
    expanded pair list take identical trajectories."""
    from skge_tpu import init_state

    model = CASES[case][0]()
    opt = AdaGrad(lr=LR)
    sampler = SharedNegativeSampler(N_E, k=5)
    pos = jnp.asarray(make_batch(seed=33))
    mask = jnp.ones(B, jnp.float64)

    outs = {}
    for fused in (True, False):
        step = training.make_pairwise_step(
            model, opt, sampler, margin=0.8, aggregate="unique", fused=fused
        )
        state = init_state(model, opt, jax.random.PRNGKey(9))
        for _ in range(2):
            state, m = step(state, pos, mask)
        outs[fused] = (state, m)

    assert int(outs[True][1].nviolations) == int(outs[False][1].nviolations)
    for k in outs[True][0].params:
        np.testing.assert_allclose(
            np.asarray(outs[True][0].params[k]),
            np.asarray(outs[False][0].params[k]),
            rtol=1e-10,
            err_msg=f"param {k}",
        )
