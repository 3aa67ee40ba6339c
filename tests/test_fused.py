"""Fused pairwise path parity: structural pre-combine must be EXACTLY the
reference math (duplicate-occurrence averaging with structural counts)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu.models import ERMLP, HolE, RESCAL, TransE  # noqa: E402
from skge_tpu.optim import AdaGrad  # noqa: E402
from skge_tpu import training  # noqa: E402
from test_parity import CASES, make_params, make_batch, to_jax, oracle_apply, B, N_E, LR  # noqa: E402


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_fused_pairwise_matches_oracle(case, aggregate):
    model = CASES[case][0]()
    margin = 0.8
    prm = make_params(model.name)
    oracle = CASES[case][1](prm, margin=margin)
    pos = make_batch(seed=13)
    rng = np.random.default_rng(14)
    repl0 = rng.integers(0, N_E, B)  # subject corruption
    repl1 = rng.integers(0, N_E, B)  # object corruption

    # oracle sees the expanded pair lists, reference-style
    neg0 = pos.copy(); neg0[:, 0] = repl0
    neg1 = pos.copy(); neg1[:, 1] = repl1
    pxs = [tuple(map(int, t)) for t in np.concatenate([pos, pos])]
    nxs = [tuple(map(int, t)) for t in np.concatenate([neg0, neg1])]
    grads, nviol = oracle.pairwise_gradients(pxs, nxs)
    assert nviol > 0
    want_prm, want_p2 = oracle_apply(
        grads, {k: v.copy() for k, v in prm.items()}, model
    )

    corr = [
        (0, jnp.asarray(repl0), jnp.ones(B, jnp.float64)),
        (1, jnp.asarray(repl1), jnp.ones(B, jnp.float64)),
    ]
    opt = AdaGrad(lr=LR)
    jprm = to_jax(prm)
    ost = opt.init(jprm)
    _, jnviol, occ, g_dense = training.pairwise_grads_fused(
        model, jprm, jnp.asarray(pos), corr, jnp.ones(B, jnp.float64), margin
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


@pytest.mark.parametrize("case", ["transe", "hole"])
def test_fused_step_equals_generic_step(case):
    """Same PRNG key => fused and generic steps take identical trajectories."""
    from skge_tpu.sampling import RandomModeSampler
    from skge_tpu import init_state

    model = CASES[case][0]()
    opt = AdaGrad(lr=LR)
    sampler = RandomModeSampler(N_E)
    pos = jnp.asarray(make_batch(seed=15))
    mask = jnp.ones(B, jnp.float64)

    outs = {}
    for fused in (True, False):
        step = training.make_pairwise_step(
            model, opt, sampler, margin=0.8, aggregate="unique", fused=fused
        )
        state = init_state(model, opt, jax.random.PRNGKey(7))
        for _ in range(3):
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


def test_fused_bernoulli_split_modes():
    """Bernoulli's per-row mode choice via two masked corruption slots must
    equal the generic path's mixed negatives."""
    from skge_tpu.sampling import BernoulliSampler
    from skge_tpu import init_state

    model = CASES["transe"][0]()
    opt = AdaGrad(lr=LR)
    probs = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, 5))
    sampler = BernoulliSampler(N_E, probs)
    pos = jnp.asarray(make_batch(seed=16))
    mask = jnp.ones(B, jnp.float64)

    outs = {}
    for fused in (True, False):
        step = training.make_pairwise_step(
            model, opt, sampler, margin=0.8, aggregate="unique", fused=fused
        )
        state = init_state(model, opt, jax.random.PRNGKey(8))
        state, m = step(state, pos, mask)
        outs[fused] = (state, m)

    assert int(outs[True][1].nviolations) == int(outs[False][1].nviolations)
    for k in outs[True][0].params:
        np.testing.assert_allclose(
            np.asarray(outs[True][0].params[k]),
            np.asarray(outs[False][0].params[k]),
            rtol=1e-10,
        )
