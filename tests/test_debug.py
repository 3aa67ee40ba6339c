"""Sanitizer wrappers (utils/debug.py): clean runs pass, corruption is caught."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, RandomModeSampler, TransE, init_state, make_pairwise_step
from skge_tpu.data import synthetic_kg
from skge_tpu.utils.debug import (
    assert_finite_state,
    checked_step,
    validate_triples,
)


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_kg(50, 4, n_train=200, seed=11)
    model = TransE(ds.n_entities, ds.n_relations, ncomp=8)
    opt = AdaGrad(lr=0.1)
    step = make_pairwise_step(model, opt, RandomModeSampler(ds.n_entities), 0.5)
    state = init_state(model, opt, jax.random.PRNGKey(0))
    batch = jnp.asarray(ds.train[:32])
    return ds, model, opt, step, state, batch


def test_checked_step_clean_run(setup):
    _, _, _, step, state, batch = setup
    err, (new_state, m) = checked_step(step)(state, batch, jnp.ones(32))
    err.throw()  # no error
    assert int(new_state.step) == 1


def test_checked_step_catches_nan(setup):
    _, _, _, step, state, batch = setup
    bad = dict(state.params)
    bad["E"] = bad["E"].at[0, 0].set(jnp.nan)
    err, _ = checked_step(step)(
        state._replace(params=bad), batch, jnp.ones(32)
    )
    with pytest.raises(Exception, match="nan"):
        err.throw()


def test_validate_triples_bounds():
    good = np.array([[0, 1, 0], [2, 0, 1]], np.int32)
    validate_triples(good, 3, 2)
    with pytest.raises(ValueError, match="out of range"):
        validate_triples(np.array([[0, 5, 0]], np.int32), 3, 2)
    with pytest.raises(ValueError, match="out of range"):
        validate_triples(np.array([[0, 1, 7]], np.int32), 3, 2)
    with pytest.raises(ValueError, match=r"\(N, 3\)"):
        validate_triples(np.zeros((2, 2), np.int32), 3, 2)


def test_assert_finite_state(setup):
    _, _, _, _, state, _ = setup
    assert_finite_state(state)
    bad = dict(state.params)
    bad["R"] = bad["R"].at[0, 0].set(jnp.inf)
    with pytest.raises(FloatingPointError, match="param 'R'"):
        assert_finite_state(state._replace(params=bad))
