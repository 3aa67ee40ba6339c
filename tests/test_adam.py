"""Row-sparse (lazy) Adam — beyond-reference optimizer: NumPy oracle with
per-row bias correction, zero-count no-op guarantee, unique/dense path
agreement, trajectory independence from skipped batches, end-to-end
training, and checkpoint round-trip of the three-slot state."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import Adam, TransE, init_state  # noqa: E402
from skge_tpu.ops.aggregate import DenseGrads, UniqueGrads  # noqa: E402

N, D = 11, 5
LR, B1, B2, EPS = 0.01, 0.9, 0.999, 1e-8


def np_lazy_adam(param, state, idx, grads):
    """Oracle: lazy Adam over touched rows with per-row step counts."""
    param = param.copy()
    m, v, t = state["m"].copy(), state["v"].copy(), state["t"].copy()
    for i, r in enumerate(idx):
        g = grads[i]
        t[r] += 1.0
        m[r] = B1 * m[r] + (1 - B1) * g
        v[r] = B2 * v[r] + (1 - B2) * g * g
        mhat = m[r] / (1 - B1 ** t[r])
        vhat = v[r] / (1 - B2 ** t[r])
        param[r] -= LR * mhat / (np.sqrt(vhat) + EPS)
    return param, {"m": m, "v": v, "t": t}


def make_state(seed=0):
    rng = np.random.default_rng(seed)
    param = rng.normal(size=(N, D))
    state = {
        "m": np.zeros((N, D)),
        "v": np.zeros((N, D)),
        "t": np.zeros(N),
    }
    return param, state


def test_unique_matches_oracle_over_steps():
    opt = Adam(lr=LR, b1=B1, b2=B2, eps=EPS)
    param, state = make_state()
    jp = jnp.asarray(param)
    js = {k: jnp.asarray(v) for k, v in state.items()}
    rng = np.random.default_rng(1)
    for step in range(5):
        # unique ids with some untouched rows each step
        idx = rng.choice(N, size=4, replace=False).astype(np.int32)
        grads = rng.normal(size=(4, D))
        ug = UniqueGrads(
            uidx=jnp.asarray(idx), grads=jnp.asarray(grads),
            count=jnp.ones(4, jnp.float64),
        )
        jp, js = opt.apply_unique(jp, js, ug)
        param, state = np_lazy_adam(param, state, idx, grads)
        np.testing.assert_allclose(np.asarray(jp), param, rtol=1e-12)
        for k in state:
            np.testing.assert_allclose(np.asarray(js[k]), state[k], rtol=1e-12)


def test_zero_count_rows_are_noops():
    opt = Adam(lr=LR)
    param, state = make_state(2)
    jp = jnp.asarray(param)
    js = {k: jnp.asarray(v) for k, v in state.items()}
    idx = np.array([3, 7, 9], np.int32)
    grads = np.random.default_rng(3).normal(size=(3, D))
    ug = UniqueGrads(
        uidx=jnp.asarray(idx), grads=jnp.asarray(grads),
        count=jnp.asarray([1.0, 0.0, 1.0]),  # row 7 masked out
    )
    np2, ns = opt.apply_unique(jp, js, ug)
    np.testing.assert_array_equal(np.asarray(np2[7]), param[7])
    assert float(ns["t"][7]) == 0.0  # moment state untouched too
    assert float(ns["t"][3]) == 1.0
    assert not np.allclose(np.asarray(np2[3]), param[3])


def test_unique_equals_dense():
    opt = Adam(lr=LR)
    param, state = make_state(4)
    idx = np.array([0, 4, 8], np.int32)
    grads = np.random.default_rng(5).normal(size=(3, D))
    ug = UniqueGrads(
        uidx=jnp.asarray(idx), grads=jnp.asarray(grads),
        count=jnp.ones(3, jnp.float64),
    )
    dense_g = np.zeros((N, D))
    dense_g[idx] = grads
    cnt = np.zeros(N)
    cnt[idx] = 1.0
    dg = DenseGrads(grads=jnp.asarray(dense_g), count=jnp.asarray(cnt))
    a_p, a_s = opt.apply_unique(
        jnp.asarray(param), {k: jnp.asarray(v) for k, v in state.items()}, ug
    )
    b_p, b_s = opt.apply_dense_masked(
        jnp.asarray(param), {k: jnp.asarray(v) for k, v in state.items()}, dg
    )
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(b_p), rtol=1e-12)
    for k in a_s:
        np.testing.assert_allclose(
            np.asarray(a_s[k]), np.asarray(b_s[k]), rtol=1e-12
        )


def test_lazy_correction_ignores_skipped_batches():
    """A row touched in steps {1, 5} gets the SAME update sequence as one
    touched in steps {1, 2} — per-row t makes corrections touch-indexed."""
    opt = Adam(lr=LR)

    def run(touch_steps, total):
        param, state = make_state(6)
        jp = jnp.asarray(param)
        js = {k: jnp.asarray(v) for k, v in state.items()}
        g = np.random.default_rng(7).normal(size=(1, D))
        for s in range(total):
            if s in touch_steps:
                ug = UniqueGrads(
                    uidx=jnp.asarray([2], np.int32), grads=jnp.asarray(g),
                    count=jnp.ones(1, jnp.float64),
                )
            else:  # a batch that misses row 2 entirely (touches row 9)
                ug = UniqueGrads(
                    uidx=jnp.asarray([9], np.int32),
                    grads=jnp.asarray(np.ones((1, D))),
                    count=jnp.ones(1, jnp.float64),
                )
            jp, js = opt.apply_unique(jp, js, ug)
        return np.asarray(jp[2])

    np.testing.assert_allclose(
        run({0, 4}, 6), run({0, 1}, 6), rtol=1e-12
    )


def test_trains_end_to_end():
    from skge_tpu import SharedNegativeSampler, make_epoch_fn, make_pairwise_step
    from skge_tpu.data import latent_kg

    ds = latent_kg(n_entities=300, n_relations=6, n_train=1500,
                   n_valid=0, n_test=40, latent_dim=8, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False)
    opt = Adam(lr=0.005)
    sampler = SharedNegativeSampler(ds.n_entities, k=32)
    step = make_pairwise_step(model, opt, sampler, margin=1.0, aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 10),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    first = last = None
    for e in range(25):
        state, m = epoch(state, xs)
        nv = float(np.asarray(m.nviolations).sum())
        first = nv if first is None else first
        last = nv
    assert last < first * 0.8


def test_checkpoint_roundtrip():
    from skge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model = TransE(17, 3, 6)
    opt = Adam(lr=0.01)
    state = init_state(model, opt, jax.random.PRNGKey(1))
    import tempfile, os  # noqa: E401

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        save_checkpoint(path, state)
        loaded, _ = load_checkpoint(path)
        for pname, slots in state.opt_state.items():
            for k, v in slots.items():
                np.testing.assert_array_equal(
                    np.asarray(loaded.opt_state[pname][k]), np.asarray(v)
                )


def test_adam_out_of_core_p1_matches_incore():
    """OOC's host-resident slot plumbing is optimizer-generic: with Adam's
    three slots (incl. the 1-D per-row t) a P=1 OOC run must reproduce the
    in-core trajectory bit-for-bit, same as the AdaGrad guarantee."""
    from skge_tpu import (OutOfCoreTrainer, SharedNegativeSampler,
                          make_epoch_fn, make_pairwise_step)
    from skge_tpu.data import synthetic_kg

    ds = synthetic_kg(n_entities=48, n_relations=4, n_train=240, seed=7)
    model = TransE(ds.n_entities, ds.n_relations, 8, l1=False)
    opt = Adam(lr=0.01)

    tr = OutOfCoreTrainer(model, opt, ds.train, n_parts=1, margin=1.0,
                          k=16, nbatches=4, seed=0)
    tr.fit(epochs=3)
    ooc_e = tr.params()["E"]

    # in-core reference (same key-split protocol as the trainer)
    step = make_pairwise_step(
        model, opt, SharedNegativeSampler(ds.n_entities, k=16),
        margin=1.0, aggregate="dense",
    )
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 4),
                    donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(3):
        state, _ = epoch(state, xs)
    np.testing.assert_array_equal(
        ooc_e[: ds.n_entities], np.asarray(state.params["E"])
    )


def test_t_counter_stays_high_precision_for_bf16_params():
    """Regression: a bf16 counter saturates at t+1==t after 256 touches,
    silently freezing bias correction — t must be >= fp32 regardless of
    the parameter dtype."""
    model = TransE(10, 2, 4, dtype="bfloat16")
    opt = Adam(lr=0.01)
    state = opt.init(model.init_params(jax.random.PRNGKey(0)))
    assert state["E"]["t"].dtype == jnp.float32
    assert state["E"]["m"].dtype == jnp.bfloat16  # moments track the param
    t = jnp.float32(256.0)
    assert float(t + 1.0) == 257.0  # what bf16 would get wrong
