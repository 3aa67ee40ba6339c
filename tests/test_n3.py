"""Nuclear-3-norm regularization (Lacroix et al., ICML 2018; `n3`
hyperparam on the factorization models — no reference counterpart,
build-scope): exactness of the added gradient term on every apply path,
the ComplEx modulus override, and touched-rows-only semantics.

Oracle trick: under SGD the update is LINEAR in the gradient, so
(params after step with n3) - (params after step with n3=0) must equal
exactly -lr * 3*n3 * w(x) on touched rows and 0 elsewhere, where w is the
model's n3_grad_rows evaluated at the PRE-step parameters. fp64."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import SGD, AdaGrad, ComplEx, DistMult, QuatE, SimplE, training  # noqa: E402

N_E, N_R, D, B, K = 60, 4, 6, 16, 7
LR, N3 = 0.1, 0.05


def build(cls, **kw):
    model = cls(N_E, N_R, D, dtype="float64", **kw)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def batch(seed=1):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, B), rng.integers(0, N_E, B),
         rng.integers(0, N_R, B)], axis=1
    ).astype(np.int32)


def np_n3_rows(cls, x):
    if cls is ComplEx:
        d = x.shape[-1] // 2
        a, b = x[..., :d], x[..., d:]
        m = np.sqrt(a * a + b * b)
        return np.concatenate([m * a, m * b], axis=-1)
    if cls is QuatE:
        d = x.shape[-1] // 4
        a, b, c, e = (x[..., i * d:(i + 1) * d] for i in range(4))
        m = np.sqrt(a * a + b * b + c * c + e * e)
        return np.concatenate([m * a, m * b, m * c, m * e], axis=-1)
    return x * np.abs(x)


def _one_step(cls, n3, aggregate, seed=3):
    model, params = build(cls, n3=n3)
    opt = SGD(lr=LR)
    pos = batch()
    rng = np.random.default_rng(seed)
    pool = rng.integers(0, N_E, K)
    mask = jnp.ones(B, jnp.float64)
    _, _, occ, dense = training.pairwise_grads_shared(
        model, params, jnp.asarray(pos), jnp.asarray(pool), mask, 0.7
    )
    new, _ = training.apply_gradients(
        model, opt, params, opt.init(params), occ, dense, aggregate,
        premasked=True,
    )
    return params, new, occ


@pytest.mark.parametrize("cls", [DistMult, ComplEx, SimplE, QuatE])
@pytest.mark.parametrize("aggregate", ["unique", "dense"])
def test_n3_delta_matches_closed_form(cls, aggregate):
    params, with_n3, occ = _one_step(cls, N3, aggregate)
    _, without, _ = _one_step(cls, 0.0, aggregate)
    for pname in params:
        p0 = np.asarray(params[pname])
        delta = np.asarray(with_n3[pname]) - np.asarray(without[pname])
        touched = np.zeros(p0.shape[0], bool)
        idx, _, cnt = occ[pname]
        touched[np.asarray(idx)[np.asarray(cnt) > 0]] = True
        expect = np.where(
            touched[:, None], -LR * 3.0 * N3 * np_n3_rows(cls, p0), 0.0
        )
        np.testing.assert_allclose(delta, expect, rtol=1e-12, atol=1e-14)
        assert touched.any()
        if pname == "E":  # relation tables are small enough to be fully hit
            assert not touched.all(), "need untouched rows to pin the zero"


def test_n3_unique_equals_dense_adagrad():
    """The two aggregation paths agree under AdaGrad with n3 active."""
    model, params = build(DistMult, n3=N3)
    opt = AdaGrad(lr=LR)
    pos = batch()
    pool = np.random.default_rng(3).integers(0, N_E, K)
    mask = jnp.ones(B, jnp.float64)
    _, _, occ, dense = training.pairwise_grads_shared(
        model, params, jnp.asarray(pos), jnp.asarray(pool), mask, 0.7
    )
    a, _ = training.apply_gradients(
        model, opt, params, opt.init(params), occ, dense, "unique",
        premasked=True,
    )
    b, _ = training.apply_gradients(
        model, opt, params, opt.init(params), occ, dense, "dense",
        premasked=True,
    )
    for pname in params:
        np.testing.assert_allclose(
            np.asarray(a[pname]), np.asarray(b[pname]), rtol=1e-11, atol=1e-13
        )


def test_n3_ce_step_full_table():
    """CE touches every entity row, so the n3 term applies to the WHOLE
    table: SGD delta == -lr * 3*n3 * w(x) everywhere on E and R."""
    from skge_tpu import init_state, make_ce_step

    pos = batch(seed=9)
    mask = jnp.ones(B, jnp.float64)

    def run(n3):
        model, params = build(ComplEx, n3=n3)
        opt = SGD(lr=LR)
        step = make_ce_step(model, opt, directions=("o", "s"))
        state = init_state(model, opt, jax.random.PRNGKey(4))
        state = state._replace(params=params) if hasattr(state, "_replace") \
            else type(state)(params, state.opt_state, state.key, state.step)
        out, _ = step(state, jnp.asarray(pos), mask)
        return params, out.params

    params, with_n3 = run(N3)
    _, without = run(0.0)
    for pname in ("E", "R"):
        delta = np.asarray(with_n3[pname]) - np.asarray(without[pname])
        expect = -LR * 3.0 * N3 * np_n3_rows(ComplEx, np.asarray(params[pname]))
        np.testing.assert_allclose(delta, expect, rtol=1e-12, atol=1e-14)


def test_complex_n3_is_rotation_invariant():
    """The modulus form is invariant to a global complex-phase rotation of
    the embeddings — the property the elementwise |x|³ form lacks and the
    reason ComplEx overrides n3_grad_rows."""
    model, params = build(ComplEx, n3=N3)
    E = np.asarray(params["E"])
    d = D
    a, b = E[:, :d], E[:, d:]
    theta = 0.618
    rot = np.concatenate(
        [a * np.cos(theta) - b * np.sin(theta),
         a * np.sin(theta) + b * np.cos(theta)], axis=-1,
    )
    m0 = np.sqrt(a * a + b * b)
    g = np.asarray(model.n3_grad_rows("E", jnp.asarray(rot)))
    ar, br = rot[:, :d], rot[:, d:]
    m1 = np.sqrt(ar * ar + br * br)
    np.testing.assert_allclose(m1, m0, rtol=1e-12)  # modulus unchanged
    np.testing.assert_allclose(
        g, np.concatenate([m1 * ar, m1 * br], axis=-1), rtol=1e-12
    )


def _sgd_delta_touched(params, with_n3, without, cls):
    """Assert (with_n3 - without) == -lr*3*n3*w(x) on touched rows, 0 off.
    Touched = rows changed by either run (an n3-only change still marks a
    touched row)."""
    for pname in params:
        p0 = np.asarray(params[pname])
        a = np.asarray(with_n3[pname])
        b = np.asarray(without[pname])
        touched = (np.abs(a - p0).max(axis=tuple(range(1, p0.ndim))) > 0) | (
            np.abs(b - p0).max(axis=tuple(range(1, p0.ndim))) > 0
        )
        expect = np.where(
            touched.reshape((-1,) + (1,) * (p0.ndim - 1)),
            -LR * 3.0 * N3 * np_n3_rows(cls, p0), 0.0,
        )
        np.testing.assert_allclose(a - b, expect, rtol=1e-11, atol=1e-13)
        assert touched.any()


def test_n3_applied_on_shardmap_path():
    """Regression: the explicit-SPMD (shard_map) step must apply n3 like
    the single-device path (it silently dropped it before)."""
    from skge_tpu.parallel.mesh import make_mesh
    from skge_tpu.parallel.shardmap_step import (
        make_shardmap_pairwise_step, shard_state_shardmap,
    )
    from skge_tpu import SGD, init_state

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs virtual devices")
    mesh = make_mesh(jax.devices()[:4], shape=(2, 2))
    pos = batch()
    mask = jnp.ones(B, jnp.float64)

    def run(n3):
        model = DistMult(N_E, N_R, D, dtype="float64", n3=n3)
        from skge_tpu import SharedNegativeSampler

        sampler = SharedNegativeSampler(N_E, k=K)
        step = make_shardmap_pairwise_step(model, SGD(lr=LR), sampler, 0.7, mesh)
        st = shard_state_shardmap(
            init_state(model, SGD(lr=LR), jax.random.PRNGKey(0)), model, mesh
        )
        params0 = {k: np.asarray(v) for k, v in st.params.items()}
        st, _ = step(st, jnp.asarray(pos), mask)
        return params0, {k: np.asarray(v) for k, v in st.params.items()}

    params, with_n3 = run(N3)
    _, without = run(0.0)
    _sgd_delta_touched(params, with_n3, without, DistMult)


def test_n3_applied_on_partitioned_path():
    """Regression: the partitioned SPMD step must apply n3 too."""
    from skge_tpu.data import partition_edges, synthetic_kg
    from skge_tpu.parallel.partitioned import (
        make_partitioned_pairwise_step, make_shard_mesh,
        shard_state_partitioned,
    )
    from skge_tpu import SGD, SharedNegativeSampler, init_state

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs virtual devices")
    P_ = 4
    n_pad = 64
    s = n_pad // P_
    ds = synthetic_kg(n_pad, N_R, n_train=200, seed=3)
    owner = (np.arange(n_pad) // s).astype(np.int32)
    batches, pmask, _ = partition_edges(ds.train, owner, P_)
    mesh = make_shard_mesh(jax.devices()[:P_])

    def run(n3):
        model = DistMult(n_pad, N_R, D, dtype="float64", n3=n3)
        sampler = SharedNegativeSampler(n_pad, k=K)
        step = make_partitioned_pairwise_step(
            model, SGD(lr=LR), sampler, 0.7, mesh
        )
        st = shard_state_partitioned(
            init_state(model, SGD(lr=LR), jax.random.PRNGKey(0)), model, mesh
        )
        params0 = {k: np.asarray(v) for k, v in st.params.items()}
        st, _ = step(
            st, jnp.asarray(batches), jnp.asarray(pmask, jnp.float64)
        )
        return params0, {k: np.asarray(v) for k, v in st.params.items()}

    params, with_n3 = run(N3)
    _, without = run(0.0)
    _sgd_delta_touched(params, with_n3, without, DistMult)
