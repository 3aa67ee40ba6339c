"""Sort + banded one-hot matmul segment-sum (ops/sorted_segment.py):
exactness vs the XLA scatter, drop semantics, overflow fallback, and the
`dense_sorted` training-step aggregation mode."""

import numpy as np

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, RandomModeSampler, TransE, init_state, \
    make_pairwise_step
from skge_tpu.data import synthetic_kg
from skge_tpu.ops.sorted_segment import segment_sum_sorted

R, D, T = 700, 24, 4096


def _ref(idx, vals, num_rows):
    out = np.zeros((num_rows, vals.shape[1]), np.float64)
    for i, v in zip(np.asarray(idx), np.asarray(vals, np.float64)):
        if 0 <= i < num_rows:
            out[i] += v
    return out


def test_matches_scatter_sum():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, T).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
    got = np.asarray(
        segment_sum_sorted(idx, vals, R, chunk=512, band=256), np.float64
    )
    np.testing.assert_allclose(got, _ref(idx, vals, R), atol=5e-5, rtol=1e-5)


def test_out_of_range_dropped_no_wrap():
    rng = np.random.default_rng(1)
    idx = rng.integers(-50, R + 50, T).astype(np.int32)  # incl. invalid
    vals = rng.standard_normal((T, D)).astype(np.float32)
    got = np.asarray(
        segment_sum_sorted(jnp.asarray(idx), jnp.asarray(vals), R,
                           chunk=512, band=256),
        np.float64,
    )
    np.testing.assert_allclose(got, _ref(idx, vals, R), atol=5e-5, rtol=1e-5)


def test_overflow_falls_back_exactly():
    """Ids alternating between the two ends of the table make every chunk
    span ~R rows >> band: the cond must take the scatter fallback and stay
    exact."""
    rng = np.random.default_rng(2)
    idx = np.where(
        np.arange(T) % 2 == 0,
        rng.integers(0, 20, T),
        rng.integers(R - 20, R, T),
    ).astype(np.int32)
    vals = rng.standard_normal((T, D)).astype(np.float32)
    got = np.asarray(
        segment_sum_sorted(jnp.asarray(idx), jnp.asarray(vals), R,
                           chunk=512, band=64),
        np.float64,
    )
    np.testing.assert_allclose(got, _ref(idx, vals, R), atol=5e-5, rtol=1e-5)


def test_ragged_tail_padding():
    rng = np.random.default_rng(3)
    t = 777  # not a chunk multiple
    idx = rng.integers(0, R, t).astype(np.int32)
    vals = rng.standard_normal((t, D)).astype(np.float32)
    got = np.asarray(
        segment_sum_sorted(jnp.asarray(idx), jnp.asarray(vals), R,
                           chunk=512, band=256),
        np.float64,
    )
    np.testing.assert_allclose(got, _ref(idx, vals, R), atol=5e-5, rtol=1e-5)


def test_dense_sorted_step_matches_dense():
    """The dense_sorted aggregation mode reproduces the dense-mode training
    step in fp32 to summation-reordering tolerance."""
    ds = synthetic_kg(120, 6, n_train=500, seed=11)
    model = TransE(ds.n_entities, ds.n_relations, 16, dtype="float32")
    opt = AdaGrad(lr=0.1)
    sampler = RandomModeSampler(ds.n_entities, modes=(0, 1, 0, 1))

    outs = {}
    for agg in ("dense", "dense_sorted"):
        step = jax.jit(make_pairwise_step(model, opt, sampler, 0.5, agg))
        state = init_state(model, opt, jax.random.PRNGKey(4))
        xs = jnp.asarray(ds.train)
        mask = jnp.ones(xs.shape[0], model.jdtype)
        for _ in range(3):
            state, m = step(state, xs, mask)
        outs[agg] = (state, m)
    a, b = outs["dense"], outs["dense_sorted"]
    assert float(a[1].nviolations) == float(b[1].nviolations)
    for k in a[0].params:
        np.testing.assert_allclose(
            np.asarray(a[0].params[k]), np.asarray(b[0].params[k]),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )


def test_wide_row_sorted_backend_matches_oracle():
    """backend='sorted' now engages for WIDE rows too (>= 4096 features —
    TransR's flattened (d, d) projection grads): segment_mean_dense must
    route them through the banded matmul, not silently fall back, and match
    the fp64 oracle to mantissa-split tolerance."""
    from skge_tpu.ops.aggregate import segment_mean_dense

    rng = np.random.default_rng(7)
    t, f, rows = 300, 4608, 37
    idx = rng.integers(0, rows, t).astype(np.int32)
    vals = rng.standard_normal((t, f)).astype(np.float32)
    mask = (rng.random(t) > 0.2).astype(np.float32)
    got = segment_mean_dense(
        jnp.asarray(idx), jnp.asarray(vals), jnp.asarray(mask), rows,
        backend="sorted",
    )
    ref_sum = _ref(idx, vals * mask[:, None], rows)
    cnt = np.zeros(rows)
    for i, mk in zip(idx, mask):
        cnt[i] += mk
    ref_avg = ref_sum / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(np.asarray(got.count), cnt, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.grads, np.float64), ref_avg, atol=5e-5, rtol=1e-5
    )
