"""Pallas segment-sum kernel: semantics vs the XLA scatter, on the
interpreter (CPU). TPU-compiled equivalence + the 1.35x timing live in
bench/driver runs; these tests pin the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skge_tpu.ops.pallas_segment import fits_in_vmem, segment_sum_pallas


def xla_ref(idx, g, r):
    return jnp.zeros((r, g.shape[1]), g.dtype).at[idx].add(g, mode="drop")


@pytest.mark.parametrize("t,r,d", [(64, 16, 8), (1000, 37, 152), (4096, 200, 24)])
def test_segment_sum_matches_xla(t, r, d):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, r, t), jnp.int32)
    g = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    out = segment_sum_pallas(idx, g, r, chunk=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_ref(idx, g, r)), rtol=1e-5, atol=1e-5
    )


def test_segment_sum_drops_out_of_range():
    """Indices >= num_rows (the padding convention) contribute nothing."""
    rng = np.random.default_rng(1)
    t, r, d = 512, 20, 16
    idx = rng.integers(0, r, t)
    idx[::5] = r  # padding slots
    idx[1::7] = r + 3  # arbitrary out-of-range
    g = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    jidx = jnp.asarray(idx, jnp.int32)
    out = segment_sum_pallas(jidx, g, r, chunk=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_ref(jidx, g, r)), rtol=1e-5, atol=1e-5
    )


def test_segment_sum_drops_negative_indices():
    """Negative indices must be dropped — NOT wrapped to the table tail the
    way NumPy-style `.at[]` indexing would, and not written to row 0. (The
    aggregation layer never produces negatives; dropping is the defensive
    contract against silent row corruption.)"""
    rng = np.random.default_rng(3)
    t, r, d = 512, 20, 16
    idx = rng.integers(-4, r, t)  # some negative
    assert (idx < 0).any()
    g = rng.normal(size=(t, d)).astype(np.float32)
    out = segment_sum_pallas(
        jnp.asarray(idx, jnp.int32), jnp.asarray(g), r, chunk=1024,
        interpret=True,
    )
    want = np.zeros((r, d), np.float32)
    for i in range(t):
        if 0 <= idx[i] < r:
            want[idx[i]] += g[i]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_segment_sum_tail_not_multiple_of_chunk():
    rng = np.random.default_rng(2)
    t, r, d = 1500, 40, 8  # 1500 % 1024 != 0
    idx = jnp.asarray(rng.integers(0, r, t), jnp.int32)
    g = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    out = segment_sum_pallas(idx, g, r, chunk=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_ref(idx, g, r)), rtol=1e-5, atol=1e-5
    )


def test_fits_in_vmem_budget():
    assert fits_in_vmem(16_296, 152)          # FB15k-sized table
    assert not fits_in_vmem(10_000_000, 152)  # web-scale table: fall back


def test_dense_pallas_aggregate_matches_dense():
    """apply_gradients('dense_pallas') == apply_gradients('dense') when the
    pallas kernel runs interpreted — full-step equivalence (fp32)."""
    from skge_tpu import AdaGrad, TransE, init_state, training
    from skge_tpu.ops import aggregate as agg
    from jax.experimental.pallas import tpu as pltpu

    n_e, n_r, d, b = 50, 6, 16, 32
    model = TransE(n_e, n_r, d)
    opt = AdaGrad(lr=0.1)
    rng = np.random.default_rng(3)
    pos = jnp.asarray(
        np.stack(
            [rng.integers(0, n_e, b), rng.integers(0, n_e, b),
             rng.integers(0, n_r, b)], axis=1
        ).astype(np.int32)
    )
    corr = [
        (0, jnp.asarray(rng.integers(0, n_e, b), jnp.int32), jnp.ones(b, jnp.float32)),
        (1, jnp.asarray(rng.integers(0, n_e, b), jnp.int32), jnp.ones(b, jnp.float32)),
    ]
    state = init_state(model, opt, jax.random.PRNGKey(0))
    mask = jnp.ones(b, jnp.float32)

    outs = {}
    for mode in ("dense", "dense_pallas"):
        loss, nviol, occ, g_dense = training.pairwise_grads_fused(
            model, state.params, pos, corr, mask, 0.5
        )
        with pltpu.force_tpu_interpret_mode():
            params, _ = training.apply_gradients(
                model, opt, state.params, state.opt_state, occ, g_dense,
                mode, premasked=True,
            )
        outs[mode] = params
    for k in outs["dense"]:
        np.testing.assert_allclose(
            np.asarray(outs["dense"][k]),
            np.asarray(outs["dense_pallas"][k]),
            rtol=1e-6, atol=1e-7,
        )


def test_segment_sum_wide_rows_col_tiled(monkeypatch):
    """Column-tiled wide-row path (forced tiny budget) matches XLA."""
    from skge_tpu.ops import pallas_segment as ps

    rng = np.random.default_rng(4)
    t, r, d = 300, 17, 520  # d spans several forced col tiles
    idx = jnp.asarray(rng.integers(0, r + 2, t), jnp.int32)
    g = jnp.asarray(rng.normal(size=(t, d)), jnp.float32)
    monkeypatch.setattr(ps, "_VMEM_BUDGET", 2 << 20)  # ~2MB: forces tiling
    assert ps._col_tile(r, d, 1024) < 640  # < padded d => multiple col tiles
    out = ps.segment_sum_pallas(idx, g, r, chunk=1024, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_ref(idx, g, r)), rtol=1e-5, atol=1e-5
    )
