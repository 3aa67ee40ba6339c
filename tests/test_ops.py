"""Unit tests for numeric primitives (SURVEY.md §4 test pyramid, level 1-2)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu.ops import ccorr, cconv, segment_mean_dense, segment_mean_unique  # noqa: E402
from skge_tpu.optim import normless1_rows  # noqa: E402
from oracle import oracle_numpy as orc  # noqa: E402

RNG = np.random.default_rng


@pytest.mark.parametrize("d", [8, 15, 16, 150])
def test_circulant_matches_oracle(d):
    rng = RNG(0)
    a = rng.normal(size=(6, d))
    b = rng.normal(size=(6, d))
    np.testing.assert_allclose(
        np.asarray(cconv(jnp.asarray(a), jnp.asarray(b))),
        orc.cconv(a, b),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(ccorr(jnp.asarray(a), jnp.asarray(b))),
        orc.ccorr(a, b),
        rtol=1e-10, atol=1e-10,
    )


def test_ccorr_cconv_adjoint_identities():
    """<r, ccorr(a,b)> == <b, cconv(a,r)> == <a, ccorr(r,b)> — the identities
    that turn all-entity HolE scoring into one matmul (SURVEY.md §3.4)."""
    rng = RNG(1)
    a, b, r = (jnp.asarray(rng.normal(size=16)) for _ in range(3))
    lhs = jnp.dot(r, ccorr(a, b))
    np.testing.assert_allclose(float(lhs), float(jnp.dot(b, cconv(a, r))), rtol=1e-10)
    np.testing.assert_allclose(float(lhs), float(jnp.dot(a, ccorr(r, b))), rtol=1e-10)


def test_hole_shift_invariance():
    """ccorr(a, b) — and hence the HolE score — is invariant to a
    simultaneous circular shift of e_s and e_o (property test from
    SURVEY.md §4 item 2)."""
    rng = RNG(2)
    a, b, r = (rng.normal(size=32) for _ in range(3))
    base = float(jnp.dot(jnp.asarray(r), ccorr(jnp.asarray(a), jnp.asarray(b))))
    for k in (1, 7):
        shifted = float(
            jnp.dot(
                jnp.asarray(r),
                ccorr(jnp.asarray(np.roll(a, k)), jnp.asarray(np.roll(b, k))),
            )
        )
        np.testing.assert_allclose(shifted, base, rtol=1e-9)


@pytest.mark.parametrize("impl", ["unique", "dense"])
def test_segment_mean_matches_grad_sum_matrix(impl):
    rng = RNG(3)
    n_rows, t, d = 11, 30, 4
    idx = rng.integers(0, n_rows, t)
    g = rng.normal(size=(t, d))

    uidx, m, n = orc.grad_sum_matrix(idx)
    want = np.zeros((n_rows, d))
    want[uidx] = m.dot(g) / n

    mask = jnp.ones(t, jnp.float64)
    if impl == "unique":
        res = segment_mean_unique(jnp.asarray(idx), jnp.asarray(g), mask, n_rows)
        got = np.zeros((n_rows, d))
        got_np = np.asarray(res.grads)
        ui = np.asarray(res.uidx)
        keep = ui < n_rows
        got[ui[keep]] = got_np[keep]
        touched = np.zeros(n_rows, bool)
        touched[ui[keep][np.asarray(res.count)[keep] > 0]] = True
    else:
        res = segment_mean_dense(jnp.asarray(idx), jnp.asarray(g), mask, n_rows)
        got = np.asarray(res.grads)
        touched = np.asarray(res.count) > 0

    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_array_equal(touched, np.isin(np.arange(n_rows), uidx))


def test_segment_mean_mask_drops_occurrences():
    """Masked occurrences contribute neither gradient nor count."""
    idx = jnp.asarray([3, 3, 5])
    g = jnp.asarray([[2.0], [4.0], [8.0]])
    mask = jnp.asarray([1.0, 0.0, 0.0])
    res = segment_mean_unique(idx, g, mask, 10)
    ui = np.asarray(res.uidx)
    grads = np.asarray(res.grads)
    cnt = np.asarray(res.count)
    row3 = np.where(ui == 3)[0][0]
    row5 = np.where(ui == 5)[0][0]
    assert grads[row3, 0] == 2.0  # mean over ONE unmasked occurrence
    assert cnt[row3] == 1.0
    assert cnt[row5] == 0.0  # row 5 must not be updated at all


def test_normless1_projects_only_large_rows():
    rows = jnp.asarray([[3.0, 4.0], [0.3, 0.4]])
    out = np.asarray(normless1_rows(rows))
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-12)
    np.testing.assert_allclose(out[1], [0.3, 0.4], rtol=1e-12)


def test_segment_mean_dense_wide_row_branch(monkeypatch):
    """The wide-feature split-scatter branch must equal the fused-channel
    path exactly (it's a layout change, not a math change)."""
    import jax.numpy as jnp
    from skge_tpu.ops import aggregate as agg

    rng = np.random.default_rng(8)
    t, r, d = 50, 9, 12
    idx = jnp.asarray(rng.integers(0, r + 2, t))  # incl. out-of-range drops
    g = jnp.asarray(rng.normal(size=(t, d, d)))
    m = jnp.asarray((rng.uniform(size=t) > 0.3).astype(np.float64))

    narrow = agg.segment_mean_dense(idx, g, m, r)
    monkeypatch.setattr(agg, "_WIDE_ROW_THRESHOLD", 1)
    wide = agg.segment_mean_dense(idx, g, m, r)
    np.testing.assert_allclose(
        np.asarray(wide.grads), np.asarray(narrow.grads), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(wide.count), np.asarray(narrow.count), rtol=1e-12
    )
