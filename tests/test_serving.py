"""Serving (top-K link prediction) correctness.

All engines score candidates through `KGEModel.score_pool` — the algebra
whose per-pair exactness is pinned by tests/test_shared.py — so the brute
force here builds the full (B, n_e) matrix through the SAME entry point and
checks the top-k selection (values, ids, filtering, sharding, streaming)
around it. A separate cross-path check ties the matrix to
`model.score_triples` on expanded triples.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu.models import MODELS  # noqa: E402
from skge_tpu.serving import (  # noqa: E402
    LinkPredictor,
    StreamedLinkPredictor,
    _MODE,
    _entity_param,
    _query_rows,
)

N_E, N_R, D = 64, 6, 16
NQ = 11


def make_model(name):
    kw = {"dtype": "float64"}
    if name == "transe_l2":
        return MODELS["transe"](N_E, N_R, D, l1=False, **kw)
    return MODELS[name](N_E, N_R, D, **kw)


def make_params(model, seed=0):
    return model.init_params(jax.random.PRNGKey(seed))


def make_queries(seed=3, n=NQ):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, N_E, n), rng.integers(0, N_R, n)], axis=1
    ).astype(np.int32)


def full_matrix(model, params, queries, direction):
    """(B, n_e) score matrix via the engines' own scoring entry point."""
    ent = jnp.asarray(queries[:, 0])
    rel = jnp.asarray(queries[:, 1])
    rows = _query_rows(model, params, ent, rel, direction)
    return np.asarray(
        model.score_pool(
            rows, params[_entity_param(model)], model.dense_params(params),
            _MODE[direction],
        )
    )


def brute_topk(scores, k):
    """Descending values; ties broken toward the lower entity id (lax.top_k
    convention)."""
    order = np.lexsort((np.arange(scores.shape[1])[None, :].repeat(
        scores.shape[0], 0), -scores))
    ids = order[:, :k]
    vals = np.take_along_axis(scores, ids, axis=1)
    return vals, ids


MODEL_NAMES = ["transe", "transe_l2", "hole", "rescal", "ermlp", "distmult",
               "transh", "transr", "tucker"]


@pytest.mark.parametrize("name", MODEL_NAMES)
@pytest.mark.parametrize("direction", ["o", "s"])
def test_topk_matches_bruteforce(name, direction):
    model = make_model(name)
    params = make_params(model)
    queries = make_queries()
    pred = LinkPredictor(model, params, batch_size=4)  # multi-batch path
    k = 7
    res = pred.top_k(queries, k, direction=direction, filtered=False)
    scores = full_matrix(model, params, queries, direction)
    vals, ids = brute_topk(scores, k)
    np.testing.assert_array_equal(res.entities, ids)
    np.testing.assert_allclose(res.scores, vals, rtol=1e-6)


def test_matrix_matches_score_triples():
    """Cross-path sanity: the score_pool matrix equals scoring expanded
    triples (mode semantics, both directions)."""
    model = make_model("hole")
    params = make_params(model)
    queries = make_queries(seed=5, n=4)
    for direction in ("o", "s"):
        mat = full_matrix(model, params, queries, direction)
        for b, (e, r) in enumerate(queries):
            cand = np.arange(N_E, dtype=np.int32)
            if direction == "o":
                triples = np.stack(
                    [np.full(N_E, e), cand, np.full(N_E, r)], axis=1
                )
            else:
                triples = np.stack(
                    [cand, np.full(N_E, e), np.full(N_E, r)], axis=1
                )
            direct = np.asarray(
                model.score_triples(params, jnp.asarray(triples))
            )
            np.testing.assert_allclose(mat[b], direct, rtol=1e-8)


def test_filtered_excludes_known():
    model = make_model("transe")
    params = make_params(model)
    rng = np.random.default_rng(7)
    known = np.stack(
        [rng.integers(0, N_E, 200), rng.integers(0, N_E, 200),
         rng.integers(0, N_R, 200)], axis=1,
    ).astype(np.int32)
    queries = known[:NQ][:, [0, 2]]  # (s, p) of known triples
    pred = LinkPredictor(model, params, known=known, batch_size=NQ)
    res = pred.top_k(queries, k=N_E, direction="o", filtered=True)
    scores = full_matrix(model, params, queries, "o")
    from skge_tpu.data import true_triple_index

    sp_o, _ = true_triple_index(known)
    for b, (s, p) in enumerate(queries):
        true_os = set(sp_o[(int(s), int(p))].tolist())
        returned = res.entities[b]
        real = returned[returned >= 0]
        assert true_os.isdisjoint(real.tolist())
        # every filtered slot shows the sentinel
        assert np.sum(returned == -1) == len(true_os)
        assert np.all(np.isneginf(res.scores[b][returned == -1]))
        # and the survivors are exactly the complement, best-first
        want = brute_topk(
            np.where(np.isin(np.arange(N_E), list(true_os)),
                     -np.inf, scores[b])[None, :],
            N_E - len(true_os),
        )[1][0]
        np.testing.assert_array_equal(real, want)


@pytest.mark.parametrize("name", ["transe", "distmult"])
def test_sharded_matches_single(name):
    from skge_tpu.parallel import make_mesh

    model = make_model(name)
    params = make_params(model)
    queries = make_queries(seed=11)
    mesh = make_mesh(jax.devices(), shape=(1, 8))
    single = LinkPredictor(model, params, batch_size=NQ)
    sharded = LinkPredictor(model, params, batch_size=NQ, mesh=mesh)
    for direction in ("o", "s"):
        a = single.top_k(queries, 9, direction=direction, filtered=False)
        b = sharded.top_k(queries, 9, direction=direction, filtered=False)
        np.testing.assert_array_equal(a.entities, b.entities)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12)


def test_sharded_filtered_matches_single():
    from skge_tpu.parallel import make_mesh

    model = make_model("transe")
    params = make_params(model)
    rng = np.random.default_rng(13)
    known = np.stack(
        [rng.integers(0, N_E, 150), rng.integers(0, N_E, 150),
         rng.integers(0, N_R, 150)], axis=1,
    ).astype(np.int32)
    queries = known[:NQ][:, [0, 2]]
    mesh = make_mesh(jax.devices(), shape=(1, 8))
    single = LinkPredictor(model, params, known=known, batch_size=NQ)
    sharded = LinkPredictor(model, params, known=known, batch_size=NQ,
                            mesh=mesh)
    a = single.top_k(queries, 12, direction="o")
    b = sharded.top_k(queries, 12, direction="o")
    np.testing.assert_array_equal(a.entities, b.entities)


@pytest.mark.parametrize("name", ["transe", "rescal", "ermlp"])
def test_streamed_matches_incore(name):
    model = make_model(name)
    params = make_params(model)
    params_host = {k: np.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(17)
    known = np.stack(
        [rng.integers(0, N_E, 100), rng.integers(0, N_E, 100),
         rng.integers(0, N_R, 100)], axis=1,
    ).astype(np.int32)
    queries = make_queries(seed=19)
    incore = LinkPredictor(model, params, known=known, batch_size=5)
    streamed = StreamedLinkPredictor(
        model, params_host, known=known, batch_size=5, chunk=23
    )  # chunk doesn't divide n_e: exercises the padded tail chunk
    for direction in ("o", "s"):
        for filtered in (False, True):
            a = incore.top_k(queries, 8, direction=direction,
                             filtered=filtered)
            b = streamed.top_k(queries, 8, direction=direction,
                               filtered=filtered)
            np.testing.assert_array_equal(a.entities, b.entities)
            np.testing.assert_allclose(a.scores, b.scores, rtol=1e-12)


def test_score_triples_roundtrip():
    model = make_model("transe")
    params = make_params(model)
    pred = LinkPredictor(model, params)
    rng = np.random.default_rng(23)
    triples = np.stack(
        [rng.integers(0, N_E, 9), rng.integers(0, N_E, 9),
         rng.integers(0, N_R, 9)], axis=1,
    ).astype(np.int32)
    got = pred.score_triples(triples)
    want = np.asarray(model.score_triples(params, jnp.asarray(triples)))
    np.testing.assert_allclose(got, want)


def test_aot_compile_and_export_roundtrip():
    model = make_model("distmult")
    params = make_params(model)
    pred = LinkPredictor(model, params, batch_size=8)
    k = 5
    compiled = pred.aot_kernels(k=k, directions=("o",))
    assert "o" in compiled

    try:
        from jax import export as jexport
    except ImportError:
        pytest.skip("jax.export unavailable")
    blob = pred.export_serialized(k=k, direction="o")
    assert isinstance(blob, bytes) and len(blob) > 0
    rehydrated = jexport.deserialize(blob)
    queries = make_queries(seed=29, n=8)
    args = (
        params,
        jnp.asarray(queries[:, 0]),
        jnp.asarray(queries[:, 1]),
        jnp.full((1,), 8, jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    vals, ids = rehydrated.call(*args)
    ref = pred.top_k(queries, k, direction="o", filtered=False)
    np.testing.assert_array_equal(np.asarray(ids), ref.entities)
    np.testing.assert_allclose(np.asarray(vals), ref.scores, rtol=1e-6)


# ---------------------------------------------------------------------------
# Quantized serving (int8 / bfloat16 entity tables)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_quantized_engine_equals_exact_on_dequantized_table(mode):
    """Wiring exactness: LinkPredictor(quantize=...) must produce the
    IDENTICAL ranking that the exact engine produces on the explicitly
    quantize->dequantized table — quantization error is a property of the
    representation, never of the engine plumbing."""
    from skge_tpu.serving import quantize_table_fp8, quantize_table_int8

    quantizer = {"int8": quantize_table_int8, "fp8": quantize_table_fp8}

    model = MODELS["distmult"](N_E, N_R, D)  # fp32: the production dtype
    params = dict(make_params(model))
    q = make_queries()
    qt = quantizer[mode](np.asarray(params["E"]))
    deq = (qt["q"].astype(np.float32) * qt["scale"])
    exact = LinkPredictor(
        model, {**params, "E": jnp.asarray(deq)}
    ).top_k(q, 10, filtered=False)
    quant = LinkPredictor(model, params, quantize=mode).top_k(
        q, 10, filtered=False
    )
    np.testing.assert_array_equal(exact.entities, quant.entities)
    np.testing.assert_allclose(exact.scores, quant.scores, rtol=1e-6)


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_streamed_quantized_matches_incore_quantized(mode):
    model = MODELS["transe"](N_E, N_R, D, l1=False)
    params = dict(make_params(model, seed=4))
    q = make_queries(seed=5)
    incore = LinkPredictor(model, params, quantize=mode).top_k(
        q, 7, filtered=False
    )
    host = {k: np.asarray(v) for k, v in params.items()}
    streamed = StreamedLinkPredictor(
        model, host, chunk=17, quantize=mode
    ).top_k(q, 7, filtered=False)
    np.testing.assert_array_equal(incore.entities, streamed.entities)
    np.testing.assert_allclose(incore.scores, streamed.scores,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["int8", "fp8", "bfloat16"])
def test_quantized_recall_reasonable(mode):
    """Approximation sanity: per-row int8 keeps top-10 recall high on a
    random fp32 table (scores shift by O(0.4%) of the row absmax)."""
    model = MODELS["distmult"](N_E, N_R, D)
    params = make_params(model, seed=6)
    q = make_queries(seed=7, n=32)
    exact = LinkPredictor(model, params).top_k(q, 10, filtered=False)
    quant = LinkPredictor(model, params, quantize=mode).top_k(
        q, 10, filtered=False
    )
    overlap = np.mean([
        len(set(a) & set(b)) / 10.0
        for a, b in zip(exact.entities, quant.entities)
    ])
    assert overlap >= 0.8, overlap
