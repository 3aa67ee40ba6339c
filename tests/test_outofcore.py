"""Out-of-core (PBG-style) bucketed training: exactness, integrity, learning.

No reference counterpart (the reference is in-memory only); build-scope per
BASELINE.md's production-scale mandate. The binding contracts:

- P=1 degenerates to the EXACT in-core trajectory (same PRNG stream, same
  jitted program);
- device footprint is 2 * ceil(n_e / P) entity rows regardless of n_e;
- rows never touched by any bucket keep their initial values bit-for-bit;
- multi-part training actually learns (violations drop, MRR over random).
"""

import numpy as np

import jax
import jax.numpy as jnp

from skge_tpu import AdaGrad, SharedNegativeSampler, init_state, \
    make_epoch_fn, make_pairwise_step
from skge_tpu.data import synthetic_kg
from skge_tpu.models import DistMult, TransE
from skge_tpu.outofcore import OutOfCoreTrainer


def test_single_part_matches_incore_exactly():
    ds = synthetic_kg(n_entities=80, n_relations=5, n_train=600, seed=5)
    model = TransE(ds.n_entities, ds.n_relations, 16)
    opt = AdaGrad(lr=0.1)
    k, nb, margin, epochs = 32, 10, 1.0, 3

    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, margin=margin, k=k, nbatches=nb,
        seed=0,
    ).fit(epochs=epochs)

    sampler = SharedNegativeSampler(ds.n_entities, k=k)
    step = make_pairwise_step(model, opt, sampler, margin, aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], nb))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(epochs):
        state, m = epoch(state, xs)

    got = ooc.params()
    np.testing.assert_array_equal(got["E"], np.asarray(state.params["E"]))
    np.testing.assert_array_equal(got["R"], np.asarray(state.params["R"]))


def test_untouched_rows_preserved_and_footprint():
    ds = synthetic_kg(n_entities=120, n_relations=4, n_train=500, seed=9,
                      clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 8)
    ooc = OutOfCoreTrainer(
        model, AdaGrad(), ds.train, n_parts=3, margin=1.0, k=16,
        nbatches=4, seed=1,
    )
    init_e = ooc.e_host["param"].copy()
    touched = np.zeros(ooc.e_host["param"].shape[0], bool)
    for (pi, pj), rows in ooc.buckets.items():
        touched[rows[:, 0]] = True
        touched[rows[:, 1]] = True
        # pool negatives touch every REAL row of the resident parts
        s = ooc.part_size
        for p in (pi, pj):
            touched[p * s : p * s + ooc.part_counts[p]] = True
    ooc.fit(epochs=2)
    # device resident rows per bucket = 2S, independent of n_entities;
    # the partitioner balances by DEGREE, so S can exceed n_e/P somewhat
    assert ooc.part_size <= int(ds.n_entities / 3 * 1.5)
    np.testing.assert_array_equal(
        ooc.e_host["param"][~touched], init_e[~touched]
    )
    assert np.isfinite(ooc.e_host["param"]).all()


def test_multipart_learns_on_latent_kg():
    from skge_tpu.data import latent_kg

    ds = latent_kg(n_entities=600, n_relations=8, n_train=3000,
                   n_valid=0, n_test=80, latent_dim=8, seed=3)
    model = TransE(ds.n_entities, ds.n_relations, 24, l1=False)
    ooc = OutOfCoreTrainer(
        model, AdaGrad(lr=0.1), ds.train, n_parts=2, margin=1.0, k=64,
        nbatches=10, seed=0,
    ).fit(epochs=15)
    m = ooc.metrics
    assert m[-1]["nviolations"] < m[0]["nviolations"] * 0.7
    # full-size params assemble and evaluate
    from skge_tpu.evaluation import FilteredRankingEval

    params = {k: jnp.asarray(v) for k, v in ooc.params().items()}
    r = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=32)(
        params
    )
    assert r.mrr > 2.0 / ds.n_entities  # clearly better than random


def test_chained_order_upload_bound():
    """The chained bucket order + LRU refresh must give at most ONE part
    upload per bucket transition: each bucket after the first shares a
    resident partition with its predecessor whenever the bucket graph
    allows, and fetching the missing part must never evict the shared one
    (the (new, shared) LRU-front hazard)."""
    ds = synthetic_kg(n_entities=120, n_relations=4, n_train=800, seed=3,
                      clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 8)
    ooc = OutOfCoreTrainer(
        model, AdaGrad(), ds.train, n_parts=3, margin=1.0, k=16,
        nbatches=2, seed=1,
    )
    order = ooc._bucket_order()
    assert sorted(order) == sorted(ooc.buckets)
    # every transition shares a part when the bucket graph allows it
    # (P=3 with clustered data: diagonal buckets exist, graph is connected)
    chained = sum(
        1 for a, b in zip(order, order[1:]) if set(a) & set(b)
    )
    assert chained == len(order) - 1

    ooc.fit(epochs=1)
    nbuckets = len(order)
    # first bucket <= 2 uploads, every later transition <= 1
    assert ooc.uploads <= nbuckets + 1, (ooc.uploads, nbuckets)

    before = ooc.uploads
    ooc.fit(epochs=1)
    # fit() flushes at the end, so epoch 2 re-uploads from scratch
    assert ooc.uploads - before <= nbuckets + 1


def test_pointwise_single_part_matches_incore():
    """Pointwise-logistic bucket path (VERDICT r1 ask 6): P=1 takes the
    in-core pointwise trajectory. The bucket epoch's masked sentinel row
    widens each batch reduction by one exact-zero term, which can move
    results by 1 fp64 ulp (same value, different reduction tree); over
    several epochs an ulp can flip a normless1 projection threshold, so
    the single-epoch state is pinned ulp-tight and the multi-epoch run is
    pinned on the loss metric."""
    from skge_tpu import make_pointwise_step

    ds = synthetic_kg(n_entities=80, n_relations=5, n_train=600, seed=6)
    model = TransE(ds.n_entities, ds.n_relations, 16, dtype="float64")
    opt = AdaGrad(lr=0.1)
    k, nb = 32, 10

    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, k=k, nbatches=nb, seed=0,
        pairwise=False,
    ).fit(epochs=1)

    sampler = SharedNegativeSampler(ds.n_entities, k=k)
    step = make_pointwise_step(model, opt, sampler, "dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], nb))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    state, m = epoch(state, xs)

    got = ooc.params()
    np.testing.assert_allclose(
        got["E"], np.asarray(state.params["E"]), rtol=0, atol=1e-14
    )
    np.testing.assert_allclose(
        got["R"], np.asarray(state.params["R"]), rtol=0, atol=1e-14
    )
    assert np.isclose(
        ooc.metrics[0]["loss"], float(jnp.sum(m.loss)), rtol=1e-12
    )
    ooc2 = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, k=k, nbatches=nb, seed=0,
        pairwise=False,
    ).fit(epochs=4)
    losses = [mm["loss"] for mm in ooc2.metrics]
    assert losses[-1] < 0.9 * losses[0]  # logistic loss actually decreases


def test_prefetch_preserves_trajectory_and_fills_free_slot():
    """Prefetch must not change the math (only WHEN uploads happen) and
    with a free slot (cache_parts=3) the next bucket's part is resident
    before its epoch runs."""
    ds = synthetic_kg(n_entities=90, n_relations=5, n_train=900, seed=8,
                      clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 16, dtype="float64")
    opt = AdaGrad(lr=0.1)

    def run(prefetch, cache_parts):
        return OutOfCoreTrainer(
            model, opt, ds.train, n_parts=3, k=32, nbatches=6, seed=1,
            cache_parts=cache_parts, prefetch=prefetch,
        ).fit(epochs=2)

    a = run(False, 3)
    b = run(True, 3)
    np.testing.assert_array_equal(a.params()["E"], b.params()["E"])
    # prefetch into the free slot converts at least one in-loop blocking
    # upload into an early one; the total upload count cannot grow
    assert b.uploads <= a.uploads + 1  # wraparound prefetch may add one


def test_ooc_checkpoint_resume_exact(tmp_path):
    """save/restore round-trips the host-resident sharded state (one npz
    per partition, no full-table copy): resuming reproduces the
    uninterrupted trajectory bit-for-bit."""
    ds = synthetic_kg(n_entities=90, n_relations=5, n_train=900, seed=8,
                      clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 16, dtype="float64")
    opt = AdaGrad(lr=0.1)

    def mk():
        return OutOfCoreTrainer(
            model, opt, ds.train, n_parts=3, k=32, nbatches=6, seed=1,
            cache_parts=2,
        )

    full = mk().fit(epochs=4)

    t = mk().fit(epochs=2)
    ck = str(tmp_path / "ooc_ck")
    t.save(ck)
    import os

    assert sorted(os.listdir(ck)) == [
        "manifest.json", "part_00000.npz", "part_00001.npz",
        "part_00002.npz", "replicated.npz",
    ]
    t2 = mk().restore(ck)
    assert [m["loss"] for m in t2.metrics] == [m["loss"] for m in t.metrics]
    t2.fit(epochs=2)
    pa, pb = full.params(), t2.params()
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)


def test_streamed_eval_matches_incore_eval():
    """OutOfCoreTrainer.evaluate streams candidates one partition at a
    time; the rank integers must EXACTLY equal the in-core evaluator's
    on the gathered full table (same comparisons, partitioned counting),
    for both tie conventions."""
    from skge_tpu.evaluation import FilteredRankingEval

    ds = synthetic_kg(n_entities=90, n_relations=5, n_train=900,
                      n_test=80, seed=8, clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 16, dtype="float64")
    opt = AdaGrad(lr=0.1)
    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=3, k=32, nbatches=6, seed=1,
    ).fit(epochs=2)

    params = {k: jnp.asarray(v) for k, v in ooc.params().items()}
    for ties in ("mean", "optimistic"):
        want = FilteredRankingEval(
            model, ds.test, ds.all_triples(), batch_size=32, ties=ties
        )(params)
        got = ooc.evaluate(
            ds.test, ds.all_triples(), batch_size=32, ties=ties
        )
        np.testing.assert_array_equal(got.ranks, want.ranks, err_msg=ties)
        np.testing.assert_array_equal(
            got.ranks_raw, want.ranks_raw, err_msg=ties
        )
        assert got.mrr == want.mrr


def test_selfadv_single_part_matches_incore():
    """OOC loss='selfadv' at P=1 matches the in-core make_selfadv_step
    trajectory (completing the loss x distribution matrix: selfadv now
    runs on single-device, mesh, partitioned and out-of-core paths).
    fp64 + allclose rather than bitwise: the softmax/logaddexp reductions
    fuse differently between the bucket and plain epoch programs (ulp
    reorder), unlike the margin path's elementwise math."""
    from skge_tpu.training import make_selfadv_step

    ds = synthetic_kg(n_entities=80, n_relations=5, n_train=600, seed=5)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False,
                   dtype="float64")
    opt = AdaGrad(lr=0.1)
    k, nb, margin, epochs = 32, 10, 2.0, 3

    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, margin=margin, k=k, nbatches=nb,
        seed=0, loss="selfadv",
    ).fit(epochs=epochs)

    sampler = SharedNegativeSampler(ds.n_entities, k=k)
    step = make_selfadv_step(model, opt, sampler, margin, 1.0, "dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], nb))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(epochs):
        state, m = epoch(state, xs)

    got = ooc.params()
    np.testing.assert_allclose(
        got["E"], np.asarray(state.params["E"]), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        got["R"], np.asarray(state.params["R"]), rtol=1e-9, atol=1e-12
    )


def test_ce_single_part_matches_incore():
    """OOC loss='ce' at P=1 matches the in-core make_ce_step trajectory
    (VERDICT r2 ask 2: CE reaches the out-of-core path; at n_parts=1 the
    whole table is resident so bucket-CE == full CE). fp64 + allclose:
    the softmax reductions fuse differently between the bucket and plain
    epoch programs (ulp reorder), like the selfadv path."""
    from skge_tpu.training import make_ce_step

    ds = synthetic_kg(n_entities=80, n_relations=5, n_train=600, seed=5)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False,
                   dtype="float64")
    opt = AdaGrad(lr=0.1)
    nb, epochs = 10, 3

    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, nbatches=nb, seed=0, loss="ce",
        label_smoothing=0.1,
    ).fit(epochs=epochs)

    step = make_ce_step(model, opt, directions=("o", "s"),
                        label_smoothing=0.1)
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], nb))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(epochs):
        state, m = epoch(state, xs)

    got = ooc.params()
    np.testing.assert_allclose(
        got["E"], np.asarray(state.params["E"]), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        got["R"], np.asarray(state.params["R"]), rtol=1e-9, atol=1e-12
    )


def test_ce_multipart_learns_on_latent_kg():
    """OOC CE with n_parts>1 (bucket-resident candidate sets) still learns:
    loss drops and streamed eval beats random — the documented
    approximation arm of VERDICT r2 ask 2."""
    from skge_tpu.data import latent_kg

    ds = latent_kg(n_entities=300, n_relations=6, n_train=900, n_test=40,
                   latent_dim=6, seed=3)
    from skge_tpu import Adam

    model = DistMult(ds.n_entities, ds.n_relations, 16)
    ooc = OutOfCoreTrainer(
        model, Adam(lr=1e-2), ds.train, n_parts=2, nbatches=8, seed=0,
        loss="ce", label_smoothing=0.1,
    ).fit(epochs=12)
    losses = [m["loss"] for m in ooc.metrics]
    assert losses[-1] < losses[0] * 0.8, losses
    res = ooc.evaluate(ds.test, ds.all_triples(), batch_size=32)
    assert res.mrr > 3.0 / ds.n_entities


def test_host_buckets_trajectory_identical():
    """host_buckets=True (10^8-scale knob: bucket triples stay in host
    RAM, uploaded per visit) is a pure transport choice — bit-identical
    trajectory to the device-resident default."""
    ds = synthetic_kg(n_entities=120, n_relations=4, n_train=500, seed=9,
                      clustered=True)
    model = TransE(ds.n_entities, ds.n_relations, 8)
    outs = []
    for hb in (False, True):
        ooc = OutOfCoreTrainer(
            model, AdaGrad(lr=0.1), ds.train, n_parts=3, margin=1.0,
            k=16, nbatches=4, seed=1, host_buckets=hb,
        ).fit(epochs=2)
        outs.append(ooc.params())
    for kk in outs[0]:
        np.testing.assert_array_equal(outs[0][kk], outs[1][kk], err_msg=kk)


def test_sampled_ce_single_part_matches_incore():
    """OOC loss='sampled_ce' at P=1 matches the in-core
    make_sampled_ce_step trajectory (VERDICT r3 item 3: sampled CE
    reaches the out-of-core path): the resident pool is the whole real
    table, the dynamic proposal domain equals n_entities, and the PRNG
    split order is shared — fp64 + allclose for the usual program-fusion
    ulp reorder."""
    from skge_tpu.training import make_sampled_ce_step

    ds = synthetic_kg(n_entities=80, n_relations=5, n_train=600, seed=5)
    model = TransE(ds.n_entities, ds.n_relations, 16, l1=False,
                   dtype="float64")
    opt = AdaGrad(lr=0.1)
    k, nb, epochs = 32, 10, 3

    ooc = OutOfCoreTrainer(
        model, opt, ds.train, n_parts=1, k=k, nbatches=nb, seed=0,
        loss="sampled_ce", label_smoothing=0.1,
    ).fit(epochs=epochs)

    sampler = SharedNegativeSampler(ds.n_entities, k=k)
    step = make_sampled_ce_step(model, opt, sampler,
                                directions=("o", "s"),
                                label_smoothing=0.1, aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], nb))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    xs = jnp.asarray(ds.train)
    for _ in range(epochs):
        state, m = epoch(state, xs)

    got = ooc.params()
    np.testing.assert_allclose(
        got["E"], np.asarray(state.params["E"]), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        got["R"], np.asarray(state.params["R"]), rtol=1e-9, atol=1e-12
    )


def test_sampled_ce_multipart_learns_and_reciprocal_evals():
    """OOC sampled-CE with n_parts>1 (resident-partition proposal) learns
    on a latent KG, through the reciprocal protocol the CLI routes
    (--trainer outofcore --sampled-ce --reciprocal)."""
    from skge_tpu.data import add_reciprocal_relations, latent_kg
    from skge_tpu import Adam

    ds = latent_kg(n_entities=300, n_relations=6, n_train=900, n_test=40,
                   latent_dim=6, seed=3)
    aug = add_reciprocal_relations(ds)
    model = DistMult(aug.n_entities, aug.n_relations, 16)
    ooc = OutOfCoreTrainer(
        model, Adam(lr=1e-2), aug.train, n_parts=2, k=64, nbatches=8,
        seed=0, loss="sampled_ce", label_smoothing=0.1,
        ce_directions=("o",),
    ).fit(epochs=12)
    losses = [m["loss"] for m in ooc.metrics]
    assert losses[-1] < losses[0] * 0.8, losses
    res = ooc.evaluate(ds.test, aug.all_triples(), batch_size=32,
                       reciprocal=True)
    assert res.mrr > 3.0 / ds.n_entities


def test_streamed_reciprocal_eval_matches_incore_wrapper():
    """evaluate(reciprocal=True) is the streamed twin of
    evaluation.ReciprocalEvalWrapper: head queries rank as object queries
    through the inverse relation with the subject-side filter set; rank
    integers exactly equal the in-core wrapper's, both tie conventions."""
    from skge_tpu.data import add_reciprocal_relations
    from skge_tpu.evaluation import (
        FilteredRankingEval, ReciprocalEvalWrapper,
    )
    from skge_tpu.models import DistMult

    ds = synthetic_kg(n_entities=90, n_relations=5, n_train=900,
                      n_test=80, seed=9, clustered=True)
    aug = add_reciprocal_relations(ds)
    model = DistMult(aug.n_entities, aug.n_relations, 16, dtype="float64")
    opt = AdaGrad(lr=0.1)
    ooc = OutOfCoreTrainer(
        model, opt, aug.train, n_parts=3, k=32, nbatches=6, seed=1,
        loss="ce", ce_directions=("o",),
    ).fit(epochs=2)

    params = {k: jnp.asarray(v) for k, v in ooc.params().items()}
    wrapped = ReciprocalEvalWrapper(model)
    for ties in ("mean", "optimistic"):
        want = FilteredRankingEval(
            wrapped, ds.test, ds.all_triples(), batch_size=32, ties=ties
        )(params)
        got = ooc.evaluate(
            ds.test, ds.all_triples(), batch_size=32, ties=ties,
            reciprocal=True,
        )
        np.testing.assert_array_equal(got.ranks, want.ranks, err_msg=ties)
        np.testing.assert_array_equal(
            got.ranks_raw, want.ranks_raw, err_msg=ties
        )
        assert got.mrr == want.mrr


def test_streamed_reciprocal_eval_needs_doubled_relations():
    import pytest

    ds = synthetic_kg(n_entities=40, n_relations=5, n_train=200,
                      n_test=20, seed=2)
    model = TransE(ds.n_entities, ds.n_relations, 8)
    ooc = OutOfCoreTrainer(model, AdaGrad(lr=0.1), ds.train, n_parts=2)
    with pytest.raises(ValueError, match="DOUBLED"):
        ooc.evaluate(ds.test, ds.all_triples(), reciprocal=True)


def test_auto_ce_loss_routes_by_partition_count():
    """loss='auto_ce' applies the measured P-crossover rule
    (choose_ce_loss: resident CE at P<=2, sampled-CE at P>=3 —
    RESULTS.md OOC CE A/B) and records an auditable report."""
    from skge_tpu.outofcore import choose_ce_loss

    assert choose_ce_loss(1)[0] == "ce"
    assert choose_ce_loss(2)[0] == "ce"
    assert choose_ce_loss(3)[0] == "sampled_ce"
    assert choose_ce_loss(4)[0] == "sampled_ce"

    ds = synthetic_kg(n_entities=60, n_relations=3, n_train=300, seed=3)
    lo = OutOfCoreTrainer(
        DistMult(ds.n_entities, ds.n_relations, 8), AdaGrad(lr=0.05),
        ds.train, n_parts=2, k=16, nbatches=4, seed=0, loss="auto_ce",
        ce_directions=("o",),
    )
    assert lo.loss == "ce" and lo.loss_report["n_parts"] == 2
    hi = OutOfCoreTrainer(
        DistMult(ds.n_entities, ds.n_relations, 8), AdaGrad(lr=0.05),
        ds.train, n_parts=4, k=16, nbatches=4, seed=0, loss="auto_ce",
        ce_directions=("o",),
    )
    assert hi.loss == "sampled_ce"
    hi.fit(epochs=1)  # resolved loss actually trains
    assert np.isfinite(hi.metrics[-1]["loss"])
