"""Data layer: reference pickle round-trip, CLI --fin path, latent capacity."""

import numpy as np
import pytest

from skge_tpu.data import Dataset, latent_kg, load_dataset, save_dataset, synthetic_kg


def test_reference_pickle_roundtrip(tmp_path):
    ds = synthetic_kg(50, 4, n_train=200, n_valid=20, n_test=20, seed=1)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    back = load_dataset(path)
    np.testing.assert_array_equal(back.train, ds.train)
    np.testing.assert_array_equal(back.valid, ds.valid)
    np.testing.assert_array_equal(back.test, ds.test)
    assert back.n_entities == ds.n_entities
    assert back.n_relations == ds.n_relations


def test_reference_pickle_format_fields(tmp_path):
    """The written pickle has the companion harness's exact schema
    (SURVEY.md §2.2): train/valid/test_subs as (s, o, p) tuple lists plus
    entities/relations vocab lists."""
    import pickle

    ds = synthetic_kg(30, 3, n_train=100, seed=2)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert set(raw) >= {
        "train_subs", "valid_subs", "test_subs", "entities", "relations",
    }
    assert isinstance(raw["train_subs"][0], tuple)
    assert len(raw["train_subs"][0]) == 3
    assert len(raw["entities"]) == 30
    assert len(raw["relations"]) == 3


def test_experiment_cli_fin_roundtrip(tmp_path):
    """End-to-end: write a reference pickle, train + eval via the CLI."""
    from skge_tpu.experiment import main

    ds = synthetic_kg(60, 4, n_train=400, n_valid=40, n_test=40, seed=3)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    rc = main([
        "--cpu", "--fin", path, "--model", "transe", "--ncomp", "16",
        "--me", "2", "--nb", "8", "--test-all", "0", "--mode", "rank",
    ])
    assert rc == 0


def test_experiment_cli_scaleout_trainers(tmp_path):
    """--trainer partitioned / outofcore run the full harness loop
    (periodic valid eval, best retention, sharded checkpoint, test eval)."""
    from skge_tpu.experiment import main

    ds = synthetic_kg(60, 4, n_train=400, n_valid=40, n_test=40, seed=3)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    for extra in (["--trainer", "partitioned"],
                  ["--trainer", "outofcore", "--parts", "2"]):
        rc = main([
            "--cpu", "--fin", path, "--model", "transe", "--ncomp", "16",
            "--me", "2", "--nb", "8", "--test-all", "2", "--k", "32",
            "--fout", str(tmp_path / "best"),
        ] + extra)
        assert rc == 0, extra


def test_latent_kg_blocked_sweep_matches_single_matmul():
    """The >2M-entity blocked argmax sweep (running-best lax.scan over
    candidate blocks — VERDICT r3 item 5) assigns the same objects as the
    single-matmul path, all three geometries, threshold lowered so the
    comparison runs at CPU scale. Values are identical when per-row dots
    reduce identically; the strict-improvement carry reproduces argmax's
    first-occurrence tie rule."""
    from skge_tpu import data as dmod

    for kind in ("translational", "bilinear", "rotational"):
        ref = latent_kg(500, 4, n_train=900, latent_dim=8, seed=2,
                        kind=kind)
        old = dmod._BLOCKED_SWEEP_THRESHOLD
        dmod._BLOCKED_SWEEP_THRESHOLD = 100
        try:
            blk = latent_kg(500, 4, n_train=900, latent_dim=8, seed=2,
                            kind=kind)
        finally:
            dmod._BLOCKED_SWEEP_THRESHOLD = old
        np.testing.assert_array_equal(ref.train, blk.train, err_msg=kind)


def test_latent_kg_capacity_guard():
    with pytest.raises(ValueError, match="unique noise-free"):
        latent_kg(n_entities=10, n_relations=2, n_train=100)


def test_lattice_kg_closed_form_is_exact_nearest_neighbour():
    """kind='lattice' (the 10^7+ build path): the clamp+round closed form
    must equal the brute-force Euclidean argmin over ALL entity latent
    points — the same realizability contract the swept geometries have,
    without the sweep. Verified on a 4^3 = 64-entity lattice."""
    b, dl = 4, 3
    n_e = b ** dl
    ds = latent_kg(n_e, 5, n_train=250, latent_dim=dl, seed=3,
                   kind="lattice")
    assert ds.train.shape == (250, 3)
    # rebuild the generator's latents + translations from the same seed
    rng = np.random.default_rng(3)
    Rel = (rng.uniform(-3.0, 3.0, size=(5, dl)) / b).astype(np.float32)
    powers = b ** np.arange(dl, dtype=np.int64)
    ids = np.arange(n_e, dtype=np.int64)
    Z = (((ids[:, None] // powers[None, :]) % b) + 0.5) / b  # (n_e, dl)
    s, o, p = ds.train[:, 0], ds.train[:, 1], ds.train[:, 2]
    q = Z[s] + Rel[p]
    brute = np.argmin(
        np.sum((q[:, None, :] - Z[None, :, :]) ** 2, axis=2), axis=1
    )
    np.testing.assert_array_equal(o, brute)
    # determinism
    ds2 = latent_kg(n_e, 5, n_train=250, latent_dim=dl, seed=3,
                    kind="lattice")
    np.testing.assert_array_equal(ds.train, ds2.train)


def test_lattice_kg_rejects_non_power_entity_count():
    with pytest.raises(ValueError, match="perfect"):
        latent_kg(65, 5, n_train=10, latent_dim=3, kind="lattice")


def test_experiment_cli_reciprocal_ce(tmp_path):
    """--ce --reciprocal: dataset augmented (doubled relations), CE trains
    object-direction-only, and BOTH eval sites rank heads through the
    canonical inverse-routed wrapper."""
    from skge_tpu.evaluation import ReciprocalEvalWrapper
    from skge_tpu.experiment import Experiment, make_parser

    ds = synthetic_kg(60, 4, n_train=400, n_valid=40, n_test=40, seed=3)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    args = make_parser().parse_args([
        "--cpu", "--fin", path, "--model", "distmult", "--ncomp", "8",
        "--ce", "--reciprocal", "--optimizer", "adam", "--lr", "1e-3",
        "--me", "2", "--nb", "8", "--test-all", "1", "--mode", "rank",
    ])
    exp = Experiment(args)
    assert exp.ds.n_relations == 8  # doubled
    assert len(exp.ds.train) == 800  # inverse triples appended
    assert isinstance(exp._eval_model, ReciprocalEvalWrapper)
    assert tuple(exp.trainer.config.ce_directions) == ("o",)
    result = exp.run()
    assert "mrr" in result and np.isfinite(result["mrr"])

    # --reciprocal without --ce is rejected (except for conve, where the
    # flag is redundant)
    bad = make_parser().parse_args([
        "--cpu", "--fin", path, "--model", "distmult", "--reciprocal",
        "--me", "1", "--nb", "4",
    ])
    with pytest.raises(SystemExit):
        Experiment(bad)


def test_experiment_cli_conve_scaleout(tmp_path):
    """ConvE reaches the scale-out trainers via the CLI (--ce implied
    reciprocal; round-4 lift of the --trainer single restriction), and
    the pairwise pool path still gets the clear canonicalization error."""
    from skge_tpu.experiment import main

    ds = synthetic_kg(60, 4, n_train=300, n_valid=30, n_test=30, seed=3)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    for extra in (["--trainer", "partitioned"],
                  ["--trainer", "outofcore", "--parts", "2"]):
        rc = main([
            "--cpu", "--fin", path, "--model", "conve", "--ncomp", "16",
            "--ce", "--optimizer", "adam", "--lr", "5e-3",
            "--me", "2", "--nb", "8", "--test-all", "0",
        ] + extra)
        assert rc == 0, extra
    import pytest

    with pytest.raises(SystemExit, match="canonical"):
        main([
            "--cpu", "--fin", path, "--model", "conve", "--ncomp", "16",
            "--trainer", "partitioned", "--me", "1", "--nb", "4",
        ])


def test_experiment_cli_selfadv_scaleout(tmp_path):
    """--selfadv reaches the partitioned and out-of-core trainers (it was
    silently downgraded to margin loss before)."""
    from skge_tpu.experiment import main

    ds = synthetic_kg(60, 4, n_train=400, n_valid=40, n_test=40, seed=3)
    path = str(tmp_path / "kg.bin")
    save_dataset(ds, path)
    for extra in (["--trainer", "partitioned"],
                  ["--trainer", "outofcore", "--parts", "2"]):
        rc = main([
            "--cpu", "--fin", path, "--model", "transe", "--l2",
            "--ncomp", "16", "--me", "2", "--nb", "8", "--test-all", "0",
            "--k", "32", "--selfadv", "--margin", "2.0",
        ] + extra)
        assert rc == 0, extra
