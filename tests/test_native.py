"""Native C++ triple loader: parity with the Python loader + error paths."""

import os
import subprocess

import numpy as np
import pytest

from skge_tpu import native
from skge_tpu.data import load_tsv

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def write_files(tmp_path, n_train=500, n_valid=60, n_test=40, seed=0):
    rng = np.random.default_rng(seed)
    ents = [f"/m/entity_{i:04d}" for i in range(120)]
    rels = [f"/rel/r{i}" for i in range(7)]
    paths = []
    for name, n in (("train", n_train), ("valid", n_valid), ("test", n_test)):
        p = tmp_path / f"{name}.txt"
        with open(p, "w") as f:
            for _ in range(n):
                h = ents[rng.integers(len(ents))]
                r = rels[rng.integers(len(rels))]
                t = ents[rng.integers(len(ents))]
                f.write(f"{h}\t{r}\t{t}\n")
        paths.append(str(p))
    return paths


def test_native_matches_python_loader(tmp_path):
    paths = write_files(tmp_path)
    ds_native = load_tsv(*paths, use_native=True)
    ds_python = load_tsv(*paths, use_native=False)
    # same interning order => identical ids
    assert ds_native.entities == ds_python.entities
    assert ds_native.relations == ds_python.relations
    for a, b in (
        (ds_native.train, ds_python.train),
        (ds_native.valid, ds_python.valid),
        (ds_native.test, ds_python.test),
    ):
        np.testing.assert_array_equal(a, b)


def test_shared_vocab_across_splits(tmp_path):
    paths = write_files(tmp_path)
    splits, entities, relations = native.load_triple_files(paths)
    # an entity id seen in test must name the same string as in train
    seen = np.unique(np.concatenate([s[:, :2].ravel() for s in splits]))
    assert seen.max() < len(entities)
    ds = load_tsv(*paths)
    assert ds.n_entities == len(entities)


def test_column_order_permutation(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("alice knows bob\nbob likes carol\n")
    splits, entities, relations = native.load_triple_files(
        [str(p)], order="spo"
    )
    t = splits[0]
    assert entities[t[0, 0]] == "alice"
    assert entities[t[0, 1]] == "bob"       # object column
    assert relations[t[0, 2]] == "knows"
    # sop order: alice knows bob -> s=alice o=knows? no: order='sop' means
    # file columns are subject, object, predicate
    splits2, e2, r2 = native.load_triple_files([str(p)], order="sop")
    t2 = splits2[0]
    assert e2[t2[0, 0]] == "alice"
    assert e2[t2[0, 1]] == "knows"
    assert r2[t2[0, 2]] == "bob"


def test_malformed_line_raises(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a r b\nonly two\n")
    with pytest.raises(RuntimeError, match="malformed"):
        native.load_triple_files([str(p)])


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.load_triple_files([str(tmp_path / "nope.txt")])


def test_bad_order_raises(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("a r b\n")
    with pytest.raises(RuntimeError, match="order"):
        native.load_triple_files([str(p)], order="ss")
    with pytest.raises(RuntimeError, match="order"):
        native.load_triple_files([str(p)], order="ssp")


def test_blank_lines_and_crlf(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("a r b\r\n\n\nc r d\n")
    splits, entities, relations = native.load_triple_files([str(p)])
    assert splits[0].shape == (2, 3)
    assert entities == ["a", "b", "c", "d"]


def test_native_partitioner_matches_python_exactly():
    """native/src/partitioner.cpp is a bit-exact port of the Python
    greedy_entity_partition (same stable ordering, balance cap, score and
    load tie-breaks, refinement sweeps)."""
    import pytest

    from skge_tpu.data import greedy_entity_partition, synthetic_kg
    from skge_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    for seed, (n_e, n_r, n_t, parts, clustered) in enumerate([
        (97, 6, 900, 4, True),
        (400, 8, 6000, 8, True),
        (123, 5, 700, 3, False),
        (50, 2, 60, 7, False),   # sparse: isolated entities
    ]):
        ds = synthetic_kg(n_e, n_r, n_train=n_t, seed=seed,
                          clustered=clustered)
        py = greedy_entity_partition(ds.train, n_e, parts, backend="python")
        nat = greedy_entity_partition(ds.train, n_e, parts, backend="native")
        np.testing.assert_array_equal(nat, py, err_msg=f"case {seed}")


def test_native_partitioner_rejects_bad_ids():
    import pytest

    from skge_tpu.data import greedy_entity_partition
    from skge_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    bad = np.array([[0, 99, 0]], np.int32)  # object id out of range
    with pytest.raises(ValueError):
        greedy_entity_partition(bad, 10, 2, backend="native")
