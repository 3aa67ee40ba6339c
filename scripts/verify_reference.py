"""Reference-mount verification protocol (SURVEY.md §0; VERDICT r1 ask 8).

`/root/reference` was EMPTY in every session so far, so every
[M]-confidence constant in SURVEY.md §2.1 is pinned only to the
from-memory NumPy oracle (tests/oracle/oracle_numpy.py). If the mount is
ever populated, run this FIRST:

    python scripts/verify_reference.py [--reference /root/reference]
                                       [--golden tests/golden]

It (1) greps the actual reference source for each [M]-tagged semantic and
diffs it against this repo's values, (2) if the reference package is
importable, runs a mini training trace through the REAL reference code
and dumps golden step traces for the parity suite, and (3) exits non-zero
on any mismatch so CI / the build session cannot miss a silent
divergence. With an empty mount it reports that and exits 0 (nothing to
verify — the oracle remains the parity target).

Checked constants and where this repo pins them:

  _EPS (AdaGrad guard)        skge/param.py     -> skge_tpu/optim.py EPS = 1e-6
  _DEF_LEARNING_RATE          skge/base.py      -> 0.1  (optim.Optimizer.lr, compat)
  _DEF_MAX_EPOCHS             skge/base.py      -> 500  (compat)
  _DEF_NBATCHES               skge/base.py      -> 100  (compat)
  _DEF_MARGIN                 skge/base.py      -> 1.0  (compat)
  ntries default              skge/sample.py    -> 100  (sampling/sample)
  unzip order (s, o, p)       skge/util.py      -> util.unzip_triples
  nunif init form             skge/param.py     -> models/base.INITIALIZERS
  normless1 touched-rows-only skge/param.py     -> optim post-constraint
  HolE pairwise af = sigmoid  skge/hole.py      -> models/hole.pairwise_af
  RESCAL/ER-MLP pairwise af   skge/{rescal,ermlp}.py -> models/*.pairwise_af
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO_VALUES = {
    "_EPS": "1e-6",
    "_DEF_LEARNING_RATE": "0.1",
    "_DEF_MAX_EPOCHS": "500",
    "_DEF_NBATCHES": "100",
    "_DEF_MARGIN": "1.0",
    "ntries": "100",
}


def _num_eq(a: str, b: str) -> bool:
    try:
        return float(a) == float(b)
    except ValueError:
        return a.strip() == b.strip()


def grep_constant(src: str, name: str):
    m = re.search(rf"{re.escape(name)}\s*=\s*([0-9eE_.\-+]+)", src)
    return m.group(1) if m else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--golden", default="tests/golden")
    args = ap.parse_args()

    files = []
    for root, _, names in os.walk(args.reference):
        files += [os.path.join(root, n) for n in names if n.endswith(".py")]
    if not files:
        print(
            f"reference mount {args.reference} is EMPTY — nothing to "
            "verify; the NumPy oracle remains the parity target "
            "(SURVEY.md §0)."
        )
        return 0

    srcs = {f: open(f, errors="replace").read() for f in files}
    all_src = "\n".join(srcs.values())
    failures = []

    def check(label, ok, detail=""):
        status = "OK " if ok else "DIFF"
        print(f"[{status}] {label}{': ' + detail if detail else ''}")
        if not ok:
            failures.append(label)

    # 1. numeric constants
    for name, ours in REPO_VALUES.items():
        found = grep_constant(all_src, name)
        if found is None and name == "ntries":
            m = re.search(r"ntries[^=\n]*=\s*([0-9]+)", all_src)
            found = m.group(1) if m else None
        if found is None:
            check(name, False, f"not found in reference (ours: {ours})")
        else:
            check(name, _num_eq(found, ours), f"ref={found} ours={ours}")

    # 2. structural semantics
    check(
        "unzip (s, o, p) order",
        bool(
            re.search(r"def\s+unzip_triples", all_src)
            and re.search(r"ss.*?os.*?ps|s\b.*o\b.*p\b", all_src, re.S)
        ),
        "verify manually: skge/util.py unzip_triples column order",
    )
    check(
        "normless1 exists",
        "normless1" in all_src,
    )
    check(
        "HolE pairwise sigmoid-before-margin",
        bool(
            re.search(
                r"hole", " ".join(srcs), re.I
            )
            and re.search(r"sigmoid|expit|af\.Sigmoid", all_src)
        ),
        "verify skge/hole.py _pairwise_gradients applies af before margin",
    )

    # 3. golden traces from the real reference package, if importable
    sys.path.insert(0, args.reference)
    try:
        import numpy as _np  # noqa: F401
        import skge as ref_skge  # the REAL reference package

        os.makedirs(args.golden, exist_ok=True)
        import numpy as np

        rng = np.random.default_rng(0)
        n_e, n_r, d, b = 17, 3, 8, 12
        xs = [
            (int(rng.integers(n_e)), int(rng.integers(n_e)),
             int(rng.integers(n_r)))
            for _ in range(b)
        ]
        ys = np.ones(b)
        mdl = ref_skge.TransE((n_e, n_e, n_r), d, init="nunif")
        sc = mdl._scores(
            np.array([x[0] for x in xs]),
            np.array([x[2] for x in xs]),
            np.array([x[1] for x in xs]),
        )
        np.savez(
            os.path.join(args.golden, "transe_trace.npz"),
            E=np.asarray(mdl.E), R=np.asarray(mdl.R),
            xs=np.asarray(xs), scores=np.asarray(sc),
        )
        print(f"[OK ] golden TransE score trace -> {args.golden}")
        print(
            "NOTE: regenerate ALL golden traces and re-point "
            "tests/test_parity.py at them; see PARITY.md."
        )
    except ImportError as e:
        print(f"[-- ] reference package not importable ({e}); "
              "constant diff only")
    finally:
        sys.path.pop(0)

    if failures:
        print(f"\n{len(failures)} MISMATCH(ES): {failures}")
        print("Update the repo constants AND tests/oracle/oracle_numpy.py, "
              "then rerun the parity suite.")
        return 1
    print("\nreference verification passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
