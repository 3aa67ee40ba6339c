"""Reference-scale quality suite: all four models on a WN18-sized learnable
synthetic KG (latent translational geometry — data.latent_kg), trained with
the flagship shared-negative-pool scheme and evaluated with the filtered
ranking protocol. Writes a markdown table to RESULTS.md.

Real WN18/FB15k files are not available in this offline environment; this
suite demonstrates the complete train -> validate -> evaluate pipeline at
the reference's scale (40,943 entities / 141k train triples) on the real
chip. Absolute MRR is dataset-specific and NOT comparable to the paper's
WN18 numbers; the latent KG is TransE-realizable by construction, so the
translational models should score high and the bilinear/neural models
lower (opposite of real WN18, where HolE wins).

Usage: python scripts/quality_suite.py [--epochs 100] [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--k", type=int, default=None,
                    help="pool size (default 1024; 8192 for --loss selfadv)")
    ap.add_argument("--nbatches", type=int, default=100)
    ap.add_argument("--entities", type=int, default=40943)   # WN18 shape
    ap.add_argument("--relations", type=int, default=18)
    ap.add_argument("--ntrain", type=int, default=141442)
    ap.add_argument("--latent-dim", type=int, default=32)
    ap.add_argument("--out", default=None, help="append results to this md file")
    ap.add_argument("--models", default=None,
                    help="comma-separated subset, e.g. 'TransE-L1,HolE'")
    ap.add_argument(
        "--sampler", default="shared", choices=["shared", "random-mode"],
        help="'random-mode' = the REFERENCE scheme (iid corruption per "
        "positive) at the reference hyperparams margin=0.2 lr=0.1 — the "
        "decoupling run from VERDICT r1 ask 4: shared-pool hyperparameter "
        "sensitivity vs reference-semantics correctness",
    )
    ap.add_argument("--negatives", type=int, default=2,
                    help="[random-mode] negatives per (positive, mode)")
    ap.add_argument(
        "--loss", default="margin", choices=["margin", "selfadv", "ce"],
        help="'selfadv' = Sun et al. 2019 self-adversarial loss over the "
        "shared pool (the strongest measured loss — RESULTS.md); uses the "
        "per-model selfadv margins (gamma) with lr 0.3 and k 8192 unless "
        "--k overrides. 'ce' = the canonical multiplicative-era scheme for "
        "EVERY model: reciprocal relations + object-direction 1-vs-all "
        "cross entropy (ls=0.1) + Adam lr=1e-3 (no sampler) — the recipe "
        "that rescues DistMult/ComplEx/TuckER on this KG (RESULTS.md)",
    )
    ap.add_argument("--adv-alpha", type=float, default=1.0,
                    help="[--loss selfadv] softmax temperature; the "
                    "recorded tables use 1.0, the tuned best is 2.0 "
                    "(RESULTS.md lever sweep)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.loss == "selfadv" and args.sampler != "shared":
        ap.error("--loss selfadv needs the shared-pool sampler")
    if args.k is None:
        args.k = 8192 if args.loss == "selfadv" else 1024

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from skge_tpu import (
        AdaGrad, RandomModeSampler, SharedNegativeSampler, init_state,
        make_epoch_fn, make_pairwise_step,
    )
    from skge_tpu.data import latent_kg
    from skge_tpu.evaluation import FilteredRankingEval
    from skge_tpu.models import (
        ComplEx, DistMult, ERMLP, HolE, PairRE, QuatE, RESCAL, RotatE,
        SimplE, TransE, TransH, TransR, TuckER,
    )

    print("building latent KG...", flush=True)
    t0 = time.perf_counter()
    ds = latent_kg(
        n_entities=args.entities, n_relations=args.relations,
        n_train=args.ntrain, n_valid=5000, n_test=5000,
        latent_dim=args.latent_dim, seed=0,
    )
    print(f"  built in {time.perf_counter() - t0:.0f}s", flush=True)
    xs = jnp.asarray(ds.train)

    # (name, model, margin, lr, k or None=args.k). HolE's sigmoid score
    # transform caps the gradient prefactor at 0.25 and AdaGrad's accumulator
    # then freezes the run at the reference's lr=0.1 under the shared-pool
    # loss; very large pools (k=8192) additionally destabilize it (nearly
    # every pool pair violates a sigmoid margin early on, so the pool term
    # swamps the positives). Sweep on the real chip: margin 0.5 / lr 0.3 /
    # k 2048 measured ~8x better MRR than the reference hyperparams here.
    configs = [
        ("TransE-L1", TransE(ds.n_entities, ds.n_relations, 150), 2.0, 0.1, None),
        ("TransE-L2", TransE(ds.n_entities, ds.n_relations, 150, l1=False), 1.0, 0.1, None),
        ("HolE", HolE(ds.n_entities, ds.n_relations, 150, rparam=0.0), 0.5, 0.3, 2048),
        ("RESCAL", RESCAL(ds.n_entities, ds.n_relations, 100, rparam=0.01), 1.0, 0.1, None),
        ("ER-MLP", ERMLP(ds.n_entities, ds.n_relations, 150, nhidden=10), 1.0, 0.1, None),
        # multiplicative models: rparam collapses embeddings on this KG
        # (all-equal scores => random MRR under the mean tie-break), and the
        # translation-generated latent KG structurally favors TransE —
        # DistMult is symmetric, so these are expected to trail here
        ("DistMult", DistMult(ds.n_entities, ds.n_relations, 150), 0.5, 0.3, 2048),
        ("ComplEx", ComplEx(ds.n_entities, ds.n_relations, 75), 0.5, 0.3, 2048),
        ("RotatE", RotatE(ds.n_entities, ds.n_relations, 75), 0.5, 0.3, 2048),
        # round-2 families: TransH/TransR/PairRE are translational refinements
        # (should track TransE on this KG); TuckER rides RESCAL's config;
        # SimplE/QuatE are multiplicative (DistMult-family caveats apply)
        ("TransH", TransH(ds.n_entities, ds.n_relations, 150), 1.0, 0.1, None),
        ("TransR", TransR(ds.n_entities, ds.n_relations, 64), 1.0, 0.1, None),
        ("PairRE", PairRE(ds.n_entities, ds.n_relations, 150), 1.0, 0.1, None),
        ("TuckER", TuckER(ds.n_entities, ds.n_relations, 100, rparam=0.01), 1.0, 0.1, None),
        ("SimplE", SimplE(ds.n_entities, ds.n_relations, 75), 0.5, 0.3, 2048),
        ("QuatE", QuatE(ds.n_entities, ds.n_relations, 38), 0.5, 0.3, 2048),
        # ConvE runs its canonical scheme instead of the pairwise pool:
        # reciprocal relations + object-direction 1-vs-all CE (ls=0.1) +
        # Adam (its paper optimizer — measured +36% over AdaGrad here)
        ("ConvE", None, 0.0, 1e-3, None),
    ]

    if args.sampler == "random-mode":
        # reference operating point: iid corruption, margin 0.2, lr 0.1
        configs = [(n, m, 0.2, 0.1, None) for n, m, _, _, _ in configs
                   if n != "ConvE"]
    if args.loss == "ce":
        # every model trains through its score_all_o eval kernel. rparam is
        # STRIPPED: under CE the optimizer applies full-table updates, so
        # row L2 decays every row every step and collapses the embeddings
        # (measured: TuckER rparam=0.01 -> MRR 0.0003). ComplEx gets its
        # canonical N3 (measured n3=1e-3); TuckER uses the measured
        # d=150 / rcomp=30 shape.
        from dataclasses import replace as _rp

        def _ce_model(n, m):
            if n == "ConvE":
                return None
            if n == "TuckER":
                return TuckER(ds.n_entities, 2 * ds.n_relations, 150,
                              rcomp=30)
            kw = {"n3": 1e-3} if n == "ComplEx" else {}
            if hasattr(m, "rparam"):
                kw["rparam"] = 0.0
            return _rp(m, n_relations=2 * ds.n_relations, **kw)

        configs = [
            (n, _ce_model(n, m), 0.0, 1e-3, None)
            for n, m, _, _, _ in configs
        ]
    if args.loss == "selfadv":
        # per-family selfadv gammas measured in RESULTS.md ("selfadv sweep
        # across families"); lr 0.3, k 8192 unless --k overrides
        gammas = {"TransE-L1": 6.0, "TransE-L2": 3.0, "TransH": 3.0,
                  "PairRE": 3.0, "HolE": 1.0}
        configs = [
            (n, m, gammas.get(n, 3.0), 0.3, args.k)
            for n, m, _, _, _ in configs if n != "ConvE"
        ]
    if args.models:
        want = {m.strip() for m in args.models.split(",")}
        configs = [c for c in configs if c[0] in want]
    rows = []
    needs_recip = args.loss == "ce" or any(c[0] == "ConvE" for c in configs)
    if needs_recip:
        from skge_tpu.data import add_reciprocal_relations

        aug = add_reciprocal_relations(ds)
        aug_xs = jnp.asarray(aug.train)
    for name, model, margin, lr, k in configs:
        eval_model = None  # default: evaluate the trained model directly
        if name == "ConvE" or args.loss == "ce":
            from skge_tpu import Adam, make_ce_step
            from skge_tpu.evaluation import ReciprocalEvalWrapper
            from skge_tpu.models import ConvE

            opt = Adam(lr=lr)
            if name == "ConvE":
                model = ConvE(aug.n_entities, aug.n_relations, 150)
            else:
                # canonical reciprocal protocol: head queries rank through
                # the inverse relation (the direction CE actually trained),
                # exactly as ConvE does internally
                eval_model = ReciprocalEvalWrapper(model)
            step = make_ce_step(model, opt, directions=("o",),
                                label_smoothing=0.1)
            train_xs = aug_xs
        else:
            opt = AdaGrad(lr=lr)
            if args.sampler == "random-mode":
                sampler = RandomModeSampler(
                    ds.n_entities, modes=(0, 1) * args.negatives
                )
            else:
                sampler = SharedNegativeSampler(ds.n_entities, k=k or args.k)
            if args.loss == "selfadv":
                from skge_tpu import make_selfadv_step

                step = make_selfadv_step(
                    model, opt, sampler, margin=margin,
                    alpha=args.adv_alpha, aggregate="dense",
                )
            else:
                step = make_pairwise_step(
                    model, opt, sampler, margin=margin, aggregate="dense"
                )
            train_xs = xs
        epoch = jax.jit(
            make_epoch_fn(step, int(train_xs.shape[0]), args.nbatches),
            donate_argnums=(0,),
        )
        state = init_state(model, opt, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            state, m = epoch(state, train_xs)
        np.asarray(m.loss)
        t_train = time.perf_counter() - t0
        ev = FilteredRankingEval(
            eval_model or model, ds.test, ds.all_triples(), batch_size=1024
        )
        r = ev(state.params)
        row = {
            "model": name, "epochs": args.epochs,
            "train_s": round(t_train, 1),
            "mrr": round(r.mrr, 4), "mrr_raw": round(r.mrr_raw, 4),
            "hits1": round(r.hits[1], 3), "hits3": round(r.hits[3], 3),
            "hits10": round(r.hits[10], 3), "mr": round(r.mean_rank, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:  # append incrementally so timeouts lose nothing
            tag = (
                f"iid x{args.negatives} m=0.2 lr=0.1"
                if args.sampler == "random-mode" else f"k={k or args.k}"
            )
            if args.loss == "selfadv":
                tag = f"selfadv g={margin} {tag}"
            elif args.loss == "ce" or name == "ConvE":
                tag = "CE+Adam reciprocal"
            header = (
                f"| {name} {tag} ep={args.epochs} | {row['mrr']} | "
                f"{row['mrr_raw']} | {row['hits1']} | {row['hits3']} | "
                f"{row['hits10']} | {row['mr']} | {row['train_s']} |\n"
            )
            with open(args.out, "a") as f:
                f.write(header)
    if args.out:
        print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
