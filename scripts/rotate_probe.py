"""RotatE mechanism probe on the rotational latent KG (VERDICT r3 item 1).

Round 3 measured RotatE at 0.0106 filtered MRR vs ComplEx 0.0463 on the KG
that is by construction EXACTLY RotatE-realizable. Two init-scale suspects
(models/rotate.py):

1. nunif phases are U(-0.42, 0.42) — all 18 relations start as near-identity
   rotations (the paper uses U(-pi, pi): distinct rotations from step 0);
2. nunif entities are U(-0.012, 0.012) — initial squared distances ~1e-4
   while the selfadv gamma is 1.5-6 (the paper couples the entity range to
   gamma: b = (gamma + 2) / d).

This probe A/Bs `gamma_init` (the paper init, models/rotate.py) against the
default across a gamma grid under the shared selfadv protocol, and logs the
entity-norm / phase-spread trajectories that separate the two hypotheses.

Usage:
    python scripts/rotate_probe.py                  # full scale, cached KG
    python scripts/rotate_probe.py --cpu --entities 2000 --ntrain 16000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=40943)
    ap.add_argument("--relations", type=int, default=18)
    ap.add_argument("--ntrain", type=int, default=327544)
    ap.add_argument("--latent-dim", type=int, default=16)
    ap.add_argument("--ncomp", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--patience", type=int, default=3)
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--gammas", default="3,6,12")
    ap.add_argument("--variants", default="paper,nunif",
                    help="comma subset of paper,nunif,mixed,oracle")
    ap.add_argument("--alpha", type=float, default=2.0)
    ap.add_argument("--lr", type=float, default=0.3)
    ap.add_argument("--nbatches", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from skge_tpu import (
        AdaGrad, SharedNegativeSampler, init_state, make_epoch_fn,
        make_selfadv_step,
    )
    from skge_tpu.data import Dataset, latent_kg
    from skge_tpu.evaluation import FilteredRankingEval
    from skge_tpu.models import RotatE

    n_held = min(5000, max(50, args.ntrain // 10))
    key = (f"rotational-e{args.entities}-r{args.relations}-t{args.ntrain}"
           f"-h{n_held}-l{args.latent_dim}-s0")
    cache = os.path.join("/tmp", f"latent_kg_{key}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        ds = Dataset(train=z["train"], valid=z["valid"], test=z["test"],
                     n_entities=args.entities, n_relations=args.relations)
    else:
        ds = latent_kg(
            n_entities=args.entities, n_relations=args.relations,
            n_train=args.ntrain, n_valid=n_held, n_test=n_held,
            latent_dim=args.latent_dim, seed=0, kind="rotational",
        )
        np.savez(cache, train=ds.train, valid=ds.valid, test=ds.test)
    xs = jnp.asarray(ds.train)
    all_triples = ds.all_triples()

    def diag(params):
        E, R = np.asarray(params["E"]), np.asarray(params["R"])
        return {
            "e_norm": round(float(np.linalg.norm(E, axis=1).mean()), 4),
            "phase_sd": round(float(R.std()), 4),
        }

    def oracle_params(ncomp):
        """The GENERATOR's latents as model parameters (same rng stream as
        data.latent_kg kind='rotational'; eval at this point gives MRR
        ~0.87 / H@10 1.0 — realizability is proven, so any training-run
        shortfall is pure optimization). Extra complex dims (ncomp >
        latent/2) pad with zeros: rotations act on zeros, distances
        unchanged."""
        rng = np.random.default_rng(0)
        Z = rng.normal(size=(args.entities, args.latent_dim)).astype(
            np.float32)
        Z /= np.maximum(np.linalg.norm(Z, axis=1, keepdims=True), 1.0)
        Rel = rng.uniform(
            -np.pi, np.pi, size=(args.relations, args.latent_dim // 2)
        ).astype(np.float32)
        h = args.latent_dim // 2
        pad = ncomp - h
        if pad < 0:
            raise SystemExit("--ncomp must be >= latent_dim/2 for oracle")
        a, b = Z[:, :h], Z[:, h:]
        ze = np.zeros((args.entities, pad), np.float32)
        zr = np.zeros((args.relations, pad), np.float32)
        return {
            "E": jnp.asarray(np.concatenate([a, ze, b, ze], axis=1)),
            "R": jnp.asarray(np.concatenate([Rel, zr], axis=1)),
        }

    def run(tag, model, gamma, oracle=False):
        opt = AdaGrad(lr=args.lr)
        sampler = SharedNegativeSampler(ds.n_entities, k=args.k)
        step = make_selfadv_step(model, opt, sampler, margin=gamma,
                                 alpha=args.alpha, aggregate="dense")
        epoch = jax.jit(
            make_epoch_fn(step, int(xs.shape[0]), args.nbatches),
            donate_argnums=(0,),
        )
        state = init_state(model, opt, jax.random.PRNGKey(0))
        if oracle:
            state = state._replace(params=oracle_params(args.ncomp))
        d0 = diag(state.params)
        val_ev = FilteredRankingEval(model, ds.valid, all_triples,
                                     batch_size=1024)
        best = (-1.0, 0, None)
        bad, e, t0 = 0, 0, time.perf_counter()
        while e < args.epochs:
            state, m = epoch(state, xs)
            e += 1
            if e % args.eval_every == 0 or e == args.epochs:
                vm = val_ev(state.params).mrr
                print(json.dumps({"tag": tag, "epoch": e,
                                  "valid_mrr": round(float(vm), 4),
                                  **diag(state.params)}), flush=True)
                if vm > best[0]:
                    best = (vm, e, jax.tree.map(jnp.copy, state.params))
                    bad = 0
                else:
                    bad += 1
                    if bad >= args.patience:
                        break
        params = best[2] if best[2] is not None else state.params
        test_ev = FilteredRankingEval(model, ds.test, all_triples,
                                      batch_size=1024)
        r = test_ev(params)
        row = {
            "tag": tag, "gamma": gamma, "best_epoch": best[1],
            "train_s": round(time.perf_counter() - t0, 1),
            "mrr": round(r.mrr, 4), "hits10": round(r.hits[10], 3),
            "mr": round(r.mean_rank, 1),
            "init": d0, "final": diag(params),
        }
        print(json.dumps(row), flush=True)
        return row

    gammas = [float(g) for g in args.gammas.split(",")]
    variants = [v for v in args.variants.split(",") if v]
    rows = []
    for g in gammas:
        if "paper" in variants:
            rows.append(run(
                f"paper-init g={g}",
                RotatE(ds.n_entities, ds.n_relations, args.ncomp,
                       gamma_init=g),
                g,
            ))
        if "nunif" in variants:
            rows.append(run(
                f"nunif g={g}",
                RotatE(ds.n_entities, ds.n_relations, args.ncomp,
                       phase_init="nunif"),
                g,
            ))
        if "mixed" in variants:
            # isolate the phase-spread mechanism: entities keep the nunif
            # scale that works, ONLY phases start at the generator's
            # uniform(-pi, pi) distribution
            rows.append(run(
                f"uniform-phase g={g}",
                RotatE(ds.n_entities, ds.n_relations, args.ncomp,
                       phase_init="uniform"),
                g,
            ))
        if "oracle" in variants:
            # train selfadv FROM the generator's own latents: does the
            # loss hold the realizable optimum or walk away from it?
            rows.append(run(
                f"oracle-init g={g}",
                RotatE(ds.n_entities, ds.n_relations, args.ncomp),
                g, oracle=True,
            ))
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
