"""OOC resident-candidate CE: measure the approximation cost (VERDICT r3
item 4).

`OutOfCoreTrainer(loss='ce')` computes the softmax over the RESIDENT
partitions' candidates — exact at P=1 (the full table is resident),
an approximation at P>1 (outofcore.py's documented bias). This A/B
quantifies that cost on the learnable translational latent KG at the
WN18 shape, matched budget and protocol (reciprocal + object-direction
CE ls=0.1 + Adam 1e-3, validation-selected checkpoint), and asks whether
OOC sampled-CE (resident-partition proposal, round-4) recovers it.

Arms: P=1 full CE (== single-device full CE bit-for-bit), P=2/P=4
resident CE, P=2/P=4 sampled CE (k=8192).

Usage:
    python scripts/ooc_ce_ab.py [--epochs 200] [--eval-every 20]
    python scripts/ooc_ce_ab.py --cpu --entities 500 ... (smoke)
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
    ap.add_argument("--ntrain", type=int, default=141442)
    ap.add_argument("--latent-dim", type=int, default=32)
    ap.add_argument("--dim", type=int, default=150)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--patience", type=int, default=3)
    ap.add_argument("--k", type=int, default=8192)
    ap.add_argument("--nbatches", type=int, default=100)
    ap.add_argument("--arms", default="ce:1,ce:2,ce:4,sampled_ce:2,sampled_ce:4")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from skge_tpu import Adam
    from skge_tpu.data import Dataset, add_reciprocal_relations, latent_kg
    from skge_tpu.models import DistMult
    from skge_tpu.outofcore import OutOfCoreTrainer

    n_held = min(5000, max(50, args.ntrain // 10))
    key = (f"translational-e{args.entities}-r{args.relations}"
           f"-t{args.ntrain}-h{n_held}-l{args.latent_dim}-s0")
    cache = os.path.join("/tmp", f"latent_kg_{key}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        ds = Dataset(train=z["train"], valid=z["valid"], test=z["test"],
                     n_entities=args.entities, n_relations=args.relations)
    else:
        ds = latent_kg(
            n_entities=args.entities, n_relations=args.relations,
            n_train=args.ntrain, n_valid=n_held, n_test=n_held,
            latent_dim=args.latent_dim, seed=0,
        )
        np.savez(cache, train=ds.train, valid=ds.valid, test=ds.test)
    aug = add_reciprocal_relations(ds)
    all_triples = aug.all_triples()

    rows = []
    for arm in args.arms.split(","):
        loss, p = arm.split(":")
        p = int(p)
        model = DistMult(aug.n_entities, aug.n_relations, args.dim)
        tr = OutOfCoreTrainer(
            model, Adam(lr=1e-3), aug.train, n_parts=p, k=args.k,
            nbatches=args.nbatches, seed=0, loss=loss,
            label_smoothing=0.1, ce_directions=("o",),
        )
        best = (-1.0, 0, None)
        bad, e = 0, 0
        t0 = time.perf_counter()
        while e < args.epochs:
            tr.fit(epochs=args.eval_every)
            e += args.eval_every
            vm = tr.evaluate(ds.valid, all_triples, batch_size=1024,
                             reciprocal=True).mrr
            print(json.dumps({"arm": arm, "epoch": e,
                              "valid_mrr": round(float(vm), 4)}),
                  flush=True)
            if vm > best[0]:
                # snapshot the host state (part files are the natural
                # format, but the full table is small at this shape)
                best = (vm, e, {kk: v.copy()
                                for kk, v in tr.e_host.items()})
                # dev_params buffers are DONATED by the jitted update —
                # a dict copy holds deleted arrays after the next fit();
                # snapshot to host memory instead
                best_dev = {kk: np.asarray(v).copy()
                            for kk, v in tr.dev_params.items()}
                bad = 0
            else:
                bad += 1
                if bad >= args.patience:
                    break
        # restore the best checkpoint for the test eval
        if best[2] is not None:
            tr._cache.clear()
            tr._lru.clear()
            for kk, v in best[2].items():
                tr.e_host[kk][:] = v
            import jax.numpy as jnp
            tr.dev_params = {kk: jnp.asarray(v)
                             for kk, v in best_dev.items()}
        r = tr.evaluate(ds.test, all_triples, batch_size=1024,
                        reciprocal=True)
        row = {
            "arm": arm, "n_parts": p, "best_epoch": best[1],
            "train_eval_s": round(time.perf_counter() - t0, 1),
            "mrr": round(r.mrr, 4), "hits10": round(r.hits[10], 3),
            "mr": round(r.mean_rank, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
