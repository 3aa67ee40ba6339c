"""One-client flagship campaign: 1M-shape lr probes, then the 10^7 run.

The axon TPU tunnel admits one client and takes ~6 min to release a slot
(NEXT.md operational notes), so the lr sweep and the final 10M run all
happen inside THIS process by calling `flagship_10m.main(argv)` —
no per-job tunnel-release tax, shared /tmp KG caches, shared jit caches
where shapes agree.

Probe protocol (NEXT.md round-4 advice): sweep lr at the 1M-entity
lattice shape (10^6 = 10^6 is a perfect 6th power, density 4 -> 4M
triples) with --eval-n 200, pick the best held-out filtered MRR, then run
the full 11.39M-entity flagship at that lr.

Usage:
    python scripts/flagship_autorun.py                      # the real thing
    python scripts/flagship_autorun.py --cpu --smoke        # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flagship_10m  # noqa: E402  (sibling script)


def run_one(argv, out):
    t0 = time.perf_counter()
    flagship_10m.main(argv + ["--out", out])
    with open(out) as f:
        report = json.loads(f.readlines()[-1])
    report["wall_s"] = round(time.perf_counter() - t0, 1)
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-lrs", default="1e-3,3e-3,1e-2")
    ap.add_argument("--probe-epochs", type=int, default=3)
    ap.add_argument("--final-epochs", type=int, default=4)
    ap.add_argument("--out", default=".flagship_r5.jsonl")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes for a CPU smoke of the campaign flow")
    args = ap.parse_args()

    base = ["--cpu"] if args.cpu else []
    if args.smoke:
        probe_shape = ["--entities", "4096", "--latent-dim", "6",
                       "--ntrain", "16000", "--nheld", "200",
                       "--dim", "16", "--parts", "2", "--k", "256",
                       "--nbatches", "8", "--eval-n", "50"]
        final_shape = ["--entities", "15625", "--latent-dim", "6",
                       "--ntrain", "62500", "--nheld", "200",
                       "--dim", "16", "--parts", "4", "--k", "256",
                       "--nbatches", "16", "--eval-n", "50"]
    else:
        probe_shape = ["--entities", "1000000", "--latent-dim", "6",
                       "--ntrain", "4000000", "--nheld", "2000",
                       "--parts", "4", "--eval-n", "200"]
        # flagship_10m defaults (11.39M entities / 45.6M triples) except
        # eval-n: 500 held-out queries keep the streamed-eval wall-clock
        # inside the shared-tunnel budget (cost ~ queries x n_e x d; the
        # 1M-shape 1000-query protocol point stays measured by the
        # r5_quick OOC re-time job) while the MRR standard error at the
        # >=100x-random bar stays far below the claim.
        final_shape = ["--eval-n", "500"]

    probes = []
    for lr in args.probe_lrs.split(","):
        rep = run_one(
            base + probe_shape
            + ["--lr", lr, "--epochs", str(args.probe_epochs),
               "--ckpt", f"/tmp/flagship_probe_{lr}"],
            args.out,
        )
        probes.append((float(lr), rep))
        print(json.dumps({"probe_lr": lr, "mrr": rep["mrr"],
                          "wall_s": rep["wall_s"]}), flush=True)

    best_lr, best = max(probes, key=lambda t: t[1]["mrr"])
    print(json.dumps({"chosen_lr": best_lr, "probe_mrr": best["mrr"]}),
          flush=True)

    final = run_one(
        base + final_shape
        + ["--lr", str(best_lr), "--epochs", str(args.final_epochs)],
        args.out,
    )
    print(json.dumps({"final_mrr": final["mrr"],
                      "final_wall_s": final["wall_s"]}), flush=True)


if __name__ == "__main__":
    main()
