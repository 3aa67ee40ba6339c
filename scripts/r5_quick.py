"""One-client round-5 quick campaign: four chip measurements, ONE tunnel
client (the axon tunnel admits one client and takes ~6 min to release a
slot — NEXT.md operational notes), each stage fault-isolated and writing
its artifact into the REPO (never /tmp, which is wiped between sessions):

1. rowop_bench            -> .rowop_r5.jsonl        (VERDICT r4 item 5)
2. bench.py --all         -> .bench_matrix_r05.jsonl (item 4)
3. CE-headline seeds 1,2  -> .seeds_ce_r5.jsonl      (item 3, RESCAL /
   TransE-L2 on the bilinear KG, same 100-ep fixed CE protocol as the
   seed-0 rows in RESULTS.md "Under the CE protocol")
4. OOC eval re-time       -> .ooc_retime_r5.jsonl    (item 7, same 1M
   shape as the round-4 552 s measurement: DistMult d=64 P=4 k=8192,
   4M train triples, 1000-query streamed eval)

A stage that raises is logged to .r5_quick_status.jsonl and the campaign
moves on. Usage: python scripts/r5_quick.py [--cpu --smoke]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, HERE)
sys.path.insert(0, ROOT)

STATUS = os.path.join(ROOT, ".r5_quick_status.jsonl")


class Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def status(**kw):
    kw["ts"] = round(time.time(), 1)
    with open(STATUS, "a") as f:
        f.write(json.dumps(kw) + "\n")


class JsonLineSink(io.TextIOBase):
    """Append every parseable JSON-dict stdout line to `path` AS IT
    PRINTS — a stage killed mid-run (timeout / tunnel wedge) keeps the
    rows it already produced."""

    def __init__(self, path, extra=None):
        self.path, self.extra, self._buf = path, extra, ""

    def write(self, s):
        self._buf += s
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            try:
                r = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(r, dict):
                if self.extra:
                    r.update(self.extra)
                with open(self.path, "a") as f:
                    f.write(json.dumps(r) + "\n")
        return len(s)

    def flush(self):
        pass


def run_stage(name, fn, artifact=None, extra=None):
    """Run fn(); stream its JSON stdout lines into `artifact` live."""
    t0 = time.perf_counter()
    status(stage=name, event="start")
    buf = io.StringIO()
    sinks = [sys.__stdout__, buf]
    if artifact:
        sinks.append(JsonLineSink(os.path.join(ROOT, artifact), extra))
    try:
        with contextlib.redirect_stdout(Tee(*sinks)):
            fn()
    except SystemExit as e:
        if e.code not in (0, None):
            status(stage=name, event="error", rc=e.code,
                   tail=buf.getvalue()[-1500:])
            return False
    except Exception:
        status(stage=name, event="error",
               tb=traceback.format_exc()[-2000:],
               tail=buf.getvalue()[-1500:])
        return False
    status(stage=name, event="done",
           wall_s=round(time.perf_counter() - t0, 1))
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes to smoke the campaign flow on CPU")
    ap.add_argument("--stages", default="rowop,seeds,ooc,bench",
                    help="comma subset of {rowop,bench,seeds,ooc}")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    cpu = ["--cpu"] if args.cpu else []

    if "rowop" in stages:
        import rowop_bench

        def do_rowop():
            # 76.3e6: the round-3 pallas iid-path measurement
            # (RESULTS.md "iid aggregation roofline") the bound is
            # compared against.
            argv = ["rowop_bench.py", "--measured", "76.3e6"] + cpu
            if args.smoke:
                argv += ["--entities", "2000", "--batch", "256"]
            sys.argv = argv
            rowop_bench.main()

        run_stage("rowop", do_rowop, ".rowop_r5.jsonl")

    if "seeds" in stages:
        import quality_suite

        # RESULTS.md "Under the CE protocol" seed-0 rows: bilinear KG
        # (latent 8), 40,943 entities, 327,544 train (8/entity), d=32,
        # reciprocal full CE, 100 epochs fixed. Seeds 1 and 2 complete
        # the mean±sd VERDICT r4 item 3 asks for.
        for seed in (1, 2):
            qs = ["--kg", "bilinear", "--entities", "40943",
                  "--relations", "18", "--ntrain", "327544",
                  "--latent-dim", "8", "--dim", "32", "--loss", "ce",
                  "--epochs", "100",
                  "--models", "RESCAL,TransE-L2",
                  "--train-seed", str(seed)] + cpu
            if args.smoke:
                qs[qs.index("--entities") + 1] = "300"
                qs[qs.index("--ntrain") + 1] = "2400"
                qs[qs.index("--epochs") + 1] = "4"
            run_stage(f"seeds_ce_{seed}",
                      lambda qs=qs: quality_suite.main(qs),
                      ".seeds_ce_r5.jsonl", extra={"train_seed": seed})

    if "ooc" in stages:
        import flagship_10m

        def do_ooc():
            argv = ["--entities", "1000000", "--ntrain", "4000000",
                    "--nheld", "5000", "--model", "distmult",
                    "--parts", "4", "--epochs", "2",
                    "--ckpt", "/tmp/ooc_retime_ckpt"] + cpu
            if args.smoke:
                argv = ["--entities", "4096", "--latent-dim", "6",
                        "--ntrain", "16000", "--nheld", "200",
                        "--dim", "16", "--parts", "2", "--k", "256",
                        "--nbatches", "8", "--eval-n", "50",
                        "--model", "distmult", "--epochs", "1",
                        "--ckpt", "/tmp/ooc_retime_ckpt"] + cpu
            flagship_10m.main(argv)

        run_stage("ooc_retime", do_ooc, ".ooc_retime_r5.jsonl")

    if "bench" in stages:
        # LAST on purpose: the longest stage (20 matrix rows, each with
        # its own compiles) is the one a round-end truncation should hit;
        # JsonLineSink keeps every completed row either way.
        import bench

        def do_bench():
            argv = ["bench.py", "--all"] + cpu
            if args.smoke:
                argv += ["--entities", "2000", "--relations", "20",
                         "--ntrain", "10000", "--nbatches", "4",
                         "--epochs", "1"]
            sys.argv = argv
            bench.main()

        run_stage("bench_all", do_bench, ".bench_matrix_r05.jsonl")

    status(stage="campaign", event="drained")


if __name__ == "__main__":
    main()
