"""Row-op speed-of-light microbenchmark (VERDICT r4 item 5).

The reference-exact iid training path (`bench.py --sampler random-mode`)
is row-OP-rate-bound on v5e, not bandwidth- or FLOP-bound: the chip has
no vector gather/scatter engine (no SparseCore), so every index-driven
row movement pays the scalar-core dynamic-address pipeline
(RESULTS.md round-2 roofline). This script pins that claim with
standalone numbers:

1. measures the primitive rates (ns/row) at the iid bench's own shapes —
   row GATHER `table[idx]`, XLA fused SCATTER-ADD (grads + count channel,
   `ops/aggregate.segment_mean_dense` semantics), the pallas VMEM scatter
   (`ops/pallas_segment.segment_sum_pallas`), the sorted one-hot MXU path
   (`ops/sorted_segment`), and the sort itself;
2. derives the implied work-unit bound for the iid row. Per positive with
   n negatives per mode and 2 modes: 3 + 2n row gathers (s, o, p rows +
   negative rows) and the same count of scatter rows, for 4n work units
   (2 scores per ranked pair, the reference accounting) =>

       bound = 4n / ((3 + 2n) * (ns_gather + ns_scatter))

   This is OPTIMISTIC: it prices ONLY index-driven row movement, with
   scoring/backward VPU work, sampling, and optimizer sqrt/divide all
   free, so it upper-bounds any implementation that keeps reference
   per-pair gradient semantics;
3. prints measured-path/bound so the gap is one number. One JSON line
   per record.

Run on the chip via scripts/chip_queue.sh; `--cpu` for a smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30, warmup=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--entities", type=int, default=14951)   # FB15k
    ap.add_argument("--dim", type=int, default=150)
    ap.add_argument("--batch", type=int, default=4831)       # ntrain/nbatches
    ap.add_argument("--negatives", type=int, default=8)
    ap.add_argument("--measured", type=float, default=None,
                    help="measured iid-path work-units/s to compare against "
                    "the derived bound (e.g. 76.3e6 for dense_pallas)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n_e, d, b, n = args.entities, args.dim, args.batch, args.negatives
    # occurrence rows per step at the iid bench shape: every (positive,
    # mode, negative) pair touches its negative's E row; s/o/p rows
    # amortize across the positive's 2n pairs
    t_rows = b * (3 + 2 * n)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n_e, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_e, t_rows).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(t_rows, d)).astype(np.float32))
    counts = jnp.ones((t_rows,), jnp.float32)

    recs = []

    def rec(op, seconds, rows_moved, note=""):
        r = {"op": op, "rows": int(rows_moved), "ms": round(seconds * 1e3, 3),
             "ns_per_row": round(seconds / rows_moved * 1e9, 2)}
        if note:
            r["note"] = note
        recs.append(r)
        print(json.dumps(r), flush=True)
        return r["ns_per_row"]

    # 1. row gather
    gather = jax.jit(lambda t, i: t[i])
    ns_gather = rec("gather", timeit(gather, table, idx), t_rows)

    # 2. XLA fused scatter-add (grads + count channel in ONE scatter —
    # the aggregate.segment_mean_dense layout)
    @jax.jit
    def scatter_fused(i, g, c):
        aug = jnp.concatenate([g, c[:, None]], axis=1)
        return jnp.zeros((n_e, d + 1), jnp.float32).at[i].add(
            aug, mode="drop"
        )

    ns_scatter = rec("scatter_xla_fused", timeit(scatter_fused, idx, rows,
                                                 counts), t_rows)

    # 3. pallas VMEM scatter (single-chip kernel; falls back if the table
    # doesn't fit VMEM or backend is CPU)
    ns_scatter_pallas = None
    try:
        from skge_tpu.ops.pallas_segment import fits_in_vmem, segment_sum_pallas

        if not args.cpu and fits_in_vmem(n_e, d):
            pl = jax.jit(
                lambda i, g: segment_sum_pallas(i, g, n_e)
            )
            ns_scatter_pallas = rec(
                "scatter_pallas", timeit(pl, idx, rows), t_rows
            )
    except Exception as e:  # pragma: no cover - capability probe
        print(json.dumps({"op": "scatter_pallas", "skipped": str(e)}),
              flush=True)

    # 4. sort (the dense_sorted path's first phase)
    srt = jax.jit(lambda i: jnp.sort(i))
    rec("sort_i32", timeit(srt, idx), t_rows)

    # 5. sorted one-hot MXU aggregation (ops/sorted_segment; timed on
    # presorted ids — the full dense_sorted pipeline adds the sort and
    # the gather-into-sorted-order measured above)
    try:
        from skge_tpu.ops.sorted_segment import segment_sum_sorted

        sidx = jnp.sort(idx)
        ss = jax.jit(lambda i, g: segment_sum_sorted(i, g, n_e))
        rec("segment_sum_sorted", timeit(ss, sidx, rows), t_rows)
    except Exception as e:  # pragma: no cover - optional path
        print(json.dumps({"op": "segment_sum_sorted", "skipped": str(e)}),
              flush=True)

    # derived bound: 4n work units per positive over (3+2n) gather +
    # (3+2n) scatter rows (row movement only; all compute free)
    best_scatter = min(
        x for x in (ns_scatter, ns_scatter_pallas) if x is not None
    )
    ns_per_positive = (3 + 2 * n) * (ns_gather + best_scatter)
    bound = 4 * n / (ns_per_positive * 1e-9)
    out = {
        "metric": "iid_rowop_bound",
        "value": round(bound / 1e6, 1),
        "unit": "M work-units/s",
        "ns_gather_per_row": ns_gather,
        "ns_scatter_per_row": best_scatter,
        "negatives": n,
        "formula": "4n / ((3+2n)*(ns_gather+ns_scatter))",
    }
    if args.measured:
        out["measured_Mups"] = round(args.measured / 1e6, 1)
        out["measured_over_bound"] = round(args.measured / bound, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
