"""Row-op speed-of-light microbenchmark (VERDICT r4 item 5).

The reference-exact iid training path (`bench.py --sampler random-mode`)
is row-OP-rate-bound on v5e, not FLOP-bound: the chip has no vector
gather/scatter engine (no SparseCore), so every index-driven row
movement pays the scalar-core dynamic-address pipeline (RESULTS.md
round-2 roofline). This script pins that claim with standalone numbers:

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
   per-pair gradient semantics.

TIMING METHODOLOGY (round-5 correction): the first recorded run timed
`dispatch; block_until_ready` per call and measured 0.2 ns/row — above
HBM bandwidth, i.e. impossible: over the axon tunnel
`block_until_ready` returns at ENQUEUE, not completion. Every op is now
timed as R data-dependency-CHAINED repetitions inside one jitted
`lax.fori_loop` (each iteration's indices/operands derive from the
previous carry through a non-foldable LCG perturbation, so XLA can
neither elide nor overlap them) and the wall clock closes with a 4-byte
device_get of a value computed FROM the final carry — one real
device-roundtrip amortized over R reps.

Run on the chip via scripts/chip_queue.sh; `--cpu` for a smoke run.
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--entities", type=int, default=14951)   # FB15k
    ap.add_argument("--dim", type=int, default=150)
    ap.add_argument("--batch", type=int, default=4831)       # ntrain/nbatches
    ap.add_argument("--negatives", type=int, default=8)
    ap.add_argument("--reps", type=int, default=100,
                    help="chained in-jit repetitions per timing sample")
    ap.add_argument("--iters", type=int, default=5,
                    help="outer samples (min taken)")
    ap.add_argument("--measured", type=float, default=None,
                    help="measured iid-path work-units/s to compare against "
                    "the derived bound (e.g. 76.3e6 for dense_pallas)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    n_e, d, b, n = args.entities, args.dim, args.batch, args.negatives
    R = args.reps
    # occurrence rows per step at the iid bench shape: every (positive,
    # mode, negative) pair touches its negative's E row; s/o/p rows
    # amortize across the positive's 2n pairs
    t_rows = b * (3 + 2 * n)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n_e, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n_e, t_rows).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(t_rows, d)).astype(np.float32))
    counts = jnp.ones((t_rows,), jnp.float32)

    def perturb(seed):
        # LCG step; output range [0, n_e) — not constant-foldable
        nxt = seed * jnp.int32(1103515245) + jnp.int32(12345)
        return nxt, jnp.abs(nxt) % jnp.int32(n_e)

    def timeit_chained(body, carry0, readout):
        """min over outer iters of (R chained in-jit reps); returns s/rep.

        `body(i, carry) -> carry` must thread a data dependency;
        `readout(carry) -> f32 scalar` is device_get'd to close the
        clock on real completion.
        """
        looped = jax.jit(
            lambda c: lax.fori_loop(0, R, body, c)
        )
        out = looped(carry0)          # compile + warm
        float(jax.device_get(readout(out)))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = looped(carry0)
            float(jax.device_get(readout(out)))
            best = min(best, time.perf_counter() - t0)
        return best / R

    recs = []

    def rec(op, sec_per_rep, rows_moved, note=""):
        r = {"op": op, "rows": int(rows_moved), "reps_chained": R,
             "ms": round(sec_per_rep * 1e3, 4),
             "ns_per_row": round(sec_per_rep / rows_moved * 1e9, 3)}
        if note:
            r["note"] = note
        recs.append(r)
        print(json.dumps(r), flush=True)
        return r["ns_per_row"]

    # 1. row gather: indices perturbed from the carry each rep; gathered
    # rows fold into the scalar carry so no rep is dead code
    def gather_body(i, c):
        seed, acc = c
        seed, off = perturb(seed)
        g = table[(idx + off) % n_e]
        return seed, acc + g[0, 0]

    ns_gather = rec(
        "gather",
        timeit_chained(gather_body, (jnp.int32(1), jnp.float32(0)),
                       lambda c: c[1]),
        t_rows,
    )

    # 2. XLA fused scatter-add (grads + count channel in ONE scatter —
    # the aggregate.segment_mean_dense layout); accumulates into the SAME
    # table across reps: natural read-after-write chaining
    aug0 = jnp.concatenate([rows, counts[:, None]], axis=1)

    def scatter_body(i, c):
        seed, tab = c
        seed, off = perturb(seed)
        return seed, tab.at[(idx + off) % n_e].add(aug0, mode="drop")

    ns_scatter = rec(
        "scatter_xla_fused",
        timeit_chained(
            scatter_body,
            (jnp.int32(1), jnp.zeros((n_e, d + 1), jnp.float32)),
            lambda c: c[1][0, 0],
        ),
        t_rows,
    )

    # 3. pallas VMEM scatter (single-chip kernel; skipped if the table
    # doesn't fit VMEM or backend is CPU)
    ns_scatter_pallas = None
    try:
        from skge_tpu.ops.pallas_segment import fits_in_vmem, segment_sum_pallas

        if not args.cpu and fits_in_vmem(n_e, d):
            def pallas_body(i, c):
                seed, acc = c
                seed, off = perturb(seed)
                out = segment_sum_pallas((idx + off) % n_e, rows, n_e)
                return seed, acc + out[0, 0]

            ns_scatter_pallas = rec(
                "scatter_pallas",
                timeit_chained(pallas_body,
                               (jnp.int32(1), jnp.float32(0)),
                               lambda c: c[1]),
                t_rows,
            )
    except Exception as e:  # pragma: no cover - capability probe
        print(json.dumps({"op": "scatter_pallas", "skipped": str(e)}),
              flush=True)

    # 4. sort (the dense_sorted path's first phase)
    def sort_body(i, c):
        seed, acc = c
        seed, off = perturb(seed)
        s = jnp.sort((idx + off) % n_e)
        return seed, acc + s[0]

    rec("sort_i32",
        timeit_chained(sort_body, (jnp.int32(1), jnp.int32(0)),
                       lambda c: c[1].astype(jnp.float32)),
        t_rows)

    # 5. sorted one-hot MXU aggregation (ops/sorted_segment). The ids
    # must stay sorted, so the chain perturbs the GRADS (scaled carry
    # added; not foldable) instead of the indices.
    try:
        from skge_tpu.ops.sorted_segment import segment_sum_sorted

        sidx = jnp.sort(idx)

        def ss_body(i, c):
            acc = c
            out = segment_sum_sorted(sidx, rows + acc * 1e-30, n_e)
            return out[0, 0]

        rec("segment_sum_sorted",
            timeit_chained(ss_body, jnp.float32(0), lambda c: c),
            t_rows)
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
    # bandwidth floor for context: each row moved is d*4 bytes read (+
    # written back on scatter) against v5e HBM ~819 GB/s
    bw_floor_ns = d * 4 / 819e9 * 1e9
    out = {
        "metric": "iid_rowop_bound",
        "value": round(bound / 1e6, 1),
        "unit": "M work-units/s",
        "ns_gather_per_row": ns_gather,
        "ns_scatter_per_row": best_scatter,
        "hbm_read_floor_ns_per_row": round(bw_floor_ns, 3),
        "negatives": n,
        "formula": "4n / ((3+2n)*(ns_gather+ns_scatter))",
    }
    if args.measured:
        out["measured_Mups"] = round(args.measured / 1e6, 1)
        out["measured_over_bound"] = round(args.measured / bound, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
