"""Compiled-HLO evidence of collective/compute overlap in the partitioned
step (SURVEY.md §7 hard part (e): boundary exchange overlapped with
scoring).

Multi-chip TPU hardware is not reachable from this container, but the TPU
compiler is: `jax.experimental.topologies.get_topology_desc` gives an
AOT compile-only target (here a v5e 2x4 slice), and the POST-SCHEDULING
HLO it returns lists ops in execution order, with each async collective
split into `async-collective-start` / `async-collective-done` and
`estimated_cycles` attached to every compute fusion. Overlap is then a
measurable property of the schedule: the sum of compute cycles issued
between a collective's start and its done is work the chip performs
while the ICI transfer is in flight.

Usage:
    python scripts/inspect_overlap.py [--boundary-cap C] [--no-overlap]

Prints, per collective in the step schedule: kind, payload bytes, and
overlapped compute cycles; then a totals line. `--no-overlap` compiles
the step with `overlap=False` (strictly phased exchange) for an A/B of
the schedules. The async conversion needs the async-collective-fusion
flags below — they are the same flags `parallel.partitioned` documents
for production runs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skge_tpu.utils.hloparse import analyze  # noqa: E402  (shared parser —
# also drives the hardware-independent collective-bytes budget gate in
# tests/test_collective_budget.py)

ASYNC_FLAGS = {
    "xla_tpu_enable_async_collective_fusion": "true",
    "xla_tpu_async_collective_fusion_with_start_done_only": "true",
    "xla_tpu_async_collective_fusion_fuse_multiple_collectives": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_reduce": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_reduce_scatter": "true",
    "xla_tpu_enable_async_all_to_all": "true",
}

def build_step(boundary_cap: int, overlap: bool, ragged: bool = False,
               loss: str = "margin", d: int = 128, k: int = 512,
               L: int = 2048, s_rows: int = 4096,
               directions: tuple = ("o", "s")):
    import jax

    # keep every runtime array on CPU: the AOT TPU compile only needs the
    # compiler (topology backend), and lowering materializes closure
    # constants — fetching those from a remote-tunneled chip can hang
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import jax.numpy as jnp
    from skge_tpu import AdaGrad, TransE
    from skge_tpu.parallel.partitioned import (
        SHARD_AXIS,
        RelabeledPoolSampler,
        make_partitioned_pairwise_step,
        make_partitioned_sampled_ce_step,
        make_partitioned_selfadv_step,
        partitioned_state_specs,
    )
    from skge_tpu.training import TrainState

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    mesh = Mesh(np.asarray(topo.devices), (SHARD_AXIS,))
    p_ = 8
    s_rows = max(s_rows, boundary_cap)
    n_e = p_ * s_rows
    model = TransE(n_entities=n_e, n_relations=64, ncomp=d)
    opt = AdaGrad(lr=0.1)
    sampler = RelabeledPoolSampler(np.arange(n_e), k=k)
    if loss == "selfadv":
        step = make_partitioned_selfadv_step(
            model, opt, sampler, 1.0, mesh,
            boundary_cap=boundary_cap, overlap=overlap, ragged=ragged,
        )
    elif loss == "sampled_ce":
        step = make_partitioned_sampled_ce_step(
            model, opt, sampler, mesh, directions=directions,
            boundary_cap=boundary_cap, overlap=overlap, ragged=ragged,
        )
    else:
        step = make_partitioned_pairwise_step(
            model, opt, sampler, 1.0, mesh,
            boundary_cap=boundary_cap, overlap=overlap, ragged=ragged,
        )
    _, _, spec = partitioned_state_specs(model, opt)
    sh = jax.tree.map(
        lambda sp: NamedSharding(mesh, sp), spec,
        is_leaf=lambda x: isinstance(x, P),
    )

    def sds(shape, dt, s):
        return jax.ShapeDtypeStruct(shape, dt, sharding=s)

    state = TrainState(
        params={"E": sds((n_e, d), jnp.float32, sh.params["E"]),
                "R": sds((64, d), jnp.float32, sh.params["R"])},
        opt_state={"E": {"p2": sds((n_e, d), jnp.float32, sh.params["E"])},
                   "R": {"p2": sds((64, d), jnp.float32, sh.params["R"])}},
        key=sds((2,), jnp.uint32, sh.key),
        step=sds((), jnp.int32, sh.step),
    )
    batch = sds((p_, L, 3), jnp.int32,
                NamedSharding(mesh, P(SHARD_AXIS, None, None)))
    mask = sds((p_, L), jnp.float32, NamedSharding(mesh, P(SHARD_AXIS)))
    return step.lower(state, batch, mask).compile(compiler_options=ASYNC_FLAGS)


def sweep(caps, dims, k, L, loss="margin", directions=("o", "s")):
    """Bytes-vs-hidden-cycles crossover table: dense+overlap vs ragged for
    each (d, C), compiled-evidence decision next to the `choose_exchange`
    cost-model prediction that `PartitionedTrainer(exchange='auto')` uses
    (VERDICT r2 item 8). Exposed-cycle accounting:

      dense:  per async collective max(0, bytes/ICI_BPC - overlapped_cycles),
              summed; sync collectives fully exposed.
      ragged: ragged buffers are static (P*C*d); expected transfer is
              buffer/P (uniform owners), synchronous => fully exposed, plus
              the fixed per-op latency the cost model carries.
    """
    import json

    from skge_tpu.parallel.partitioned import (
        ICI_BYTES_PER_CYCLE, RAGGED_LATENCY_CYCLES, choose_exchange,
    )

    p_ = 8
    rows = []
    for d in dims:
        for cap in caps:
            exposed = {}
            detail = {}
            for mode in ("dense", "ragged"):
                compiled = build_step(
                    cap, overlap=True, ragged=(mode == "ragged"),
                    d=d, k=k, L=L, loss=loss, directions=directions,
                )
                recs, sync = analyze(compiled.as_text())
                exp = 0.0
                bytes_total = 0
                for r in recs:
                    exp += max(
                        0.0, r["bytes"] / ICI_BYTES_PER_CYCLE
                        - r["overlap_cycles"]
                    )
                    bytes_total += r["bytes"]
                n_ragged = 0
                for r in sync:
                    if "ragged" in r["kind"]:
                        exp += (r["bytes"] / p_) / ICI_BYTES_PER_CYCLE
                        bytes_total += r["bytes"] // p_
                        n_ragged += 1
                    else:
                        exp += r["bytes"] / ICI_BYTES_PER_CYCLE
                        bytes_total += r["bytes"]
                if n_ragged:
                    exp += RAGGED_LATENCY_CYCLES
                exposed[mode] = exp
                detail[mode] = {
                    "bytes": bytes_total,
                    "overlapped_cycles": sum(
                        r["overlap_cycles"] for r in recs
                    ),
                }
            evidence = (
                "ragged" if exposed["ragged"] < exposed["dense"] else "dense"
            )
            n_modes = len(directions) if loss == "sampled_ce" else 2
            predicted, report = choose_exchange(
                d=d, cap=cap, k=k, batch_per_shard=L, p=p_, n_modes=n_modes,
            )
            row = {
                "loss": loss, "n_modes": n_modes,
                "d": d, "cap": cap, "k": k, "L": L,
                "dense_bytes": detail["dense"]["bytes"],
                "dense_overlapped_cycles":
                    detail["dense"]["overlapped_cycles"],
                "dense_exposed_cycles": round(exposed["dense"]),
                "ragged_bytes_expected": detail["ragged"]["bytes"],
                "ragged_exposed_cycles": round(exposed["ragged"]),
                "evidence_choice": evidence,
                "model_choice": predicted,
                "agree": evidence == predicted,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    n_agree = sum(r["agree"] for r in rows)
    print(f"# cost model agrees with compiled evidence on "
          f"{n_agree}/{len(rows)} configs")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--boundary-cap", type=int, default=256)
    ap.add_argument("--no-overlap", action="store_true")
    ap.add_argument("--ragged", action="store_true",
                    help="owner-routed ragged_all_to_all boundary exchange "
                    "(P-fold exchange-volume reduction)")
    ap.add_argument("--dump", default=None, help="write full HLO here")
    ap.add_argument("--loss", default="margin",
                    choices=["margin", "selfadv", "sampled_ce"])
    ap.add_argument("--reciprocal", action="store_true",
                    help="[--loss sampled_ce] object-direction only "
                    "(halves the hideable pool compute)")
    ap.add_argument("--sweep", action="store_true",
                    help="dense-vs-ragged crossover table over (d, C) "
                    "(12 AOT compiles; see `sweep`)")
    ap.add_argument("--sweep-caps", default="256,2048,8192")
    ap.add_argument("--sweep-dims", default="64,256")
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()
    directions = ("o",) if args.reciprocal else ("o", "s")
    if args.sweep:
        sweep([int(c) for c in args.sweep_caps.split(",")],
              [int(d) for d in args.sweep_dims.split(",")],
              args.k, args.batch, loss=args.loss, directions=directions)
        return
    compiled = build_step(args.boundary_cap, overlap=not args.no_overlap,
                          ragged=args.ragged, loss=args.loss,
                          directions=directions)
    hlo = compiled.as_text()
    if args.dump:
        open(args.dump, "w").write(hlo)
    records, sync = analyze(hlo)
    print(f"{'kind':<20}{'bytes':>12}{'overlap cycles':>16}{'ops inside':>12}")
    if any("ragged" in r["kind"] for r in records + sync):
        print("(ragged-all-to-all 'bytes' = static output BUFFER; actual "
              "transfer = sum of dynamic send_sizes, ~P-fold smaller)")
    tot = 0
    for r in sorted(records, key=lambda r: -r["bytes"]):
        print(f"{r['kind']:<20}{r['bytes']:>12}{r['overlap_cycles']:>16}"
              f"{r['ops_between']:>12}")
        tot += r["overlap_cycles"]
    for r in sorted(sync, key=lambda r: -r["bytes"]):
        print(f"{r['kind'] + ' (SYNC)':<20}{r['bytes']:>12}{'-':>16}{'-':>12}")
    n_async = len(records)
    n_sync = len(sync)
    big_sync = sum(1 for r in sync if r["bytes"] >= 1 << 20)
    print(f"\nasync collectives: {n_async}; sync: {n_sync} "
          f"(>=1MiB sync: {big_sync}); total overlapped compute cycles: {tot}")
    if not args.no_overlap and big_sync:
        print("WARNING: large collectives remain synchronous", file=sys.stderr)


if __name__ == "__main__":
    main()
