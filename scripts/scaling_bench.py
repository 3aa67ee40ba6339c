"""Multi-chip scaling-efficiency harness (SURVEY.md §7 step 5).

Weak scaling of the SPMD pairwise train step over a growing device mesh
(fixed per-device batch). Two regimes:

- **Real multi-chip slice** (no --cpu): per-device work is constant, so
  weak-scaling efficiency(N) = step_time(1) / step_time(N). North-star
  target >= 85% at N >= 2 (BASELINE.md).
- **Virtual CPU devices** (--cpu): all "devices" share the same physical
  cores, so efficiency is meaningless (total FLOPs cannot scale). The
  meaningful code-path metric is **SPMD overhead** = sharded-step time on
  the N-device mesh / unsharded single-device time on the SAME total
  batch: ideal 1.0; it isolates the cost GSPMD adds (collectives,
  partitioned scatters, replication). NOTE: on a 1-core host (this image)
  the N virtual devices serialize, and the shard_map design's deliberate
  compute duplication across the 'model' axis (parallel on real chips)
  serializes too — so CPU overhead conflates runtime serialization with
  collective cost. The gate (--max-overhead) therefore only catches
  egregious regressions; real efficiency needs a real slice. The PRIMARY
  hardware-independent regression tripwire is tests/test_collective_budget
  .py, which pins compiled-HLO collective bytes/step at measured + 10% —
  deterministic where this wall-clock gate drifts 40% between sessions
  (VERDICT round-2 weakness 2).

Usage:
    python scripts/scaling_bench.py --cpu --devices 8 --model transe
    python scripts/scaling_bench.py --cpu --sampler shared --k 256
    python scripts/scaling_bench.py            # on a real pod: efficiency
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
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--model", default="transe")
    ap.add_argument("--ncomp", type=int, default=64)
    ap.add_argument("--entities", type=int, default=20000)
    ap.add_argument("--relations", type=int, default=200)
    ap.add_argument("--per-device-batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sampler", default="random-mode",
                    choices=["random-mode", "shared"])
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--negatives", type=int, default=4)
    ap.add_argument("--impl", default="shardmap",
                    choices=["shardmap", "gspmd"],
                    help="SPMD implementation: explicit shard_map collectives"
                    " (parallel/shardmap_step.py) or GSPMD-inferred"
                    " (parallel/sharded.py)")
    ap.add_argument("--max-overhead", type=float, default=None,
                    help="[--cpu] pass gate on SPMD overhead vs unsharded; "
                    "default ratchets per impl (VERDICT r1 ask 10): "
                    "shardmap 2.8 (sessions measure 2.2-2.5), gspmd 4.5 "
                    "(3.2-4.4 -- XLA's generic sharded scatter lowering "
                    "plus virtual-device scheduling noise; the gate only "
                    "catches egregious regressions, real efficiency needs "
                    "a real slice)")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from skge_tpu import (
        AdaGrad, MODELS, RandomModeSampler, SharedNegativeSampler, init_state,
    )
    from skge_tpu.parallel import make_mesh, make_sharded_pairwise_step, shard_state
    from skge_tpu.parallel.shardmap_step import (
        make_shardmap_pairwise_step, shard_state_shardmap,
    )

    if args.impl == "shardmap":
        make_step, place = make_shardmap_pairwise_step, shard_state_shardmap
    else:
        make_step, place = make_sharded_pairwise_step, shard_state

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(args.devices, n_avail)]
    model = MODELS[args.model](args.entities, args.relations, args.ncomp)
    opt = AdaGrad(lr=0.1)
    if args.sampler == "shared":
        sampler = SharedNegativeSampler(args.entities, k=args.k)
        pairs_per_pos = 2 * args.k
    else:
        sampler = RandomModeSampler(args.entities, modes=(0, 1) * args.negatives)
        pairs_per_pos = 2 * args.negatives

    rng = np.random.default_rng(0)

    def make_batch(b):
        return (
            jnp.asarray(
                np.stack(
                    [rng.integers(0, args.entities, b),
                     rng.integers(0, args.entities, b),
                     rng.integers(0, args.relations, b)], axis=1
                ).astype(np.int32)
            ),
            jnp.ones(b, jnp.float32),
        )

    def time_step(step_fn, state, batch, mask):
        state, m = step_fn(state, batch, mask)  # compile
        np.asarray(m.loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step_fn(state, batch, mask)
        np.asarray(m.loss)
        return (time.perf_counter() - t0) / args.steps

    t1 = None
    results = []
    for n in sizes:
        # default shape: ('data' = n/2, 'model' = 2) for even n — entity
        # tables row-sharded 2-way, batch data-parallel (see parallel.mesh)
        mesh = make_mesh(jax.devices()[:n])
        step = make_step(model, opt, sampler, 1.0, mesh)
        b = args.per_device_batch * n
        batch, mask = make_batch(b)
        state = place(
            init_state(model, opt, jax.random.PRNGKey(0)), model, mesh
        )
        dt = time_step(step, state, batch, mask)
        rec = {
            "devices": n,
            "total_batch": b,
            "step_ms": round(dt * 1e3, 2),
            "scored_triples_per_s": round(2 * pairs_per_pos * b / dt, 1),
        }
        if args.cpu:
            # unsharded single-device step on the SAME total batch
            mesh1 = make_mesh(jax.devices()[:1], shape=(1, 1))
            step1 = make_step(model, opt, sampler, 1.0, mesh1)
            state1 = place(
                init_state(model, opt, jax.random.PRNGKey(0)), model, mesh1
            )
            dt1 = time_step(step1, state1, batch, mask)
            rec["spmd_overhead"] = round(dt / dt1, 4)
        else:
            t1 = dt if t1 is None else t1
            rec["efficiency"] = round(t1 / dt, 4)
        results.append(rec)
        print(json.dumps(rec))

    if args.cpu:
        worst = max(r["spmd_overhead"] for r in results)
        gate = args.max_overhead
        if gate is None:
            gate = {"shardmap": 2.8, "gspmd": 4.5}[args.impl]
        ok = worst <= gate
        summary = {
            "metric": "spmd_overhead_vs_unsharded",
            "impl": args.impl,
            "backend": "cpu-virtual",
            "target": gate,
            "worst": worst,
            "pass": ok,
            "note": "efficiency unmeasurable on shared-core virtual devices;"
            " run on a real slice for weak-scaling efficiency",
        }
    else:
        worst = min((r["efficiency"] for r in results[1:]), default=1.0)
        ok = worst >= 0.85
        summary = {
            "metric": "weak_scaling_efficiency",
            "impl": args.impl,
            "backend": jax.devices()[0].platform,
            "target": 0.85,
            "worst": worst,
            "pass": ok,
        }
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
