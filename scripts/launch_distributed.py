"""Multi-process launcher for the distributed training path.

Two modes (SURVEY.md §2.3 "Communication backend" — build-scope; the
reference is single-process NumPy and has no counterpart):

1. **Local gang** (testing / single host with several accelerators or
   virtual CPU devices): spawn N ranks of any skge_tpu script on this
   machine, wiring `SKGE_COORDINATOR` / `SKGE_NUM_PROCESSES` /
   `SKGE_PROCESS_ID` so the script's `distributed.initialize()` call
   joins them into one JAX gang (Gloo collectives on CPU; ICI on a real
   multi-chip host):

       python scripts/launch_distributed.py --nproc 2 \
           --devices-per-proc 2 -- python my_train.py --args...

2. **Pod slice**: run the SAME training script once per host with the
   env vars pointing at host 0 (or nothing at all on TPU pods, where
   `jax.distributed.initialize()` auto-detects topology); this launcher
   just documents the contract, it does not ssh.

The child script only needs:

    from skge_tpu.parallel import distributed
    distributed.initialize()            # before any other jax call
    mesh = make_shard_mesh()            # spans the GLOBAL device list
    ...PartitionedTrainer(model, opt, triples, mesh)...
"""

import argparse
import os
import socket
import subprocess
import sys


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Spawn a local N-process JAX gang around a command."
    )
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument(
        "--devices-per-proc", type=int, default=0,
        help="force this many virtual CPU devices per rank (0 = leave "
        "the platform's own device set, e.g. real TPU chips)",
    )
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run per rank")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (append: -- python train.py ...)")

    port = args.port
    if port == 0:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]

    procs = []
    for rank in range(args.nproc):
        env = dict(os.environ)
        env["SKGE_COORDINATOR"] = f"localhost:{port}"
        env["SKGE_NUM_PROCESSES"] = str(args.nproc)
        env["SKGE_PROCESS_ID"] = str(rank)
        if args.devices_per_proc:
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                "--xla_force_host_platform_device_count="
                f"{args.devices_per_proc}"
            )
            env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(cmd, env=env))
    rcs = [p.wait() for p in procs]
    sys.exit(max(rcs) if rcs else 0)


if __name__ == "__main__":
    main()
