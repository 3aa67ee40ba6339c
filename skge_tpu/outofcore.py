"""Out-of-core (PBG-style) bucketed training: entity tables beyond HBM.

The reference holds every parameter in process memory (skge/base.py Model —
a few MB at WN18 scale). Production KGs have 10^8-10^9 entities; at d=256
fp32 the entity table plus its AdaGrad accumulator is ~2 KB/entity — far
beyond one chip's HBM. This module trains such tables on ONE device by the
PyTorch-BigGraph partition-bucket scheme (Lerer et al. 2019; same scheme as
DGL-KE's partitioned training, PAPERS.md):

1. entities are partitioned into P parts (`data.greedy_entity_partition`,
   community-aware) and relabeled so part p owns contiguous rows
   [p*S, (p+1)*S) (`parallel.partitioned.relabel_entities`);
2. triples are grouped into buckets (part(subject), part(object));
3. the entity table and its accumulator live in HOST memory; one bucket at
   a time, the two parts it touches are uploaded to the device, the
   standard jitted pairwise epoch runs on the bucket's triples (negatives
   drawn from the RESIDENT parts, as in PBG), and the updated rows stream
   back. Device footprint is 2S rows + the relation table, independent of
   the total entity count.

Semantics: within a bucket the update math is EXACTLY the in-core trainer
(same violation filtering, duplicate-occurrence averaging, sparse AdaGrad +
normless1 — the same `make_pairwise_step` program runs on the resident
slice; with P=1 the trajectory is bit-identical to in-core training, see
tests/test_outofcore.py). Across buckets the scheme differs from global iid
sampling the same way PBG does: positives arrive grouped by bucket and
negatives come from the bucket's resident parts. Relation parameters stay
device-resident the whole run (they are small: n_r rows).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skge_tpu.data import greedy_entity_partition
from skge_tpu.models.base import KGEModel, Params
from skge_tpu.optim import Optimizer
from skge_tpu.parallel.partitioned import relabel_entities
from skge_tpu.training import StepMetrics, TrainState, make_epoch_fn, make_pairwise_step


@dataclass(frozen=True, eq=False)
class BucketPoolSampler:
    """Shared-negative pool drawn from the bucket's RESIDENT entity rows.

    Slot layout: rows [0, size_i) are part i's real entities, rows
    [slot_stride, slot_stride + size_j) are part j's (slot_stride = S, the
    padded part size; for diagonal buckets i == j there is one slot).
    Draws land uniformly on the union of REAL rows — never on the padding
    rows of either slot (the reference corrupts with randint over real
    entities only, skge/sample.py ~35).
    """

    size_i: int
    size_j: int
    slot_stride: int  # 0 for diagonal buckets (single slot)
    k: int = 1024
    modes: Tuple[int, ...] = (0, 1)

    def pool(self, key: jax.Array, pos: jnp.ndarray, mask: jnp.ndarray):
        total = self.size_i + (self.size_j if self.slot_stride else 0)
        u = jax.random.randint(key, (self.k,), 0, total)
        if not self.slot_stride:
            return u
        return jnp.where(u < self.size_i, u, u - self.size_i + self.slot_stride)


class OutOfCoreTrainer:
    """PBG-style bucketed trainer over a host-resident entity table.

    Parameters
    ----------
    model : the KGE model at FULL size (n_entities = total entities).
    opt : row-sparse optimizer (AdaGrad/SGD).
    n_parts : number of entity partitions P (device must fit 2*ceil(n_e/P)
        entity rows plus the relation table).
    k : shared-negative-pool size per step.
    aggregate : gradient aggregation mode for the device step.
    """

    def __init__(
        self,
        model: KGEModel,
        opt: Optimizer,
        triples: np.ndarray,
        n_parts: int,
        margin: float = 1.0,
        k: int = 1024,
        nbatches: int = 100,
        aggregate: str = "dense",
        seed: int = 0,
    ):
        self.full_model = model
        self.opt = opt
        self.margin = margin
        self.aggregate = aggregate
        t = np.asarray(triples, np.int32)

        part = (
            greedy_entity_partition(t, model.n_entities, n_parts, seed=seed)
            if n_parts > 1
            else np.zeros(model.n_entities, np.int32)
        )
        relabeled, self.new_of_old, n_padded = relabel_entities(t, part, n_parts)
        s = n_padded // n_parts
        self.part_size = s            # padded rows per part
        self.n_parts = n_parts
        self.part_counts = np.bincount(part, minlength=n_parts)

        # bucket (pi, pj) -> triple rows, ids made slot-local lazily
        owner_s = relabeled[:, 0] // s
        owner_o = relabeled[:, 1] // s
        self.buckets: Dict[Tuple[int, int], np.ndarray] = {}
        for pi in range(n_parts):
            for pj in range(n_parts):
                rows = relabeled[(owner_s == pi) & (owner_o == pj)]
                if rows.shape[0]:
                    self.buckets[(pi, pj)] = rows
        self.nbatches = nbatches
        self.k = k

        # host-resident entity table + accumulator (padded to P*S rows);
        # everything else (relations, dense params) is device-resident.
        # PRNG split order matches training.init_state (params from the
        # first subkey, sampling from the second) so the P=1 degenerate
        # case takes the EXACT in-core trajectory.
        init_key, dev_key = jax.random.split(jax.random.PRNGKey(seed))
        padded_model = replace(model, n_entities=n_parts * s)
        params = padded_model.init_params(init_key)
        ostate = opt.init(params)
        self.e_host = {"param": np.array(params["E"])}
        for name, arr in ostate["E"].items():
            self.e_host[name] = np.array(arr)
        self.dev_params = {kk: v for kk, v in params.items() if kk != "E"}
        self.dev_opt = {kk: v for kk, v in ostate.items() if kk != "E"}
        self.key = dev_key
        self.step = 0
        self._epochs: Dict[Tuple[int, int, int], callable] = {}
        self._metrics: list = []

    # -- device program cache: one jitted epoch per (bucket length, diag) --
    def _epoch_fn(self, n: int, diag: bool, size_i: int, size_j: int):
        sig = (n, diag, size_i, size_j)
        if sig not in self._epochs:
            resident_rows = self.part_size * (1 if diag else 2)
            bucket_model = replace(self.full_model, n_entities=resident_rows)
            sampler = BucketPoolSampler(
                size_i=size_i,
                size_j=size_j,
                slot_stride=0 if diag else self.part_size,
                k=self.k,
            )
            step = make_pairwise_step(
                bucket_model, self.opt, sampler, self.margin,
                aggregate=self.aggregate,
            )
            nb = max(1, min(self.nbatches, n))
            self._epochs[sig] = jax.jit(
                make_epoch_fn(step, n, nb), donate_argnums=(0,)
            )
        return self._epochs[sig]

    def _bucket_epoch(self, pi: int, pj: int, rows: np.ndarray):
        s = self.part_size
        diag = pi == pj
        # slot-local triple ids
        local = rows.copy()
        local[:, 0] -= pi * s
        local[:, 1] -= pj * s
        if not diag:
            local[:, 1] += s

        # upload resident rows
        def take(a):
            blk = a[pi * s : (pi + 1) * s]
            if diag:
                return jnp.asarray(blk)
            return jnp.asarray(
                np.concatenate([blk, a[pj * s : (pj + 1) * s]])
            )

        e_dev = {kk: take(v) for kk, v in self.e_host.items()}
        params = dict(self.dev_params)
        params["E"] = e_dev["param"]
        ostate = dict(self.dev_opt)
        ostate["E"] = {kk: v for kk, v in e_dev.items() if kk != "param"}

        state = TrainState(
            params=params,
            opt_state=ostate,
            key=self.key,
            step=jnp.asarray(self.step, jnp.int32),
        )
        epoch = self._epoch_fn(
            rows.shape[0], diag,
            int(self.part_counts[pi]), int(self.part_counts[pj]),
        )
        state, m = epoch(state, jnp.asarray(local))
        self.key = state.key
        self.step = int(state.step)

        # stream updated rows back; keep device-resident tables on device
        e_new = np.asarray(state.params["E"])
        st_new = {kk: np.asarray(v) for kk, v in state.opt_state["E"].items()}
        def put(host, dev):
            host[pi * s : (pi + 1) * s] = dev[:s]
            if not diag:
                host[pj * s : (pj + 1) * s] = dev[s:]
        put(self.e_host["param"], e_new)
        for kk in st_new:
            put(self.e_host[kk], st_new[kk])
        self.dev_params = {
            kk: v for kk, v in state.params.items() if kk != "E"
        }
        self.dev_opt = {
            kk: v for kk, v in state.opt_state.items() if kk != "E"
        }
        return (
            float(np.asarray(m.loss).sum()),
            float(np.asarray(m.nviolations).sum()),
        )

    def fit(self, epochs: int = 1, verbose: bool = False):
        """Run `epochs` passes; each pass visits every bucket once, ordered
        to reuse one resident partition between consecutive buckets (halves
        upload traffic vs arbitrary order — PBG's bucket ordering)."""
        order = sorted(
            self.buckets, key=lambda ij: (min(ij), max(ij), ij[0])
        )
        for ep in range(epochs):
            tot_loss = tot_viol = 0.0
            for (pi, pj) in order:
                loss, nviol = self._bucket_epoch(pi, pj, self.buckets[(pi, pj)])
                tot_loss += loss
                tot_viol += nviol
            self._metrics.append(
                {"epoch": ep, "loss": tot_loss, "nviolations": tot_viol}
            )
            if verbose:
                print(self._metrics[-1], flush=True)
        return self

    @property
    def metrics(self):
        return list(self._metrics)

    def params(self) -> Params:
        """Full-size host params in ORIGINAL entity ids (for eval/save)."""
        e = np.empty((self.full_model.n_entities, *self.e_host["param"].shape[1:]),
                     self.e_host["param"].dtype)
        e[:] = self.e_host["param"][self.new_of_old]
        out = {kk: np.asarray(v) for kk, v in self.dev_params.items()}
        out["E"] = e
        return out
