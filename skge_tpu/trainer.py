"""High-level trainers — the StochasticTrainer / PairwiseStochasticTrainer
equivalents (skge/base.py ~100-265), built on the functional core.

Defaults mirror the reference's module constants (SURVEY.md §5 config):
_DEF_MAX_EPOCHS=500, _DEF_NBATCHES=100, _DEF_LEARNING_RATE=0.1,
_DEF_MARGIN=1.0 [M]. Epochs run as ONE jitted `lax.scan` over minibatches;
`post_epoch` callbacks receive the trainer and a falsy return triggers early
stop, exactly like the reference. Checkpointing (params + optimizer state +
RNG + step — more than the reference saves) is built in.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from skge_tpu.models.base import KGEModel
from skge_tpu.optim import OPTIMIZERS, Optimizer
from skge_tpu.training import (
    StepMetrics,
    TrainState,
    init_state,
    make_epoch_fn,
    make_pairwise_step,
    make_pointwise_step,
)  # noqa: F401  (StepMetrics used by the mesh epoch)
from skge_tpu.utils.checkpoint import save_checkpoint
from skge_tpu.utils.metrics import MetricsLogger, StepTimer

# reference module defaults (skge/base.py, [M] exact values)
DEF_MAX_EPOCHS = 500
DEF_NBATCHES = 100
DEF_LEARNING_RATE = 0.1
DEF_MARGIN = 1.0


@dataclass(frozen=True)
class TrainConfig:
    max_epochs: int = DEF_MAX_EPOCHS
    nbatches: int = DEF_NBATCHES
    learning_rate: float = DEF_LEARNING_RATE
    margin: float = DEF_MARGIN
    pairwise: bool = True
    # 'margin' (default: the pairwise/pointwise pair above), 'selfadv'
    # (Sun et al. 2019 self-adversarial loss; needs a pool sampler) or
    # 'ce' (full 1-vs-all cross entropy; needs NO sampler). Both override
    # `pairwise`. `adv_alpha` is selfadv's softmax temperature;
    # `label_smoothing`/`ce_directions` parameterize 'ce'.
    loss: str = "margin"
    adv_alpha: float = 1.0
    label_smoothing: float = 0.0
    ce_directions: tuple = ("o", "s")
    optimizer: str = "adagrad"
    # lr schedule ('linear'/'cosine'/None) over max_epochs * nbatches total
    # steps; checkpoint-safe (position = TrainState.step, which resume
    # restores)
    schedule: Optional[str] = None
    warmup: int = 0
    schedule_min: float = 0.0
    aggregate: str = "unique"
    # mesh runs only: row-shard relation tables over 'model' too (pairwise
    # shard_map step; see parallel/shardmap_step.py) — the large-n_r /
    # wide-relation (RESCAL/TransR) memory mode
    shard_relations: bool = False
    seed: int = 0
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 0  # epochs; 0 = only on completion if path set
    metrics_jsonl: Optional[str] = None

    def to_meta(self) -> dict:
        return dataclasses.asdict(self)


class Trainer:
    """Drives epochs of the jitted scan; owns state, metrics, callbacks.

    `sampler` is a pure on-device sampler from `skge_tpu.sampling`.
    `post_epoch` callbacks: `f(trainer) -> truthy to continue` (reference
    early-stop contract, skge/base.py ~150).
    """

    def __init__(
        self,
        model: KGEModel,
        sampler: Callable,
        config: TrainConfig = TrainConfig(),
        post_epoch: Sequence[Callable] = (),
        optimizer: Optional[Optimizer] = None,
        mesh=None,
    ):
        """`mesh`: an optional ('data', 'model') jax Mesh (parallel.make_mesh)
        — training then runs the explicit-SPMD shard_map step (pairwise) or
        the GSPMD sharded step (pointwise) with the entity table row-sharded
        over 'model' and batches over 'data'. The epoch loop shuffles on
        host (deterministic in config.seed + epoch, but a DIFFERENT
        trajectory from the single-device scan's on-device permutation)."""
        self.model = model
        self.config = config
        self.sampler = sampler
        self.post_epoch = list(post_epoch)
        self.mesh = mesh
        if optimizer is None:
            from skge_tpu.optim import make_schedule

            optimizer = OPTIMIZERS[config.optimizer](
                lr=config.learning_rate,
                schedule=make_schedule(
                    config.schedule, warmup=config.warmup,
                    total=config.max_epochs * config.nbatches,
                    min_scale=config.schedule_min,
                ),
            )
        self.opt = optimizer
        self.metrics = MetricsLogger(config.metrics_jsonl)
        self.state: Optional[TrainState] = None
        # per-epoch scalars for callbacks (reference attribute contract)
        self.epoch = 0
        self.loss = float("nan")
        self.nviolations = 0
        self._epoch_fn = None

    # -- construction of the jitted epoch --
    def _build(self, n_triples: int):
        cfg = self.config
        if cfg.loss not in ("margin", "selfadv", "ce", "sampled_ce"):
            raise ValueError(f"unknown loss {cfg.loss!r}")
        if self.mesh is not None:
            self._epoch_fn = self._build_mesh_epoch(n_triples)
            return
        if cfg.loss == "sampled_ce":
            from skge_tpu.training import make_sampled_ce_step

            step = make_sampled_ce_step(
                self.model, self.opt, self.sampler,
                tuple(cfg.ce_directions), cfg.label_smoothing,
                cfg.aggregate,
            )
        elif cfg.loss == "ce":
            from skge_tpu.training import make_ce_step

            step = make_ce_step(
                self.model, self.opt, tuple(cfg.ce_directions),
                cfg.label_smoothing,
            )
        elif cfg.loss == "selfadv":
            from skge_tpu.training import make_selfadv_step

            step = make_selfadv_step(
                self.model, self.opt, self.sampler, cfg.margin,
                cfg.adv_alpha, cfg.aggregate,
            )
        elif cfg.pairwise:
            step = make_pairwise_step(
                self.model, self.opt, self.sampler, cfg.margin, cfg.aggregate
            )
        else:
            step = make_pointwise_step(
                self.model, self.opt, self.sampler, cfg.aggregate
            )
        nb = min(cfg.nbatches, n_triples)
        self._epoch_fn = jax.jit(make_epoch_fn(step, n_triples, nb))

    def _build_mesh_epoch(self, n_triples: int):
        """On-device epoch over the mesh step: the SAME shuffle + scan as
        the single-device `make_epoch_fn` (same state-key stream), with
        each batch padded by masked rows up to a 'data'-axis multiple.
        Because the mesh steps sample GLOBALLY from the same key stream,
        the sharded trajectory is the single-device trajectory
        (tests/test_trainer_mesh.py pins it in fp64)."""
        from skge_tpu.parallel.mesh import DATA_AXIS
        from skge_tpu.parallel.sharded import make_sharded_pointwise_step
        from skge_tpu.parallel.shardmap_step import make_shardmap_pairwise_step

        cfg = self.config
        if cfg.loss == "ce":
            from skge_tpu.parallel.shardmap_step import make_shardmap_ce_step

            step = make_shardmap_ce_step(
                self.model, self.opt, self.mesh,
                tuple(cfg.ce_directions), cfg.label_smoothing,
            )
        elif cfg.loss == "sampled_ce":
            from skge_tpu.parallel.shardmap_step import (
                make_shardmap_sampled_ce_step,
            )

            step = make_shardmap_sampled_ce_step(
                self.model, self.opt, self.sampler, self.mesh,
                tuple(cfg.ce_directions), cfg.label_smoothing,
                shard_relations=cfg.shard_relations,
            )
        elif cfg.loss == "selfadv":
            from skge_tpu.parallel.shardmap_step import (
                make_shardmap_selfadv_step,
            )

            step = make_shardmap_selfadv_step(
                self.model, self.opt, self.sampler, cfg.margin, self.mesh,
                alpha=cfg.adv_alpha, shard_relations=cfg.shard_relations,
            )
        elif cfg.pairwise:
            step = make_shardmap_pairwise_step(
                self.model, self.opt, self.sampler, cfg.margin, self.mesh,
                shard_relations=cfg.shard_relations,
            )
        elif hasattr(self.sampler, "pool"):
            # shared-pool pointwise: explicit-SPMD (same collective
            # structure as selfadv); iid samplers below keep the GSPMD
            # route (the generic expansion has no gather hook)
            from skge_tpu.parallel.shardmap_step import (
                make_shardmap_pointwise_step,
            )

            step = make_shardmap_pointwise_step(
                self.model, self.opt, self.sampler, self.mesh,
                shard_relations=cfg.shard_relations,
            )
        else:
            step = make_sharded_pointwise_step(
                self.model, self.opt, self.sampler, self.mesh
            )
        nb = min(cfg.nbatches, n_triples)
        d_size = self.mesh.shape[DATA_AXIS]
        return jax.jit(make_epoch_fn(step, n_triples, nb, pad_to=d_size))

    def fit(
        self,
        xs: np.ndarray,
        state: Optional[TrainState] = None,
        start_epoch: int = 0,
    ) -> TrainState:
        """Train on (N, 3) int triples. Resumable via (state, start_epoch)."""
        xs = np.asarray(xs, np.int32).reshape(-1, 3)
        self._build(xs.shape[0])
        if state is None:
            state = init_state(
                self.model, self.opt, jax.random.PRNGKey(self.config.seed)
            )
        if self.mesh is not None:
            cfg = self.config
            if (cfg.loss in ("ce", "selfadv", "sampled_ce") or cfg.pairwise
                    or hasattr(self.sampler, "pool")):
                from skge_tpu.parallel.shardmap_step import shard_state_shardmap

                state = shard_state_shardmap(
                    state, self.model, self.mesh,
                    # relation sharding exists on the pairwise/selfadv/
                    # sampled-CE shard_map steps (not the vocab-parallel
                    # full-CE step)
                    shard_relations=(
                        cfg.loss != "ce" and cfg.shard_relations
                    ),
                )
            else:
                from skge_tpu.parallel.mesh import shard_state

                state = shard_state(state, self.model, self.mesh)
        self.state = state
        xs_dev = jnp.asarray(xs)
        timer = StepTimer()
        cfg = self.config
        for epoch in range(start_epoch, cfg.max_epochs):
            self.epoch = epoch + 1
            self.state, m = self._epoch_fn(self.state, xs_dev)
            self.loss = float(jnp.sum(m.loss))
            self.nviolations = int(jnp.sum(m.nviolations))
            dt = timer.reset()
            self.metrics.log(
                {
                    "epoch": self.epoch,
                    "loss": self.loss,
                    "nviolations": self.nviolations,
                    "epoch_seconds": dt,
                    "triples_per_second": xs.shape[0] / max(dt, 1e-9),
                }
            )
            if (
                cfg.checkpoint_path
                and cfg.checkpoint_every
                and self.epoch % cfg.checkpoint_every == 0
            ):
                self.save(cfg.checkpoint_path)
            stop = False
            for f in self.post_epoch:
                if not f(self):
                    stop = True
            if stop:
                break
        if cfg.checkpoint_path:
            self.save(cfg.checkpoint_path)
        return self.state

    def save(self, path: str) -> None:
        assert self.state is not None, "nothing to save before fit()"
        save_checkpoint(
            path,
            self.state,
            meta={
                "model": self.model.name,
                "epoch": self.epoch,
                "config": self.config.to_meta(),
            },
        )
