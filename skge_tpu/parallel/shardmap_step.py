"""Explicitly-scheduled SPMD train step (shard_map + hand-placed collectives).

The GSPMD path (parallel/sharded.py) lets XLA infer collectives from
shardings; its lowering of index-gathers and scatter-adds on a row-sharded
entity table is generic and measured 2-3.7x slower than the unsharded
program on the same total batch (scripts/scaling_bench.py). This module
writes the SPMD program by hand over the ('data', 'model') mesh:

- batch sharded over 'data'; REPLICATED over 'model' (each model-group
  member re-scores the same pairs — compute is cheap, communication is
  not; 'model' stays small, 2-4).
- entity table E and its AdaGrad accumulator row-sharded over 'model'
  ('model' is the memory axis: tables too big for one chip split here).
- **gather** of entity rows: each shard reads its owned rows (others
  zeroed) and one `psum('model')` assembles full rows — traffic O(B*d),
  with identical indices across the model group by construction.
- **scatter** of entity gradients: every device scatter-adds ONLY the
  occurrence rows its shard owns into its local (n_e/M, d) table — zero
  communication on 'model' — then one `psum('data')` reduces across data
  shards — traffic O(n_e*d/M) per step, independent of batch size.
- relation tables replicated; their gradient tables psum over 'data'.
- losses/violation counts psum over 'data'.

This is the TPU-native analogue of the reference-scale plan in SURVEY.md
section 5 ("row-sharding E across hosts ... gradients exchanged and
overlapped"): collectives ride ICI, every tensor keeps a static shape, and
a (1, 1) mesh degenerates to the single-chip program bit-for-bit (tested).

Requires n_entities divisible by the 'model' axis size (pad the entity
count up if needed — embedding row count is free).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skge_tpu.models.base import KGEModel
from skge_tpu.optim import Optimizer
from skge_tpu.ops.aggregate import DenseGrads
from skge_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from skge_tpu.training import (
    StepMetrics,
    TrainState,
    pairwise_grads_fused,
    pairwise_grads_shared,
)


def _entity_param(model: KGEModel) -> str:
    by_role = {role: pname for _, pname, role in model.slot_spec()}
    assert by_role["s"] == by_role["o"], "one entity table expected"
    return by_role["s"]


def _param_specs(model: KGEModel):
    """E sharded over 'model'; relation + dense params replicated."""
    epname = _entity_param(model)
    specs = {}
    for _, pname, role in model.slot_spec():
        specs[pname] = P(MODEL_AXIS) if pname == epname else P()
    for pname in model.dense_param_names:
        specs[pname] = P()
    return specs


def _scatter_sums(idx, grads, counts, rows):
    """Raw (un-averaged) masked scatter: grads+counts into `rows` slots.

    Out-of-range indices (negative or >= rows) are dropped — this is what
    restricts each shard to its owned rows after subtracting the offset.
    """
    t = idx.shape[0]
    aug = jnp.concatenate(
        [grads.reshape(t, -1), counts.astype(grads.dtype)[:, None]], axis=1
    )
    return jnp.zeros((rows, aug.shape[1]), grads.dtype).at[idx].add(
        aug, mode="drop"
    )


def make_shardmap_pairwise_step(
    model: KGEModel,
    opt: Optimizer,
    sampler: Callable,
    margin: float,
    mesh: Mesh,
):
    """Jitted explicit-SPMD pairwise step: (state, batch, mask) -> (state, m).

    `state` entity tables must be placed with `shard_state_shardmap`; batch
    and mask sharded over 'data'. Supports the `pool` (shared-negative) and
    `corruptions` (iid) sampler protocols.

    Sampling happens OUTSIDE shard_map on the global batch, from the same
    `split(state.key)` stream as the single-device step — so a mesh run's
    trajectory is the single-device trajectory (same negatives for the
    same rows; each data shard just receives its slice of the global
    draws). The update math reduces per-shard scatter tables with
    psum('data') before the duplicate-count averaging, which reorders
    only exact zero-padding adds. Trajectory parity is pinned in
    tests/test_trainer_mesh.py.
    """
    epname = _entity_param(model)
    n_e = model.n_entities
    m_size = mesh.shape[MODEL_AXIS]
    if n_e % m_size != 0:
        raise ValueError(
            f"n_entities={n_e} not divisible by model axis {m_size}; pad the "
            "entity count (embedding row count is free)"
        )
    shard_rows = n_e // m_size
    specs = _param_specs(model)
    shared = hasattr(sampler, "pool")

    # optimizer slot names (e.g. AdaGrad's 'p2', SGD's none) from a dummy init
    slot_names = tuple(opt.init({"x": jnp.zeros(1)})["x"])
    state_spec = TrainState(
        params={k: specs[k] for k in specs},
        opt_state={k: {sn: specs[k] for sn in slot_names} for k in specs},
        key=P(),
        step=P(),
    )
    metrics_spec = StepMetrics(loss=P(), nviolations=P())

    def local_step(modes, state: TrainState, batch, mask, draws):
        params = state.params
        row_off = jax.lax.axis_index(MODEL_AXIS) * shard_rows

        def gather(pname, idx, role=None):
            if pname != epname:
                return params[pname][idx]
            local = idx - row_off
            own = jnp.logical_and(local >= 0, local < shard_rows)
            rows = params[pname][jnp.clip(local, 0, shard_rows - 1)]
            rows = jnp.where(
                own.reshape(own.shape + (1,) * (rows.ndim - 1)), rows, 0
            )
            return jax.lax.psum(rows, MODEL_AXIS)

        key = state.key  # already advanced by the global-sampling wrapper
        if shared:
            (pool_idx,) = draws
            loss, nviol, occ, g_dense = pairwise_grads_shared(
                model, params, batch, pool_idx, mask, margin,
                modes=modes, gather=gather,
            )
        else:
            repls, valids = draws
            corr = list(zip(modes, repls, valids))
            loss, nviol, occ, g_dense = pairwise_grads_fused(
                model, params, batch, corr, mask, margin, gather=gather
            )

        loss = jax.lax.psum(loss, DATA_AXIS)
        nviol_local = nviol
        nviol = jax.lax.psum(nviol, DATA_AXIS)

        new_params = dict(params)
        new_opt = dict(state.opt_state)
        reg = model.regularization
        for pname, (idx, grads, counts) in occ.items():
            if pname == epname:
                local = idx - row_off
                # JAX .at[] wraps NEGATIVE indices NumPy-style BEFORE the
                # drop-mode bounds check — route non-owned rows to an
                # always-out-of-range positive index instead
                local = jnp.where(
                    jnp.logical_and(local >= 0, local < shard_rows),
                    local, shard_rows,
                )
                table = _scatter_sums(local, grads, counts, shard_rows)
            else:
                table = _scatter_sums(idx, grads, counts, model.num_rows(pname))
            table = jax.lax.psum(table, DATA_AXIS)
            count = table[:, -1]
            feat = grads.shape[1:]
            gsum = table[:, :-1].reshape((table.shape[0],) + feat)
            gavg = gsum / jnp.maximum(count, 1.0).reshape(
                (-1,) + (1,) * len(feat)
            )
            if reg != 0.0 and pname in model.reg_row_params:
                gavg = gavg + reg * new_params[pname]
            dg = DenseGrads(grads=gavg, count=count)
            new_params[pname], new_opt[pname] = opt.apply_dense_masked(
                new_params[pname], new_opt[pname], dg,
                model.post_constraints.get(pname),
            )
        # dense (non-row) params: recover local gradient SUMS, reduce, then
        # divide by the GLOBAL violation count
        for pname, g in g_dense.items():
            gsum = jax.lax.psum(
                g * jnp.maximum(nviol_local, 1.0), DATA_AXIS
            )
            g_global = gsum / jnp.maximum(nviol, 1.0)
            new_params[pname], new_opt[pname] = opt.apply_full(
                new_params[pname], new_opt[pname], g_global
            )
        new_state = TrainState(new_params, new_opt, key, state.step + 1)
        return new_state, StepMetrics(loss=loss, nviolations=nviol)

    def step(state: TrainState, batch, mask):
        # global sampling: the SAME split(state.key) stream as the
        # single-device step — draws for row i equal the single-device
        # draws for row i, whatever the mesh shape.
        key, sk = jax.random.split(state.key)
        state = state._replace(key=key)
        if shared:
            modes = tuple(sampler.modes)
            draws = (sampler.pool(sk, batch, mask),)
            draws_spec = (P(),)  # one global pool, replicated
        else:
            corr = sampler.corruptions(sk, batch, mask)
            modes = tuple(m for m, _, _ in corr)  # static at trace time
            draws = (
                tuple(r for _, r, _ in corr),
                tuple(v for _, _, v in corr),
            )
            draws_spec = (
                tuple(P(DATA_AXIS) for _ in modes),   # replacement ids
                tuple(P(DATA_AXIS) for _ in modes),   # validity masks
            )
        smapped = jax.shard_map(
            partial(local_step, modes),
            mesh=mesh,
            in_specs=(
                state_spec, P(DATA_AXIS, None), P(DATA_AXIS), draws_spec,
            ),
            out_specs=(state_spec, metrics_spec),
            check_vma=False,
        )
        return smapped(state, batch, mask, draws)

    return jax.jit(step, donate_argnums=(0,))


def shard_state_shardmap(
    state: TrainState, model: KGEModel, mesh: Mesh
) -> TrainState:
    """Place a TrainState for the shard_map step (E over 'model')."""
    specs = _param_specs(model)

    def put(tree_specs, tree):
        return jax.tree.map(
            lambda s, v: jax.device_put(v, NamedSharding(mesh, s)),
            tree_specs, tree,
        )

    return TrainState(
        params=put({k: specs[k] for k in state.params}, state.params),
        opt_state=put(
            {k: {kk: specs[k] for kk in state.opt_state[k]} for k in state.opt_state},
            state.opt_state,
        ),
        key=jax.device_put(state.key, NamedSharding(mesh, P())),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
