"""Hardware-independent scaling-regression gate: compiled-HLO collective
bytes per step (VERDICT round-2 item 7).

Wall-clock SPMD-overhead gates on virtual CPU devices drift with host
scheduling noise (round 2 measured 3.2-4.4 for GSPMD vs round 1's 2.33, and
the gate had to be loosened to 4.5 to absorb it). The compiled program is
deterministic: this test lowers each SPMD training step on the 8-virtual-
device mesh, inventories every collective XLA inserted
(skge_tpu/utils/hloparse.py), and pins total payload bytes at the measured
value + 10%. A sharding regression — a lost partition spec replicating a
table, a new all-gather of the entity table, a softmax assembly that
materializes full logits — multiplies these numbers, and THAT is what a
gate should trip on; virtual-device wall clock never reliably did.

Budgets were measured on jaxlib's CPU backend under this suite's exact
config (8 virtual devices, x64 enabled); they are byte counts of collective
OUTPUT buffers summed over the whole module. The wall-clock gates in
scripts/scaling_bench.py remain as a coarse backstop; real efficiency still
needs a real slice (BASELINE.md north star >= 85% weak scaling at N >= 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skge_tpu import AdaGrad, SharedNegativeSampler, TransE, init_state
from skge_tpu.parallel import make_mesh, make_sharded_pairwise_step, shard_state
from skge_tpu.parallel.partitioned import (
    SHARD_AXIS,
    RelabeledPoolSampler,
    make_partitioned_pairwise_step,
    partitioned_state_specs,
)
from skge_tpu.parallel.shardmap_step import (
    make_shardmap_ce_step,
    make_shardmap_pairwise_step,
    shard_state_shardmap,
)
from skge_tpu.training import TrainState
from skge_tpu.utils.hloparse import collective_bytes

N_E, N_R, D, B, K = 16000, 128, 64, 8192, 256


def _compiled_text_2d(build_step, place):
    mesh = make_mesh(jax.devices())  # ('data' 4, 'model' 2)
    model = TransE(N_E, N_R, D)
    opt = AdaGrad(lr=0.1)
    step = build_step(model, opt, mesh)
    state = place(init_state(model, opt, jax.random.PRNGKey(0)), model, mesh)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(np.stack(
        [rng.integers(0, N_E, B), rng.integers(0, N_E, B),
         rng.integers(0, N_R, B)], axis=1).astype(np.int32))
    mask = jnp.ones(B, jnp.float32)
    return step.lower(state, batch, mask).compile().as_text()


def _pairwise(make_step):
    def build(model, opt, mesh):
        sampler = SharedNegativeSampler(N_E, k=K)
        return make_step(model, opt, sampler, 1.0, mesh)
    return build


def _compiled_text_partitioned():
    p_, s_rows = 8, 2000
    n_e = p_ * s_rows
    model = TransE(n_e, N_R, D)
    opt = AdaGrad(lr=0.1)
    mesh = Mesh(np.asarray(jax.devices()), (SHARD_AXIS,))
    sampler = RelabeledPoolSampler(np.arange(n_e), k=K)
    step = make_partitioned_pairwise_step(
        model, opt, sampler, 1.0, mesh, boundary_cap=256, overlap=True
    )
    _, _, spec = partitioned_state_specs(model, opt)
    sh = jax.tree.map(lambda sp: NamedSharding(mesh, sp), spec,
                      is_leaf=lambda x: isinstance(x, P))

    def sds(shape, dt, s):
        return jax.ShapeDtypeStruct(shape, dt, sharding=s)

    L = 1024
    state = TrainState(
        params={"E": sds((n_e, D), jnp.float32, sh.params["E"]),
                "R": sds((N_R, D), jnp.float32, sh.params["R"])},
        opt_state={"E": {"p2": sds((n_e, D), jnp.float32, sh.params["E"])},
                   "R": {"p2": sds((N_R, D), jnp.float32, sh.params["R"])}},
        key=sds((2,), jnp.uint32, sh.key),
        step=sds((), jnp.int32, sh.step),
    )
    batch = sds((p_, L, 3), jnp.int32,
                NamedSharding(mesh, P(SHARD_AXIS, None, None)))
    mask = sds((p_, L), jnp.float32, NamedSharding(mesh, P(SHARD_AXIS)))
    return step.lower(state, batch, mask).compile().as_text()


# measured collective bytes at these exact shapes (jaxlib CPU backend,
# 8 virtual devices, x64 on) + 10% headroom. A regression that replicates
# a table or gathers full logits is a >= 2x jump, far beyond the headroom.
CASES = [
    ("gspmd_pairwise", None, 3_930_000),        # measured 3,567,616
    ("shardmap_pairwise", None, 2_870_000),     # measured 2,604,288
    ("shardmap_ce", None, 3_500_000),           # measured 3,178,496
    ("partitioned_pairwise", None, 339_000),    # measured 307,712
    # the three pool losses share pairwise's collective structure — their
    # budgets pin that identity (measured 2,604,288 / 2,604,288 / 2,604,292)
    ("shardmap_selfadv", None, 2_870_000),
    ("shardmap_pointwise", None, 2_870_000),
    ("shardmap_sampled_ce", None, 2_870_000),
]


def _text_for(name):
    if name == "gspmd_pairwise":
        return _compiled_text_2d(
            _pairwise(make_sharded_pairwise_step), shard_state)
    if name == "shardmap_pairwise":
        return _compiled_text_2d(
            _pairwise(make_shardmap_pairwise_step), shard_state_shardmap)
    if name == "shardmap_ce":
        return _compiled_text_2d(
            lambda m, o, mesh: make_shardmap_ce_step(m, o, mesh),
            shard_state_shardmap)
    if name == "shardmap_selfadv":
        from skge_tpu.parallel.shardmap_step import make_shardmap_selfadv_step

        def build(model, opt, mesh):
            sampler = SharedNegativeSampler(N_E, k=K)
            return make_shardmap_selfadv_step(model, opt, sampler, 1.0, mesh)
        return _compiled_text_2d(build, shard_state_shardmap)
    if name == "shardmap_pointwise":
        from skge_tpu.parallel.shardmap_step import (
            make_shardmap_pointwise_step,
        )

        def build(model, opt, mesh):
            sampler = SharedNegativeSampler(N_E, k=K)
            return make_shardmap_pointwise_step(model, opt, sampler, mesh)
        return _compiled_text_2d(build, shard_state_shardmap)
    if name == "shardmap_sampled_ce":
        from skge_tpu.parallel.shardmap_step import (
            make_shardmap_sampled_ce_step,
        )

        def build(model, opt, mesh):
            sampler = SharedNegativeSampler(N_E, k=K)
            return make_shardmap_sampled_ce_step(
                model, opt, sampler, mesh,
                directions=("o",), label_smoothing=0.1,
            )
        return _compiled_text_2d(build, shard_state_shardmap)
    return _compiled_text_partitioned()


@pytest.mark.parametrize("name,_,budget", CASES, ids=[c[0] for c in CASES])
def test_collective_bytes_within_budget(name, _, budget):
    cb = collective_bytes(_text_for(name))
    total = sum(cb.values())
    # parser sanity: a distributed step with zero detected collectives means
    # the parser broke, not that communication vanished
    assert total > 0, f"no collectives detected in {name} — parser regression?"
    assert total <= budget, (
        f"{name}: collective bytes/step {total} exceed budget {budget} "
        f"(per kind: {cb}) — a sharding regression added communication"
    )
