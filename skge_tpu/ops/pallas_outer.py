"""Pallas TPU factored outer-product scatter: RESCAL's W-gradient, fused.

RESCAL's relation parameter is a (n_r, d, d) tensor; every training pair's
gradient w.r.t. its W row is a RANK-1 outer product (skge/rescal.py
`_pairwise_gradients` builds exactly these before summing per unique
relation). The generic autodiff path materializes the (T, d, d) per-
occurrence outer products in HBM (193 MB/step at FB15k shapes) and then
scatter-adds them into the (n_r, d, d) table — two full passes over data
that is algebraically rank-1.

This kernel performs the scatter in FACTORED form: it streams the (T, d)
factor pairs (u, v) through VMEM and accumulates

    table[idx[t]] += outer(u[t], v[t])

with the whole table VMEM-resident, computing each outer product on the VPU
as a (d, 1) x (1, lanes) broadcast at the moment of accumulation. The
(T, d, d) intermediate never exists anywhere. Per occurrence this costs one
dynamic (d_sub, lane-tile) read-modify-write (~the scalar-core dynamic-op
cost + 2*d_sub*tile/1024 VPU cycles) versus ~4 KB*d/128 of HBM traffic per
row on the XLA path.

Layout: the (num_rows, d, d) table is flattened to ((num_rows+1) * d_sub,
dv) 2-D rows, where d_sub = d rounded up to the fp32 sublane multiple (8)
so every dynamic row-block start `r * d_sub` stays sublane-aligned
(`pl.multiple_of`), and dv = d rounded up to the 128-lane tile. The +1 row
block is sacrificial: out-of-range indices (>= num_rows, the padding
convention of ops/aggregate.py) are clamped onto it, matching
`.at[].add(mode="drop")`. Wide d is swept in lane tiles (grid dim 0) like
ops/pallas_segment.py; the accumulator IS the output block (index map
constant in the chunk dimension, so Mosaic keeps it resident across the
whole sweep and writes it back once per lane tile).

Reference context: the summation half of skge/util.py `grad_sum_matrix`
(~30) specialized to rank-1 rows; averaging happens in ops/aggregate.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8  # fp32 sublane multiple
_VMEM_BUDGET = 110 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_v(num_rows: int, d_sub: int, dv: int, chunk: int, rank: int) -> int:
    """Widest lane tile of the v/feature axis fitting the VMEM budget."""
    # resident: out-as-accumulator ((num_rows+1)*d_sub, tile) + double-
    # buffered u_t (d_sub, chunk) and v (chunk, tile) input blocks per rank
    # term, with the same 25% pipeline headroom as ops/pallas_segment.py
    budget = int(_VMEM_BUDGET * 0.75) // 4
    for tile in range(dv, 0, -_LANE):
        need = (num_rows + 1) * d_sub * tile
        need += rank * 2 * d_sub * chunk          # u_t double buffers
        need += rank * 2 * chunk * tile           # v double buffers
        if need <= budget:
            return tile
    return 0


def fits_in_vmem_outer(num_rows: int, d: int, chunk: int = 1024, rank: int = 2) -> bool:
    d_sub = _round_up(d, _SUB)
    return _tile_v(num_rows, d_sub, _LANE, chunk, rank) >= _LANE


def _kernel(idx_ref, *refs, num_rows, d_sub, chunk, rank):
    ut_refs = refs[:rank]
    v_refs = refs[rank : 2 * rank]
    out_ref = refs[2 * rank]
    step = pl.program_id(1)  # chunk index; lane tile is grid dim 0

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    def group(gi, carry):
        # Mosaic requires dynamic LANE starts to be 128-aligned, so u columns
        # are read as one (d_sub, 128) window per group of 128 occurrences
        # and each occurrence's column is extracted with a one-hot lane mask
        # + lane reduction.
        g0 = pl.multiple_of(gi * _LANE, _LANE)
        ublks = [ut_ref[:, pl.ds(g0, _LANE)] for ut_ref in ut_refs]

        def body(lane, carry):
            j = gi * _LANE + lane
            # out-of-range indices — negative OR >= num_rows — land on the
            # sacrificial row block (dropped; negatives deliberately do NOT
            # wrap the way NumPy-style .at[] indexing would)
            raw = idx_ref[j]
            r = jnp.where(raw < 0, num_rows, jnp.minimum(raw, num_rows))
            row0 = pl.multiple_of(r * d_sub, _SUB)
            # all rank terms land in ONE dynamic read-modify-write; terms
            # are summed BEFORE the table add so fp32 association matches
            # the XLA fallback (sum-of-outers, then scatter) bit-for-bit
            onehot = lane_ids == lane
            delta = None
            for ublk, v_ref in zip(ublks, v_refs):
                ucol = jnp.sum(
                    jnp.where(onehot, ublk, 0.0), axis=1, keepdims=True
                )  # (d_sub, 1)
                term = ucol * v_ref[pl.ds(j, 1), :]
                delta = term if delta is None else delta + term
            out_ref[pl.ds(row0, d_sub), :] = (
                out_ref[pl.ds(row0, d_sub), :] + delta
            )
            return carry

        return jax.lax.fori_loop(0, _LANE, body, carry)

    jax.lax.fori_loop(0, chunk // _LANE, group, 0)


@functools.partial(
    jax.jit, static_argnames=("num_rows", "chunk", "interpret")
)
def segment_outer_sum_pallas(
    indices: jnp.ndarray,   # (T,) int32
    us,                     # tuple of (T, d) float32 — left factors
    vs,                     # tuple of (T, d) float32 — right factors
    num_rows: int,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum low-rank outer products into a (num_rows, d, d) table by index.

    Semantics match
        jnp.zeros((num_rows, d, d)).at[indices].add(
            sum_f us[f][:, :, None] * vs[f][:, None, :], mode="drop")
    up to fp32 accumulation order, WITHOUT materializing the (T, d, d)
    intermediate — all rank terms of one occurrence are applied in a single
    dynamic table read-modify-write. `interpret=True` runs in the Pallas
    interpreter (CPU tests).
    """
    us, vs = tuple(us), tuple(vs)
    rank = len(us)
    assert rank == len(vs) and rank >= 1
    for a in (*us, *vs):
        if a.dtype != jnp.float32:
            raise TypeError(f"fp32-only, got {a.dtype}")
        if a.shape != us[0].shape:
            raise ValueError("all factors must share one (T, d) shape")
    t, d = us[0].shape
    if chunk % 1024:
        raise ValueError(f"chunk must be a multiple of 1024, got {chunk}")
    d_sub = _round_up(d, _SUB)
    dv = _round_up(d, _LANE)
    tile = _tile_v(num_rows, d_sub, dv, chunk, rank)
    if tile < _LANE:
        raise ValueError(
            f"table ({num_rows}, {d}, {d}) does not fit VMEM; gate with "
            "fits_in_vmem_outer()"
        )

    indices = indices.astype(jnp.int32)
    pad = (-t) % chunk
    if pad:
        indices = jnp.concatenate(
            [indices, jnp.full((pad,), num_rows, jnp.int32)]
        )
        zp = jnp.zeros((pad, d), jnp.float32)
        us = tuple(jnp.concatenate([u, zp]) for u in us)
        vs = tuple(jnp.concatenate([v, zp]) for v in vs)
    # pad the lane axis to a TILE multiple — the grid must cover every
    # output column even when VMEM pressure picks tile < dv (the sibling
    # pallas_segment.py kernel does the same)
    dv = -(-dv // tile) * tile
    uts = tuple(jnp.pad(u.T, ((0, d_sub - d), (0, 0))) for u in us)  # (d_sub, T)
    vps = tuple(jnp.pad(v, ((0, 0), (0, dv - d))) for v in vs)       # (T, dv)
    tp = t + pad

    out = pl.pallas_call(
        functools.partial(
            _kernel, num_rows=num_rows, d_sub=d_sub, chunk=chunk, rank=rank
        ),
        grid=(dv // tile, tp // chunk),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c, i: (i,), memory_space=pltpu.SMEM),
            *[
                pl.BlockSpec(
                    (d_sub, chunk),
                    lambda c, i: (0, i),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(rank)
            ],
            *[
                pl.BlockSpec(
                    (chunk, tile),
                    lambda c, i: (i, c),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(rank)
            ],
        ],
        out_specs=pl.BlockSpec(
            ((num_rows + 1) * d_sub, tile),
            lambda c, i: (0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            ((num_rows + 1) * d_sub, dv), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(indices, *uts, *vps)
    return out.reshape(num_rows + 1, d_sub, dv)[:num_rows, :d, :d]
