"""Pallas TPU segment-sum: the gradient-aggregation scatter, hand-rolled.

The iid-corruption train step is dominated by ONE op: scatter-adding the
(T, D) per-occurrence gradient rows into the (R, D) parameter-table
accumulator (T ~ 19 rows per positive with 8 negatives; 80% of step time —
see bench.py --sampler random-mode). XLA lowers `.at[idx].add` to a
row-serialized scatter at ~31 ns/row on v5e. This kernel keeps the WHOLE
accumulator table resident in VMEM (v5e has 128 MB; a FB15k-sized
16.3k x 152 fp32 table is 16.7 MB) and streams occurrence chunks through a
branch-free read-modify-write loop at ~25 ns/row — measured 1.35x over the
XLA scatter at FB15k shapes (92k occurrences: 2.35 ms vs 3.2 ms).

Measured design notes (v5e, this repo's _pallas prototypes):
- per-row dynamic VMEM ops cost ~25 ns regardless of shadow-accumulator
  count or unroll beyond 4 — the scalar-core address pipeline is the wall,
  not the RMW dependency chain;
- XLA *gathers* run ~5 ns/row (vectorized HBM reads), so gathers stay in
  XLA and only the scatter comes here;
- a bf16 one-hot MXU matmul formulation has a 2.3 ms FLOP floor at these
  shapes and measured 4.4 ms — rejected.

Out-of-range indices — negative OR >= num_rows — are dropped by routing
them to a sacrificial row. NOTE: negative indices do NOT wrap (unlike
NumPy-style `.at[]` indexing, which wraps -n <= idx < 0); the aggregation
layer only ever produces indices in [0, num_rows] (num_rows = padding),
so dropping is the defensive choice against silent row corruption.

Reference context: this implements the summation half of skge/util.py's
`grad_sum_matrix` (~30) — the CSR duplicate-summing matvec — as a TPU
kernel; the averaging division happens in ops/aggregate.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_UNROLL = 4
_SPARE_ROWS = 8  # sacrificial rows for dropped indices
_VMEM_BUDGET = 110 * 1024 * 1024  # leave headroom under v5e's 128 MB


def _padded_bytes(rows: int, cols: int) -> int:
    lanes = -(-cols // _LANE) * _LANE
    return rows * lanes * 4


def _col_tile(num_rows: int, feat: int, chunk: int) -> int:
    """Largest feature tile (lane multiple) fitting the VMEM budget.

    Wide rows (RESCAL's d*d relation slices) are processed in column tiles:
    the accumulator, output block and double-buffered input chunks for ONE
    tile must fit; per-row loop cost amortizes over tile lanes, which is
    exactly where this kernel beats XLA hardest (XLA's row-scatter pays its
    per-row overhead regardless of width).
    """
    feat_pad = -(-feat // _LANE) * _LANE
    # acc + out + double-buffered input chunks, with 25% headroom for the
    # pipeline's extra buffers (Mosaic's accounting exceeds the naive sum).
    # Returns 0 when even one 128-lane tile exceeds the budget — the
    # caller must fall back to the XLA scatter rather than compile a
    # kernel that trips vmem_limit_bytes near the boundary.
    denom = 4 * (2 * num_rows + _SPARE_ROWS + 2 * chunk)
    tile = int(_VMEM_BUDGET * 0.75) // denom // _LANE * _LANE
    return int(min(feat_pad, tile))


def fits_in_vmem(num_rows: int, feat: int, chunk: int = 4096) -> bool:
    """Whether the accumulator + pipeline buffers fit at SOME column tile,
    under the SAME 25%-headroom accounting `_col_tile` uses (a mismatch
    here would select the kernel and then fail at compile time)."""
    return _col_tile(num_rows, feat, chunk) >= _LANE


def _kernel(idx_ref, g_ref, out_ref, acc_ref, *, num_rows: int, chunk: int):
    step = pl.program_id(1)  # chunk index (innermost); col tile is dim 0

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, carry):
        # branch-free: dropped/padding indices — negative OR >= num_rows —
        # land in the sacrificial row (negatives deliberately do NOT wrap)
        for u in range(_UNROLL):
            j = i * _UNROLL + u
            raw = idx_ref[j]
            r = jnp.where(raw < 0, num_rows, jnp.minimum(raw, num_rows))
            acc_ref[pl.ds(r, 1), :] = (
                acc_ref[pl.ds(r, 1), :] + g_ref[pl.ds(j, 1), :]
            )
        return carry

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)

    @pl.when(step == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[pl.ds(0, num_rows), :]


@functools.partial(
    jax.jit, static_argnames=("num_rows", "chunk", "interpret")
)
def segment_sum_pallas(
    indices: jnp.ndarray,   # (T,) int32
    grads: jnp.ndarray,     # (T, D) float32
    num_rows: int,
    chunk: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum `grads` rows into a (num_rows, D) table by `indices`.

    Semantics match `jnp.zeros((num_rows, D)).at[indices].add(grads,
    mode="drop")` up to fp32 accumulation order for indices in
    [0, num_rows); all out-of-range indices (including negatives, which
    NumPy-style indexing would wrap) are dropped. Arbitrary D: wide rows are
    swept in VMEM-sized column tiles (grid dim 0). `interpret=True` runs
    the kernel in the Pallas interpreter (CPU tests).
    """
    if grads.dtype != jnp.float32:
        raise TypeError(f"segment_sum_pallas is fp32-only, got {grads.dtype}")
    if chunk % 1024:
        raise ValueError(
            f"chunk must be a multiple of 1024 (SMEM 1-D tiling), got {chunk}"
        )
    t, d = grads.shape
    indices = indices.astype(jnp.int32)
    pad = (-t) % chunk
    if pad:
        indices = jnp.concatenate(
            [indices, jnp.full((pad,), num_rows, jnp.int32)]
        )
        grads = jnp.concatenate([grads, jnp.zeros((pad, d), grads.dtype)])
    tile = _col_tile(num_rows, d, chunk)
    if tile < _LANE:
        raise ValueError(
            f"accumulator for num_rows={num_rows} does not fit VMEM at any "
            "column tile — gate with fits_in_vmem() and fall back to the "
            "XLA scatter"
        )
    dpad = (-d) % tile
    if dpad:
        grads = jnp.pad(grads, ((0, 0), (0, dpad)))

    out = pl.pallas_call(
        functools.partial(_kernel, num_rows=num_rows, chunk=chunk),
        grid=((d + dpad) // tile, (t + pad) // chunk),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c, i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk, tile), lambda c, i: (i, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_rows, tile), lambda c, i: (0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, d + dpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((num_rows + _SPARE_ROWS, tile), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET
        ),
        interpret=interpret,
    )(indices, grads)
    return out[:, :d] if dpad else out
