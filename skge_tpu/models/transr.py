"""TransR — translation in relation-specific spaces (Lin et al., AAAI 2015).

Beyond the reference's roster (SURVEY.md §2.1). Each relation carries a
projection matrix M_p mapping entity space (ncomp) into its own relation
space (rcomp):

    score = -|| M_p e_s + r_p - M_p e_o ||^2

Parameters: E (n_e, ncomp), R (n_r, rcomp), M (n_r, rcomp, ncomp) — a 3-D
row-indexed parameter like RESCAL's W. M initializes to the identity (the
paper's choice: start as TransE), entity and relation rows keep the
`normless1` ball constraint.

TPU design: training scores are two batched MXU matmuls (project s and o)
plus an elementwise reduce. Candidate sweeps (pool / all-entity) are
inherently O(B * N * rcomp * ncomp) — every candidate must pass through
every query's per-relation projection; that cost is intrinsic to TransR's
form, not to this implementation. The sweep chunks candidates through a
`lax.map` of batched (B, chunk) projections so the (B, chunk, rcomp)
transient stays bounded, and `jax.checkpoint` keeps the backward pass from
materializing all chunks at once.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from skge_tpu.models.base import INITIALIZERS, KGEModel, Params, acc_dtype


@dataclass(frozen=True)
class TransR(KGEModel):
    rcomp: int = 0  # relation-space dim; 0 = same as ncomp

    name = "transr"
    post_constraints = {"E": "normless1", "R": "normless1"}

    @property
    def rdim(self) -> int:
        return self.rcomp or self.ncomp

    def slot_spec(self):
        return (
            ("es", "E", "s"), ("eo", "E", "o"),
            ("rp", "R", "p"), ("mp", "M", "p"),
        )

    def init_params(self, key: jax.Array) -> Params:
        init = INITIALIZERS[self.init]
        ke, kr = jax.random.split(key)
        eye = jnp.eye(self.rdim, self.ncomp, dtype=self.jdtype)
        return {
            "E": init(ke, (self.n_entities, self.ncomp), self.jdtype),
            "R": init(kr, (self.n_relations, self.rdim), self.jdtype),
            "M": jnp.broadcast_to(
                eye, (self.n_relations, self.rdim, self.ncomp)
            ).copy(),
        }

    def _project(self, m, e):
        """(B, rcomp) = batched M_p @ e."""
        return jnp.einsum(
            "bij,bj->bi", m, e, preferred_element_type=acc_dtype(e)
        ).astype(e.dtype)

    def score_from_rows(self, rows, dense):
        d = (
            self._project(rows["mp"], rows["es"])
            + rows["rp"]
            - self._project(rows["mp"], rows["eo"])
        )
        return -jnp.sum(d * d, axis=-1)

    def _sweep(self, q, m, cand):
        """-||q - M_b e||^2 for every candidate e, chunked over candidates."""
        n = cand.shape[0]
        chunk = max(1, min(n, 128))
        pad = (-n) % chunk
        cpad = jnp.pad(cand, ((0, pad), (0, 0)))
        cc = cpad.reshape(-1, chunk, cand.shape[1])

        @jax.checkpoint
        def body(cblk):
            proj = jnp.einsum(
                "bij,kj->bki", m, cblk, preferred_element_type=acc_dtype(q)
            ).astype(q.dtype)                        # (B, chunk, rcomp)
            diff = q[:, None, :] - proj
            return -jnp.sum(diff * diff, axis=-1)    # (B, chunk)

        out = jax.lax.map(body, cc)                  # (n_chunks, B, chunk)
        out = jnp.moveaxis(out, 0, 1).reshape(q.shape[0], -1)
        return out[:, :n]

    def score_pool(self, rows, pool_rows, dense, mode):
        m = rows["mp"]
        if mode == 1:
            q = self._project(m, rows["es"]) + rows["rp"]
        else:
            q = self._project(m, rows["eo"]) - rows["rp"]
        return self._sweep(q, m, pool_rows)

    def score_all_o(self, params: Params, s, p):
        m = params["M"][p]
        q = self._project(m, params["E"][s]) + params["R"][p]
        return self._sweep(q, m, params["E"])

    def score_all_s(self, params: Params, o, p):
        m = params["M"][p]
        q = self._project(m, params["E"][o]) - params["R"][p]
        return self._sweep(q, m, params["E"])
