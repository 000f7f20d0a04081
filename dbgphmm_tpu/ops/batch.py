"""Candidate-batched likelihood evaluation.

The posterior hill-climb scores many neighbor copy-number assignments X
against the same reads.  All candidates share the graph topology (only
transition/init probabilities change), so the per-candidate arrays are
stacked on a leading axis and vmapped — "batch of X's x batch of reads"
(ref: SURVEY.md section 2.11 candidate parallelism; replaces the reference's
rayon fan-out over neighbors, posterior.rs:504-515).

Candidate counts vary between hill-climb iterations; we pad to power-of-two
buckets to avoid XLA recompilation churn.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..phmm.model import PHMMModel
from .forward import DeviceModel, forward_scores, to_device


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


@jax.jit
def _scores_vmapped(dm: DeviceModel, init_b, plogt_b, clogt_b, codes, lens):
    def one(init_logp, parent_logt, child_logt):
        dmc = dataclasses.replace(
            dm, init_logp=init_logp, parent_logt=parent_logt, child_logt=child_logt
        )
        return forward_scores(dmc, codes, lens, renorm=True)

    return jax.vmap(one)(init_b, plogt_b, clogt_b)  # [C, B]


@jax.jit
def _scores_vmapped_mapped(dm: DeviceModel, init_b, plogt_b, clogt_b, codes,
                           lens, map_nodes):
    from .sparse import forward_scores_mapped

    def one(init_logp, parent_logt, child_logt):
        dmc = dataclasses.replace(
            dm, init_logp=init_logp, parent_logt=parent_logt, child_logt=child_logt
        )
        return forward_scores_mapped(dmc, codes, lens, map_nodes, renorm=True)

    return jax.vmap(one)(init_b, plogt_b, clogt_b)  # [C, B]


@jax.jit
def _scores_vmapped_mapped_pos(dm: DeviceModel, init_b, plogt_b, clogt_b,
                               codes, lens, mn, pp, cp, sp):
    from .sparse import forward_scores_mapped_pos

    def one(init_logp, parent_logt, child_logt):
        dmc = dataclasses.replace(
            dm, init_logp=init_logp, parent_logt=parent_logt, child_logt=child_logt
        )
        return forward_scores_mapped_pos(dmc, codes, lens, mn, pp, cp, sp)

    return jax.vmap(one)(init_b, plogt_b, clogt_b)  # [C, B]


def candidate_log_likelihoods(
    models: Sequence[PHMMModel],
    codes: np.ndarray,
    lens: np.ndarray,
    dtype=jnp.float64,
    map_nodes: np.ndarray = None,
    positions=None,
) -> np.ndarray:
    """Total log P(R|X_c) = sum over reads of log P(read|X_c), for each
    candidate model (same topology, different probabilities).

    When ``map_nodes`` [B, L, A] is given, uses the mapping-constrained
    sparse kernel (ref: freq.rs:175-192 scoring with mappings) — the
    production path for large graphs.

    Returns [n_candidates] float64.
    """
    from .forward import pad_model

    C = len(models)
    pad = _bucket(C)
    models = [pad_model(m) for m in models]  # shared bucket (same topology)
    base = to_device(models[0], dtype=dtype, pad=False)
    as_d = lambda arrs: jnp.asarray(np.stack(arrs), dtype=dtype)
    init = [m.init_logp for m in models] + [models[0].init_logp] * (pad - C)
    plogt = [m.parent_logt for m in models] + [models[0].parent_logt] * (pad - C)
    clogt = [m.child_logt for m in models] + [models[0].child_logt] * (pad - C)
    if positions is not None:
        per_read = _scores_vmapped_mapped_pos(
            base, as_d(init), as_d(plogt), as_d(clogt),
            jnp.asarray(codes), jnp.asarray(lens),
            jnp.asarray(positions.map_nodes), jnp.asarray(positions.prev_pos),
            jnp.asarray(positions.cur_pos), jnp.asarray(positions.self_pos),
        )
    elif map_nodes is not None:
        per_read = _scores_vmapped_mapped(
            base, as_d(init), as_d(plogt), as_d(clogt),
            jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(map_nodes),
        )
    else:
        per_read = _scores_vmapped(
            base, as_d(init), as_d(plogt), as_d(clogt),
            jnp.asarray(codes), jnp.asarray(lens),
        )  # [pad, B]
    out = np.asarray(per_read, dtype=np.float64)[:C].sum(axis=1)
    return out
