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


@jax.jit
def _totals_vmapped(dm, init_b, plogt_b, clogt_b, codes, lens):
    per_read = _scores_vmapped(dm, init_b, plogt_b, clogt_b, codes, lens)
    return jnp.sum(jnp.where(lens[None, :] > 0, per_read, 0.0), axis=1)


@jax.jit
def _totals_vmapped_mapped(dm, init_b, plogt_b, clogt_b, codes, lens, mn):
    per_read = _scores_vmapped_mapped(
        dm, init_b, plogt_b, clogt_b, codes, lens, mn
    )
    return jnp.sum(jnp.where(lens[None, :] > 0, per_read, 0.0), axis=1)


@jax.jit
def _totals_vmapped_mapped_pos(dm, init_b, plogt_b, clogt_b, codes, lens,
                               mn, pp, cp, sp):
    per_read = _scores_vmapped_mapped_pos(
        dm, init_b, plogt_b, clogt_b, codes, lens, mn, pp, cp, sp
    )
    return jnp.sum(jnp.where(lens[None, :] > 0, per_read, 0.0), axis=1)


def _pad_reads_axis(arr: np.ndarray, m: int, fill):
    """Pad axis 0 (reads) to a multiple of m."""
    pad = (-arr.shape[0]) % m
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


def candidate_log_likelihoods(
    models: Sequence[PHMMModel],
    codes: np.ndarray,
    lens: np.ndarray,
    dtype=jnp.float64,
    map_nodes: np.ndarray = None,
    positions=None,
    mesh=None,
) -> np.ndarray:
    """Total log P(R|X_c) = sum over reads of log P(read|X_c), for each
    candidate model (same topology, different probabilities).

    When ``map_nodes`` [B, L, A] is given, uses the mapping-constrained
    sparse kernel (ref: freq.rs:175-192 scoring with mappings) — the
    production path for large graphs.

    When ``mesh`` is given (a ("cand", "reads") mesh from
    :func:`dbgphmm_tpu.parallel.make_mesh`), candidates are sharded along
    "cand" and reads along "reads"; the per-read log-likelihood sum lowers to
    a psum over the reads axis (the reference's rayon fan-outs
    posterior.rs:504-515 + freq.rs:175-192 become the two mesh axes).

    Returns [n_candidates] float64.
    """
    from .forward import pad_model

    C = len(models)
    pad = _bucket(C)
    if mesh is not None:
        n_cand_shard = mesh.shape["cand"]
        pad = -(-pad // n_cand_shard) * n_cand_shard
    models = [pad_model(m) for m in models]  # shared bucket (same topology)
    base = to_device(models[0], dtype=dtype, pad=False)
    as_d = lambda arrs: jnp.asarray(np.stack(arrs), dtype=dtype)
    init = [m.init_logp for m in models] + [models[0].init_logp] * (pad - C)
    plogt = [m.parent_logt for m in models] + [models[0].parent_logt] * (pad - C)
    clogt = [m.child_logt for m in models] + [models[0].child_logt] * (pad - C)

    codes = np.asarray(codes)
    lens = np.asarray(lens)
    if mesh is not None:
        from ..parallel.sharding import put_read_sharded, put_replicated
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_read_shard = mesh.shape["reads"]
        codes = _pad_reads_axis(codes, n_read_shard, -1)
        lens = _pad_reads_axis(lens, n_read_shard, 0)
        from ..parallel.sharding import _put_sharded, gather_to_host

        cand_sh = NamedSharding(mesh, P("cand"))
        put_c = lambda arrs: _put_sharded(cand_sh, as_d(arrs))
        put_r = lambda a, ax=0: put_read_sharded(mesh, a, ax, flat=False)
        base_d = put_replicated(mesh, base)
        codes_d, lens_d = put_r(codes), put_r(lens)
        if positions is not None:
            pad_r = lambda a: _pad_reads_axis(np.asarray(a), n_read_shard, -1)
            per_cand = _totals_vmapped_mapped_pos(
                base_d, put_c(init), put_c(plogt), put_c(clogt),
                codes_d, lens_d,
                put_r(pad_r(positions.map_nodes)), put_r(pad_r(positions.prev_pos)),
                put_r(pad_r(positions.cur_pos)), put_r(pad_r(positions.self_pos)),
            )
        elif map_nodes is not None:
            per_cand = _totals_vmapped_mapped(
                base_d, put_c(init), put_c(plogt), put_c(clogt),
                codes_d, lens_d, put_r(_pad_reads_axis(map_nodes, n_read_shard, -1)),
            )
        else:
            per_cand = _totals_vmapped(
                base_d, put_c(init), put_c(plogt), put_c(clogt),
                codes_d, lens_d,
            )
        return gather_to_host(per_cand).astype(np.float64)[:C]

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
