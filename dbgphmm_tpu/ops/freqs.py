"""Transition-usage expectations (edge freqs) and init freqs on device.

Counterpart of the reference's ``to_edge_and_init_freqs``
(ref: src/hmmv2/freq.rs:276-389): the expected number of times each PHMM
transition (graph edge slot) and each Begin->node transition was used while
emitting the reads.  Consumed by the EM-style Q score (q.py) and the ``freq``
CLI.

Freqs are returned per adjacency slot ``[B, n, D]`` (aligned with
``DeviceModel.child_idx/child_logt``) rather than per edge id — the Q score
contracts them directly against ``child_logt``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .forward import DeviceModel, NEG, _b_init, _b_step, _reverse_codes, forward_tables


@functools.partial(jax.jit, static_argnames=("renorm",))
def trans_and_init_freqs(
    dm: DeviceModel,
    codes: jnp.ndarray,
    lens: jnp.ndarray,
    renorm: bool = False,
):
    """Returns (slot_freqs [B, n, D], init_freqs [B, n], logp [B]), linear
    space (ref: freq.rs:332-389 accumulated over i = 0..=n)."""
    B, L = codes.shape
    n = dm.emission.shape[0]
    D = dm.child_idx.shape[1]
    dtype = dm.init_logp.dtype
    lt = dm.lt

    f_final, f_tabs = forward_tables(dm, codes, lens, renorm=renorm)
    logp = f_final.e + f_final.off

    child = dm.child_idx  # [n, D]
    logt = dm.child_logt  # [n, D]

    slot_freqs = jnp.zeros((B, n, D), dtype=dtype)
    init_freqs = jnp.zeros((B, n), dtype=dtype)

    # i = n term: only *d transitions, bi1 = B[n] = b_init (d = p_end)
    b0 = _b_init(dm, B, n, dtype)
    scale_n = (f_final.off - logp)[:, None, None]
    bd_l = b0.d[:, child]  # [B, n, D] = p_end everywhere
    fm_k = f_final.m[:, :, None]
    fi_k = f_final.i[:, :, None]
    fd_k = f_final.d[:, :, None]
    slot_freqs = slot_freqs + (
        jnp.exp(fm_k + logt[None] + lt.MD + bd_l + scale_n)
        + jnp.exp(fi_k + logt[None] + lt.ID + bd_l + scale_n)
        + jnp.exp(fd_k + logt[None] + lt.DD + bd_l + scale_n)
    )
    # init d-terms at i=n: F[n].mb = -inf (n>0); ib finite
    init_freqs = init_freqs + (
        jnp.exp(f_final.mb[:, None] + dm.init_logp[None] + lt.MD + b0.d + scale_n[:, :, 0])
        + jnp.exp(f_final.ib[:, None] + dm.init_logp[None] + lt.ID + b0.d + scale_n[:, :, 0])
    )

    xs_rev = _reverse_codes(codes, lens)
    pos = jnp.arange(L, dtype=lens.dtype)

    def body(carry, xs):
        bst, sf, inf = carry
        x, t = xs
        valid = t < lens
        i_merge = lens - 1 - t  # the interval index i being accumulated
        bi2 = bst  # B[i+1]
        bst1 = _b_step(dm, bst, x, valid, renorm)  # B[i]

        # F[i]: init table if i==0 else f_tabs[i-1]
        i_f = jnp.clip(i_merge - 1, 0, L - 1)
        take = lambda tab: jnp.take_along_axis(tab, i_f[None, :, None], axis=0)[0]
        take1 = lambda tab: jnp.take_along_axis(tab, i_f[None, :], axis=0)[0]
        fm = take(f_tabs.m)
        fi = take(f_tabs.i)
        fd = take(f_tabs.d)
        fmb = take1(f_tabs.mb)
        fib = take1(f_tabs.ib)
        foff = take1(f_tabs.off)
        is_init = i_merge == 0
        fm = jnp.where(is_init[:, None], NEG, fm)
        fi = jnp.where(is_init[:, None], NEG, fi)
        fd = jnp.where(is_init[:, None], NEG, fd)
        fmb = jnp.where(is_init, 0.0, fmb)
        fib = jnp.where(is_init, NEG, fib)
        foff = jnp.where(is_init, 0.0, foff)

        p_emit = jnp.where(dm.emission[None] == x[:, None], lt.match, lt.mismatch)
        p_emit_l = p_emit[:, child.reshape(-1)].reshape(B, n, D)
        bm2_l = bi2.m[:, child]  # [B, n, D]
        bd1_l = bst1.d[:, child]

        sc_m = (foff + bi2.off - logp)[:, None, None]
        sc_d = (foff + bst1.off - logp)[:, None, None]
        fm_k = fm[:, :, None]
        fi_k = fi[:, :, None]
        fd_k = fd[:, :, None]
        contrib = (
            jnp.exp(fm_k + logt[None] + lt.MM + p_emit_l + bm2_l + sc_m)
            + jnp.exp(fi_k + logt[None] + lt.IM + p_emit_l + bm2_l + sc_m)
            + jnp.exp(fd_k + logt[None] + lt.DM + p_emit_l + bm2_l + sc_m)
            + jnp.exp(fm_k + logt[None] + lt.MD + bd1_l + sc_d)
            + jnp.exp(fi_k + logt[None] + lt.ID + bd1_l + sc_d)
            + jnp.exp(fd_k + logt[None] + lt.DD + bd1_l + sc_d)
        )
        sf = sf + jnp.where(valid[:, None, None], contrib, 0.0)

        # init transitions Begin -> v
        contrib0 = (
            jnp.exp(fmb[:, None] + dm.init_logp[None] + lt.MM + p_emit + bi2.m + sc_m[:, :, 0])
            + jnp.exp(fib[:, None] + dm.init_logp[None] + lt.IM + p_emit + bi2.m + sc_m[:, :, 0])
            + jnp.exp(fmb[:, None] + dm.init_logp[None] + lt.MD + bst1.d + sc_d[:, :, 0])
            + jnp.exp(fib[:, None] + dm.init_logp[None] + lt.ID + bst1.d + sc_d[:, :, 0])
        )
        inf = inf + jnp.where(valid[:, None], contrib0, 0.0)
        return (bst1, sf, inf), None

    (bf, slot_freqs, init_freqs), _ = jax.lax.scan(
        body, (b0, slot_freqs, init_freqs), (xs_rev.T, pos)
    )
    return slot_freqs, init_freqs, logp
