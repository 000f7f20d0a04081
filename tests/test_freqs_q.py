"""Edge-transition usage expectations + Q score
(ref: src/hmmv2/freq.rs:276-389, src/hmmv2/q.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dbgphmm_tpu.ops import pad_reads, to_device
from dbgphmm_tpu.ops.freqs import trans_and_init_freqs
from dbgphmm_tpu.phmm import PHMMParams, linear_phmm
from dbgphmm_tpu.phmm.q import QScore, q_score_exact


def test_edge_freqs_linear_zero_error():
    """Error-free full-length read on a linear chain: every chain transition
    used exactly once, init mass 1 at node 0."""
    seq = b"ATTCGATCGT"
    model = linear_phmm(seq, PHMMParams.zero_error())
    dm = to_device(model, dtype=jnp.float64)
    codes, lens = pad_reads([seq])
    slot_freqs, init_freqs, logp = trans_and_init_freqs(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False
    )
    n = len(seq)
    sf = np.asarray(slot_freqs)[0][:n]
    inf = np.asarray(init_freqs)[0][:n]
    # chain transitions (slot 0 of nodes 0..8) all ~1
    np.testing.assert_allclose(sf[:-1, 0], 1.0, atol=1e-6)
    # init: all mass at node 0
    assert inf[0] == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(inf[1:], 0.0, atol=1e-6)


def test_edge_freqs_partial_read():
    """A mid-chain fragment: transitions inside the fragment used once,
    outside unused."""
    seq = b"ATTCGATCGT"
    model = linear_phmm(seq, PHMMParams.default())
    dm = to_device(model, dtype=jnp.float64)
    read = seq[3:8]
    codes, lens = pad_reads([read])
    slot_freqs, init_freqs, logp = trans_and_init_freqs(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False
    )
    sf = np.asarray(slot_freqs)[0][:len(seq)]
    inf = np.asarray(init_freqs)[0][:len(seq)]
    # transitions 3->4..6->7 used ~1; 0->1 unused
    np.testing.assert_allclose(sf[3:7, 0], 1.0, atol=0.05)
    assert sf[0, 0] < 1e-3
    assert inf[3] == pytest.approx(1.0, abs=0.05)


def test_q_score():
    seq = b"ATTCGATCGT"
    model = linear_phmm(seq, PHMMParams.default())
    dm = to_device(model, dtype=jnp.float64)
    codes, lens = pad_reads([seq, seq[2:9]])
    slot_freqs, init_freqs, _lp = trans_and_init_freqs(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False
    )
    sf = np.asarray(slot_freqs).sum(axis=0)
    inf = np.asarray(init_freqs).sum(axis=0)
    q = q_score_exact(model, sf, inf)
    assert np.isfinite(q.total())
    # init usages total ~ n_reads; trans score <= 0 (log probs)
    assert inf.sum() == pytest.approx(2.0, abs=0.05)
    assert q.trans <= 0.0
    # chain trans probs are 1 (log 0) on a linear graph -> trans ~ 0
    assert q.trans == pytest.approx(0.0, abs=1e-6)
    d = q.sub(QScore(0.0, 0.0, 0.0))
    assert d.total() == pytest.approx(q.total())
