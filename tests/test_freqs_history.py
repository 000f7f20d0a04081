"""Generative-sampling oracle: posterior node/edge freqs of a sampled read
approximate the sampler's recorded state-usage History
(ref: tests/hmm.rs:15-120 check_node_freq_similarity;
src/hmmv2/sample/history.rs:63-100)."""

import jax.numpy as jnp
import numpy as np

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.ops import node_freqs_and_mappings, pad_reads, to_device
from dbgphmm_tpu.ops.forward import forward_scores, full_prob_backward
from dbgphmm_tpu.ops.freqs import trans_and_init_freqs
from dbgphmm_tpu.phmm import PHMMParams
from dbgphmm_tpu.phmm.model import linear_random_phmm
from dbgphmm_tpu.phmm.sample import (
    History,
    sample_histories,
    sample_history,
)
from dbgphmm_tpu.seq.collection import StyledSequence


def _decode_node_freqs(model, read):
    dm = to_device(model, dtype=jnp.float64)
    codes, lens = pad_reads([read])
    logp, freqs, _mn, _ml = node_freqs_and_mappings(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True
    )
    return float(logp[0]), np.asarray(freqs)[0][: model.n_nodes], dm, codes, lens


def test_history_basics():
    m = linear_random_phmm(100, 0, PHMMParams.default())
    rng = np.random.Generator(np.random.PCG64(0))
    h = sample_history(m, rng, max_states=500, endable=True)
    r = h.to_sequence()
    assert h.total_bases() == len(r)
    nf = h.to_node_freqs(m.n_nodes)
    # every visited state is a node usage; M+I+D counts >= emitted bases - ins
    assert nf.sum() >= len(r) - 5
    tc = h.to_trans_counts(m)
    # transitions happen between distinct consecutive nodes
    assert tc.sum() <= len(h)


def test_node_freqs_match_history_linear():
    """Posterior node freqs from forward/backward decode track the
    generative History's usage counts (ref: tests/hmm.rs:15-120)."""
    params = PHMMParams.uniform(0.001)
    m = linear_random_phmm(300, 11, params)
    rng = np.random.Generator(np.random.PCG64(7))
    # full-length walk from the chain head
    h = sample_history(m, rng, max_states=2000, endable=False, start_node=0)
    r = h.to_sequence()
    assert len(r) > 200
    nf_true = h.to_node_freqs(m.n_nodes)
    logp, nf_est, dm, codes, lens = _decode_node_freqs(m, r)
    assert np.isfinite(logp)
    # total expected usage ~ total true usage
    assert abs(nf_est.sum() - nf_true.sum()) / nf_true.sum() < 0.05
    # strong per-node agreement on a low-error read (nf_true is ~all-ones on
    # a full-length walk, so compare by relative L1 rather than correlation)
    l1 = np.abs(nf_est - nf_true).sum() / nf_true.sum()
    assert l1 < 0.1, l1
    # forward and backward full probs agree (ref: tests/hmm.rs:44-56)
    f = forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True)
    b = full_prob_backward(dm, jnp.asarray(codes), jnp.asarray(lens))
    assert abs(float(f[0]) - float(b[0])) < 0.1


def test_node_freqs_match_history_on_dbg():
    """Same oracle on a DBG-derived PHMM with a repeat (branching graph)."""
    seq = b"TTAGGCTTCGATCGAATGCCTTAGGCTTACGTAGGATCCGATA"
    dbg = MultiDbg.from_styled_seqs(8, [StyledSequence.linear(seq)])
    params = PHMMParams.uniform(0.001)
    model = dbg.to_phmm(params, mode="non_zero")
    rng = np.random.Generator(np.random.PCG64(3))
    nf_true = np.zeros(model.n_nodes)
    reads = []
    for _ in range(8):
        h = sample_history(model, rng, max_states=400, endable=True)
        if h.total_bases() < 10:
            continue
        nf_true += h.to_node_freqs(model.n_nodes)
        reads.append(h.to_sequence())
    dm = to_device(model, dtype=jnp.float64)
    codes, lens = pad_reads(reads)
    _logp, freqs, _mn, _ml = node_freqs_and_mappings(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True
    )
    nf_est = np.asarray(freqs).sum(axis=0)[: model.n_nodes]
    assert abs(nf_est.sum() - nf_true.sum()) / nf_true.sum() < 0.05
    corr = np.corrcoef(nf_true, nf_est)[0, 1]
    assert corr > 0.9, corr


def test_edge_freqs_match_history():
    """Expected transition usage (EdgeFreqs) tracks the History's recorded
    transitions (ref: history.rs:80-100 to_edge_freqs + freq.rs:276-298)."""
    params = PHMMParams.uniform(0.001)
    m = linear_random_phmm(200, 5, params)
    rng = np.random.Generator(np.random.PCG64(9))
    h = sample_history(m, rng, max_states=1200, endable=False, start_node=0)
    r = h.to_sequence()
    tc_true = h.to_trans_counts(m)
    dm = to_device(m, dtype=jnp.float64)
    codes, lens = pad_reads([r])
    trans, _init, _logp = trans_and_init_freqs(
        dm, jnp.asarray(codes), jnp.asarray(lens)
    )
    tc_est = np.asarray(trans)[0][: tc_true.shape[0], : tc_true.shape[1]]
    assert abs(tc_est.sum() - tc_true.sum()) / max(tc_true.sum(), 1) < 0.05
    l1 = np.abs(tc_est - tc_true).sum() / max(tc_true.sum(), 1)
    assert l1 < 0.1, l1


def test_sample_histories_deterministic():
    m = linear_random_phmm(80, 2, PHMMParams.default())
    a = sample_histories(m, 3, 200, seed=5)
    b = sample_histories(m, 3, 200, seed=5)
    assert [h.steps for h in a] == [h.steps for h in b]
    c = sample_histories(m, 3, 200, seed=6)
    assert [h.steps for h in a] != [h.steps for h in c]
