"""Sparse (mapping-constrained) kernel vs dense oracle
(ref: tests/hmm.rs:174-231 sparse-vs-dense < 1e-9; forward.rs:640-669
forward_with_mapping ~ dense within 0.1 log units)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.posterior import generate_mappings
from dbgphmm_tpu.ops import forward_scores, node_freqs_and_mappings, pad_reads, to_device
from dbgphmm_tpu.ops.sparse import forward_scores_mapped, pad_mappings
from dbgphmm_tpu.phmm import PHMMParams, linear_phmm
from dbgphmm_tpu.phmm.model import linear_random_phmm
from dbgphmm_tpu.seq.collection import ReadCollection, StyledSequence
from dbgphmm_tpu.seq.random_seq import generate


def test_full_mapping_equals_dense():
    """With the mapping covering ALL nodes at every position, the sparse
    kernel must reproduce the dense kernel exactly."""
    m = linear_phmm(b"ATTCGATCGT", PHMMParams.high_error())
    dm = to_device(m, dtype=jnp.float64)
    reads = [b"CGATC", b"ATTCGATCGT"]
    codes, lens = pad_reads(reads)
    B, L = codes.shape
    n = m.n_nodes
    all_nodes = np.tile(np.arange(n, dtype=np.int32), (B, L, 1))
    dense = forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False)
    sparse = forward_scores_mapped(
        dm, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(all_nodes),
        renorm=False,
    )
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense), atol=1e-9)


def test_topk_mapping_close_to_dense():
    """Top-k mapping from posterior decode gives scores within 0.1 log units
    of dense (ref: forward.rs:664-668 assert log_diff < 0.1)."""
    m = linear_random_phmm(150, 0, PHMMParams.default())
    dm = to_device(m, dtype=jnp.float64)
    seq = generate(150, 0)
    reads = [seq[10:90], seq[40:140]]
    codes, lens = pad_reads(reads)
    logp, _f, map_nodes, _ml = node_freqs_and_mappings(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False, n_active=10
    )
    dense = forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False)
    sparse = forward_scores_mapped(
        dm, jnp.asarray(codes), jnp.asarray(lens), map_nodes, renorm=False
    )
    diff = np.abs(np.asarray(sparse) - np.asarray(dense))
    assert np.all(diff < 0.1), diff


def test_renorm_consistency():
    m = linear_random_phmm(100, 1, PHMMParams.default())
    dm = to_device(m, dtype=jnp.float64)
    seq = generate(100, 1)
    reads = [seq[5:80]]
    codes, lens = pad_reads(reads)
    _lp, _f, map_nodes, _ml = node_freqs_and_mappings(
        dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False, n_active=12
    )
    a = forward_scores_mapped(dm, jnp.asarray(codes), jnp.asarray(lens), map_nodes, renorm=False)
    b = forward_scores_mapped(dm, jnp.asarray(codes), jnp.asarray(lens), map_nodes, renorm=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_mapped_scoring_on_dbg_candidates():
    """Sparse scoring distinguishes copy-number candidates like dense does."""
    h1 = b"TTAGGCTTCGATCGAATGCC"
    h2 = b"TTAGGCTTGGATCGAATGCC"
    dbg = MultiDbg.from_styled_seqs(
        8, [StyledSequence.linear(h1), StyledSequence.linear(h2)]
    )
    reads = ReadCollection([h1[2:18], h2[3:19], h1[:16], h2[4:]])
    params = PHMMParams.uniform(0.001)
    maps = generate_mappings(dbg, params, reads, n_active=12)
    codes, lens = pad_reads(list(reads))
    map_arr = pad_mappings(maps, codes.shape[1], 12)

    true_model = dbg.to_phmm(params)
    work = dbg.copy()
    # corrupt a copy number by one short cycle
    from dbgphmm_tpu.multi_dbg.neighbors import to_short_neighbors

    nbr_cn, _info = to_short_neighbors(dbg, 8, 2)[0]
    work.set_copy_nums(nbr_cn)
    bad_model = work.to_phmm(params)

    dms = [to_device(mm, dtype=jnp.float64) for mm in (true_model, bad_model)]
    scores = [
        float(
            np.sum(
                np.asarray(
                    forward_scores_mapped(
                        dm, jnp.asarray(codes), jnp.asarray(lens),
                        jnp.asarray(map_arr), renorm=True,
                    )
                )
            )
        )
        for dm in dms
    ]
    dense_scores = [
        float(np.sum(np.asarray(forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=False))))
        for dm in dms
    ]
    # same ordering and close values
    assert (scores[0] > scores[1]) == (dense_scores[0] > dense_scores[1])
    assert abs(scores[0] - dense_scores[0]) < 0.5
