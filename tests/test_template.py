"""Template-built PHMM arrays must match the direct MultiDbg.to_phmm path."""

import numpy as np
import pytest

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.neighbors import to_short_neighbors
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.phmm.template import make_template
from dbgphmm_tpu.seq.collection import StyledSequence


@pytest.mark.parametrize("mode", ["normal", "non_zero", "uniform"])
def test_template_matches_direct(mode):
    g = [StyledSequence.linear(b"GATCCACGGATTACG"), StyledSequence.linear(b"GATCAACGGATTACG")]
    dbg = MultiDbg.from_styled_seqs(6, g)
    params = PHMMParams.uniform(0.01)
    tpl = make_template(dbg, params)

    for cn in [dbg.get_copy_nums()] + [c for c, _i in to_short_neighbors(dbg, 6, 2)[:4]]:
        work = dbg.copy()
        work.set_copy_nums(cn)
        direct = work.to_phmm(params, mode=mode)
        templ = tpl.model_for(cn, mode=mode)
        np.testing.assert_array_equal(templ.emission, direct.emission)
        np.testing.assert_allclose(templ.init_logp, direct.init_logp, atol=1e-12)
        np.testing.assert_array_equal(
            np.where(np.isfinite(templ.parent_logt), templ.parent_idx, -1),
            np.where(np.isfinite(direct.parent_logt), direct.parent_idx, -1),
        )
        np.testing.assert_allclose(
            np.sort(templ.parent_logt, axis=1),
            np.sort(direct.parent_logt, axis=1),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.sort(templ.child_logt, axis=1),
            np.sort(direct.child_logt, axis=1),
            atol=1e-12,
        )
        assert templ.params.n_warmup == dbg.k


def test_template_degree_bucket_matches_pad_model():
    """Template degree must match ops.forward.pad_model's bucket {2, 5}:
    a D=3 template combined with a degree-padded (D=5) DeviceModel crashed
    the mapped-pos scoring kernel (observed on u500(8) at k=40)."""
    from dbgphmm_tpu.ops.forward import pad_model

    # node "ACG" (k-1=3) has three in-edges AACG/TACG/CACG -> parent deg 3
    seq = b"TTGAACGTCATACGTGGCACGTAA"
    dbg = MultiDbg.from_styled_seqs(4, [StyledSequence.linear(seq)])
    params = PHMMParams.uniform(0.01)
    tpl = make_template(dbg, params)
    assert tpl.parent_idx.shape[1] in (2, 5)
    m = tpl.model_for(dbg.get_copy_nums())
    assert pad_model(m).parent_idx.shape[1] == m.parent_idx.shape[1]


def test_scoring_with_positions_on_degree3_graph():
    """End-to-end candidate scoring through template + precomputed positions
    on a graph with parent degree 3 (regression: shape mismatch D=3 vs 5)."""
    from dbgphmm_tpu.multi_dbg.posterior import (
        generate_mappings,
        sample_posterior,
    )
    from dbgphmm_tpu.seq.collection import ReadCollection

    seq = b"TTGAACGTCATACGTGGCACGTAA"
    dbg = MultiDbg.from_styled_seqs(4, [StyledSequence.linear(seq)])
    params = PHMMParams.uniform(0.01)
    reads = ReadCollection([seq[i : i + 12] for i in range(0, 12, 3)])
    maps = generate_mappings(dbg, params, reads)
    post = sample_posterior(
        dbg, params, reads, maps, len(seq), 10, max_iter=2,
    )
    assert np.isfinite(post.max_sample().score.p())
