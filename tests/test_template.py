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
