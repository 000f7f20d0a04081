"""Frontier-decode vs dense-oracle differential agreement (CPU-sized
regression of scripts/validate_large_n_mapping.py; VERDICT r2 item 4).

Round-1b failure mode: the evolving top-K frontier silently dropped
true-path cells on repeat-ambiguous graphs and the mapped scorer ranked
the TRUTH 1e5 log units below a wrong assignment.  This test pins the two
decision quantities on a repeat-diploid at CPU scale:

1. the frontier decode's read log-likelihood matches the exact dense f64
   forward within 1 nat;
2. the BETWEEN-CANDIDATE score differential (true vs perturbed copy
   numbers) under the frontier mapping matches the dense differential —
   the quantity that steers the hill climb.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.neighbors import to_short_neighbors
from dbgphmm_tpu.ops import pad_reads, to_device
from dbgphmm_tpu.ops.adaptive import mappings_sparse_adaptive
from dbgphmm_tpu.ops.forward import forward_scores
from dbgphmm_tpu.ops.sparse import forward_scores_mapped
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.phmm.sample import SampleProfile, sample_positioned_reads_phmm
from dbgphmm_tpu.seq import genome as genome_gen


def test_frontier_decode_matches_dense_oracle_on_repeat_diploid():
    # ~4.6kb diploid tandem repeat (8 x 250bp units, 2% unit divergence)
    g = genome_gen.tandem_repeat_polyploid_with_unique_homo_ends(
        250, 12, 0, 0.02, 1, 150, 2, 0.02, 0
    )
    seqs = [s.seq for s in g]
    k = 20
    dbg = MultiDbg.from_styled_seqs(k, list(g))
    n = dbg.n_edges_full()
    assert n > 4200, n  # enough states that the frontier actually trims

    params = PHMMParams.uniform(0.001)
    model = dbg.to_phmm(params, mode="non_zero")
    dm32 = to_device(model, dtype=jnp.float32)
    dm64 = to_device(model, dtype=jnp.float64)

    reads = [
        r.seq
        for r in sample_positioned_reads_phmm(
            seqs, params, SampleProfile(n_reads=2, length=1600, seed=0)
        )
        if len(r.seq) >= 800
    ]
    assert reads
    codes, lens = pad_reads(reads)
    codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)

    # dense f64 oracle
    lp_dense = np.asarray(forward_scores(dm64, codes_d, lens_d, renorm=True))

    # production frontier configuration
    lp_f, mn_f, _ml = mappings_sparse_adaptive(
        dm32, codes_d, lens_d, n_top=64, n_active=128, max_ratio=30.0,
        n_warmup=16, stored_k=128, store_bf16=True,
    )
    gaps = np.abs(np.asarray(lp_f) - lp_dense)
    assert gaps.max() < 1.0, gaps

    # candidate differential under the frontier mapping vs dense
    truth = dbg.get_copy_nums()
    nbrs = to_short_neighbors(dbg, max_cycle_size=10, max_flip=2)
    assert nbrs
    pert = nbrs[0][0]
    diff = {}
    for name, cn in (("true", truth), ("pert", pert)):
        work = dbg.copy()
        work.set_copy_nums(cn)
        mm = work.to_phmm(params, mode="normal")
        sc_mapped = np.asarray(
            forward_scores_mapped(
                to_device(mm, dtype=jnp.float32), codes_d, lens_d,
                jnp.asarray(np.asarray(mn_f)), renorm=True,
            )
        ).sum()
        sc_dense = np.asarray(
            forward_scores(
                to_device(mm, dtype=jnp.float64), codes_d, lens_d,
                renorm=True,
            )
        ).sum()
        diff[name] = (sc_mapped, sc_dense)
    d_mapped = diff["true"][0] - diff["pert"][0]
    d_dense = diff["true"][1] - diff["pert"][1]
    assert abs(d_mapped - d_dense) < 1.0, (d_mapped, d_dense)
    assert (d_mapped > 0) == (d_dense > 0)
