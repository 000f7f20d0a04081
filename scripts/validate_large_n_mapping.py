"""Validate the >DENSE_COMPUTE_MAX_NODES (65,536) mapping regime at
production scale (VERDICT r1 item 6; ref: scripts/sim.sh:160,196-228
G=40-80kb diploid configs).

Past 65,536 full edges, `generate_mappings` switches from the
dense-compute/compact-store decode (exact forward over all n nodes) to the
evolving top-K frontier (`mappings_sparse_adaptive` with n_top=64).  This
script builds a production-scale diploid DBG (G ~ 80kb total, n > 65,536
full edges), samples 10kb reads from the genome with the graph-PHMM
sampler, and measures:

1. per-read log-likelihood gap: frontier decode vs exact dense-compute
   decode (forced by raising the threshold);
2. mapping agreement: top-1 node match rate and active-set overlap;
3. downstream effect: mapped-scorer candidate scores under both mappings.

Run on the TPU (the dense-compute pass is O(B*L*n)); writes a summary to
stdout for docs/ACCURACY_NOTES.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_large_n_mapping.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.ops import pad_reads, to_device
from dbgphmm_tpu.ops.adaptive import mappings_sparse_adaptive
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.phmm.sample import (
    SampleProfile,
    sample_positioned_reads_phmm,
)
from dbgphmm_tpu.seq import genome as genome_gen


def main():
    k = 40
    # ~40kb per haplotype diploid (500bp unit x 80), 2% divergence — the
    # sim.sh production class
    g = genome_gen.tandem_repeat_polyploid_with_unique_homo_ends(
        500, 80, 0, 0.02, 1, 300, 2, 0.02, 0
    )
    seqs = [s.seq for s in g]
    print(f"# genome: {len(seqs)} haplotypes, total {g.genome_size()} bp")

    t0 = time.time()
    dbg = MultiDbg.from_styled_seqs(k, list(g))
    n = dbg.n_edges_full()
    print(f"# DBG k={k}: n_full_edges={n} (built in {time.time()-t0:.0f}s)")
    assert n > 65536, f"need n > 65536, got {n} — raise n_unit"

    params = PHMMParams.uniform(0.001)
    model = dbg.to_phmm(params, mode="non_zero")
    dm = to_device(model, dtype=jnp.float32)

    # 4kb reads, small batch: the forced-dense reference pass is O(B*L*n)
    # with per-step top_k over n=80k lanes — the heaviest op this framework
    # runs; keep its footprint bounded (an 11kb x8 variant crashed the TPU
    # worker process)
    reads = [
        r.seq
        for r in sample_positioned_reads_phmm(
            seqs, params,
            SampleProfile(n_reads=4, length=4400, seed=0), has_revcomp=False,
        )
        if len(r.seq) >= 2000
    ]
    print(f"# {len(reads)} reads, lengths {[len(r) for r in reads]}")
    codes, lens = pad_reads(reads)
    codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)

    n_active, max_ratio = 128, 30.0

    # (a) frontier decode (the production >65536 path)
    t0 = time.time()
    lp_f, mn_f, ml_f = mappings_sparse_adaptive(
        dm, codes_d, lens_d, n_top=64, n_active=n_active,
        max_ratio=max_ratio, n_warmup=16,
    )
    lp_f = np.asarray(lp_f)
    t_frontier = time.time() - t0
    print(f"# frontier decode: {t_frontier:.1f}s logp={lp_f[:4].round(1)}")

    # (b) exact dense-compute decode (forced): n_top spans the full n via
    # dense warmup the whole read (n_warmup = L)
    D = int(dm.parent_idx.shape[1])
    t0 = time.time()
    lp_d, mn_d, ml_d = mappings_sparse_adaptive(
        dm, codes_d, lens_d, n_top=max(40, 256 // (D + 1)),
        n_active=n_active, max_ratio=max_ratio, n_warmup=int(codes.shape[1]),
    )
    lp_d = np.asarray(lp_d)
    t_dense = time.time() - t0
    print(f"# dense-compute decode: {t_dense:.1f}s logp={lp_d[:4].round(1)}")

    gaps = np.abs(lp_f - lp_d)
    print(f"# per-read |logp gap| frontier-vs-dense: max={gaps.max():.3f} "
          f"mean={gaps.mean():.3f}")

    mn_f, mn_d = np.asarray(mn_f), np.asarray(mn_d)
    top1, overlap, denom = 0, 0.0, 0
    for b, L in enumerate(lens):
        for j in range(int(L)):
            denom += 1
            top1 += int(mn_f[b, j, 0] == mn_d[b, j, 0])
            sf = set(mn_f[b, j][mn_f[b, j] >= 0].tolist())
            sd = set(mn_d[b, j][mn_d[b, j] >= 0].tolist())
            if sd:
                overlap += len(sf & sd) / len(sd)
    print(f"# mapping agreement: top-1 {top1/denom:.4f}, "
          f"active-set overlap {overlap/denom:.4f}")

    # (c) downstream: mapped-scorer scores under both mappings for the true
    # copy numbers and a perturbed candidate
    from dbgphmm_tpu.ops.sparse import forward_scores_mapped

    model_n = dbg.to_phmm(params, mode="normal")
    dmn = to_device(model_n, dtype=jnp.float32)
    for name, mn_x in (("frontier", mn_f), ("dense", mn_d)):
        sc = np.asarray(
            forward_scores_mapped(
                dmn, codes_d, lens_d, jnp.asarray(mn_x), renorm=True
            )
        )
        print(f"# mapped score ({name} mapping): total={sc.sum():.2f} "
              f"per-read={sc[:4].round(1)}")

    ok = gaps.max() < 1.0 and top1 / denom > 0.95
    print(f"# VERDICT: {'OK' if ok else 'DISAGREEMENT — investigate'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
