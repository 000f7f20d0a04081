"""Draft DBG construction pipeline tests (ref: src/multi_dbg/draft.rs)."""

import numpy as np
import pytest

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.draft import (
    create_draft_from_reads,
    min_squared_error_copy_nums_from_freqs,
)
from dbgphmm_tpu.seq.collection import ReadCollection, StyledSequence
from dbgphmm_tpu.seq.genome import tandem_repeat_polyploid_with_unique_homo_ends
from dbgphmm_tpu.seq.random_seq import generate


def perfect_fragment_reads(genome_seqs, read_len=50, coverage=10, seed=0):
    rng = np.random.default_rng(seed)
    reads = []
    for seq in genome_seqs:
        n_reads = int(len(seq) * coverage / read_len)
        for _ in range(n_reads):
            start = rng.integers(0, max(len(seq) - read_len, 1))
            reads.append(seq[start : start + read_len])
    return ReadCollection(reads)


def test_draft_haploid_perfect_reads():
    seq = generate(500, 7)
    reads = perfect_fragment_reads([seq], read_len=50, coverage=20)
    dbg = create_draft_from_reads(
        k=16,
        reads=reads,
        p_error=0.0,
        genome_size=len(seq),
        n_haplotypes=1,
        min_count=2,
        min_deadend_count=2,
        verbose=False,
    )
    assert dbg.k == 16
    assert dbg.is_copy_nums_valid()
    # reconstructed genome size close to truth (margins may clip ends)
    assert abs(dbg.genome_size() - len(seq)) <= 50
    # assembled sequence must be a substring of the genome (ends clipped by
    # coverage at the margins)
    haps = dbg.get_linear_haplotype_seqs()
    assert len(haps) == 1
    assert haps[0][0].seq in seq


def test_draft_diploid():
    g = tandem_repeat_polyploid_with_unique_homo_ends(
        10, 5, 0, 0.0, 0, 100, 2, 0.05, 0
    )
    reads = perfect_fragment_reads([s.seq for s in g], read_len=60, coverage=20, seed=1)
    dbg = create_draft_from_reads(
        k=20,
        reads=reads,
        p_error=0.0,
        genome_size=g.genome_size(),
        n_haplotypes=2,
        min_count=2,
        min_deadend_count=2,
        verbose=False,
    )
    assert dbg.is_copy_nums_valid()
    assert abs(dbg.genome_size() - g.genome_size()) <= 150


def test_mse_refit_from_freqs():
    # build true dbg, perturb copy nums, re-fit from true-frequency signal
    seq = b"GATCCACGGATTACGGATCA"
    dbg = MultiDbg.from_styled_seqs(6, [StyledSequence.linear(seq)])
    true_cn = dbg.get_copy_nums()
    # freqs = copy_num * coverage for each full edge
    coverage = 10.0
    freqs = [dbg.copy_num(e) * coverage for e in range(dbg.n_edges_full())]
    fitted = min_squared_error_copy_nums_from_freqs(dbg, freqs, coverage, None)
    assert fitted == true_cn
