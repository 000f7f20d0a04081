"""Dataset/simulation harness tests (ref: src/e2e.rs)."""

import numpy as np
import pytest

from dbgphmm_tpu.e2e import (
    Dataset,
    ReadType,
    generate_dataset,
    generate_simple_genome_fragment_dataset,
)
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.seq import genome as G


def test_generate_dataset_fragment():
    g = G.simple(200, 5)
    ds = generate_dataset(g, 0, 10, 50, ReadType.FIXED_SIZE_FRAGMENT,
                          PHMMParams.uniform(0.001))
    assert ds.coverage() == pytest.approx(10, rel=0.3)
    assert 30 <= ds.average_read_length() <= 55
    # ground truth origins present
    assert ds.reads.positioned is not None
    pr = ds.reads.positioned[0]
    assert any(o.is_match() for o in pr.origins)


def test_generate_dataset_revcomp_justified():
    g = G.simple(300, 1)
    ds = generate_dataset(g, 0, 8, 60, ReadType.FRAGMENT_WITH_REVCOMP,
                          PHMMParams.uniform(0.0))
    # justify_strand flips reads to forward; with p=0 every read must be an
    # exact substring of the genome
    seq = g[0].seq
    n_match = sum(1 for r in ds.reads if r in seq)
    assert n_match == len(ds.reads)


def test_dataset_json_roundtrip(tmp_path):
    ds = generate_simple_genome_fragment_dataset()
    p = tmp_path / "ds.json"
    ds.to_json_file(p)
    ds2 = Dataset.from_json_file(p)
    assert ds2.genome == ds.genome
    assert ds2.reads.reads == ds.reads.reads
    assert ds2.params.p_mismatch == ds.params.p_mismatch


def test_write_files(tmp_path):
    g = G.simple(100, 2)
    ds = generate_dataset(g, 1, 5, 30, ReadType.FIXED_SIZE_FRAGMENT,
                          PHMMParams.uniform(0.001))
    ds.write_files(str(tmp_path / "x"))
    for suffix in (".json", ".genome.fa", ".reads.fa", ".reads.sam"):
        assert (tmp_path / f"x{suffix}").exists()


def test_paf_export():
    g = G.simple(200, 3)
    ds = generate_dataset(g, 0, 5, 50, ReadType.FRAGMENT_WITH_REVCOMP,
                          PHMMParams.uniform(0.001))
    lines = ds.reads.to_paf_lines([len(s.seq) for s in g])
    assert len(lines) > 0
    cols = lines[0].split("\t")
    assert len(cols) == 12
    assert cols[4] in "+-"
    assert int(cols[6]) == 200


def test_error_rate_matches_params():
    """Sampled reads carry ~the configured error rate."""
    g = G.simple(2000, 7)
    p = 0.02
    ds = generate_dataset(g, 0, 10, 500, ReadType.FIXED_SIZE_FRAGMENT,
                          PHMMParams.uniform(p))
    # align-free estimate: fraction of read 20-mers not present in genome
    seq = g[0].seq
    kmers = {seq[i : i + 20] for i in range(len(seq) - 19)}
    bad = total = 0
    for r in ds.reads:
        for i in range(0, len(r) - 19, 20):
            total += 1
            if r[i : i + 20] not in kmers:
                bad += 1
    # reference emission semantics (picker.rs:32-43): mismatch prob =
    # 3p/(1-p+3p) ~ 5.8%, plus p_MI+p_MD = 2p ~ 4% indel starts per state
    # -> per-base error ~ 9.4%; P(20-mer clean) ~ 0.906^20 ~ 0.14
    # -> ~0.86 of 20-mers carry an error
    frac = bad / total
    assert 0.75 < frac < 0.95, frac
