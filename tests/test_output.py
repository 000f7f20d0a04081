"""Serialization round-trip tests (ref: multi_dbg.rs:1808-1830 dump/load
equivalence for every toy graph)."""

import numpy as np
import pytest

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg import output as out
from dbgphmm_tpu.multi_dbg.posterior import (
    Mappings,
    Posterior,
    PosteriorSample,
    Score,
)
from dbgphmm_tpu.seq.collection import StyledSequence


def toys():
    return [
        ("linear", MultiDbg.from_styled_seqs(4, [StyledSequence.linear(b"GATCC")])),
        ("circular", MultiDbg.from_styled_seqs(4, [StyledSequence.circular(b"GATCCTTGA")])),
        (
            "diploid",
            MultiDbg.from_styled_seqs(
                5,
                [
                    StyledSequence.linear(b"GATCCAC"),
                    StyledSequence.linear(b"GATTCAC"),
                ],
            ),
        ),
        (
            "repeat",
            MultiDbg.from_styled_seqs(
                4, [StyledSequence.linear(b"ACGTTACGTTACGTT")]
            ),
        ),
    ]


@pytest.mark.parametrize("name,dbg", toys())
def test_dbg_roundtrip(name, dbg):
    s = out.to_dbg_string(dbg)
    dbg2 = out.from_dbg_string(s)
    assert dbg2.k == dbg.k
    assert dbg2.n_edges_full() == dbg.n_edges_full()
    assert dbg2.n_edges_compact() == dbg.n_edges_compact()
    assert dbg2.genome_size() == dbg.genome_size()
    assert dbg2.to_kmer_copy_num_map() == dbg.to_kmer_copy_num_map()
    # second round trip is byte-stable
    assert out.to_dbg_string(dbg2) == s


def test_dbg_file_gzip_roundtrip(tmp_path):
    dbg = toys()[0][1]
    p = tmp_path / "x.dbg.gz"
    out.to_dbg_file(dbg, p)
    dbg2 = out.from_dbg_file(p)
    assert dbg2.to_kmer_copy_num_map() == dbg.to_kmer_copy_num_map()


def test_paths_roundtrip(tmp_path):
    paths = [[0, 5, 2, 3], [1, 2]]
    s = out.to_paths_string(paths)
    assert out.from_paths_string(s) == paths
    assert "P\t0,5,2,3" in s


def test_gfa_format():
    dbg = toys()[2][1]
    s = out.to_gfa_string(dbg)
    lines = s.strip().split("\n")
    s_lines = [l for l in lines if l.startswith("S")]
    l_lines = [l for l in lines if l.startswith("L")]
    assert len(s_lines) == dbg.n_edges_compact()
    assert all("DP:f:" in l and "LN:i:" in l for l in s_lines)
    assert len(l_lines) > 0


def make_posterior(n_edges):
    post = Posterior()
    post.add(
        PosteriorSample(
            [1] * n_edges, Score(-100.0, -3.0, 14, 0.0), []
        )
    )
    post.add(
        PosteriorSample(
            [2] + [1] * (n_edges - 1), Score(-105.0, -3.0, 15, 0.0), []
        )
    )
    return post


def test_post_roundtrip():
    post = make_posterior(4)
    s = out.to_post_string(post)
    post2 = out.from_post_string(s)
    assert len(post2.samples) == 2
    assert post2.max_copy_nums() == post.max_copy_nums()
    assert post2.p == pytest.approx(post.p)


def test_inspect_format():
    dbg = toys()[2][1]
    post = make_posterior(dbg.n_edges_compact())
    true_cn = [1] * dbg.n_edges_compact()
    s = out.to_inspect_string(dbg, post, true_cn)
    assert f"{dbg.k}\tG\tn_edges_compact\t{dbg.n_edges_compact()}" in s
    c_lines = [l for l in s.splitlines() if "\tC\t" in l]
    e_lines = [l for l in s.splitlines() if "\tE\t" in l]
    assert len(c_lines) == 2
    assert len(e_lines) == dbg.n_edges_compact()
    # best sample first with normalized posterior prob
    assert c_lines[0].split("\t")[2] == "0"


def test_map_roundtrip(tmp_path):
    dbg = toys()[0][1]
    reads = [b"GATC", b"ATCC"]
    nodes = [
        np.array([[0, 1], [1, -1], [2, 3], [3, -1]], dtype=np.int32),
        np.array([[1, 2], [2, -1], [3, -1], [4, -1]], dtype=np.int32),
    ]
    logps = [
        np.log(np.array([[0.6, 0.4], [1.0, 1e-300], [0.5, 0.5], [1.0, 1e-300]])),
        np.log(np.array([[0.7, 0.3], [1.0, 1e-300], [1.0, 1e-300], [1.0, 1e-300]])),
    ]
    maps = Mappings(nodes, logps)
    p = tmp_path / "x.mpz"
    out.to_map_file(dbg, p, reads, maps)
    maps2 = out.from_map_file(p)
    assert maps2.n_reads() == 2
    np.testing.assert_array_equal(maps2.nodes[0], nodes[0])
    np.testing.assert_allclose(maps2.logps[1][0], logps[1][0], atol=1e-12)
