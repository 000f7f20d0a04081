"""HashDbg unit tests (ref: src/hashdbg.rs colocated tests)."""

import pytest

from dbgphmm_tpu.hashdbg import HashDbg
from dbgphmm_tpu.seq.collection import StyledSequence


def test_count_from_fragments():
    hd = HashDbg.from_fragment_seqs(4, [b"ATCGATCG", b"AT"])  # short read skipped
    assert hd.get(b"ATCG") == 2
    assert hd.get(b"TCGA") == 1
    assert hd.get(b"ATAT") == 0
    assert hd.n() == 4


def test_count_from_styled():
    hd = HashDbg.from_styled_seqs(4, [StyledSequence.linear(b"ATCG")])
    # margins included
    assert hd.get(b"nnnA") == 1
    assert hd.get(b"Gnnn") == 1
    assert hd.is_copy_nums_consistent()


def test_childs_parents():
    hd = HashDbg.from_fragment_seqs(4, [b"ATCGA"])
    assert hd.childs(b"ATCG") == [b"TCGA"]
    assert hd.parents(b"TCGA") == [b"ATCG"]
    assert hd.is_deadend(b"ATCG")  # no parents


def test_remove_rare():
    hd = HashDbg.from_fragment_seqs(3, [b"AAAT", b"AAAT", b"CCGT"])
    n = hd.remove_rare_kmers(2)
    assert n == 2  # CCG, CGT dropped
    assert hd.get(b"AAA") == 2


def test_remove_deadends_cascade():
    # chain hanging off a cycle: the whole chain should cascade away
    hd = HashDbg(3)
    cycle = b"ATCGA"  # circularize manually: ATC TCG CGA GAT(+wrap)
    for km, c in ((b"ATC", 5), (b"TCG", 5), (b"CGA", 5), (b"GAT", 5)):
        hd.set(km, c)
    # low-count chain TTA -> TAT -> ATC
    hd.set(b"TTA", 1)
    hd.set(b"TAT", 1)
    removed = hd.remove_deadends(3)
    assert removed == 2
    assert hd.n() == 4


def test_augment_deadends():
    hd = HashDbg.from_fragment_seqs(4, [b"ATCGA"])
    starts, ends = hd.augment_deadends()
    assert starts and ends
    assert hd.get(b"nnnA") == 1
    assert hd.get(b"Annn") == 1
    assert hd.is_copy_nums_consistent()


def test_components_and_largest():
    hd = HashDbg.from_fragment_seqs(4, [b"AAAAAA", b"CCCCC"])
    comps = hd.connected_components()
    assert len(comps) == 2
    big = hd.largest_component()
    assert big.has(b"AAAA") and not big.has(b"CCCC")


def test_stats():
    hd = HashDbg.from_styled_seqs(4, [StyledSequence.linear(b"ATCGG")])
    ds = hd.degree_stats()
    assert sum(ds.values()) > 0
    cs = hd.copy_num_stats()
    assert cs.get(1, 0) > 0


def test_gfa():
    hd = HashDbg.from_fragment_seqs(4, [b"ATCGATTT"])
    gfa = hd.to_gfa_string()
    assert gfa.startswith("S\t")
    assert "DP:f:" in gfa
