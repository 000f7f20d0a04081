import pytest

from dbgphmm_tpu import kmer
from dbgphmm_tpu.seq import (
    Genome,
    ReadCollection,
    SeqStyle,
    StyledSequence,
    revcomp,
    sanitize_bases,
)
from dbgphmm_tpu.seq import genome as genome_gen
from dbgphmm_tpu.seq.random_seq import MutationProfile, generate, random_mutation


def test_styled_sequence_roundtrip():
    s = StyledSequence(b"ACGT", SeqStyle.LINEAR)
    assert str(s) == "L:ACGT"
    assert StyledSequence.from_str("C:ACGT").style is SeqStyle.CIRCULAR
    assert StyledSequence.from_str("L:ACGT") == s


def test_revcomp():
    assert revcomp(b"ACGT") == b"ACGT"
    assert revcomp(b"AAGC") == b"GCTT"


def test_sanitize():
    assert sanitize_bases(b"acgtN") == b"ACGTn"
    with pytest.raises(ValueError):
        sanitize_bases(b"ACGX")


def test_linear_kmers_with_margins():
    # linear 'ATC' with k=3 -> nnA nAT ATC TCn Cnn
    kms = list(kmer.linear_sequence_to_kmers(b"ATC", 3))
    assert kms == [b"nnA", b"nAT", b"ATC", b"TCn", b"Cnn"]


def test_circular_kmers():
    kms = list(kmer.circular_sequence_to_kmers(b"ATC", 3))
    assert kms == [b"ATC", b"TCA", b"CAT"]


def test_fragment_kmers():
    kms = list(kmer.linear_fragment_sequence_to_kmers(b"ATCG", 3))
    assert kms == [b"ATC", b"TCG"]


def test_kmer_relations():
    km = b"ATC"
    assert kmer.prefix(km) == b"AT"
    assert kmer.suffix(km) == b"TC"
    assert b"TCA" in kmer.childs(km)
    assert b"TCn" in kmer.childs(km)
    assert b"nAT" in kmer.parents(km)
    assert kmer.is_adjacent(b"ATC", b"TCG")
    assert not kmer.is_adjacent(b"ATC", b"AGG")
    assert kmer.overlap(b"ATC", b"TCG") == b"ATCG"
    assert kmer.is_starting(b"nnA")
    assert kmer.is_ending(b"Cnn")
    assert kmer.is_null(b"nnn")
    assert kmer.kmers_join([b"ATC", b"TCG", b"CGT"]) == b"ATCGT"


def test_genome_generators_deterministic():
    g1 = genome_gen.simple(100, 42)
    g2 = genome_gen.simple(100, 42)
    assert g1 == g2
    assert g1.genome_size() == 100

    d = genome_gen.diploid(200, 0, 0.05, 1)
    assert len(d) == 2
    assert d[0].seq != d[1].seq

    t = genome_gen.tandem_repeat_polyploid_with_unique_homo_ends(
        20, 10, 0, 0.0, 0, 50, 2, 0.02, 0
    )
    assert len(t) == 2
    # homo ends shared
    assert t[0].seq[:50] == t[1].seq[:50]
    assert t[0].seq[-50:] == t[1].seq[-50:]


def test_mutation_rates():
    seq = generate(10000, 0)
    mutated, ops = random_mutation(seq, MutationProfile.uniform(0.01), 1)
    # ~3% of bases touched (mut+ins+del each 1%)
    assert 100 < len(ops) < 600
    assert abs(len(mutated) - len(seq)) < 200


def test_genome_to_kmers():
    g = Genome([StyledSequence.linear(b"ATC")])
    kms = g.to_kmers(3)
    assert kms[b"nnA"] == 1
    assert kms[b"ATC"] == 1
    assert sum(kms.values()) == 5


def test_read_collection_fasta_roundtrip(tmp_path):
    rc = ReadCollection([b"ACGT", b"GGTT"])
    p = tmp_path / "reads.fa"
    rc.to_fasta(p)
    rc2 = ReadCollection.from_fasta(p)
    assert rc2.reads == rc.reads
    assert rc.total_bases() == 8
    assert rc.average_length() == 4.0


def test_genome_fasta_roundtrip(tmp_path):
    g = Genome(
        [StyledSequence.linear(b"ACGTACGT"), StyledSequence.circular(b"TTTTAAAA")]
    )
    p = tmp_path / "genome.fa"
    g.to_fasta(p)
    g2 = Genome.from_fasta(p)
    assert g2[0].seq == g[0].seq
    assert g2[1].style is SeqStyle.CIRCULAR
