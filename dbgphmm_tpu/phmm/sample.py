"""Generative read sampling from the PHMM error model
(ref: src/hmmv2/sample.rs, src/graph/genome_graph.rs:328-424).

Reads are emitted by walking the profile HMM along a genome haplotype
(optionally its reverse complement): Match emits the genome base (or a
mismatch), Ins emits a random base, Del skips a genome base.  Every emitted
base records its ground-truth origin, which is the e2e harness's truth label
(ref: PositionedSequence, collection.rs:508-726).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..seq.collection import (
    BASES,
    GenomeGraphPos,
    PositionedSequence,
    revcomp,
)
from .params import PHMMParams


@dataclass
class SampleProfile:
    """(ref: sample.rs:92-156 SampleProfile)"""

    total_bases: Optional[int] = None  # ReadAmount::TotalBases
    n_reads: Optional[int] = None  # ReadAmount::Count
    length: int = 1000  # state count limit per read
    start_points_all: bool = False  # StartPoints::AllStartPoints (full length)
    seed: int = 0


def _sample_read_from_hap(
    seq: bytes,
    hap_id: int,
    start: int,
    max_states: int,
    params: PHMMParams,
    rng: np.random.Generator,
    is_revcomp: bool,
) -> PositionedSequence:
    """Walk M/I/D states from `start` along `seq`, emitting bases with the
    PHMM error model (ref: sample.rs:160-280)."""
    L = len(seq)
    out = bytearray()
    origins: List[GenomeGraphPos] = []
    pos = start
    state = "M"
    # normalized per-state transition distributions (excluding p_end which is
    # applied first at each step)
    p_end = params.p_end
    trans = {
        "M": [("M", params.p_MM), ("I", params.p_MI), ("D", params.p_MD)],
        "I": [("M", params.p_IM), ("I", params.p_II), ("D", params.p_ID)],
        "D": [("M", params.p_DM), ("I", params.p_DI), ("D", params.p_DD)],
    }
    bases = np.frombuffer(BASES, dtype=np.uint8)

    for _step in range(max_states):
        if pos >= L:
            break
        if rng.random() < p_end:
            break
        if state == "M":
            b = seq[pos]
            if rng.random() < params.p_mismatch:
                others = [c for c in BASES if c != b]
                b = others[rng.integers(0, 3)]
            out.append(b)
            if is_revcomp:
                origins.append(GenomeGraphPos(hap_id, L - 1 - pos))
            else:
                origins.append(GenomeGraphPos(hap_id, pos))
            pos += 1
        elif state == "I":
            out.append(int(bases[rng.integers(0, 4)]))
            origins.append(GenomeGraphPos())
        else:  # D
            pos += 1
        # next state
        names, probs = zip(*trans[state])
        probs = np.asarray(probs)
        probs = probs / probs.sum()
        state = names[rng.choice(len(names), p=probs)]

    return PositionedSequence(bytes(out), origins, is_revcomp=is_revcomp)


def sample_positioned_reads(
    genome_seqs: List[bytes],
    params: PHMMParams,
    profile: SampleProfile,
    has_revcomp: bool = False,
) -> List[PositionedSequence]:
    """Sample reads from a genome with the PHMM error model
    (ref: genome_graph.rs:399-424 sample_positioned_reads)."""
    rng = np.random.Generator(np.random.PCG64(profile.seed))
    lengths = np.array([len(s) for s in genome_seqs], dtype=np.float64)
    p_hap = lengths / lengths.sum()

    reads: List[PositionedSequence] = []
    total = 0

    def one_read() -> PositionedSequence:
        hap = int(rng.choice(len(genome_seqs), p=p_hap))
        seq = genome_seqs[hap]
        rc = bool(has_revcomp and rng.random() < 0.5)
        walk_seq = revcomp(seq) if rc else seq
        if profile.start_points_all:
            start = 0
        else:
            start = int(rng.integers(0, len(seq)))
        return _sample_read_from_hap(
            walk_seq, hap, start, profile.length, params, rng, rc
        )

    if profile.n_reads is not None:
        for _ in range(profile.n_reads):
            reads.append(one_read())
    else:
        assert profile.total_bases is not None
        while total < profile.total_bases:
            r = one_read()
            if len(r) == 0:
                continue
            reads.append(r)
            total += len(r)
    return reads
