"""Benchmark: graph-PHMM forward likelihood throughput on one chip.

Scenario mirrors the reference's in-repo speed tests
(ref: src/hmmv2/speed.rs:307-315): full-length reads scored against the DBG
of a 1kb genome.  Reference baseline: sparse forward ~0.3 s/read single-core
M1 (=> ~3.33 reads/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 1.0 / 0.3  # ref: speed.rs:307-315, sparse forward 1kb


def main():
    import jax
    import jax.numpy as jnp

    from dbgphmm_tpu.multi_dbg import MultiDbg
    from dbgphmm_tpu.ops import pad_reads, to_device
    from dbgphmm_tpu.ops.forward import forward_scores
    from dbgphmm_tpu.phmm.params import PHMMParams
    from dbgphmm_tpu.seq.collection import StyledSequence
    from dbgphmm_tpu.seq.random_seq import generate

    genome_len = 1000
    k = 40
    n_reads = 1024
    read_len = 1000

    seq = generate(genome_len, 0)
    dbg = MultiDbg.from_styled_seqs(k, [StyledSequence.linear(seq)])
    model = dbg.to_phmm(PHMMParams.uniform(0.001))
    dm = to_device(model, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    reads = []
    for _ in range(n_reads):
        # full-length-ish reads with small random trims
        trim = int(rng.integers(0, 10))
        reads.append(seq[trim : genome_len - int(rng.integers(0, 10))])
    codes, lens = pad_reads(reads, pad_to=read_len)
    codes = jnp.asarray(codes)
    lens = jnp.asarray(lens)

    # warmup / compile (np.asarray forces a real device round-trip; on the
    # axon platform block_until_ready alone returns early)
    np.asarray(forward_scores(dm, codes, lens, renorm=True))

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = np.asarray(forward_scores(dm, codes, lens, renorm=True))
    dt = (time.perf_counter() - t0) / n_iter

    reads_per_sec = n_reads / dt
    print(
        json.dumps(
            {
                "metric": "phmm_forward_reads_per_sec_1kb_genome_k40",
                "value": round(reads_per_sec, 2),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
