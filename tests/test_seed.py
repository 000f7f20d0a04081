"""Exact-match seeded mapping generation (multi_dbg.seed).

Oracle strategy (SURVEY §4): the dense decode is exact below
DENSE_MAPPING_MAX_NODES, so seeded+refined mappings are validated against
it on graphs small enough for both paths.
"""

import numpy as np
import pytest

from dbgphmm_tpu.e2e import ReadType, generate_dataset
from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.posterior import Mappings, generate_mappings
from dbgphmm_tpu.multi_dbg.seed import SeedIndex, seed_mappings_arrays
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.seq import genome as G
from dbgphmm_tpu.seq.collection import StyledSequence


@pytest.fixture(scope="module")
def setup():
    g = G.tandem_repeat_polyploid_with_unique_homo_ends(
        50, 4, 0, 0.02, 0, 100, 2, 0.01, 0
    )
    ds = generate_dataset(g, 0, 6, 200, ReadType.FIXED_SIZE_FRAGMENT,
                          PHMMParams.uniform(0.005))
    dbg = MultiDbg.from_styled_seqs(16, list(g))
    return g, ds, dbg


def test_suffix_index_matches_kmers(setup):
    _g, _ds, dbg = setup
    idx = SeedIndex(dbg, s=12)
    for e in range(0, dbg.n_edges_full(), 7):
        km = dbg.kmer_full(e)
        key = km[-12:]
        if b"n" in key:
            continue
        hit = idx.lookup(key)
        assert hit is not None and e in hit.tolist(), (e, km)


def test_seed_exact_substring_contains_truth(setup):
    g, _ds, dbg = setup
    hap = bytes(g[0].seq)
    read = hap[20:170]
    arrs = seed_mappings_arrays(dbg, [read])
    a = arrs[0]
    kmap = dbg.to_kmer_map()
    k = dbg.k
    misses = 0
    for i in range(k - 1, len(read)):
        true_e = kmap.get(read[i - k + 1 : i + 1])
        if true_e is None:
            continue
        if true_e not in set(a[i][a[i] >= 0].tolist()):
            misses += 1
    assert misses == 0
    # no empty rows anywhere (head positions are bridged backward)
    assert ((a >= 0).sum(axis=1) > 0).all()


def test_seeded_mappings_match_dense_decode(setup):
    """Seeded sets + constrained refine vs the exact dense decode: the
    from-scratch path for this graph size.  read_logps must agree to a few
    nats (the hint constrains to a superset of the posterior's support) and
    the dense top-1 state must live inside the refined sets."""
    _g, ds, dbg = setup
    reads = list(ds.reads)[:12]
    params = PHMMParams.uniform(0.005)

    dense = generate_mappings(dbg, params, reads)  # n < 4000 -> exact dense
    arrs = seed_mappings_arrays(dbg, reads)
    seeds = Mappings(arrs, [np.zeros(a.shape) for a in arrs], None, None, -1)
    seeded = generate_mappings(
        dbg, params, reads, hint=seeds, hint_regen=False
    )

    lp_d = dense.read_logps
    lp_s = seeded.read_logps
    assert np.all(np.isfinite(lp_s))
    # constrained score <= full score; must not be catastrophically below
    assert np.all(lp_s <= lp_d + 1e-6)
    assert np.all(lp_s >= lp_d - 10.0), (lp_d - lp_s)

    hits = tot = 0
    for r in range(len(reads)):
        dn, dl = dense.nodes[r], dense.logps[r]
        sn = seeded.nodes[r]
        for i in range(dn.shape[0]):
            if (dn[i] >= 0).any():
                top1 = int(dn[i][np.argmax(dl[i])])
                tot += 1
                if top1 in set(sn[i][sn[i] >= 0].tolist()):
                    hits += 1
    assert hits / max(1, tot) > 0.95, (hits, tot)


def test_seeded_scores_survive_indels(setup):
    """A read with a hand-inserted and a hand-deleted base must not floor:
    the indel-aware bridging + connectivity repair keep the constrained
    score within ~30 nats of the clean read's."""
    g, _ds, dbg = setup
    hap = bytes(g[0].seq)
    clean = hap[10:190]
    corrupt = bytearray(clean)
    corrupt.insert(60, ord(b"A") if clean[60] != ord(b"A") else ord(b"C"))
    del corrupt[120]
    reads = [clean, bytes(corrupt)]
    params = PHMMParams.uniform(0.005)
    arrs = seed_mappings_arrays(dbg, reads)
    seeds = Mappings(arrs, [np.zeros(a.shape) for a in arrs], None, None, -1)
    seeded = generate_mappings(
        dbg, params, reads, hint=seeds, hint_regen=False
    )
    lp = seeded.read_logps
    assert np.isfinite(lp).all()
    assert lp[1] > lp[0] - 30.0, lp
