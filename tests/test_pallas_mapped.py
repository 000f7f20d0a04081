"""Pallas full-scan mapped kernel vs the XLA positions kernel (interpret mode
on CPU; the real-TPU run is exercised by bench/driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbgphmm_tpu.multi_dbg import MultiDbg
from dbgphmm_tpu.multi_dbg.posterior import generate_mappings
from dbgphmm_tpu.multi_dbg.neighbors import to_short_neighbors
from dbgphmm_tpu.ops import pad_reads, to_device
from dbgphmm_tpu.ops.pallas_mapped import (
    build_streams,
    eff_tables,
    lin_params_vector,
    pallas_mapped_scores,
)
from dbgphmm_tpu.ops.sparse import (
    forward_scores_mapped_pos,
    pad_mappings,
    precompute_positions,
)
from dbgphmm_tpu.phmm.params import PHMMParams
from dbgphmm_tpu.phmm.template import make_template
from dbgphmm_tpu.seq.collection import ReadCollection, StyledSequence


@pytest.fixture(scope="module")
def setup():
    h1 = b"TTAGGCTTCGATCGAATGCCAGGTTACG"
    h2 = b"TTAGGCTTGGATCGAATGCCAGGTTACG"
    dbg = MultiDbg.from_styled_seqs(8, [StyledSequence.linear(h1), StyledSequence.linear(h2)])
    params = PHMMParams.uniform(0.001)
    reads = ReadCollection([h1[2:26], h2[3:27], h1[:24], h2[4:]])
    maps = generate_mappings(dbg, params, reads, n_active=12)
    codes, lens = pad_reads(list(reads), pad_to=32)  # multiple of TL=8
    tpl = make_template(dbg, params)
    mn = pad_mappings(maps, codes.shape[1], 12)
    pos = precompute_positions(mn, tpl.parent_idx, parent_exists=tpl.parent_exists)
    candidates = [dbg.get_copy_nums()] + [
        cn for cn, _i in to_short_neighbors(dbg, 8, 2)[:3]
    ]
    return dbg, params, tpl, pos, codes, lens, candidates


def test_pallas_matches_positions_kernel(setup):
    dbg, params, tpl, pos, codes, lens, candidates = setup
    streams = build_streams(tpl, pos, codes, lens, dbg)
    eff, inv_total = eff_tables(streams, candidates)

    dm32 = to_device(tpl.model_for(candidates[0]), dtype=jnp.float32)
    ltv = lin_params_vector(dm32)

    out = np.asarray(
        pallas_mapped_scores(
            jnp.asarray(eff), jnp.asarray(inv_total),
            jnp.asarray(streams.lens),
            jnp.asarray(streams.codes), jnp.asarray(streams.emis),
            jnp.asarray(streams.numce), jnp.asarray(streams.selfp),
            jnp.asarray(streams.prevp), jnp.asarray(streams.curp),
            jnp.asarray(streams.dence), ltv,
            n_max_gaps=params.n_max_gaps, TL=8, interpret=True,
        )
    )
    B = codes.shape[0]
    assert out.shape[1] >= B

    # reference: per-candidate positions kernel (f64, log space)
    for c, cn in enumerate(candidates):
        work = dbg.copy()
        work.set_copy_nums(cn)
        dm = to_device(tpl.model_for(cn), dtype=jnp.float64)
        ref = np.asarray(
            forward_scores_mapped_pos(
                dm, jnp.asarray(codes), jnp.asarray(lens),
                jnp.asarray(pos.map_nodes), jnp.asarray(pos.prev_pos),
                jnp.asarray(pos.cur_pos), jnp.asarray(pos.self_pos),
            )
        )
        got = out[c, :B]
        finite = np.isfinite(ref)
        assert np.all(np.isfinite(got[finite])), (c, got, ref)
        np.testing.assert_allclose(got[finite], ref[finite], atol=2e-3, rtol=1e-5)


def test_pallas_scorer_matches_score_candidates(setup):
    """PallasMappedScorer (the production scoring fast path) must rank and
    value candidates like the XLA mapped-pos scoring used on CPU."""
    from dbgphmm_tpu.ops.batch import candidate_log_likelihoods
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer
    from dbgphmm_tpu.phmm.template import make_template

    dbg, params, tpl, pos, codes, lens, candidates = setup
    # a non-TL-multiple read length exercises the internal padding
    codes_odd = codes[:, :27]
    from dbgphmm_tpu.ops.sparse import precompute_positions

    pos_odd = precompute_positions(
        pos.map_nodes[:, :27], tpl.parent_idx, parent_exists=tpl.parent_exists
    )
    lens_odd = np.minimum(lens, 27)
    scorer = PallasMappedScorer(tpl, pos_odd, codes_odd, lens_odd, tpl.params)
    scorer.interpret = True
    got = scorer.scores(candidates)

    models = [tpl.model_for(cn) for cn in candidates]
    ref = candidate_log_likelihoods(
        models, codes_odd, lens_odd, positions=pos_odd
    )
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-5)


def test_pallas_scorer_flags_blocked_candidates(setup):
    """A candidate that zeroes edges on every read path underflows the
    linear-space kernel; scores_detailed must flag it (ok=False) so the
    caller rescoring path kicks in."""
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer

    dbg, params, tpl, pos, codes, lens, candidates = setup
    zero_all = [0] * dbg.n_edges_compact()
    scorer = PallasMappedScorer(tpl, pos, codes, lens, tpl.params)
    scorer.interpret = True
    sums, ok = scorer.scores_detailed([candidates[0], zero_all])
    assert ok[0]
    assert not ok[1]


def test_pallas_log_kernel_matches_f64(setup):
    """The log-space Pallas kernel must match the f64 XLA log kernel on both
    good candidates AND blocked ones (copy-0 cuts) where the linear kernel
    underflows to -inf."""
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer
    from dbgphmm_tpu.ops.sparse import forward_scores_mapped_pos
    from dbgphmm_tpu.ops.forward import to_device

    dbg, params, tpl, pos, codes, lens, candidates = setup
    zero_mid = list(candidates[0])
    # zero out a used edge -> blocked reads
    zero_mid[0] = 0
    cands = candidates + [zero_mid]

    scorer = PallasMappedScorer(tpl, pos, codes, lens, tpl.params, space="log")
    scorer.interpret = True
    got, ok = scorer.scores_detailed(cands)

    for c, cn in enumerate(cands):
        dm = to_device(tpl.model_for(cn), dtype=jnp.float64)
        ref = np.asarray(
            forward_scores_mapped_pos(
                dm, jnp.asarray(codes), jnp.asarray(lens),
                jnp.asarray(pos.map_nodes), jnp.asarray(pos.prev_pos),
                jnp.asarray(pos.cur_pos), jnp.asarray(pos.self_pos),
            )
        ).sum()
        # -inf only where the exact kernel is -inf (structurally blocked)
        assert np.isfinite(got[c]) == np.isfinite(ref), (c, got[c], ref)
        if np.isfinite(ref):
            np.testing.assert_allclose(got[c], ref, atol=0.5, rtol=1e-4), c
    assert (ok == np.isfinite(got)).all()


def test_pallas_wide_mapping_width(setup):
    """Mapping widths above one 64-lane tile (A0=80 -> A=80, D*A=160-lane
    fused gathers) must still match the XLA positions kernel."""
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer
    from dbgphmm_tpu.ops.batch import candidate_log_likelihoods
    from dbgphmm_tpu.ops.sparse import precompute_positions

    dbg, params, tpl, pos, codes, lens, candidates = setup
    # widen the mapping arrays to 80 slots (pad with -1: unused slots)
    mn = pos.map_nodes
    B, L, A0 = mn.shape
    wide = np.full((B, L, 80), -1, dtype=mn.dtype)
    wide[:, :, :A0] = mn
    pos_w = precompute_positions(wide, tpl.parent_idx,
                                 parent_exists=tpl.parent_exists)
    models = [tpl.model_for(cn) for cn in candidates]
    ref = candidate_log_likelihoods(models, codes, lens, positions=pos_w)
    for space in ("log", "packed"):
        scorer = PallasMappedScorer(tpl, pos_w, codes, lens, tpl.params,
                                    space=space)
        scorer.interpret = True
        # width buckets to the next power of two (80 -> 128)
        assert scorer.streams.emis.shape[2] == 128
        got = scorer.scores(candidates)
        np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-5)


def test_packed_kernel_matches_log_kernel(setup):
    """The lane-packed candidate-blocked kernel reproduces the log-space
    kernel for every (P, CL) configuration, including blocked (-inf under
    both) candidates."""
    from dbgphmm_tpu.ops.pallas_mapped import (
        pack_eff_tables,
        pallas_mapped_scores_packed,
    )

    dbg, params, tpl, pos, codes, lens, candidates = setup
    cands = candidates + [[0] * dbg.n_edges_compact()]
    streams = build_streams(tpl, pos, codes, lens, dbg)
    eff0, invt0 = eff_tables(streams, cands)
    dm32 = to_device(tpl.model_for(cands[0]), dtype=jnp.float32)
    ltv = lin_params_vector(dm32)
    args = (
        jnp.asarray(streams.lens), jnp.asarray(streams.codes),
        jnp.asarray(streams.emis), jnp.asarray(streams.numce),
        jnp.asarray(streams.selfp), jnp.asarray(streams.prevp),
        jnp.asarray(streams.curp), jnp.asarray(streams.dence),
    )
    ref = np.asarray(
        pallas_mapped_scores(
            jnp.asarray(eff0), jnp.asarray(invt0), *args, ltv,
            n_max_gaps=params.n_max_gaps, TL=8, interpret=True, space="log",
        )
    )
    A = streams.emis.shape[2]
    C, B = len(cands), codes.shape[0]
    for P, CL, RN in [(1, 1, 1), (2, 2, 1), (2, 4, 1), (2, 8, 1), (2, 4, 2)]:
        eff, linv, _cp = pack_eff_tables(streams, cands, P, CL, A)
        out = np.asarray(
            pallas_mapped_scores_packed(
                jnp.asarray(eff), jnp.asarray(linv), *args, ltv,
                n_max_gaps=params.n_max_gaps, TL=8, P=P, CL=CL,
                interpret=True, renorm_every=RN,
            )
        )
        a, b = out[:C, :B], ref[:C, :B]
        both_inf = np.isneginf(a) & np.isneginf(b)
        assert not (np.isneginf(a) ^ np.isneginf(b)).any(), (P, CL)
        diff = np.where(both_inf, 0.0, np.abs(a - b))
        assert diff.max() < 1e-3, (P, CL, RN, diff.max())


def test_packed_scorer_matches_log_scorer(setup):
    """PallasMappedScorer(space='packed') == space='log' at scorer level."""
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer

    dbg, params, tpl, pos, codes, lens, candidates = setup
    outs = {}
    for space in ("log", "packed"):
        scorer = PallasMappedScorer(
            tpl, pos, codes, lens, tpl.params, space=space
        )
        scorer.interpret = True
        sums, ok = scorer.scores_detailed(candidates)
        outs[space] = (sums, ok)
    np.testing.assert_allclose(
        outs["packed"][0], outs["log"][0], atol=1e-2, rtol=1e-6
    )
    assert (outs["packed"][1] == outs["log"][1]).all()


def test_packed_kernel_full_lane_pack_p8(setup):
    """The production A=16 -> P=8 lane-pack configuration (ADVICE r2: never
    exercised in CI) matches the log-space kernel."""
    from dbgphmm_tpu.ops.pallas_mapped import (
        pack_eff_tables,
        pallas_mapped_scores_packed,
    )

    dbg, params, tpl, pos, codes, lens, candidates = setup
    cands = candidates + [[0] * dbg.n_edges_compact()]
    streams = build_streams(tpl, pos, codes, lens, dbg)
    A = streams.emis.shape[2]
    assert A == 16, "fixture should bucket to the production width 16"
    eff0, invt0 = eff_tables(streams, cands)
    dm32 = to_device(tpl.model_for(cands[0]), dtype=jnp.float32)
    ltv = lin_params_vector(dm32)
    args = (
        jnp.asarray(streams.lens), jnp.asarray(streams.codes),
        jnp.asarray(streams.emis), jnp.asarray(streams.numce),
        jnp.asarray(streams.selfp), jnp.asarray(streams.prevp),
        jnp.asarray(streams.curp), jnp.asarray(streams.dence),
    )
    ref = np.asarray(
        pallas_mapped_scores(
            jnp.asarray(eff0), jnp.asarray(invt0), *args, ltv,
            n_max_gaps=params.n_max_gaps, TL=8, interpret=True, space="log",
        )
    )
    C, B = len(cands), codes.shape[0]
    for P, CL, RN in [(8, 1, 1), (8, 2, 2)]:
        eff, linv, _cp = pack_eff_tables(streams, cands, P, CL, A)
        out = np.asarray(
            pallas_mapped_scores_packed(
                jnp.asarray(eff), jnp.asarray(linv), *args, ltv,
                n_max_gaps=params.n_max_gaps, TL=8, P=P, CL=CL,
                interpret=True, renorm_every=RN,
            )
        )
        a, b = out[:C, :B], ref[:C, :B]
        both_inf = np.isneginf(a) & np.isneginf(b)
        assert not (np.isneginf(a) ^ np.isneginf(b)).any(), (P, CL)
        diff = np.where(both_inf, 0.0, np.abs(a - b))
        assert diff.max() < 1e-3, (P, CL, RN, diff.max())


def test_packed_kernel_multi_chunk_eff_table(setup):
    """NC > 128 rides as [NCC, 128] eff chunks (production compact graphs
    reach NC=2048; the old >128-lane row path hit a Mosaic
    'offsets outside the first tile' compile error on chip).  Shift every
    compact-edge id by 128 so REAL values live in chunk 1 and the sentinel
    in chunk 2, and check scores are unchanged."""
    from dbgphmm_tpu.ops.pallas_mapped import (
        pack_eff_tables,
        pallas_mapped_scores_packed,
    )

    dbg, params, tpl, pos, codes, lens, candidates = setup
    cands = candidates + [[0] * dbg.n_edges_compact()]
    streams = build_streams(tpl, pos, codes, lens, dbg)
    A = streams.emis.shape[2]
    assert streams.nc_pad == 128
    SENT_OLD, NC_NEW = streams.nc_pad - 1, 384
    SENT_NEW = NC_NEW - 1

    def shift_ce(arr):
        return np.where(arr == SENT_OLD, SENT_NEW, arr + 128).astype(np.int32)

    el = np.zeros(NC_NEW, dtype=np.float32)
    el[128 : 128 + streams.nc_pad] = streams.emittable_len
    # the shifted id space also shifts the full-assignment length table
    # (round 4: _eff_matrix derives totals from emittable_len_full)
    el_full = np.zeros(128 + streams.emittable_len_full.shape[0],
                       dtype=np.float32)
    el_full[128:] = streams.emittable_len_full
    shifted = streams._replace(
        numce=shift_ce(streams.numce), dence=shift_ce(streams.dence),
        nc_pad=NC_NEW, emittable_len=el, emittable_len_full=el_full,
    )
    cands_shifted = [[0] * 128 + list(cn) for cn in cands]

    eff0, invt0 = eff_tables(streams, cands)
    dm32 = to_device(tpl.model_for(cands[0]), dtype=jnp.float32)
    ltv = lin_params_vector(dm32)
    args_of = lambda s: (
        jnp.asarray(s.lens), jnp.asarray(s.codes),
        jnp.asarray(s.emis), jnp.asarray(s.numce),
        jnp.asarray(s.selfp), jnp.asarray(s.prevp),
        jnp.asarray(s.curp), jnp.asarray(s.dence),
    )
    ref = np.asarray(
        pallas_mapped_scores(
            jnp.asarray(eff0), jnp.asarray(invt0), *args_of(streams), ltv,
            n_max_gaps=params.n_max_gaps, TL=8, interpret=True, space="log",
        )
    )
    C, B = len(cands), codes.shape[0]
    for P, CL in [(1, 2), (2, 2), (8, 1)]:
        eff, linv, _cp = pack_eff_tables(shifted, cands_shifted, P, CL, A)
        out = np.asarray(
            pallas_mapped_scores_packed(
                jnp.asarray(eff), jnp.asarray(linv), *args_of(shifted), ltv,
                n_max_gaps=params.n_max_gaps, TL=8, P=P, CL=CL,
                interpret=True, renorm_every=2,
            )
        )
        a, b = out[:C, :B], ref[:C, :B]
        both_inf = np.isneginf(a) & np.isneginf(b)
        assert not (np.isneginf(a) ^ np.isneginf(b)).any(), (P, CL)
        diff = np.where(both_inf, 0.0, np.abs(a - b))
        assert diff.max() < 1e-3, (P, CL, diff.max())


def test_scorer_read_chunking_matches_single_chunk(setup):
    """Forcing a tiny read chunk (KIR-class HBM bounding) reproduces the
    unchunked scorer exactly."""
    from dbgphmm_tpu.ops.pallas_mapped import PallasMappedScorer

    from dbgphmm_tpu.ops.pallas_mapped import MappedPositionsLike

    dbg, params, tpl, pos, codes, lens, candidates = setup
    # tile to 20 reads so an 8-read chunk splits the batch three ways
    t = lambda a: np.concatenate([a] * 5, axis=0)
    codes, lens = t(codes), t(lens)
    pos = MappedPositionsLike(
        map_nodes=t(pos.map_nodes), prev_pos=t(pos.prev_pos),
        cur_pos=t(pos.cur_pos), self_pos=t(pos.self_pos),
    )
    one = PallasMappedScorer(tpl, pos, codes, lens, tpl.params, space="packed")
    one.interpret = True
    chunked = PallasMappedScorer(
        tpl, pos, codes, lens, tpl.params, space="packed", read_chunk=8
    )
    chunked.interpret = True
    assert len(chunked.chunks) == 3
    s1, ok1 = one.scores_detailed(candidates)
    s2, ok2 = chunked.scores_detailed(candidates)
    np.testing.assert_allclose(s2, s1, atol=1e-4, rtol=1e-7)
    assert (ok1 == ok2).all()
