"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md section 2.11: read-DP + candidate parallelism with psum merge)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbgphmm_tpu.ops import forward_scores, pad_reads, to_device
from dbgphmm_tpu.parallel import (
    make_mesh,
    sharded_candidate_log_likelihoods,
    sharded_forward_total,
)
from dbgphmm_tpu.phmm import PHMMParams, linear_phmm


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "needs 8 virtual devices (conftest)"
    seq = b"ATTCGATCGTACGGTTAACG" * 3
    dm = to_device(linear_phmm(seq, PHMMParams.default()), dtype=jnp.float64)
    reads = [seq[i : i + 30] for i in range(0, 30, 3)]  # 10 reads
    codes, lens = pad_reads(reads)
    return dm, codes, lens


def test_sharded_total_matches_local(setup):
    dm, codes, lens = setup
    local = float(
        jnp.sum(forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True))
    )
    for shape in [(1, 8), (2, 4), (1, 4)]:
        mesh = make_mesh(shape[0] * shape[1], cand_axis=shape[0])
        total = sharded_forward_total(dm, codes, lens, mesh)
        assert total == pytest.approx(local, abs=1e-9), shape


def test_sharded_candidates_match_local(setup):
    dm, codes, lens = setup
    # 4 candidates with scaled init probs
    dms = [
        dataclasses.replace(dm, init_logp=dm.init_logp + jnp.log(s))
        for s in (1.0, 0.5, 0.25, 0.125)
    ]
    mesh = make_mesh(8, cand_axis=2)
    lls = sharded_candidate_log_likelihoods(dms, codes, lens, mesh)
    for i, d in enumerate(dms):
        local = float(
            jnp.sum(forward_scores(d, jnp.asarray(codes), jnp.asarray(lens), renorm=True))
        )
        assert lls[i] == pytest.approx(local, abs=1e-9)
    # scaling init by s multiplies every read's P by s -> total shifts by
    # n_reads * log(s)
    n = codes.shape[0]
    assert lls[1] - lls[0] == pytest.approx(n * np.log(0.5), abs=1e-6)


def test_uneven_read_count_padding(setup):
    dm, codes, lens = setup
    # 10 reads on an 8-way mesh: padding path
    mesh = make_mesh(8, cand_axis=1)
    total = sharded_forward_total(dm, codes, lens, mesh)
    local = float(
        jnp.sum(forward_scores(dm, jnp.asarray(codes), jnp.asarray(lens), renorm=True))
    )
    assert total == pytest.approx(local, abs=1e-9)
