import math

import numpy as np
import pytest

from dbgphmm_tpu import prob


def test_ladd_basic():
    # log(0.1 + 0.2) == logaddexp
    x, y = math.log(0.1), math.log(0.2)
    assert prob.ladd(x, y) == pytest.approx(math.log(0.3), abs=1e-12)
    # zero shortcut
    assert prob.ladd(prob.NEG_INF, x) == x
    assert prob.ladd(x, prob.NEG_INF) == x
    assert prob.ladd(prob.NEG_INF, prob.NEG_INF) == prob.NEG_INF
    # equal shortcut
    assert prob.ladd(x, x) == pytest.approx(x + math.log(2), abs=1e-15)


def test_lsum_order():
    vals = [math.log(v) for v in (0.1, 0.2, 0.3)]
    assert prob.lsum(vals) == pytest.approx(math.log(0.6), abs=1e-12)
    assert prob.lsum([]) == prob.NEG_INF


def test_mul_div_semantics():
    # multiplication of probs is addition of logs: exercised implicitly
    assert prob.from_prob(1.0) == 0.0
    assert prob.from_prob(0.0) == prob.NEG_INF
    assert prob.to_prob(prob.from_prob(0.25)) == pytest.approx(0.25)


def test_ldiff():
    x, y = math.log(0.5), math.log(0.2)
    assert prob.ldiff(x, y) == pytest.approx(math.log(0.3), abs=1e-12)
    assert prob.ldiff(x, x) == prob.NEG_INF


def test_log_factorial():
    assert prob.log_factorial(0) == 0.0
    assert prob.log_factorial(1) == 0.0
    assert prob.log_factorial(5) == pytest.approx(math.log(120), abs=1e-9)
    assert prob.log_factorial(2000) == pytest.approx(math.lgamma(2001), abs=1e-6)


def test_ln_int():
    assert prob.ln_int(0) == prob.NEG_INF
    assert prob.ln_int(1) == 0.0
    assert prob.ln_int(7) == pytest.approx(math.log(7))
    assert prob.ln_int(5000) == pytest.approx(math.log(5000))


def test_vlsum():
    a = np.log(np.array([[0.1, 0.2], [0.3, 0.4]]))
    out = prob.vlsum(a, axis=1)
    np.testing.assert_allclose(out, np.log([0.3, 0.7]), atol=1e-12)
    # all -inf row
    b = np.full((2, 2), prob.NEG_INF)
    out = prob.vlsum(b, axis=1)
    assert np.all(out == prob.NEG_INF)


def test_kmer_coverage():
    # ref: distribution.rs:31-45 c*(L-k+1)/L*(1-p)^k
    c = prob.kmer_coverage(40, 10000, 10.0, 0.001)
    expected = 10.0 * (10000 - 40 + 1) / 10000 * (1 - 0.001) ** 40
    assert c == pytest.approx(expected)
