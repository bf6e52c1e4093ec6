"""Independent validation of the Student-t CDF (no scipy in the image):
numerical integration of the t density with Simpson's rule at high
resolution, plus symmetry/limit properties."""

import math

import numpy as np
import pytest

from orc_spark.functions.stat_math import (
    betainc_reg,
    medfilt_zero_padded,
    student_t_cdf,
    welch_ttest_np,
)


def t_pdf(x, v):
    c = math.exp(math.lgamma((v + 1) / 2) - math.lgamma(v / 2)) / math.sqrt(v * math.pi)
    return c * (1.0 + x * x / v) ** (-(v + 1) / 2)


def t_cdf_simpson(t, v, n=4_000_001):
    # integrate from 0 (symmetry): avoids heavy Cauchy-like tails entirely
    if t == 0.0:
        return 0.5
    xs = np.linspace(0.0, t, n)
    ys = t_pdf(xs, v)
    h = t / (n - 1)
    integral = (h / 3) * (ys[0] + ys[-1] + 4 * ys[1:-1:2].sum() + 2 * ys[2:-1:2].sum())
    return 0.5 + integral


@pytest.mark.parametrize(
    "t,v",
    [(0.0, 1.0), (1.0, 1.0), (2.0, 10.0), (-1.5, 5.0), (4.7, 7.9), (-6.2, 3.3), (0.3, 30.0)],
)
def test_t_cdf_vs_integration(t, v):
    got = float(student_t_cdf(t, v))
    exp = t_cdf_simpson(t, v)
    assert got == pytest.approx(exp, rel=1e-9, abs=1e-12)


def test_t_cdf_properties():
    for v in (1.0, 2.5, 10.0, 100.0):
        assert float(student_t_cdf(0.0, v)) == pytest.approx(0.5, abs=1e-14)
        for t in (0.5, 2.0, 8.0):
            s = float(student_t_cdf(t, v)) + float(student_t_cdf(-t, v))
            assert s == pytest.approx(1.0, abs=1e-13)
    assert math.isnan(float(student_t_cdf(float("nan"), 5.0)))


def test_betainc_bounds():
    assert float(betainc_reg(2.0, 3.0, 0.0)) == 0.0
    assert float(betainc_reg(2.0, 3.0, 1.0)) == 1.0
    # I_x(1,1) = x (uniform)
    for x in (0.1, 0.5, 0.9):
        assert float(betainc_reg(1.0, 1.0, x)) == pytest.approx(x, rel=1e-14)


def test_medfilt_zero_padding():
    x = np.array([5.0, 1.0, 2.0, 9.0, 3.0])
    got = medfilt_zero_padded(x, 3)
    # windows: [0,5,1] [5,1,2] [1,2,9] [2,9,3] [9,3,0]
    np.testing.assert_array_equal(got, [1.0, 2.0, 2.0, 3.0, 3.0])
    # shorter than kernel → all medians of mostly-zero windows
    np.testing.assert_array_equal(medfilt_zero_padded([7.0], 3), [0.0])


def test_welch_known_value():
    # hand-checkable: equal-size samples, classic textbook shape
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    t, p, dof = welch_ttest_np(a, b, "two-sided")
    # means 3 / 6; vars 2.5 / 10; se = sqrt(.5+2) = sqrt(2.5)
    assert t == pytest.approx((3 - 6) / math.sqrt(2.5), rel=1e-14)
    q1, q2 = 2.5 / 5, 10.0 / 5
    exp_dof = (q1 + q2) ** 2 / (q1**2 / 4 + q2**2 / 4)
    assert dof == pytest.approx(exp_dof, rel=1e-14)
    assert 0.0 < p < 1.0
