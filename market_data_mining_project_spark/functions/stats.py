"""Driver-side statistical tail functions (SURVEY.md §2.9 M15).

The reference computes p-values with scipy (``Website/market/dunnhumby/
views.py:1756-1934`` — chi², Welch t, Mann-Whitney U, KS). scipy is not a
dependency of this engine, and it would be the wrong layer anyway: the
*statistics* are computed distributed in Spark (see ``operators/diff.py``)
and only the final scalar reaches these functions. Implemented from the
standard special-function identities (regularized incomplete gamma/beta via
series + continued fractions — Numerical Recipes §6.2-6.4 style, public
domain algorithms; erfc via Abramowitz & Stegun 7.1.26-class rational
approximation).

Accuracy: ~1e-10 relative for the gamma/beta paths, ~1.2e-7 absolute for
erfc — far tighter than any analytical use of a p-value.
"""

from __future__ import annotations

import math

_MAX_ITER = 500
_EPS = 3e-14


def _gamma_series(a: float, x: float) -> float:
    """Lower regularized incomplete gamma P(a, x) by series expansion (x < a+1)."""
    ap = a
    total = 1.0 / a
    delta = total
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        total += delta
        if abs(delta) < abs(total) * _EPS:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a, x) by continued fraction (x ≥ a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_upper requires x >= 0, a > 0")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(stat: float, dof: int) -> float:
    """Survival function of the chi-square distribution (p-value of χ²)."""
    if dof <= 0:
        raise ValueError("dof must be positive")
    if stat <= 0:
        return 1.0
    return gammainc_upper(dof / 2.0, stat / 2.0)


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(stat: float, dof: float) -> float:
    """One-sided survival function of Student's t; 2*t_sf(|t|, df) = two-sided p."""
    if dof <= 0:
        raise ValueError("dof must be positive")
    x = dof / (dof + stat * stat)
    p = 0.5 * betainc(dof / 2.0, 0.5, x)
    return p if stat > 0 else 1.0 - p


def norm_sf(z: float) -> float:
    """Standard normal survival function via erfc."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def ks_sf(d: float, n: int, m: int) -> float:
    """Two-sample KS asymptotic p-value (Kolmogorov distribution tail).

    Uses the Smirnov series with the Numerical-Recipes small-sample
    correction ``(en + 0.12 + 0.11/en)·d`` on the effective sample size
    en = sqrt(n·m/(n+m)). NOTE: modern scipy's ``ks_2samp(mode='asymp')``
    evaluates the plain ``en·d`` tail WITHOUT that additive correction, so
    small-sample p-values differ slightly from scipy's (the correction
    improves accuracy vs the exact distribution; the pytest gates pin this
    function against hand-computed values, not scipy).
    """
    if d <= 0:
        return 1.0
    en = math.sqrt(n * m / float(n + m))
    lam = (en + 0.12 + 0.11 / en) * d
    total = 0.0
    for j in range(1, 101):
        term = 2.0 * (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) < 1e-12:
            break
    return min(max(total, 0.0), 1.0)
