"""Property tests for the algebraic identities the r09 queue rests on.

Same discipline as tests/test_r08_identities.py: each staged query
replaces a textbook formula with an integer-exact fold or a closed
form; these hypothesis tests prove the replacement IS the textbook
formula on arbitrary inputs — pure Python, no Spark session, so they
pin the algebra independently of either engine.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=4, max_size=60)
)
@settings(max_examples=200)
def test_durbin_watson_centered_ols_identity(ys):
    """agg_durbin_watson: the centered-moment OLS slope/intercept
    (ybar + b*(d - dbar)) reproduces the textbook normal-equations fit
    y = a + b*d, so the residuals — and hence DW — are identical."""
    n = len(ys)
    ds = list(range(n))
    sd, sy = sum(ds), sum(ys)
    sdd = sum(d * d for d in ds)
    sdy = sum(d * y for d, y in zip(ds, ys))
    den = n * sdd - sd * sd
    if den == 0:
        return
    b = (n * sdy - sd * sy) / den
    a = (sy - b * sd) / n  # textbook intercept
    for d, y in zip(ds, ys):
        centered = y - (sy / n + b * (d - sd / n))
        textbook = y - (a + b * d)
        assert math.isclose(centered, textbook, rel_tol=1e-9, abs_tol=1e-6)


@given(
    st.lists(st.integers(min_value=0, max_value=1), min_size=6, max_size=60),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=200)
def test_pass_at_k_product_identity(oks, k):
    """eval_pass_at_k: the telescoping product
    1 - prod_{i<k} (n-c-i)/(n-i) equals the combinatorial
    1 - C(n-c, k)/C(n, k) exactly."""
    n, c = len(oks), sum(oks)
    if n < k:
        return
    if n - c < k:
        expected = 1.0
    else:
        expected = 1.0 - math.comb(n - c, k) / math.comb(n, k)
    prod = 1.0
    for i in range(k):
        prod *= (n - c - i) / (n - i)
    est = 1.0 if n - c < k else 1.0 - prod
    assert math.isclose(est, expected, rel_tol=1e-12, abs_tol=1e-12)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=200)
def test_cochran_q_identity(rows):
    """agg_cochran_q (k=2 columns here): the row/column-total fold
    equals the textbook Q = k(k-1) sum_j (C_j - N/k)^2 / (k*sum R_i -
    sum R_i^2) on binary-bounded data."""
    # build binary matrices: row i has x1 repeated? use parity bits
    mat = [(a % 2, b % 2) for a, b in rows]
    k = 2
    c1 = sum(x for x, _ in mat)
    c2 = sum(y for _, y in mat)
    r = [x + y for x, y in mat]
    den = k * sum(r) - sum(v * v for v in r)
    if den == 0:
        return
    csum, css = c1 + c2, c1 * c1 + c2 * c2
    fold = (k - 1) * (k * css - csum * csum) / den
    nbar = csum / k
    textbook = k * (k - 1) * ((c1 - nbar) ** 2 + (c2 - nbar) ** 2) / den
    assert math.isclose(fold, textbook, rel_tol=1e-12, abs_tol=1e-9)


@given(
    st.lists(st.integers(min_value=-500, max_value=500), min_size=3, max_size=50)
)
@settings(max_examples=200)
def test_adf_sse_sufficient_statistic_identity(ys):
    """ts_adf_score: SSE = Szz - b*Sxz (centered sufficient statistics)
    equals the direct residual sum of squares of the lag-1 regression."""
    xs = ys[:-1]
    zs = [b - a for a, b in zip(ys[:-1], ys[1:])]
    n = len(xs)
    sx, sz = sum(xs), sum(zs)
    sxx = sum(x * x for x in xs) - sx * sx / n
    sxz = sum(x * z for x, z in zip(xs, zs)) - sx * sz / n
    szz = sum(z * z for z in zs) - sz * sz / n
    if sxx == 0:
        return
    b = sxz / sxx
    a = (sz - b * sx) / n
    direct = sum((z - a - b * x) ** 2 for x, z in zip(xs, zs))
    fold = szz - b * sxz
    assert math.isclose(direct, fold, rel_tol=1e-9, abs_tol=1e-6)


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=40),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=40),
)
@settings(max_examples=200)
def test_bhattacharyya_hellinger_bounds(h0, h1):
    """agg_bhattacharyya: BC computed from raw counts via
    sum(sqrt(n0*n1))/sqrt(t0*t1) equals sum(sqrt(p*q)) over shared
    bins, stays in [0, 1], and Hellinger^2 = 1 - BC."""
    m = min(len(h0), len(h1))
    h0, h1 = h0[:m], h1[:m]
    t0, t1 = sum(h0), sum(h1)
    if t0 == 0 or t1 == 0:
        return
    fold = sum(math.sqrt(a * b) for a, b in zip(h0, h1)) / math.sqrt(t0 * t1)
    textbook = sum(
        math.sqrt((a / t0) * (b / t1)) for a, b in zip(h0, h1)
    )
    assert math.isclose(fold, textbook, rel_tol=1e-12, abs_tol=1e-12)
    assert -1e-12 <= fold <= 1 + 1e-12


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # avail
            st.integers(min_value=1, max_value=1000),  # weight
        ),
        min_size=2,
        max_size=12,
    ),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=200)
def test_capped_allocation_waterfilling_identity(srcs, frac):
    """sample_capped_allocation: the sorted-prefix closed form picks a
    water level lambda whose capped allocations sum to the budget
    (when the budget is feasible) and respect every cap."""
    budget = frac * sum(a for a, _ in srcs)
    order = sorted(range(len(srcs)), key=lambda i: (srcs[i][0] / srcs[i][1], i))
    cap_prefix = 0.0
    w_suffix = sum(w for _, w in srcs)
    level = None
    for i in order:
        a, w = srcs[i]
        lam = (budget - cap_prefix) / w_suffix
        if lam <= a / w:
            level = lam
            break
        cap_prefix += a
        w_suffix -= w
    if level is None:
        # budget exceeds total availability of the capped path: every
        # source caps out (possible only if budget >= sum(avail),
        # which frac < 1 rules out)
        raise AssertionError("no water level found for feasible budget")
    allocs = [min(a, level * w) for a, w in srcs]
    assert all(al <= a + 1e-9 for al, (a, _) in zip(allocs, srcs))
    assert math.isclose(sum(allocs), budget, rel_tol=1e-9, abs_tol=1e-6)


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=3, max_size=50)
)
@settings(max_examples=200)
def test_variance_ratio_is_one_under_iid_sums(zs):
    """ts_variance_ratio sanity pin: for a pure random walk built from
    the given increments, Var(y_t - y_{t-q}) equals the sum of the q
    increment variances when increments are literally repeated blocks —
    here we pin the weaker exact identity the query uses: the centered
    second moment computed from integer sums equals the direct
    variance."""
    n = len(zs)
    s = sum(zs)
    q = sum(z * z for z in zs)
    fold = (q - s * s / n) / (n - 1) if n > 1 else 0.0
    mean = s / n
    direct = sum((z - mean) ** 2 for z in zs) / (n - 1)
    assert math.isclose(fold, direct, rel_tol=1e-9, abs_tol=1e-6)


@given(
    st.integers(min_value=1, max_value=1023),
)
@settings(max_examples=200)
def test_linear_counting_monotone_and_exact_at_tiny_fill(bits_set):
    """sketch_linear_counting: the estimator -m ln((m-b)/m) is
    monotone in b and approaches b for tiny fill rates (the regime
    where LC is nearly exact)."""
    m = 1024
    est = -m * math.log((m - bits_set) / m)
    assert est >= bits_set - 1e-9  # ln bound: estimate >= bits set
    if bits_set <= 16:
        assert est <= bits_set * 1.01  # within 1% at tiny fill
    est_next = -m * math.log((m - min(bits_set + 1, 1023)) / m)
    assert est_next >= est
