"""Property tests for the algebraic identities the r08 queue rests on.

Each staged query replaces a textbook formula with an integer-exact
fold (the cross-engine determinism discipline); these hypothesis tests
prove the fold IS the textbook formula on arbitrary inputs — pure
Python, no Spark session, so they run in milliseconds and pin the
algebra independently of either engine.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=12))
@settings(max_examples=200)
def test_srm_chi2_fold_identity(obs):
    """agg_srm_check / stream_srm_guardrail: the textbook goodness-of-fit
    chi-squared against the equal split equals k*S2/n - n exactly."""
    n = sum(obs)
    if n == 0:
        return
    k = len(obs)
    e = n / k
    direct = sum((o - e) ** 2 / e for o in obs)
    fold = k * sum(o * o for o in obs) / n - n
    assert math.isclose(direct, fold, rel_tol=1e-12, abs_tol=1e-9)


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=100)
def test_weighted_kappa_integer_identity(pairs):
    """eval_weighted_kappa: kappa from the two integer sums O_w and
    E_w equals the textbook cell-wise weighted kappa."""
    n = len(pairs)
    cells: dict = {}
    for a, b in pairs:
        cells[(a, b)] = cells.get((a, b), 0) + 1
    r = {i: sum(c for (a, _), c in cells.items() if a == i) for i in range(5)}
    c = {j: sum(cc for (_, b), cc in cells.items() if b == j) for j in range(5)}
    ow = sum(abs(a - b) * cc for (a, b), cc in cells.items())
    ew = sum(abs(i - j) * r[i] * c[j] for i in range(5) for j in range(5))
    if ew == 0:
        return  # degenerate: all mass on one (row, col) diagonal cell
    # textbook: 1 - sum(w*O)/n / (sum(w*E)/n) with E_ij = r_i c_j / n
    direct = 1 - (ow / n) / (ew / (n * n))
    fold = 1 - n * ow / ew
    assert math.isclose(direct, fold, rel_tol=1e-12, abs_tol=1e-9)


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=200))
@settings(max_examples=100)
def test_grouped_gini_closed_form(degrees):
    """graph_degree_gini: the grouped rank-block fold equals the
    per-unit Gini G = (2*sum(i*x_(i)) - (n+1)*T) / (n*T)."""
    xs = sorted(degrees)
    n, tot = len(xs), sum(xs)
    direct_a = sum((i + 1) * x for i, x in enumerate(xs))
    # grouped fold: per distinct value, ranks r0+1..r0+c
    from collections import Counter

    cnt = Counter(xs)
    r0 = 0
    fold_a = 0
    for v in sorted(cnt):
        c = cnt[v]
        fold_a += v * (c * r0 + c * (c + 1) // 2)
        r0 += c
    assert fold_a == direct_a
    g_direct = (2 * direct_a - (n + 1) * tot) / (n * tot)
    g_fold = (2 * fold_a - (n + 1) * tot) / (n * tot)
    assert math.isclose(g_direct, g_fold, rel_tol=1e-12)


@given(
    st.lists(
        st.tuples(st.integers(1, 10_000), st.integers(1, 1_000)),
        min_size=3,
        max_size=30,
    )
)
@settings(max_examples=100)
def test_ratio_jackknife_closed_form(groups):
    """agg_ratio_jackknife: the closed-form leave-one-group-out ratios
    (total minus group) equal literal recomputation with the group
    deleted."""
    ty = sum(y for y, _ in groups)
    tx = sum(x for _, x in groups)
    for i, (y, x) in enumerate(groups):
        if tx - x == 0:
            continue
        closed = (ty - y) / (tx - x)
        rest = [g for j, g in enumerate(groups) if j != i]
        direct = sum(yy for yy, _ in rest) / sum(xx for _, xx in rest)
        assert math.isclose(closed, direct, rel_tol=1e-12)


@given(st.lists(st.integers(0, 1), min_size=1, max_size=300))
@settings(max_examples=200)
def test_runs_count_is_one_plus_sign_changes(seq):
    """agg_runs_test: the lag-based fold (1 + #changes) equals a direct
    run-length scan."""
    runs_direct = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    # direct scan
    scanned = 1
    for a, b in zip(seq, seq[1:]):
        if a != b:
            scanned += 1
    assert scanned == runs_direct


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 60)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100)
def test_littles_law_sweep_integral_equals_duration_sum(intervals):
    """agg_littles_law / agg_concurrency_profile: summing the
    open-count sweep (open <= d < close) over the full day spine equals
    the sum of interval durations — the identity that makes L = lam*W
    exact, and the reason the peak (not the average) is the
    non-trivial readout."""
    iv = [(o, o + d) for o, d in intervals]
    lo = min(o for o, _ in iv)
    hi = max(c for _, c in iv)
    sweep = 0
    for day in range(lo, hi + 1):
        sweep += sum(1 for o, c in iv if o <= day < c)
    assert sweep == sum(c - o for o, c in iv)


@given(
    st.lists(st.integers(0, 50), min_size=10, max_size=10),
    st.lists(st.integers(0, 50), min_size=10, max_size=10),
)
@settings(max_examples=100)
def test_ordered_emd_is_mean_abs_cumdiff(g, a):
    """etl_t_closeness: for distributions over an ORDERED domain, the
    Earth Mover's Distance with unit ground distance equals the mean
    absolute cumulative difference — verified against the direct
    transport computation (prefix imbalance IS the flow through each
    boundary)."""
    sg, sa = sum(g), sum(a)
    if sg == 0 or sa == 0:
        return
    pg = [x / sg for x in g]
    pa = [x / sa for x in a]
    m = len(g)
    # flow through boundary i equals |cum_g(i) - cum_a(i)|; total cost
    # with unit adjacent-move distance is the sum of boundary flows
    cumg = cuma = 0.0
    cost = 0.0
    for i in range(m - 1):
        cumg += pg[i]
        cuma += pa[i]
        cost += abs(cumg - cuma)
    # t_closeness normalizes by (m - 1)
    t_val = cost / (m - 1)
    # direct greedy transport on a line (move imbalance rightward)
    carry = 0.0
    direct = 0.0
    for i in range(m):
        carry += pg[i] - pa[i]
        if i < m - 1:
            direct += abs(carry)
    assert math.isclose(t_val, direct / (m - 1), rel_tol=1e-9, abs_tol=1e-12)


@given(st.lists(st.tuples(st.text(alphabet="ab", min_size=1, max_size=3),
                          st.text(alphabet="ab", min_size=1, max_size=3)),
                min_size=5, max_size=100))
@settings(max_examples=50)
def test_kneser_ney_normalizes_over_vocab(bigrams):
    """text_kneser_ney: interpolated KN with absolute discount D sums
    to 1 over the full successor vocabulary for any observed context
    (the property that makes it a probability, which the query's
    top-10 slice inherits)."""
    from collections import Counter, defaultdict

    D = 0.75
    c = Counter(bigrams)
    succ = defaultdict(set)
    pred = defaultdict(set)
    for (v, w), _k in c.items():
        succ[v].add(w)
        pred[w].add(v)
    nbt = len(c)  # distinct bigram types
    vocab = sorted({w for _, w in bigrams} | {v for v, _ in bigrams})
    for v in {x for x, _ in bigrams}:
        cv = sum(k for (vv, _), k in c.items() if vv == v)
        n1v = len(succ[v])
        total = 0.0
        for w in vocab:
            cvw = c.get((v, w), 0)
            pcont = len(pred[w]) / nbt
            total += max(cvw - D, 0) / cv + D * n1v / cv * pcont
        # sums to 1 iff Pcont sums to 1 over vocab — it does by
        # construction (every bigram type has exactly one right word)
        assert math.isclose(total, 1.0, rel_tol=1e-9)
