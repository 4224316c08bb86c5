"""Property-based tests for the round-4 exact-arithmetic operators.

The oracle parity suite checks the operators on the generated
testdata, which is all-positive and tie-light; these properties drive
the EXACTNESS arguments themselves — negative values, ties, boundary
frame sizes — against independent Python references (Fraction /
exact-int), both as pure-math invariants (hypothesis, hundreds of
examples) and as a handful of Spark round-trips.
"""

import datetime as dt
import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# EWMA: the dyadic-exactness invariant itself
# ---------------------------------------------------------------------------

CENTS = st.integers(-(2**20), 2**20)


@settings(max_examples=300, deadline=None)
@given(st.lists(CENTS, min_size=1, max_size=32))
def test_ewma_fold_is_exact_dyadic(vals):
    """The float left fold s=(x+s)/2 equals the exact Fraction value
    for any |cents| < 2^21 window of <= 32 — the 53-bit headroom claim
    ewma_halving's cross-engine equality rests on."""
    s = 0.0
    f = Fraction(0)
    for x in vals:
        s = (x + s) / 2.0
        f = Fraction(x + f, 2)
    assert s == float(f) and float(f) == f


@settings(max_examples=300, deadline=None)
@given(st.lists(CENTS, min_size=1, max_size=32))
def test_ewma_fold_order_free_reformulation(vals):
    """The weighted-sum evaluation (the oracle's self-join form) gives
    the identical double, term-permuted — exactness makes evaluation
    strategy irrelevant."""
    s = 0.0
    for x in vals:
        s = (x + s) / 2.0
    n = len(vals)
    # sum the weighted terms in REVERSED order
    alt = sum(x * 2.0 ** -(n - i) for i, x in
              reversed(list(enumerate(vals))))
    assert s == alt


# ---------------------------------------------------------------------------
# Spark operators vs exact Python references (few examples; each is a job)
# ---------------------------------------------------------------------------


def _mk_events(spark, series):
    """series: {user: [cents, ...]} -> events frame (values may be
    negative)."""
    rows = []
    for u, cents in series.items():
        for i, c in enumerate(cents):
            rows.append((u, i, dt.datetime(2024, 1, 1)
                         + dt.timedelta(minutes=i), c / 100.0))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")


SERIES = st.dictionaries(
    st.integers(1, 3),
    st.lists(st.integers(-(2**16), 2**16), min_size=1, max_size=40),
    min_size=1, max_size=3)


@settings(max_examples=8, deadline=None)
@given(SERIES)
def test_ewma_spark_matches_reference(spark, series):
    from kafka_connect_msk_demo_spark.operators.temporal import (
        ewma_halving)

    out = {(r.user_id, r.event_id): (r.n_window, r.ewma)
           for r in ewma_halving(_mk_events(spark, series), "user_id",
                                 ["ts", "event_id"], "value").collect()}
    for u, cents in series.items():
        window: list[int] = []
        for i, c in enumerate(cents):
            window.append(c)
            if len(window) > 32:
                window.pop(0)
            s = 0.0
            for x in window:
                s = (x + s) / 2.0
            n = len(window)
            expect = (s / (1.0 - 2.0 ** -n)) / 100.0
            assert out[(u, i)] == (n, expect), (u, i)


WIN_GROUPS = st.dictionaries(
    st.sampled_from(["a", "b"]),
    st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=30),
    min_size=1, max_size=2)


@settings(max_examples=8, deadline=None)
@given(WIN_GROUPS)
def test_winsorized_spark_matches_reference(spark, groups):
    from kafka_connect_msk_demo_spark.operators.aggregates import (
        winsorized_stats)

    rows = [(g, c / 100.0, i) for g, cs in groups.items()
            for i, c in enumerate(cs)]
    df = spark.createDataFrame(rows, "g string, amount double, oid long")
    out = {r.g: r for r in winsorized_stats(
        df, ["g"], "amount", "oid", pct=10).collect()}
    for g, cs in groups.items():
        # sort by (value, oid) exactly as the operator ranks
        ordered = [c for c, _ in sorted(
            ((c, i) for i, c in enumerate(cs)),
            key=lambda t: (t[0] / 100.0, t[1]))]
        n = len(ordered)
        k = n * 10 // 100
        lo, hi = ordered[k], ordered[n - k - 1]
        total = sum(ordered[k:n - k]) + k * lo + k * hi  # cents, exact
        expect = float(Fraction(total, 100)) / n
        r = out[g]
        assert (r.n_total, r.k_clamped) == (n, k)
        assert r.lo == lo / 100.0 and r.hi == hi / 100.0
        assert r.win_mean == expect, g


TWO_SAMPLES = st.tuples(
    st.lists(st.integers(-(10**4), 10**4), min_size=1, max_size=25),
    st.lists(st.integers(-(10**4), 10**4), min_size=1, max_size=25))


@settings(max_examples=8, deadline=None)
@given(TWO_SAMPLES)
def test_ks_drift_spark_matches_reference(spark, samples):
    from kafka_connect_msk_demo_spark.operators.aggregates import ks_drift

    early, late = samples
    rows = ([(1, i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
              c / 100.0) for i, c in enumerate(early)]
            + [(1, 1000 + i, dt.datetime(2024, 6, 1)
                + dt.timedelta(hours=i), c / 100.0)
               for i, c in enumerate(late)])
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    got = ks_drift(df, "user_id", "ts", "value").collect()[0]
    n1, n2 = len(early), len(late)
    support = sorted(set(early) | set(late))
    dnum = 0
    for x in support:
        c1 = sum(1 for v in early if v <= x)
        c2 = sum(1 for v in late if v <= x)
        dnum = max(dnum, abs(c1 * n2 - c2 * n1))
    assert (got.n_early, got.n_late) == (n1, n2)
    assert got.d_stat == float(dnum) / float(n1 * n2)


# ---------------------------------------------------------------------------
# Pearson r from exact integer moments: the exactly-rounded-finisher claim
# ---------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(-10**6, 10**6),
                          st.integers(-10**6, 10**6)),
                min_size=2, max_size=60))
def test_corr_finisher_is_deterministic_for_exact_moments(pairs):
    """r from EXACT integer moments through the FIXED finisher
    num/(sqrt(va)*sqrt(vb)) stays within 4 ulps of the infinite-
    precision value (Fraction reference) whenever the variances are
    nonzero — so the engine-side and oracle-side evaluations, which
    both run this exact op sequence, can differ from truth (and hence
    from each other) by at most the final roundings. A REASSOCIATED
    finisher ((num/sqrt(va))/sqrt(vb)) is deliberately NOT asserted
    equal: only the fixed sequence is the cross-engine contract."""
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    num = n * sxy - sx * sy
    va, vb = n * sxx - sx * sx, n * syy - sy * sy
    if va == 0 or vb == 0:
        return
    r = float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
    assert abs(r) <= 1.0 + 4 * abs(math.ulp(1.0))
    # 4-op rounding error bound vs the exact value: |r - true| <=
    # ~4 ulp(|r|) (two sqrts, one multiply, one divide, each 0.5 ulp,
    # plus the int->double conversions)
    import decimal
    decimal.getcontext().prec = 60
    d = decimal.Decimal
    true = d(num) / (d(va).sqrt() * d(vb).sqrt())
    assert abs(d(r) - true) <= d(8) * d(math.ulp(abs(r) or 1.0))


# ---------------------------------------------------------------------------
# Largest-remainder decile formula: even split, exhaustive cover
# ---------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.integers(1, 5000))
def test_decile_formula_partitions_ranks_evenly(n):
    """decile = (rank-1)*10 div n + 1 assigns every rank 1..n to a
    bucket 1..10 with sizes differing by at most 1 — the engine-
    portable ntile replacement decile_lift uses on BOTH sides."""
    from collections import Counter
    c = Counter((r - 1) * 10 // n + 1 for r in range(1, n + 1))
    assert set(c) <= set(range(1, 11))
    if n >= 10:
        assert max(c.values()) - min(c.values()) <= 1
        assert set(c) == set(range(1, 11))
    assert sum(c.values()) == n


# ---------------------------------------------------------------------------
# Chi-square cell arithmetic: marginal conservation at double precision
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.integers(0, 10**6), min_size=2, max_size=5),
                min_size=2, max_size=5))
def test_chi2_expected_preserves_marginals(table):
    """Expected counts rt*ct/n (exact products, one double division)
    reproduce each row marginal to within n*4 ulps — the tolerance
    the chi2_independence semantic test uses."""
    w = len(table[0])
    table = [row[:w] + [0] * (w - len(row)) for row in table]
    n = sum(map(sum, table))
    if n == 0:
        return
    col = [sum(row[j] for row in table) for j in range(w)]
    for row in table:
        rt = sum(row)
        exp = sum(float(rt * c) / float(n) for c in col)
        assert abs(exp - rt) <= max(1.0, rt) * 1e-9
