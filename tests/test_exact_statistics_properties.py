"""Property-based verification of the round-3 exact-statistics
disciplines (pure Python, no Spark session needed — these pin the MATH
the operator contracts rely on, independently of any engine):

- the ×2-integral midrank rank-sum AUC equals brute-force pairwise AUC
  (with half-credit ties) on arbitrary labeled multisets;
- the weighted variant (Poisson-bootstrap counts) equals pairwise AUC
  on the expanded multiset;
- the doubled-median / quadrupled-MAD order statistics equal 2*median
  and 4*MAD on arbitrary integer windows (the Hampel/runs-test
  discipline);
- the two-step integer fold ((x*1e6 DIV a)*b DIV c) stays within a
  provable error band of the exact rational (the Spearman/runs/drift
  headroom pattern);
- Shapley position weights x12 integrality and the efficiency identity
  on random 4-channel coalition games.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def _pairwise_auc(scored):  # [(score, label)] -> Fraction
    pos = [s for s, l in scored if l == 1]
    neg = [s for s, l in scored if l == 0]
    if not pos or not neg:
        return None
    num = Fraction(0)
    for p in pos:
        for n in neg:
            if p > n:
                num += 1
            elif p == n:
                num += Fraction(1, 2)
    return num / (len(pos) * len(neg))


def _midrank_auc(scored):  # the operators' integer identity
    from collections import Counter

    grid = Counter()
    posc = Counter()
    for s, l in scored:
        grid[s] += 1
        posc[s] += l
    before = 0
    r1_2 = n1 = n0 = 0
    for s in sorted(grid):
        c = grid[s]
        p = posc[s]
        r1_2 += p * (2 * before + c + 1)
        n1 += p
        n0 += c - p
        before += c
    if n1 == 0 or n0 == 0:
        return None, None
    return Fraction(r1_2 - n1 * (n1 + 1), 2 * n1 * n0), (r1_2, n1, n0)


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_midrank_auc_equals_pairwise(scored):
    want = _pairwise_auc(scored)
    got, _ = _midrank_auc(scored)
    assert got == want  # exact rational equality, ties included


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1), st.integers(0, 4)),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_weighted_midrank_auc_equals_expanded_pairwise(rows):
    # weight w == w exact copies of the (score, label) observation
    expanded = [(s, l) for s, l, w in rows for _ in range(w)]
    scored_w = [(s, l, w) for s, l, w in rows if w > 0]
    want = _pairwise_auc(expanded)
    # weighted midrank identity as the operators compute it
    from collections import Counter

    grid = Counter()
    posc = Counter()
    for s, l, w in scored_w:
        grid[s] += w
        posc[s] += w * l
    before = 0
    r1_2 = n1 = n0 = 0
    for s in sorted(grid):
        c = grid[s]
        p = posc[s]
        r1_2 += p * (2 * before + c + 1)
        n1 += p
        n0 += c - p
        before += c
    got = (
        Fraction(r1_2 - n1 * (n1 + 1), 2 * n1 * n0)
        if n1 > 0 and n0 > 0
        else None
    )
    assert got == want


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=15))
@settings(max_examples=300, deadline=None)
def test_doubled_median_and_quadrupled_mad(win):
    s = sorted(win)
    n = len(s)
    med2 = s[(n + 1) // 2 - 1] + s[n // 2]
    # exact check against the rational median
    med = Fraction(med2, 2)
    if n % 2 == 1:
        assert med == s[n // 2]
    else:
        assert med == Fraction(s[n // 2 - 1] + s[n // 2], 2)
    dev2 = sorted(abs(2 * v - med2) for v in win)
    mad4 = dev2[(n + 1) // 2 - 1] + dev2[n // 2]
    devs = sorted(abs(Fraction(v) - med) for v in win)
    if n % 2 == 1:
        mad = devs[n // 2]
    else:
        mad = Fraction(devs[n // 2 - 1] + devs[n // 2], 2)
    assert Fraction(mad4, 4) == mad


@given(
    st.integers(0, 10**9),
    st.integers(1, 10**6),
    st.integers(1, 10**4),
    st.integers(1, 10**6),
)
@settings(max_examples=300, deadline=None)
def test_two_step_fold_error_band(x, a, b, c):
    # ((1e6*x DIV a) * b DIV c) vs floor(1e6*x*b/(a*c)):
    # the first DIV loses < 1 unit, amplified by b/c, plus < 1 from the
    # second DIV - the documented contract slack of the two-step fold
    exact = (10**6 * x * b) // (a * c)
    two_step = ((10**6 * x) // a) * b // c
    assert two_step <= exact
    slack = b // c + 2
    assert exact - two_step <= slack


@given(
    st.dictionaries(
        st.integers(0, 15), st.integers(0, 50), min_size=0, max_size=16
    )
)
@settings(max_examples=200, deadline=None)
def test_shapley_efficiency_on_random_games(conv_by_mask):
    W12 = (3, 1, 1, 3)
    k = 4

    def v(s):
        return sum(c for m, c in conv_by_mask.items() if m & s == m)

    phis = []
    for i in range(k):
        phi = 0
        for s in range(1 << k):
            if (s >> i) % 2 == 0:
                phi += W12[bin(s).count("1")] * (v(s + (1 << i)) - v(s))
        phis.append(phi)
    assert sum(phis) == 12 * (v((1 << k) - 1) - v(0))
