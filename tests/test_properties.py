"""Property-based tests (SURVEY.md §5.5) with hypothesis: algebraic
invariants of the function layer that must hold on arbitrary input,
not just fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_engineering_project_spark.functions.stemmer import porter_stem
from big_data_engineering_project_spark.functions.lexicons import STOPWORDS

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)

pyspark_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def token_lists(draw):
    word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12)
    return draw(st.lists(word, max_size=15))


@given(TEXT)
@pyspark_settings
def test_clean_text_idempotent(spark, s):
    """clean ∘ clean == clean: the chain is a projection."""
    from big_data_engineering_project_spark.functions.text import clean_text

    df = spark.createDataFrame([(s,)], "s STRING")
    once, twice = df.select(
        clean_text(F.col("s")).alias("a"),
        clean_text(clean_text(F.col("s"))).alias("b"),
    ).first()
    assert once == twice


@given(TEXT)
@pyspark_settings
def test_tokenize_never_yields_empty_tokens(spark, s):
    from big_data_engineering_project_spark.functions.text import tokenize

    df = spark.createDataFrame([(s,)], "s STRING")
    toks = df.select(tokenize(F.col("s")).alias("t")).first()["t"]
    assert all(t != "" for t in toks)


@given(token_lists())
@pyspark_settings
def test_stopword_filter_idempotent_and_disjoint(spark, tokens):
    from big_data_engineering_project_spark.functions.text import remove_stopwords

    df = spark.createDataFrame([(tokens,)], "t ARRAY<STRING>")
    once = df.select(remove_stopwords(F.col("t")).alias("o")).first()["o"]
    twice_df = spark.createDataFrame([(once,)], "t ARRAY<STRING>")
    twice = twice_df.select(remove_stopwords(F.col("t")).alias("o")).first()["o"]
    assert once == twice
    assert not (set(once) & set(STOPWORDS))


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_porter_stem_fixpoint_and_nonempty(word):
    """Stemming a stem changes little: stem is near-idempotent (allow
    one extra contraction step), always non-empty, never grows."""
    s1 = porter_stem(word)
    s2 = porter_stem(s1)
    assert len(s1) >= 1
    assert len(s1) <= len(word)
    assert len(s2) <= len(s1)


@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=2, max_size=2))
@pyspark_settings
def test_sentiment_bounded(spark, _):
    from big_data_engineering_project_spark.functions.sentiment import sentiment_col

    # random word soup including lexicon words
    import random

    rng = random.Random(42)
    words = ["good", "bad", "xyz", "terrible", "love", "zzz"]
    s = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
    df = spark.createDataFrame([(s,)], "s STRING")
    v = df.select(sentiment_col(F.col("s")).alias("v")).first()["v"]
    assert -1.0 <= v <= 1.0


@given(token_lists(), st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=4))
@pyspark_settings
def test_chunking_reconstructs_token_stream(spark, tokens, chunk, overlap):
    """Dropping each chunk's first `overlap` tokens (except chunk 0)
    and concatenating reconstructs the original token stream exactly —
    the invariant that makes overlapped chunks trainable without
    duplicating content unboundedly."""
    from big_data_engineering_project_spark.operators.text_analysis import (
        chunk_documents,
    )

    if overlap >= chunk:
        return
    df = spark.createDataFrame([(1, " ".join(tokens))], "i LONG, txt STRING")
    rows = sorted(
        chunk_documents(df, "i", "txt", chunk, overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    rebuilt = []
    for r in rows:
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[overlap:])
    assert rebuilt == tokens
    # offsets are stride-spaced and sizes bounded by the chunk width
    stride = chunk - overlap
    for r in rows:
        assert r["start_tok"] == r["chunk_idx"] * stride
        assert 1 <= r["n_toks_chunk"] <= chunk


@st.composite
def changelogs(draw):
    """Small random changelog: (key, minute-offset, id, attr)."""
    n = draw(st.integers(min_value=0, max_value=14))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(min_value=1, max_value=3)),  # key
                draw(st.integers(min_value=0, max_value=20)),  # minute
                i,  # unique id
                draw(st.sampled_from(["A", "B", "C"])),  # attr
            )
        )
    return rows


@given(changelogs())
@pyspark_settings
def test_scd2_invariants(spark, rows):
    """On ANY changelog: versions per key are contiguous 1..n; exactly
    one open (is_current) version per key; intervals chain
    (effective_to of v equals effective_from of v+1); consecutive
    versions always differ in attr (compaction worked); and the
    as-of snapshot at +inf equals the current rows."""
    import datetime as dt

    from big_data_engineering_project_spark.operators.cdc import (
        scd2_from_changelog,
        snapshot_asof,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(minutes=m), i, a) for k, m, i, a in rows
    ]
    df = spark.createDataFrame(
        data, "k LONG, ts TIMESTAMP, id LONG, attr STRING"
    )
    hist = scd2_from_changelog(df, "k", "ts", "attr", ("id",)).collect()
    by_key: dict = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for r in vs if r["is_current"]) == 1
        assert vs[-1]["is_current"] and vs[-1]["effective_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert a["attr"] != b["attr"]
    if hist:
        cur = {(r["k"], r["attr"]) for r in hist if r["is_current"]}
        hist_df = scd2_from_changelog(df, "k", "ts", "attr", ("id",))
        snap = snapshot_asof(
            hist_df, "k", base + dt.timedelta(days=999)
        ).collect()
        assert {(r["k"], r["attr"]) for r in snap} == cur


@given(changelogs())
@pyspark_settings
def test_table_diff_self_is_empty_and_classifies(spark, rows):
    """diff(x, x) == ∅ on any frame; and against a mutated copy the
    classification matches a per-key python oracle."""
    from big_data_engineering_project_spark.operators.cdc import table_diff

    # unique key per row id
    data = [(i, a, k) for k, m, i, a in rows]
    df = spark.createDataFrame(data, "id LONG, attr STRING, extra LONG")
    assert table_diff(df, df, "id", ["attr", "extra"]).count() == 0

    # mutate: drop ids % 3 == 0, change attr where id % 2 == 1
    new_rows = [
        (i, "Z" if i % 2 == 1 else a, k)
        for i, a, k in data
        if i % 3 != 0
    ]
    new = spark.createDataFrame(
        new_rows, "id LONG, attr STRING, extra LONG"
    )
    got = {
        r["id"]: r["change_type"]
        for r in table_diff(df, new, "id", ["attr", "extra"]).collect()
    }
    want = {}
    for i, a, k in data:
        if i % 3 == 0:
            want[i] = "removed"
        elif i % 2 == 1 and a != "Z":
            want[i] = "changed"
    assert got == want


@st.composite
def baskets_strategy(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    return [
        (
            draw(st.integers(min_value=1, max_value=5)),
            draw(st.sampled_from(["a", "b", "c", "d"])),
        )
        for _ in range(n)
    ]


@given(baskets_strategy())
@pyspark_settings
def test_frequent_pairs_invariants(spark, rows):
    """On ANY basket table: pair_support ≤ min(support_a, support_b);
    lift · support_a · support_b == pair_support · N exactly (the
    integer identity behind the one IEEE division); item_a < item_b;
    and supports match a python recount."""
    from collections import defaultdict

    from big_data_engineering_project_spark.operators.association import (
        frequent_pairs,
    )

    df = spark.createDataFrame(
        rows or [(None, None)], "basket LONG, item STRING"
    ).filter(F.col("basket").isNotNull())
    out = frequent_pairs(df, "basket", "item").collect()
    items = defaultdict(set)
    for b, i in rows:
        items[b].add(i)
    n_b = len(items)
    supp = defaultdict(int)
    pairs = defaultdict(int)
    for b, its in items.items():
        for i in its:
            supp[i] += 1
        s = sorted(its)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pairs[(s[x], s[y])] += 1
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_support"], r["support_a"], r["support_b"], r["lift"]
        )
        for r in out
    }
    assert set(got) == set(pairs)
    for (a, b), (ps, sa, sb, lift) in got.items():
        assert a < b
        assert ps == pairs[(a, b)]
        assert (sa, sb) == (supp[a], supp[b])
        assert ps <= min(sa, sb)
        assert lift == (ps * n_b) / (sa * sb)


@given(changelogs())
@pyspark_settings
def test_ohlc_bounds_invariants(spark, rows):
    """open/close lie in [low, high]; volume matches a recount; one
    bar per (key, day)."""
    import datetime as dt
    from collections import defaultdict

    from big_data_engineering_project_spark.operators.temporal import (
        ohlc_resample,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (str(k), base + dt.timedelta(hours=m), i, float(ord(a)))
        for k, m, i, a in rows
    ]
    if not data:
        return
    df = spark.createDataFrame(
        data, "sym STRING, ts TIMESTAMP, id LONG, px DOUBLE"
    )
    out = ohlc_resample(df, "sym", "ts", "px", "id").collect()
    counts = defaultdict(int)
    for s, ts, _, _ in data:
        counts[(s, ts.date())] += 1
    assert len(out) == len(counts)
    for r in out:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["volume"] == counts[(r["sym"], r["bucket_ts"].date())]


@given(st.integers(min_value=1, max_value=5000), st.integers(min_value=1, max_value=64))
@settings(max_examples=300, deadline=None)
def test_ntile_closed_form_matches_sql_ntile(n, k):
    """The pure closed form inside ntile_scalable (linkage.py) — with
    base = n div k, rem = n mod k, the first rem tiles hold base+1
    rows — must reproduce SQL NTILE for ALL (n, k), not just the
    fixture matrix: the r7 'balanced partition' formula bug
    (floor((rn-1)k/n)+1, diverges at n=9, k=6) is exactly the class a
    formula-level property sweep catches and an engine round-trip
    test samples too sparsely to guarantee."""

    def closed_form(rn: int) -> int:
        if n < k:
            return rn
        base, rem = divmod(n, k)
        if rn <= rem * (base + 1):
            return 1 + (rn - 1) // (base + 1)
        return 1 + rem + (rn - 1 - rem * (base + 1)) // base

    # reference: SQL NTILE assigns the first n%k tiles base+1 rows
    base, rem = divmod(n, k)
    want = []
    for tile in range(1, k + 1):
        size = base + (1 if tile <= rem else 0)
        want.extend([tile] * size)
    got = [closed_form(rn) for rn in range(1, n + 1)]
    assert got == want


@st.composite
def mg_multisets(draw):
    """Two disjoint-input multisets of small non-negative item ids,
    weighted toward collisions and boundary ties (the all-equal-counts
    bucket is the algebra's hard case)."""
    items = st.integers(min_value=0, max_value=30)
    a = draw(st.lists(items, min_size=0, max_size=120))
    b = draw(st.lists(items, min_size=0, max_size=120))
    return a, b


@given(mg_multisets(), st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=3))
@pyspark_settings
def test_mg_algebra_guarantees_on_any_multiset(spark, ab, k, nb):
    """On ANY pair of multisets and any (k, n_buckets): each side's
    summary and the MERGED summary satisfy (a) ≤ k counters per
    bucket, (b) every item with true count > its bucket's err is
    present, (c) adj ≤ true ≤ adj + err — against exact counts of the
    side / the union respectively. This is the PODS'12 mergeability
    contract; ties, empty sides, and all-pruned buckets arise freely
    from the generator."""
    from collections import Counter

    from big_data_engineering_project_spark.operators.sketches import (
        MG_A,
        MG_P,
        mg_merge,
        mg_summary,
    )
    from big_data_engineering_project_spark.operators.dedup import HASH_PRIME

    a_items, b_items = ab

    def bucket(i: int) -> int:
        return ((i % HASH_PRIME) * MG_A + 12345) % MG_P % nb

    def check(counters_df, offsets_df, multiset):
        cs = {
            (r["bucket"], r["item"]): r["adj_cnt"]
            for r in counters_df.collect()
        }
        errs = {r["bucket"]: r["err"] for r in offsets_df.collect()}
        per_bucket = Counter(b for b, _ in cs)
        assert all(v <= k for v in per_bucket.values())
        exact = Counter((bucket(i), i) for i in multiset)
        for (bk, it), true_c in exact.items():
            err = errs.get(bk, 0)
            if true_c > err:
                assert (bk, it) in cs
            if (bk, it) in cs:
                assert cs[(bk, it)] <= true_c <= cs[(bk, it)] + err

    da = spark.createDataFrame([(i,) for i in a_items] or [(None,)],
                               "item_v LONG").filter(F.col("item_v").isNotNull())
    db = spark.createDataFrame([(i,) for i in b_items] or [(None,)],
                               "item_v LONG").filter(F.col("item_v").isNotNull())
    ca, ea = mg_summary(da, "item_v", k=k, n_buckets=nb)
    cb, eb = mg_summary(db, "item_v", k=k, n_buckets=nb)
    check(ca, ea, a_items)
    check(cb, eb, b_items)
    cm, em = mg_merge(ca, ea, cb, eb, k=k)
    check(cm, em, a_items + b_items)


@given(
    vals=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=600,
    ),
    k=st.sampled_from([8, 16, 32]),
    n_shards=st.sampled_from([1, 3]),
)
@settings(max_examples=60, deadline=None)
def test_kll_certified_rank_bound_on_any_multiset(vals, k, n_shards):
    """The deterministic KLL summary's self-certified err_bound is a
    HARD guarantee on arbitrary multisets: for every quantile target,
    the returned value's true-rank window is within err_bound of the
    target; with no compactions (n <= k per shard, merge under k) the
    bound is 0 and quantiles are exact order statistics. Pure-Python
    path (the same functions the Spark operators call per shard)."""
    import bisect

    from big_data_engineering_project_spark.operators.sketches import (
        _kll_build,
        _kll_levels_to_rows,
        _kll_merge_levels,
    )

    shards = [sorted(vals[i::n_shards]) for i in range(n_shards)]
    built = [_kll_build(s, k) for s in shards]
    levels, err = _kll_merge_levels(
        [b[0] for b in built], [b[1] for b in built], k
    )
    vs, ws = _kll_levels_to_rows(levels)
    pairs = sorted(zip(vs, ws))
    n = len(vals)
    assert sum(ws) <= n + err  # weight conservation up to drops
    svals = sorted(vals)
    for num, den in [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]:
        target = -(-num * n // den)
        acc = 0
        est = pairs[-1][0] if pairs else None
        for v, w in pairs:
            acc += w
            if acc >= target:
                est = v
                break
        lo = bisect.bisect_left(svals, est)
        hi = bisect.bisect_right(svals, est)
        assert lo - err <= target <= hi + err, (target, est, lo, hi, err)
        if err == 0:
            # exact path: est IS the ceil(q*n)-th order statistic
            assert est == svals[target - 1]


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400
    )
)
@settings(max_examples=30, deadline=None)
def test_kll_deterministic_and_weight_exact_total(vals):
    """Building twice yields identical summaries (no random coin), and
    total retained weight + certified drops account for every item:
    each compaction at level h drops exactly len/2 items of weight 2^h
    and doubles the promoted half, so total weight stays within
    err_bound of n."""
    from big_data_engineering_project_spark.operators.sketches import (
        _kll_build,
        _kll_levels_to_rows,
    )

    a = _kll_build(sorted(vals), 16)
    b = _kll_build(sorted(vals), 16)
    assert a[0] == b[0] and a[1] == b[1]
    vs, ws = _kll_levels_to_rows(a[0])
    assert abs(sum(ws) - len(vals)) <= a[1]


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=1, max_value=10**4),
        ),
        min_size=1,
        max_size=120,
    ),
    k=st.sampled_from([8, 16, 32]),
)
@settings(max_examples=60, deadline=None)
def test_kll_weighted_build_certified_bound(pairs, k):
    """_kll_build_weighted (the weighted-distinct collapse path the
    Spark operators use since r10) satisfies the SAME hard certificate
    as unit-weight builds: binary weight decomposition inserts
    exactly, so all error comes from compactions and every quantile's
    true-rank window lies within err_bound of its target — even with
    counts up to 10^4 per value (heavy skew). Also: deterministic,
    and weight conservation holds within the bound."""
    from collections import Counter

    from big_data_engineering_project_spark.operators.sketches import (
        _kll_build_weighted,
        _kll_levels_to_rows,
    )

    # collapse duplicate values like the Spark groupBy does
    counts = Counter()
    for v, c in pairs:
        counts[v] += c
    collapsed = sorted(counts.items())
    n = sum(counts.values())

    a = _kll_build_weighted(collapsed, k)
    b = _kll_build_weighted(list(reversed(collapsed)), k)
    assert a == b  # input order cannot matter
    levels, err = a
    vs, ws = _kll_levels_to_rows(levels)
    assert abs(sum(ws) - n) <= err
    summary = sorted(zip(vs, ws))

    # exact rank window [lo, hi] of each distinct value in the
    # expanded multiset, without materializing it
    rank_lo, rank_hi, acc = {}, {}, 0
    for v, c in collapsed:
        rank_lo[v], rank_hi[v] = acc + 1, acc + c
        acc += c

    for num, den in [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]:
        target = -(-num * n // den)
        acc_w = 0
        est = summary[-1][0] if summary else None
        for v, w in summary:
            acc_w += w
            if acc_w >= target:
                est = v
                break
        # est is always a real input value; its true rank window:
        assert est in rank_lo, est
        assert rank_lo[est] - 1 - err <= target <= rank_hi[est] + err, (
            target,
            est,
            err,
        )
        if err == 0:
            assert rank_lo[est] <= target <= rank_hi[est]
