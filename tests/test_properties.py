"""Property-based kernel laws (hypothesis over micro-DataFrames).

Few examples, deliberately: each example pays a Spark job. The laws cover
what example-based tests structurally cannot — arbitrary key/value shapes,
null placement, and duplicate distributions.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key, latest_by_key_agg
from beeper_matric_etl_tool_spark.operators.merge import merge_upsert

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),              # key
        st.integers(min_value=0, max_value=100),            # version
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),  # payload
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(rows_strategy)
def test_latest_by_key_forms_agree_and_are_idempotent(spark_prop, rows):
    """Window-rank and max_by-aggregate forms implement the SAME operator,
    and applying the kernel twice equals applying it once.

    Both forms require a TOTAL order (their documented contract). The tie
    column must therefore distinguish EVERY payload — including NULL vs ''
    (hypothesis found that a bare coalesce collapses those two, making the
    order non-total and both forms individually nondeterministic)."""
    df = spark_prop.createDataFrame(rows, "k int, v int, p string").withColumn(
        "tie",
        F.concat(
            F.when(F.col("p").isNull(), F.lit("0")).otherwise(F.lit("1")),
            F.coalesce(F.col("p"), F.lit("")),
        ),
    )
    w = latest_by_key(df, ["k"], [F.col("v").desc(), F.col("tie").desc()])
    a = latest_by_key_agg(df, ["k"], ["v", "tie"])
    canon = lambda d: sorted((r.k, r.v, r.p) for r in d.select("k", "v", "p").collect())
    assert canon(w) == canon(a)
    assert canon(latest_by_key(w, ["k"], [F.col("v").desc(), F.col("tie").desc()])) == canon(w)


@settings(max_examples=10, deadline=None)
@given(rows_strategy)
def test_merge_upsert_laws(spark_prop, rows):
    """(1) Self-merge is all-keep (change detection finds no diffs);
    (2) merge result contains every key from both sides exactly once."""
    df = spark_prop.createDataFrame(rows, "k int, v int, p string").dropDuplicates(["k"])
    self_merged = merge_upsert(df, df, keys=["k"])
    assert {r.action for r in self_merged.collect()} <= {"keep"}

    incoming = df.withColumn("v", F.col("v") + 1).limit(3)
    merged = merge_upsert(df, incoming, keys=["k"], action_col=None)
    all_keys = {r.k for r in df.collect()} | {r.k for r in incoming.collect()}
    got_keys = [r.k for r in merged.collect()]
    assert sorted(got_keys) == sorted(all_keys)


_ts_strategy = st.integers(min_value=0, max_value=50_000)  # seconds, ~14h span


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_ts_strategy, min_size=1, max_size=20),
    st.lists(st.tuples(_ts_strategy, st.integers(0, 30_000)), min_size=1, max_size=10),
)
def test_interval_join_equals_bruteforce(spark_prop, point_ts, raw_intervals):
    """The bin-bucketed rewrite must return EXACTLY the containment pairs a
    brute-force BETWEEN join returns, for arbitrary point/interval layouts
    (intervals spanning zero, one, or many bins; duplicate timestamps)."""
    from beeper_matric_etl_tool_spark.operators.rangejoin import interval_join

    points = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(point_ts)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds(F.col("sec")).alias("ts"))
    intervals = spark_prop.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(raw_intervals)],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds(F.col("s")).alias("start"),
        F.timestamp_seconds(F.col("e")).alias("end"),
    )
    got = sorted(
        (r.pid, r.iid) for r in interval_join(points, intervals).collect()
    )
    brute = sorted(
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    )
    assert got == brute


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 5)),  # (unique-ish id, TIED ts)
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    ),
    st.integers(1, 7),
)
def test_tuple_keyset_pagination_is_lossless(spark_prop, rows, limit):
    """Paging with the TUPLE cursor (order_col, tie_col) must reproduce the
    full (order desc, tie desc) listing exactly — no skips, no repeats —
    for arbitrary tie layouts and page sizes. The deliberately tiny ts
    domain forces pages to be cut mid-tie, the exact case the scalar
    cursor loses rows on."""
    from beeper_matric_etl_tool_spark.operators.pagination import keyset_page

    df = spark_prop.createDataFrame(rows, "event_id long, ts long")
    expected = sorted(((t, i) for i, t in rows), reverse=True)

    paged, cursor = [], None
    for _ in range(len(rows) + 2):  # bounded: must terminate
        page = keyset_page(
            df, order_col="ts", tie_col="event_id", limit=limit,
            before=None if cursor is None else F.lit(cursor[0]),
            before_tie=None if cursor is None else F.lit(cursor[1]),
        ).collect()
        if not page:
            break
        paged.extend((r.ts, r.event_id) for r in page)
        cursor = (page[-1].ts, page[-1].event_id)
    assert paged == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),      # doc id
            st.sampled_from(["en", "es", "fr", "xx"]),       # source
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([(0.1, 0.25), (0.25, 0.5), (0.5, 1.0), (0.1, 1.0)]),
)
def test_mix_keep_is_monotone_in_rate(spark_prop, rows, rates):
    """Raising a source's keep rate can only ADD documents, never swap
    them: the kept set at the lower rate is a subset of the kept set at
    the higher one (the property that makes re-mixing an existing corpus
    incremental instead of a reshuffle — hash-threshold keeps are nested
    by construction, unlike RNG sampling)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import mix_keep

    lo, hi = rates
    df = spark_prop.createDataFrame(rows, "doc_id long, lang string")
    kept_lo = {
        r.doc_id for r in df.filter(mix_keep("doc_id", "lang", {"en": lo})).collect()
    }
    kept_hi = {
        r.doc_id for r in df.filter(mix_keep("doc_id", "lang", {"en": hi})).collect()
    }
    assert kept_lo <= kept_hi
    # sources without a configured rate are always dropped
    assert all(
        r.lang == "en"
        for r in df.filter(mix_keep("doc_id", "lang", {"en": hi})).collect()
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),      # doc id
            st.integers(min_value=1, max_value=40),          # token count
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=5, max_value=60),                  # budget
)
def test_pack_by_budget_laws(spark_prop, rows, budget):
    """For ANY token distribution and budget: (1) the first pack is 0 and
    pack ids are non-decreasing along the pack order (gaps ARE legal — a
    doc larger than the budget spills past bin boundaries); (2) every
    pack's token sum minus its largest doc is under budget (the
    exclusive-prefix admission rule); (3) the assignment is a pure
    function of content — rerunning yields identical packs."""
    import hashlib

    from beeper_matric_etl_tool_spark.ext.pipeline import PACK_SALT, pack_by_budget

    df = spark_prop.createDataFrame(rows, "doc_id long, n long")
    packed = pack_by_budget(df, "n", budget=budget, shuffle=True, allow_single_partition=True)
    out = packed.collect()
    ordered = sorted(
        out, key=lambda r: hashlib.md5(f"{r.doc_id}{PACK_SALT}".encode()).hexdigest()
    )
    assert ordered[0].pack_id == 0
    assert all(a.pack_id <= b.pack_id for a, b in zip(ordered, ordered[1:]))
    by_pack: dict[int, list] = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r.n)
    for toks in by_pack.values():
        assert sum(toks) - max(toks) < budget
    again = {
        (r.doc_id, r.pack_id)
        for r in pack_by_budget(
            df, "n", budget=budget, allow_single_partition=True
        ).collect()
    }
    assert {(r.doc_id, r.pack_id) for r in out} == again


@settings(max_examples=15, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=60),
    chunk=st.integers(min_value=2, max_value=20),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_documents_laws(spark_prop, n_tokens, chunk, overlap_frac):
    """For ANY (doc length, chunk size, overlap < chunk):
    - coverage: every token index appears in >= 1 chunk;
    - exactness: chunk i's text is exactly tokens[start : start+chunk];
    - overlap: consecutive chunks share exactly min(overlap, len(prev)-stride)
      token positions (i.e. starts advance by a fixed stride);
    - determinism: chunk_id is dense 0..k-1 in start order."""
    from beeper_matric_etl_tool_spark.ext.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    words = [f"t{i}" for i in range(n_tokens)]
    df = spark_prop.createDataFrame([(7, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_start"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, overlap_tokens=overlap
        ).collect()
    )
    stride = chunk - overlap
    covered = set()
    for cid, start, text, n in rows:
        toks = text.split(" ")
        assert toks == words[start : start + chunk]
        assert n == len(toks)
        assert start == cid * stride
        covered.update(range(start, start + n))
    assert covered == set(range(n_tokens))
    assert [r[0] for r in rows] == list(range(len(rows)))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_normalize_text_idempotent_on_arbitrary_unicode(spark_prop, texts):
    """normalize(normalize(x)) == normalize(x) for ARBITRARY unicode —
    the law the planted-example test cannot cover."""
    from beeper_matric_etl_tool_spark.ext.text import normalize_text

    docs = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = docs.select("doc_id", normalize_text("text").alias("t"))
    twice = once.select("doc_id", normalize_text("t").alias("t"))
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=4),
)
def test_ffd_budget_invariant_over_random_lengths(spark_prop, lengths, shards):
    """For ANY length multiset and shard count: no non-oversize bin
    exceeds the budget, every doc lands in exactly one bin, and oversize
    flags appear exactly on docs longer than the budget."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        pack_first_fit_decreasing,
    )

    budget = 16
    docs = spark_prop.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n long"
    )
    out = pack_first_fit_decreasing(
        docs, "n", budget=budget, n_shards=shards, allow_single_partition=True
    ).collect()
    assert len(out) == len(lengths)
    fills: dict[str, int] = {}
    overs: dict[str, bool] = {}
    for r in out:
        assert r["pack_oversize"] == (lengths[r["doc_id"]] > budget)
        fills[r["pack_key"]] = fills.get(r["pack_key"], 0) + r["n"]
        overs[r["pack_key"]] = overs.get(r["pack_key"], False) or r["pack_oversize"]
    for key, fill in fills.items():
        if not overs[key]:
            assert fill <= budget, (key, fill)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.sampled_from(["en", "es", "fr", "zz"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.dictionaries(
        st.sampled_from(["en", "es", "fr"]),
        st.integers(min_value=0, max_value=6),
        max_size=3,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_quota_two_phase_equals_single_phase(spark_prop, rows, quotas, parts):
    """For ANY (id, stratum) multiset, quota map, and input partitioning:
    two_phase=True returns exactly the single-window sample — the local
    top-quota of every partition contains the global top-quota, and
    unknown strata drop in both forms."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_quota

    docs = spark_prop.createDataFrame(rows, "doc_id long, lang string")
    base = {
        tuple(r)
        for r in sample_quota(docs, quotas).collect()
    }
    got = {
        tuple(r)
        for r in sample_quota(
            docs.repartition(parts), quotas, two_phase=True
        ).collect()
    }
    assert got == base
    # quota semantics hold: per stratum exactly min(quota, |stratum|)
    from collections import Counter

    strata = Counter(l for _, l in rows)
    kept = Counter(l for _, l in base)
    for code, q in quotas.items():
        assert kept.get(code, 0) == min(q, strata.get(code, 0))
    assert kept.get("zz", 0) == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.sampled_from(["en", "es", "fr", "zz"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.dictionaries(
        st.sampled_from(["en", "es", "fr"]),
        st.integers(min_value=0, max_value=120),
        max_size=3,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_token_quota_two_phase_equals_single_phase(
    spark_prop, rows, budgets, parts
):
    """For ANY (id, stratum, n_toks) multiset, budget map, and input
    partitioning: two_phase=True returns exactly the single-window
    token-budget prefix, and the prefix semantics hold — exclusive
    cumulative tokens of every kept doc stay under the budget, unknown
    strata drop, and the kept set is a prefix of the salted-hash order."""
    import hashlib

    from beeper_matric_etl_tool_spark.ext.pipeline import (
        TOKQUOTA_SALT,
        sample_token_quota,
    )

    docs = spark_prop.createDataFrame(
        rows, "doc_id long, lang string, n_toks int"
    )
    base = {tuple(r) for r in sample_token_quota(docs, budgets).collect()}
    got = {
        tuple(r)
        for r in sample_token_quota(
            docs.repartition(parts), budgets, two_phase=True
        ).collect()
    }
    assert got == base
    # reference semantics, recomputed driver-side
    expected = set()
    for lang in {l for _, l, _ in rows}:
        budget = budgets.get(lang, 0)
        stratum = sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (
                hashlib.md5(f"{r[0]}{TOKQUOTA_SALT}".encode()).hexdigest(),
                r[0],
            ),
        )
        cum = 0
        for r in stratum:
            if cum < budget:
                expected.add(tuple(r))
            cum += r[2]
    assert base == expected
