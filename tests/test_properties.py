"""Property-based tests (hypothesis) for engine invariants that must hold
on arbitrary input, not just fixtures. One Spark job per property batch
(examples are collected into a single DataFrame) to keep runtime sane."""

from __future__ import annotations

import uuid

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.functions.uuid_repair import uuid_normalize
from realtimedatapipeline_8_project_spark.operators.dedup import shingle_hashes, shingles
from realtimedatapipeline_8_project_spark.operators.windows import latest_wins

TEXTS = st.text(
    alphabet=st.sampled_from("ab cdef "), min_size=0, max_size=60
)


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_uuid_repair_is_total_and_valid(spark, data):
    samples = data.draw(
        st.lists(
            st.text(min_size=0, max_size=40).filter(lambda s: s.strip() != ""),
            min_size=1,
            max_size=50,
        )
    )
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    out = df.select("s", uuid_normalize("s").alias("u")).collect()
    for r in out:
        parsed = uuid.UUID(r.u)  # always a parseable UUID
        assert parsed.variant == uuid.RFC_4122
    # idempotent: normalizing the output is a no-op
    df2 = spark.createDataFrame([(r.u,) for r in out], ["s"])
    out2 = df2.select(uuid_normalize("s").alias("u")).collect()
    assert [r.u for r in out2] == [r.u for r in out]


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_shingle_count_formula(spark, data):
    texts = data.draw(st.lists(TEXTS, min_size=1, max_size=50))
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = df.select(
        F.size(F.split("text", " ")).alias("n_tok"),
        F.size(shingles("text")).alias("n_str"),
        F.size(shingle_hashes("text")).alias("n_hash"),
    ).collect()
    for r in out:
        # distinct shingles never exceed max(n_tok - 2, 0)
        cap = max(r.n_tok - 2, 0)
        assert 0 <= r.n_str <= cap
        assert 0 <= r.n_hash <= cap


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_latest_wins_is_idempotent_and_keyed(spark, data):
    rows = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 5),  # key
                st.integers(0, 1000),  # ts
                st.integers(-100, 100),  # payload
            ),
            min_size=1,
            max_size=80,
        )
    )
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    dedup = latest_wins(df, "k", [F.desc("ts"), F.desc("v")])
    got = dedup.collect()
    # one row per key
    assert len(got) == len({r.k for r in got}) == df.select("k").distinct().count()
    # applying again changes nothing
    again = latest_wins(dedup, "k", [F.desc("ts"), F.desc("v")]).collect()
    assert sorted(map(str, again)) == sorted(map(str, got))
    # each kept row is the max (ts, v) of its key
    best = {}
    for k, ts, v in rows:
        if k not in best or (ts, v) > best[k]:
            best[k] = (ts, v)
    for r in got:
        assert (r.ts, r.v) == best[r.k]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=80,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Fixpoint min-label propagation == reference union-find on random
    graphs (self-loops and duplicate edges included)."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want


def test_connected_components_deep_chain_converges(spark):
    """A 50-node path needs ~log2(50) propagate+jump rounds — well past
    the old fixed-4 budget; the fixpoint loop must still nail it."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        connected_components,
    )

    n = 50
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src LONG, dst LONG"
    )
    got = {r["id"]: r["comp"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(n + 1)}


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_asof_join_matches_bruteforce(spark, data):
    """The union-marker as-of join equals the brute-force definition
    (latest right row with rts <= lts per key; NULL when none) on random
    inputs, including equal-timestamp and empty-right edge cases."""
    from realtimedatapipeline_8_project_spark.operators.asof import asof_join

    lefts = data.draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 20)),
            min_size=1,
            max_size=40,
        )
    )
    rights = data.draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-99, 99)),
            min_size=0,
            max_size=40,
        )
    )
    # unique right (key, ts): keep max payload (deterministic tie-break),
    # mirroring the dedup contract asof_join requires of its right side
    best = {}
    for k, ts, v in rights:
        if (k, ts) not in best or v > best[(k, ts)]:
            best[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in best.items()]
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)], ["lid", "k", "lts"]
    )
    rdf = (
        spark.createDataFrame(rrows, ["k", "rts", "v"])
        if rrows
        else spark.createDataFrame([], "k INT, rts INT, v INT")
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            ldf, rdf, key="k", left_ts="lts", right_ts="rts",
            value_cols=["v"],
        ).collect()
    }
    for i, (k, lts) in enumerate(lefts):
        cands = [(ts, v) for (kk, ts), v in best.items()
                 if kk == k and ts <= lts]
        want = max(cands)[1] if cands else None
        assert got[i] == want, f"left {i} key {k} ts {lts}"


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_bloom_prefilter_never_drops_matches(spark, data):
    """Bloom semi-join guarantee: the pre-filter may pass extra rows
    (false positives — corrected by the exact join) but must NEVER drop a
    fact row whose key IS in the dim (false negatives would change the
    join result)."""
    from realtimedatapipeline_8_project_spark.operators.scale import (
        bloom_prefilter,
        build_bloom,
    )

    dim_keys = data.draw(
        st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=60)
    )
    fact_keys = data.draw(
        st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=120)
    )
    # ensure overlap so the guarantee is actually exercised
    fact_keys += dim_keys[: len(dim_keys) // 2 + 1]
    dim = spark.createDataFrame([(k,) for k in set(dim_keys)], ["k"])
    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], ["rid", "k"]
    )
    bloom = build_bloom(dim, "k")
    kept = {r["rid"] for r in bloom_prefilter(fact, "k", bloom).collect()}
    dimset = set(dim_keys)
    must_keep = {i for i, k in enumerate(fact_keys) if k in dimset}
    assert must_keep <= kept, "bloom pre-filter dropped a true match"


def test_bloom_prefilter_survives_colliding_column_names(spark):
    """A fact table that already carries the probe bookkeeping names must
    pass through untouched: temp columns are named fresh per schema."""
    from realtimedatapipeline_8_project_spark.operators.scale import (
        bloom_prefilter,
        build_bloom,
    )

    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    fact = spark.createDataFrame(
        [(0, 1, 111, 222), (1, 2, 333, 444), (2, 99, 555, 666)],
        ["rid", "k", "_bit0", "_w1"],
    )
    out = bloom_prefilter(fact, "k", build_bloom(dim, "k"))
    assert out.columns == fact.columns
    rows = {r["rid"]: (r["_bit0"], r["_w1"]) for r in out.collect()}
    assert {0, 1} <= set(rows)
    assert rows[0] == (111, 222) and rows[1] == (333, 444)


def test_approx_distinct_within_error_bound(spark, sf_small, sf_oracle):
    """approx_count_distinct (HLL++, rsd=0.01) must land within 5% of the
    exact per-group COUNT(DISTINCT) — turns the rows-only driver check
    into a quantified accuracy contract at two scale factors."""
    from realtimedatapipeline_8_project_spark.operators.aggregates import (
        q_approx_distinct,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    for sf_dir in (sf_small, sf_oracle):
        got = {
            r["o_orderstatus"]: r["approx_buyers"]
            for r in q_approx_distinct(spark, sf_dir).collect()
        }
        exact = {
            r["o_orderstatus"]: r["n"]
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for status, n in exact.items():
            assert abs(got[status] - n) <= max(1, 0.05 * n), (
                sf_dir,
                status,
                got[status],
                n,
            )


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_chunker_twins_agree_and_reconstruct(spark, data):
    """chunk_windows_native == the UDTF form on arbitrary text, and the
    stride-prefix concatenation rebuilds the original token sequence."""
    from realtimedatapipeline_8_project_spark.operators.udtf_ops import (
        CHUNK_S,
        chunk_windows,
        chunk_windows_native,
    )

    texts = data.draw(st.lists(TEXTS, min_size=1, max_size=30))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    a = sorted(
        map(tuple, chunk_windows(spark, df).collect())
    )
    b = sorted(map(tuple, chunk_windows_native(df).collect()))
    assert a == b
    by_doc: dict[int, list] = {}
    for doc_id, idx, _n, chunk in b:
        by_doc.setdefault(doc_id, []).append((idx, chunk))
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if t == "":
            assert i not in by_doc
            continue
        rebuilt: list[str] = []
        for _idx, chunk in sorted(by_doc[i]):
            rebuilt.extend(chunk.split(" ")[:CHUNK_S])
        assert rebuilt == toks[: len(rebuilt)]
        assert len(rebuilt) >= len(toks) - CHUNK_S


@settings(max_examples=4, deadline=None)
@given(st.data())
def test_intra_batch_dedup_verdict_invariants(spark, data):
    """On arbitrary batches (with planted exact copies): every doc gets
    exactly one verdict row; dup_of < doc_id; every dup_of target is
    itself kept; planted verbatim copies are never kept."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        intra_batch_dedup,
    )

    texts = data.draw(
        st.lists(
            st.text(alphabet=st.sampled_from("xy uvw "), min_size=0, max_size=40),
            min_size=2,
            max_size=15,
        )
    )
    rows = [(i, t) for i, t in enumerate(texts) if t.strip()]
    if not rows:
        return
    # plant a verbatim copy of the first surviving text
    rows.append((1_000_000, rows[0][1]))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    verdict = intra_batch_dedup(df).collect()
    assert len(verdict) == len(rows)
    kept = {r.doc_id for r in verdict if r.is_kept}
    for r in verdict:
        assert r.is_kept == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.doc_id
            assert r.dup_of in kept
    if len(rows[0][1].split(" ")) >= 3:
        # the seed has n-gram content: its verbatim copy must collapse
        assert 1_000_000 not in kept
    else:
        # contentless docs (< shingle width) carry no n-gram evidence:
        # the NEAR-dup gate keeps them (exact-fingerprint dedup is the
        # operator that collapses verbatim short docs)
        assert 1_000_000 in kept


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_boolean_search_docs_contain_all_terms(spark, data):
    """Ground-truth check on arbitrary corpora: the conjunctive search
    returns exactly the docs whose token set covers the query terms."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        BOOL_QUERY_TERMS,
        normalized_text,
        words,
    )

    vocab = st.sampled_from(list(BOOL_QUERY_TERMS) + ["foo", "bar"])
    docs = data.draw(
        st.lists(st.lists(vocab, min_size=0, max_size=8), min_size=1, max_size=20)
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k = len(BOOL_QUERY_TERMS)
    got = {
        r.doc_id
        for r in df.select(
            "doc_id", F.explode(words(normalized_text("text"))).alias("term")
        )
        .where(F.col("term").isin(*BOOL_QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n"))
        .where(F.col("n") == k)
        .collect()
    }
    want = {
        i for i, toks in enumerate(docs) if set(BOOL_QUERY_TERMS) <= set(toks)
    }
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.data())
def test_index_deletes_equal_filtered_build(spark, tmp_path_factory, data):
    """For an arbitrary tiny corpus, an arbitrary batch split, an
    arbitrary delete subset, and an arbitrary compaction margin:
    (postings, stats) of build+delete[+compact] == a build over the
    corpus MINUS the deleted docs. The machine-checked general form of
    the fixed-slice tests in test_index_deletes.py."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        batch_postings,
        compact_index,
        delete_index_docs,
        read_index,
        write_index_batch,
    )

    n_docs = data.draw(st.integers(min_value=1, max_value=12))
    words_st = st.text(alphabet="abcd", min_size=1, max_size=4)
    texts = data.draw(
        st.lists(
            st.lists(words_st, min_size=1, max_size=6).map(" ".join),
            min_size=n_docs,
            max_size=n_docs,
        )
    )
    n_batches = data.draw(st.integers(min_value=1, max_value=3))
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=n_docs,
            max_size=n_docs,
        )
    )
    victims = data.draw(st.sets(st.integers(min_value=0, max_value=n_docs - 1)))
    keep_last = data.draw(st.integers(min_value=0, max_value=n_batches))
    do_compact = data.draw(st.booleans())

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tmp = tmp_path_factory.mktemp("propidx")
    root, twin = str(tmp / "idx"), str(tmp / "twin")
    for b in range(n_batches):
        in_b = [i for i, a in enumerate(assign) if a == b]
        batch = docs.where(F.col("doc_id").isin(in_b or [-1]))
        write_index_batch(batch_postings(batch), b, root)
        survivors = [i for i in in_b if i not in victims]
        write_index_batch(
            batch_postings(docs.where(F.col("doc_id").isin(survivors or [-1]))),
            b,
            twin,
        )
    if victims:
        delete_index_docs(
            spark,
            root,
            spark.createDataFrame([(i,) for i in sorted(victims)], "doc_id long"),
            n_batches,
        )
    if do_compact:
        compact_index(spark, root, keep_last=keep_last)
    p_a, s_a = read_index(spark, root)
    p_b, s_b = read_index(spark, twin)
    cols = ["term", "doc_id", "tf", "dl", "positions"]
    assert sorted(map(str, p_a.select(*cols).collect())) == sorted(
        map(str, p_b.select(*cols).collect())
    )
    assert s_a.collect() == s_b.collect()


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_quantile_bucket_envelope_property(data):
    """For ARBITRARY non-negative BIGINTs: the integer bucket math
    (evaluated via the DuckDB oracle spelling, the exact expression the
    Spark side twins) puts every value inside its own [est_lo, est_hi]
    envelope, with singleton width below QH_SUB and relative width
    <= 1/QH_SUB above it — no fixture involved."""
    import duckdb

    from realtimedatapipeline_8_project_spark.operators.distribution import (
        QH_SUB,
        _bucket_exprs_duck,
    )

    vals = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 62) - 1),
            min_size=1,
            max_size=50,
        )
    )
    e = _bucket_exprs_duck("x")
    rows = duckdb.sql(
        f"SELECT x, {e['bucket_id']} AS b, {e['est_lo']} AS lo, "
        f"{e['est_hi']} AS hi FROM (SELECT unnest(?) AS x)",
        params=[vals],
    ).fetchall()
    seen = {}
    for x, b, lo, hi in rows:
        assert lo <= x <= hi, (x, lo, hi)
        if x < QH_SUB:
            assert lo == hi == x == b
        else:
            assert (hi - lo) * QH_SUB <= lo
        # bucket id determines the envelope (merge soundness)
        assert seen.setdefault(b, (lo, hi)) == (lo, hi)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_heavy_hitter_candidates_superset_property(data):
    """Weighted pigeonhole on ARBITRARY multisets and ARBITRARY
    partitionings: the union of per-partition candidate emissions always
    contains every key holding >= 1/HH_FRAC of ALL rows, and each
    partition emits at most HH_FRAC keys."""
    import pandas as pd2

    from realtimedatapipeline_8_project_spark.operators.distribution import (
        HH_FRAC,
        _make_partition_candidates,
    )

    keys = data.draw(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400)
    )
    nparts = data.draw(st.integers(min_value=1, max_value=7))
    # arbitrary assignment of rows to partitions
    assign = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=nparts - 1),
            min_size=len(keys),
            max_size=len(keys),
        )
    )
    parts = {p: [] for p in range(nparts)}
    for k, p in zip(keys, assign):
        parts[p].append(k)
    gen = _make_partition_candidates(HH_FRAC, "user_id", "int64")
    union = set()
    for p, rows in parts.items():
        if not rows:
            continue
        (out,) = list(
            gen(iter([pd2.DataFrame({"user_id": pd2.array(rows, "int64")})]))
        )
        assert len(out) <= HH_FRAC
        union |= set(out["user_id"].tolist())
    total = len(keys)
    from collections import Counter

    for k, n in Counter(keys).items():
        if n * HH_FRAC >= total:
            assert k in union, (k, n, total, nparts)


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_bpe_arrow_twin_equals_chained_on_random_corpora(spark, data):
    """Property pin for the r13 production-encode twin: on RANDOM small
    [ab]-alphabet corpora (the densest merge-interaction space — runs,
    straddles, duplicate-string derivations all live here), the
    chained-replace projection and the Arrow rank-replay twin agree
    row-for-row after training K=3 merges on the same corpus. This is
    the empirical check behind the docstring's duplicate-string caveat:
    equality is machine-verified across arbitrary corpora, not assumed
    from the common case."""
    from realtimedatapipeline_8_project_spark.operators.bpe import (
        _WORDS,
        bpe_encode_counts_arrow,
        bpe_train_merges,
        word_freq,
    )

    docs_rows = data.draw(
        st.lists(
            st.lists(
                st.text(alphabet="ab", min_size=1, max_size=6),
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=3,
        )
    )
    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs_rows)],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(word_freq(docs), n_merges=3)

    estr = (
        f"array_join(transform({_WORDS}, "
        "w -> ' ' || array_join(filter(split(w, ''), c -> c != ''), '; ')"
        " || ';'), '|')"
    )
    merged = estr
    for _, l, r, _c in merges:
        merged = f"replace({merged}, ' {l}; {r};', ' {l}{r};')"
    count = (
        "CAST(size(filter(split(replace(replace("
        "{e}, ';', ''), '|', ' '), ' '), x -> x != '')) AS BIGINT)"
    )
    chained = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in docs.selectExpr(
            "doc_id",
            f"{count.format(e=estr)} AS n_chars",
            f"{count.format(e=merged)} AS n_bpe",
        ).collect()
    }
    arrow = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in bpe_encode_counts_arrow(docs, merges).collect()
    }
    assert arrow == chained
