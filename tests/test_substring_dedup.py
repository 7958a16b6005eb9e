"""Exact-substring dedup (operators/substring_dedup.py) — the DuckDB
oracle gate (the same compare the driver runs, both fixture scales),
the planted-corpus semantics battery, the hashed production twin pin,
and the plan shape. Permanent-tier earmark: this file IS its driver
gate until a registry slot frees (plans/registry.py capacity
decision)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
    SUBDUP_K,
    EARMARKS,
    QUERIES,
    duplicated_spans,
    q_substring_spans,
    q_substring_spans_hashed,
    _oracle_substring_spans,
)

from .oracle_harness import compare, duck_connection


def test_substring_spans_matches_duckdb_oracle_small(spark, sf_small):
    con = duck_connection(sf_small)
    try:
        df = q_substring_spans(spark, sf_small)
        assert not compare(
            df, con, _oracle_substring_spans(), "dedup_substring_spans"
        )
    finally:
        con.close()


@pytest.mark.slow
def test_substring_spans_matches_duckdb_oracle_driver_scale(
    spark, sf_oracle
):
    con = duck_connection(sf_oracle)
    try:
        df = q_substring_spans(spark, sf_oracle)
        assert not compare(
            df, con, _oracle_substring_spans(), "dedup_substring_spans"
        )
    finally:
        con.close()


def test_registered_entry_is_the_gated_pair():
    # spans registered r15 (QUERIES); cut/incremental stay earmarked
    fn, sql = QUERIES["dedup_substring_spans"]
    assert fn is q_substring_spans
    assert "HAVING count(DISTINCT doc_id) >= 2" in sql
    assert set(EARMARKS) == {
        "dedup_substring_cut",
        "dedup_substring_incremental",
    }


# --- planted-corpus semantics -----------------------------------------------

_SHARED_12 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu"
_FILL_A = "one two three four five six seven eight nine ten"
_FILL_B = "red orange yellow green blue indigo violet umber ochre teal"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(docs, **kw):
    return sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, **kw).collect()
    )


def test_planted_shared_passage_is_one_maximal_span(spark):
    """A 12-token passage shared by two docs (K=8) merges its 5
    overlapping duplicated 8-grams into ONE maximal span covering
    exactly the passage — at the right offsets in each doc."""
    docs = _docs(
        spark,
        [
            (1, f"{_SHARED_12} {_FILL_A}"),  # passage at tokens 1..12
            (2, f"{_FILL_B} {_SHARED_12}"),  # passage at tokens 11..22
        ],
    )
    assert _spans(docs) == [(1, 1, 12), (2, 11, 22)]


def test_planted_within_doc_repeat_not_flagged(spark):
    """The SAME 8-gram twice inside one doc (absent elsewhere) is
    text_repetition's business, not cross-document dedup — countDistinct
    doc_id >= 2 must not fire."""
    eight = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [(1, f"{eight} {_FILL_A} {eight}"), (2, _FILL_B)],
    )
    assert _spans(docs) == []


def test_planted_sub_k_shared_span_not_flagged(spark):
    """A shared 7-token span (< K = 8) has no shared K-gram."""
    seven = "alpha beta gamma delta epsilon zeta eta"
    docs = _docs(
        spark,
        [(1, f"{seven} {_FILL_A}"), (2, f"{seven} {_FILL_B}")],
    )
    assert _spans(docs) == []


def test_planted_two_separated_passages_stay_two_spans(spark):
    """Two shared 8-token passages with a non-duplicated gap between
    them in doc 1 must NOT merge (gap > 0 tokens); doc 2 carries them
    back to back, where overlap-or-adjacent merge folds them into one
    22-token span (8 + 8 back-to-back = adjacent islands: the text
    between the two is itself fully duplicated)."""
    p1 = "alpha beta gamma delta epsilon zeta eta theta"
    p2 = "north south east west up down left right"
    docs = _docs(
        spark,
        [
            (1, f"{p1} {_FILL_A} {p2}"),  # p1 at 1..8, p2 at 19..26
            (2, f"{p1} {p2}"),  # adjacent: 1..8 and 9..16
            (3, _FILL_B),  # unique filler: no hits
        ],
    )
    got = _spans(docs)
    assert (1, 1, 8) in got and (1, 19, 26) in got
    assert (2, 1, 16) in got
    assert len(got) == 3


def test_empty_corpus_contract(spark):
    docs = _docs(spark, [])
    out = duplicated_spans(docs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_tokens",
        "span_start",
        "span_end",
    ]


def test_partitioning_invariance(spark, sf_small):
    """The report is a pure function of the corpus — 1-partition and
    13-partition inputs must agree row for row."""
    from realtimedatapipeline_8_project_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_small, "documents")

    def run(d):
        spans = duplicated_spans(d)
        return sorted(map(tuple, spans.collect()))

    assert run(docs.repartition(13)) == run(docs.coalesce(1))


def test_hashed_twin_output_identical(spark, sf_small):
    """The xxhash64 production key (8 bytes through the gram exchange)
    must reproduce the string-key spelling's output exactly on the
    fixture — the dedup_minhash_portable twin discipline."""
    a = sorted(map(tuple, q_substring_spans(spark, sf_small).collect()))
    b = sorted(
        map(tuple, q_substring_spans_hashed(spark, sf_small).collect())
    )
    assert a == b and len(a) > 0


def test_plan_no_cartesian_one_gram_exchange(spark, sf_small):
    """Plan shape (optimization r16): the duplicated-gram predicate is
    a min/max WINDOW over ONE gram exchange — the corpus is scanned and
    gram-expanded exactly ONCE (the r15 shape derived the gram table
    twice for a dup-set semi-join: one extra full corpus pass and gram
    exchange per run), no join at all on the gram side, no cartesian
    product, and the single documents scan reads ONLY (doc_id, text)."""
    from .test_plans import plan_of_df

    p = plan_of_df(q_substring_spans(spark, sf_small))
    assert "CartesianProduct" not in p
    assert "Window" in p
    scans = [l for l in p.splitlines() if "ReadSchema" in l]
    assert len(scans) == 1, p  # ONE corpus scan, the whole point
    for l in scans:
        assert "doc_id" in l and "text" in l
        assert "lang" not in l and "n_chars" not in l


def test_island_merge_matches_python_reference_random_sweep(spark):
    """The island window (running-max merge) against a pure-Python
    interval-union reference over 200 seeded-random hit sets, all in
    ONE Spark job (doc_id = case index). Catches off-by-ones at every
    gap/adjacency/overlap boundary the planted cases can't enumerate."""
    import random

    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _spans_from_hits,
    )

    rng = random.Random(0xD14)
    k = SUBDUP_K
    cases = {}
    rows = []
    for doc in range(200):
        n = rng.randint(1, 30)
        starts = sorted(rng.sample(range(1, 80), n))
        cases[doc] = starts
        rows.extend((doc, 999, s) for s in starts)

    def py_merge(starts):
        spans = []
        for s in starts:
            if spans and s <= spans[-1][1] + 1:  # overlap or adjacent
                spans[-1][1] = max(spans[-1][1], s + k - 1)
            else:
                spans.append([s, s + k - 1])
        return [tuple(x) for x in spans]

    hits = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, start long"
    )
    got = {}
    for r in _spans_from_hits(hits, k).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for doc, starts in cases.items():
        assert sorted(got.get(doc, [])) == py_merge(starts), (
            doc,
            starts,
        )


def test_substring_cut_matches_duckdb_oracle_small(spark, sf_small):
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _oracle_substring_cut,
        q_substring_cut,
    )

    con = duck_connection(sf_small)
    try:
        df = q_substring_cut(spark, sf_small)
        assert not compare(
            df, con, _oracle_substring_cut(), "dedup_substring_cut"
        )
    finally:
        con.close()


@pytest.mark.slow
def test_substring_cut_matches_duckdb_oracle_driver_scale(spark, sf_oracle):
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _oracle_substring_cut,
        q_substring_cut,
    )

    con = duck_connection(sf_oracle)
    try:
        df = q_substring_cut(spark, sf_oracle)
        assert not compare(
            df, con, _oracle_substring_cut(), "dedup_substring_cut"
        )
    finally:
        con.close()


def test_cut_is_spans_complement(spark, sf_small):
    """Cross-operator identity: for every document, kept_tokens ==
    n_tokens - dup_tokens (docs without spans keep everything) — the
    cut projection and the span report must agree exactly, or one of
    them is lying about the intervals."""
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        q_substring_cut,
    )

    spans = {
        r.doc_id: (r.dup_tokens, r.n_tokens)
        for r in q_substring_spans(spark, sf_small).collect()
    }
    cut = q_substring_cut(spark, sf_small).collect()
    assert len(cut) == 500  # every document reports
    for r in cut:
        dup, _ = spans.get(r.doc_id, (0, None))
        assert r.kept_tokens == r.n_tokens - dup, r.doc_id


def test_cut_planted_semantics(spark):
    """A fully-duplicated doc keeps 0 tokens and fingerprints the empty
    string; the partially-duplicated doc keeps exactly its unique
    tokens in order; a unique doc keeps everything and its fingerprint
    equals sha256 of the tokenized original."""
    import hashlib

    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        duplicated_spans,
        q_substring_cut,
    )

    eight = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (1, eight),  # fully duplicated vs doc 2
            (2, f"{eight} {_FILL_A}"),  # prefix duplicated, fill kept
            (3, _FILL_B),  # unique
        ],
    )
    # reuse the operator internals on the planted frame: cut = words
    # outside duplicated_spans — same join the table query performs
    spans = duplicated_spans(docs)
    got = sorted(
        (r.doc_id, r.span_start, r.span_end) for r in spans.collect()
    )
    assert got == [(1, 1, 8), (2, 1, 8)]

    # drive the full projection through a temp "documents" fixture
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("t")
        ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in q_substring_cut(spark, td).collect()}
    assert out[1].kept_tokens == 0
    assert out[1].cleaned_sha == hashlib.sha256(b"").hexdigest()
    assert out[2].kept_tokens == 10
    assert (
        out[2].cleaned_sha
        == hashlib.sha256(_FILL_A.encode()).hexdigest()
    )
    assert out[3].kept_tokens == 10
    assert (
        out[3].cleaned_sha
        == hashlib.sha256(_FILL_B.encode()).hexdigest()
    )


def test_substring_incremental_matches_duckdb_oracle_small(spark, sf_small):
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _oracle_substring_incremental,
        q_substring_incremental,
    )

    con = duck_connection(sf_small)
    try:
        df = q_substring_incremental(spark, sf_small)
        assert not compare(
            df,
            con,
            _oracle_substring_incremental(),
            "dedup_substring_incremental",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_substring_incremental_matches_duckdb_oracle_driver_scale(
    spark, sf_oracle
):
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _oracle_substring_incremental,
        q_substring_incremental,
    )

    con = duck_connection(sf_oracle)
    try:
        df = q_substring_incremental(spark, sf_oracle)
        assert not compare(
            df,
            con,
            _oracle_substring_incremental(),
            "dedup_substring_incremental",
        )
    finally:
        con.close()


def test_incremental_identity_vs_full_union(spark, sf_small):
    """The scoping pin: incremental(base, delta) must equal the FULL
    operator over (base ∪ delta) restricted to delta doc_ids — the
    incremental spelling changes the plan (base contributes only its
    distinct gram set), never the semantics."""
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        INC_SUB_COPY_OFFSET,
        _sub_delta,
        incremental_substring_spans,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_small, "documents")
    delta = _sub_delta(docs)
    union = docs.select("doc_id", "text").unionByName(delta)
    full = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(union).collect()
        if r.doc_id >= INC_SUB_COPY_OFFSET
    )
    inc = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in incremental_substring_spans(docs, delta).collect()
    )
    assert inc == full and len(inc) > 0


def test_incremental_planted_semantics(spark):
    """Copy-of-base passage flagged at full span; reversed text not
    flagged; a passage shared by two DELTA docs (absent from base)
    flagged in both — the within-batch leg of the dup test."""
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        incremental_substring_spans,
    )

    base = _docs(spark, [(1, f"{_SHARED_12} {_FILL_A}")])
    p_new = "north south east west up down left right nine ten"
    delta = _docs(
        spark,
        [
            (101, _SHARED_12),  # copies a base passage: fully flagged
            (102, " ".join(reversed(_SHARED_12.split()))),  # fresh
            (103, f"{p_new} {_FILL_B}"),  # shares p_new with 104 only
            (104, p_new),
        ],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in incremental_substring_spans(base, delta).collect()
    )
    assert got == [(101, 1, 12), (103, 1, 10), (104, 1, 10)]


def test_cut_null_text_is_empty_document(spark):
    """NULL text must converge on both engines (review r14): Spark
    would null-propagate through _WORDS -> filter -> sha2 while the
    oracle's positional CTE just yields no rows — both sides now
    coalesce to the empty document: n_tokens 0, kept 0, sha256('')."""
    import hashlib
    import os
    import tempfile

    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _oracle_substring_cut,
        q_substring_cut,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, _FILL_A)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("t")
        ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in q_substring_cut(spark, td).collect()}
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(td, 'documents.parquet')}/*.parquet')"
        )
        oracle = {
            row[0]: row
            for row in con.execute(_oracle_substring_cut()).fetchall()
        }
        con.close()
    assert out[1].n_tokens == 0 and out[1].kept_tokens == 0
    assert out[1].cleaned_sha == hashlib.sha256(b"").hexdigest()
    assert tuple(out[1]) == oracle[1]
    assert tuple(out[2]) == oracle[2]


def test_incremental_empty_delta_and_plan_shape(spark, sf_small):
    """An empty incoming batch classifies to the empty report (schema
    intact — the streaming loop's empty-batch gate mirrors this), and
    the incremental plan keeps the full operator's shape: left-semi
    against the dup set, no cartesian product."""
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _sub_delta,
        incremental_substring_spans,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import (
        load_table,
    )

    from .test_plans import plan_of_df

    docs = load_table(spark, sf_small, "documents")
    empty = _docs(spark, [])
    out = incremental_substring_spans(docs, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_tokens",
        "span_start",
        "span_end",
    ]
    p = plan_of_df(incremental_substring_spans(docs, _sub_delta(docs)))
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p


def test_hashed_empty_corpus_contract(spark):
    """The hashed spelling honors the same empty-corpus contract as
    the string spelling (schema intact, zero rows)."""
    out = duplicated_spans(_docs(spark, []), hashed=True)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_tokens",
        "span_start",
        "span_end",
    ]


def test_incremental_cut_equals_full_union_restricted(spark):
    """incremental_substring_cut(base, delta) == the full-union
    q_substring_cut projection restricted to delta ids — the cut is a
    deterministic per-document function of (words, spans), so the
    existing incremental-spans identity carries over to the cleaned
    text (and the sha fingerprints prove it value-for-value)."""
    from realtimedatapipeline_8_project_spark.operators.substring_dedup import (
        _words_of,
        cut_projection,
        incremental_substring_cut,
    )

    base = spark.createDataFrame(
        [
            (0, f"{_SHARED_12} {_FILL_A}"),
            (1, _FILL_B),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (10, _SHARED_12),          # fully duplicated vs base
            (11, f"{_FILL_A} extra1 extra2 extra3 extra4"),  # partial
            (12, "k l m n o p q r s t"),  # fresh
            (13, "k l m n o p q r s t"),  # delta-internal dup of 12
        ],
        "doc_id long, text string",
    )
    inc = sorted(
        map(tuple, incremental_substring_cut(base, delta).collect())
    )
    union = base.unionByName(delta)
    full = cut_projection(_words_of(union), duplicated_spans(union))
    want = sorted(
        tuple(r)
        for r in full.collect()
        if r.doc_id >= 10
    )
    assert inc == want
    # and the plant exercised all three legs: full cut, partial, dup
    by_id = {r[0]: r for r in inc}
    assert by_id[10][2] == 0            # fully duplicated -> all cut
    assert 0 < by_id[11][2] < by_id[11][1]  # partial
    assert by_id[12][2] == 0 and by_id[13][2] == 0  # internal dups
