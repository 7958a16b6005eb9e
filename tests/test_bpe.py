"""Distributed BPE tokenizer training (operators/bpe.py) — r13+
registration candidates, carried with the driver's oracle gate plus the
greedy-merge/boundary/plan pins the oracle alone can't isolate."""

from __future__ import annotations

from realtimedatapipeline_8_project_spark.operators.bpe import (
    BPE_MERGES,
    _oracle_bpe_encode,
    _oracle_bpe_train,
    bpe_encode_counts_arrow,
    bpe_train_merges,
    q_bpe_encode,
    q_bpe_train,
    word_freq,
)

import pytest

from .oracle_harness import compare, duck_connection
from .test_plans import plan_of_df


def test_bpe_alphabet_precondition_enforced(spark):
    """ADVICE r12: learned symbols are interpolated into SQL string
    literals, so the token alphabet is restricted to [a-z0-9]. The
    tokenizer strips quotes and the structural chars (' ; |) BEFORE
    symbols form — a quoted/punctuated corpus trains cleanly — and the
    train loop raises loudly if a symbol ever escapes the alphabet
    (a hand-built wstr bypassing the tokenizer)."""
    docs = spark.createDataFrame(
        [(1, "don't don't b|b a;a")], "doc_id long, text string"
    )
    merges = bpe_train_merges(word_freq(docs), n_merges=2)
    alphabet = set("abcdefghijklmnopqrstuvwxyz0123456789")
    assert merges
    assert all(set(l) <= alphabet and set(r) <= alphabet for _, l, r, _c in merges)
    # "don't" tokenizes as "dont" (x2): its pairs dominate the argmax
    assert (merges[0][1], merges[0][2]) in {("d", "o"), ("o", "n"), ("n", "t")}

    bad = spark.createDataFrame(
        [(" d; o; n; '; t;", 5)], "wstr string, freq long"
    )
    with pytest.raises(ValueError, match="alphabet"):
        bpe_train_merges(bad, n_merges=1)


def test_bpe_train_matches_duckdb_oracle(spark, sf_oracle):
    con = duck_connection(sf_oracle)
    try:
        df = q_bpe_train(spark, sf_oracle)
        assert df.count() == BPE_MERGES  # fixture vocab never runs dry
        assert not compare(df, con, _oracle_bpe_train(), "text_bpe_train")
    finally:
        con.close()


def test_bpe_encode_matches_duckdb_oracle(spark, sf_oracle):
    con = duck_connection(sf_oracle)
    try:
        df = q_bpe_encode(spark, sf_oracle)
        rows = df.collect()
        # merges actually compress: strictly fewer symbols somewhere,
        # never more anywhere
        assert all(r.n_bpe <= r.n_chars for r in rows)
        assert any(r.n_bpe < r.n_chars for r in rows)
        assert not compare(df, con, _oracle_bpe_encode(), "text_bpe_encode")
    finally:
        con.close()


def test_bpe_planted_merge_order_and_ties(spark):
    """Hand-derived merge sequence on a planted vocabulary: weighted
    pair counts pick the argmax, ties break lexically, and later rounds
    see the POST-merge symbols."""
    docs = spark.createDataFrame(
        [(1, "aaab ab ab ab")], "doc_id long, text string"
    )
    # words: aaab x1, ab x3 -> pairs: (a,a)x2, (a,b)x1+3=4 -> merge1 (a,b)
    # then: aaab = a a ab -> (a,a)x1, (a,ab)x1; ab = [ab] -> tie at 1:
    # (a,a) < (a,ab) lexically -> merge2 (a,a)
    # then: aaab = aa ab -> (aa,ab)x1 -> merge3 (aa,ab)
    merges = bpe_train_merges(word_freq(docs), n_merges=3)
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("a", "a"), ("aa", "ab")]
    assert [m[3] for m in merges] == [4, 1, 1]


def test_bpe_greedy_run_semantics(spark):
    """A run of the same pair merges greedily left-to-right: 'aaaa'
    under merge (a,a) becomes TWO 'aa' symbols (the self-delimiting
    encoding; a shared-delimiter spelling would undercount to one)."""
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    merges = bpe_train_merges(word_freq(docs), n_merges=1)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    out = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in _encode_planted(spark, docs, merges).collect()
    }
    assert out[1] == (4, 2)  # a a a a -> aa aa


def _encode_planted(spark, docs, merges):
    from realtimedatapipeline_8_project_spark.operators.bpe import _WORDS

    estr = (
        f"array_join(transform({_WORDS}, "
        "w -> ' ' || array_join(filter(split(w, ''), c -> c != ''), '; ')"
        " || ';'), '|')"
    )
    merged = estr
    for _, l, r, _c in merges:
        merged = f"replace({merged}, ' {l}; {r};', ' {l}{r};')"

    def count(expr):
        return (
            "CAST(size(filter(split(replace(replace("
            f"{expr}, ';', ''), '|', ' '), ' '), x -> x != '')) AS BIGINT)"
        )

    return docs.selectExpr(
        "doc_id", f"{count(estr)} AS n_chars", f"{count(merged)} AS n_bpe"
    )


def test_bpe_never_merges_across_words(spark):
    """The '|' word guard: a pair formed by word1's last symbol and
    word2's first symbol never merges — planted doc where the ONLY
    occurrence of the trained pair straddles the boundary."""
    train = spark.createDataFrame(
        [(1, "na na na")], "doc_id long, text string"
    )
    merges = bpe_train_merges(word_freq(train), n_merges=1)
    assert [(m[1], m[2]) for m in merges] == [("n", "a")]
    # 'an na': (n,a) occurs inside word2 (merges) but the a|n boundary
    # pair and word1's own 'a n'... word1 'an' = a,n: pair (a,n) not
    # (n,a); the straddling pair n(end w1)+n? -> craft 'xn ay': the only
    # (n,a) adjacency is ACROSS the boundary
    probe = spark.createDataFrame([(7, "xn ay")], "doc_id long, text string")
    out = {r.doc_id: (r.n_chars, r.n_bpe) for r in _encode_planted(spark, probe, merges).collect()}
    assert out[7] == (4, 4)  # nothing merged: the pair straddles words


def test_bpe_encode_plan_is_map_only(spark, sf_small):
    """After training, encoding is one corpus projection: no Exchange
    node, single documents scan, K replaces folded into codegen."""
    p = plan_of_df(q_bpe_encode(spark, sf_small))
    assert "Exchange" not in p, p
    assert p.count("Scan parquet  (") == 1, p  # tree form: one scan node


def test_bpe_encode_arrow_twin_equals_chained_on_fixture(spark, sf_small):
    """VERDICT r12 #5: the production-scale encode (per-word rank
    replay in one Arrow mapInPandas pass, K-independent cost) must
    equal the chained-replace projection row-for-row on the fixture
    corpus and its trained merges."""
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    merges = bpe_train_merges(word_freq(docs))
    chained = sorted(map(str, q_bpe_encode(spark, sf_small).collect()))
    arrow = sorted(map(str, bpe_encode_counts_arrow(docs, merges).collect()))
    assert chained == arrow and len(arrow) > 0


def test_bpe_encode_arrow_twin_at_k64_planted_vocab(spark):
    """The boundary the chained spelling documents (tens of merges) is
    exactly where the Arrow twin must take over: train K=64 merges on a
    planted vocabulary (64 distinct 2-symbol words with strictly
    descending frequencies -> 64 deterministic single-pair merges),
    then pin (a) the learned list is the planted one, (b) the Arrow
    twin collapses every planted word to ONE symbol, and (c) the
    chained projection — built at a depth the fixture path never
    reaches — agrees with the twin row-for-row."""
    import itertools

    from pyspark.sql import functions as F

    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    pairs = [
        (a, b) for a, b in itertools.product(alphabet, repeat=2) if a != b
    ][:64]
    rows = [
        (i, " ".join([a + b] * (1000 - i)))
        for i, (a, b) in enumerate(pairs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train_merges(word_freq(docs), n_merges=64)
    assert [(m[1], m[2]) for m in merges] == pairs  # freq-ordered plant
    arrow = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in bpe_encode_counts_arrow(docs, merges).collect()
    }
    # every planted word is exactly its own merge: 2 chars -> 1 symbol
    assert arrow == {
        i: (2 * (1000 - i), 1000 - i) for i in range(len(pairs))
    }
    # chained == twin at K=64 (the equality pin at production depth)
    from realtimedatapipeline_8_project_spark.operators.bpe import _WORDS

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
    assert chained == arrow


def test_bpe_arrow_twin_ascii_whitespace_and_null_parity(spark):
    """Review r13 (verified-by-execution finding): Python's \\s is
    unicode-aware while Spark(Java)/DuckDB(RE2) \\s are ASCII-only, so
    the Arrow twin must tokenize with explicit ASCII classes — a U+00A0
    joins its neighbors into ONE word in every engine. And a NULL text
    must count as an empty document, never the literal str() words
    'none'/'nan'."""
    docs = spark.createDataFrame(
        [(1, "a\u00a0b a b"), (2, None)], "doc_id long, text string"
    )
    merges = [(1, "a", "b", 2)]
    got = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in bpe_encode_counts_arrow(docs, merges).collect()
    }
    # 'a b' -> one word 'ab' (merges to 1 symbol); then 'a', 'b'
    assert got[1] == (4, 3)
    assert got[2] == (0, 0)
    # engine agreement on the U+00A0 row: the chained projection over
    # the same planted merge tokenizes identically
    from realtimedatapipeline_8_project_spark.operators.bpe import _WORDS

    estr = (
        f"array_join(transform({_WORDS}, "
        "w -> ' ' || array_join(filter(split(w, ''), c -> c != ''), '; ')"
        " || ';'), '|')"
    )
    merged = f"replace({estr}, ' a; b;', ' ab;')"
    count = (
        "CAST(size(filter(split(replace(replace("
        "{e}, ';', ''), '|', ' '), ' '), x -> x != '')) AS BIGINT)"
    )
    chained = docs.where("doc_id = 1").selectExpr(
        "doc_id",
        f"{count.format(e=estr)} AS n_chars",
        f"{count.format(e=merged)} AS n_bpe",
    ).collect()[0]
    assert (chained.n_chars, chained.n_bpe) == got[1]


def test_bpe_encode_arrow_twin_rank_order_not_maximal_munch(spark):
    """The counter-example from the module docstring, machine-checked:
    merges [(b,c), (a,b)] encode 'abc' as [a, bc] (2 symbols) under BPE
    rank order — a longest-match trie would say [ab, c] but ALSO 2
    symbols, so pin the mid-state via a 3-rule list where munching
    diverges in COUNT: merges [(b,c),(a,b),(ab,c)] on 'abc' give
    a+bc -> no (ab) -> no (ab,c): 2 symbols; maximal munch over the
    final vocab {bc,ab,abc} would match 'abc' whole: 1 symbol."""
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    merges = [(1, "b", "c", 1), (2, "a", "b", 1), (3, "ab", "c", 1)]
    got = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in bpe_encode_counts_arrow(docs, merges).collect()
    }
    assert got == {1: (3, 2)}  # [a, bc] — munch would report 1


def test_bpe_encode_oracle_survives_dry_vocab(spark, tmp_path):
    """Review r13: when the vocabulary runs dry before BPE_MERGES
    rounds, the encode oracle's per-round doc chain must NO-OP the dry
    rounds (LEFT JOIN ON TRUE), not annihilate to zero rows via a cross
    join against the empty t_k — the Spark side keeps serving one row
    per document with the merges it did learn. Planted: a corpus whose
    single word exhausts all pairs after 2 merges."""
    import duckdb

    docs = spark.createDataFrame(
        [(1, "abab"), (2, "ab")], "doc_id long, text string"
    )
    # merges: (a,b) x3 -> 'ab'; then ('ab','ab') x1 in doc 1 -> 'abab';
    # round 3+ find no pairs — vocabulary dry
    merges = bpe_train_merges(word_freq(docs))
    assert len(merges) == 2  # genuinely dry before BPE_MERGES=6
    spark_rows = {
        r.doc_id: (r.n_chars, r.n_bpe)
        for r in q_bpe_encode_planted(spark, docs).collect()
    }
    assert spark_rows == {1: (4, 1), 2: (2, 1)}
    con = duckdb.connect()
    try:
        con.register("documents_src", docs.toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
        oracle = {
            int(doc_id): (int(nc), int(nb))
            for doc_id, nc, nb in con.execute(_oracle_bpe_encode()).fetchall()
        }
    finally:
        con.close()
    assert oracle == spark_rows


def q_bpe_encode_planted(spark, docs):
    """q_bpe_encode's body over a caller-supplied docs frame (the
    registered query loads the fixture table; tests plant corpora)."""
    from realtimedatapipeline_8_project_spark.operators.bpe import _WORDS

    merges = bpe_train_merges(word_freq(docs))
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
    return docs.selectExpr(
        "doc_id",
        f"{count.format(e=estr)} AS n_chars",
        f"{count.format(e=merged)} AS n_bpe",
    )


def test_bpe_empty_corpus_contract(spark, tmp_path):
    import os

    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    empty_sf = str(tmp_path / "empty")
    os.makedirs(empty_sf)
    load_table(spark, "/root/testdata/sf0.001", "documents").limit(0).write.parquet(
        os.path.join(empty_sf, "documents.parquet")
    )
    assert q_bpe_train(spark, empty_sf).count() == 0
    assert q_bpe_encode(spark, empty_sf).count() == 0
