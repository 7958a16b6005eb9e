"""Distributed BPE tokenizer training (operators/bpe.py) — r13+
registration candidates, carried with the driver's oracle gate plus the
greedy-merge/boundary/plan pins the oracle alone can't isolate."""

from __future__ import annotations

from realtimedatapipeline_8_project_spark.operators.bpe import (
    BPE_MERGES,
    _oracle_bpe_encode,
    _oracle_bpe_train,
    bpe_train_merges,
    q_bpe_encode,
    q_bpe_train,
    word_freq,
)

from .oracle_harness import compare, duck_connection
from .test_plans import plan_of_df


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
