"""Distributed BPE tokenizer training + encoding (SURVEY §2.13 scale
extension: the tokenizer-TRAINING pass of an LLM data pipeline, beside
the token-counting/encoding ops text_analysis already serves).

Byte-pair encoding (Sennrich et al., public algorithm) as an iterative
DataFrame program, the kmeans/PageRank discipline applied to tokenizer
training:

* The corpus is touched ONCE to build the (word, freq) table — classic
  BPE trains on the word-frequency dictionary, so every training
  iteration runs over VOCAB-sized state, never the corpus.
* Each merge round is one map-side-combined aggregation: explode each
  word's adjacent symbol pairs weighted by freq, SUM per pair, take the
  argmax with a total deterministic order (freq DESC, left ASC, right
  ASC). The winning pair is a 1-row bounded driver read per round
  (``BPE_MERGES`` total — the kmeans-seed / MaxScore-theta discipline),
  then every word applies the merge in one projection.
* Symbols are self-delimiting in a flat string — each symbol occupies
  ``' X;'`` (leading space + trailing semicolon INSIDE its own span), so
  the merge is a plain ``replace(wstr, ' l; r;', ' lr;')``: leftmost
  non-overlapping replacement IS greedy left-to-right BPE, adjacent
  occurrences share no delimiter (`' a; a; a; a;'` merges to
  `' aa; aa;'`, not the undercount a shared-space encoding gives), a
  pair can never match a PREFIX of a longer second symbol, and Spark
  and DuckDB ``replace`` have identical semantics — the whole train
  pipeline replays exactly in the oracle's unrolled CTE chain.
* Encoding is map-only: the learned merges fold into ONE projection of
  chained replaces (whole-stage codegen, no joins); words are joined
  with a ``'|'`` guard so merges never cross word boundaries.

Everything is integer/string exact — no floats anywhere.

Registration: r13+ earmark (plans/registry.py capacity policy) — module
NOT imported by the registry, the hybrid.py precedent. Oracle gate +
pins in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

BPE_MERGES = 6

# symbol-string spellings, identical semantics in both engines ----------------

_S_SYMS = "filter(split(replace(wstr, ';', ''), ' '), x -> x != '')"
_D_SYMS = "list_filter(string_split(replace(wstr, ';', ''), ' '), x -> x <> '')"

# adjacent pairs; guarded: Spark sequence(1, 0) is DESCENDING, so a
# 1-symbol word must short-circuit to an empty array (DuckDB range(1, n)
# is already empty for n <= 1)
_S_PAIRS = (
    f"CASE WHEN size({_S_SYMS}) < 2 THEN array() "
    f"ELSE transform(sequence(1, size({_S_SYMS}) - 1), "
    f"i -> struct({_S_SYMS}[i-1] AS l, {_S_SYMS}[i] AS r)) END"
)


def _word_chars(col: str) -> str:
    """' s; c; a; n;' — Spark spelling."""
    return (
        f"' ' || array_join(filter(split({col}, ''), c -> c != ''), '; ') "
        "|| ';'"
    )


def _word_chars_duck(col: str) -> str:
    return (
        f"' ' || array_to_string(list_filter(string_split({col}, ''), "
        "c -> c <> ''), '; ') || ';'"
    )


_WORDS = r"filter(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' '), x -> x != '')"
_D_WORDS = r"list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), x -> x <> '')"


def word_freq(docs: DataFrame) -> DataFrame:
    """(wstr, freq): the word-frequency dictionary in symbol-string
    form — the ONLY corpus pass of training; all iterations run over
    this vocab-sized table."""
    return (
        docs.selectExpr(f"explode({_WORDS}) AS word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .selectExpr(f"{_word_chars('word')} AS wstr", "freq")
    )


def bpe_train_merges(w: DataFrame, n_merges: int = BPE_MERGES) -> list:
    """Run the merge rounds; returns [(rank, left, right, pair_freq)].
    One aggregation + one 1-row driver read per round."""
    merges = []
    for k in range(n_merges):
        top = (
            w.selectExpr(f"explode({_S_PAIRS}) AS p", "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:  # degenerate vocab: nothing left to merge
            break
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((k + 1, l, r, int(cnt)))
        w = w.selectExpr(
            f"replace(wstr, ' {l}; {r};', ' {l}{r};') AS wstr", "freq"
        )
    return merges


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, left, right, pair_freq): the learned merge table."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(word_freq(docs))
    return spark.createDataFrame(
        merges, "rank long, left_sym string, right_sym string, pair_freq long"
    )


def _oracle_ctes(n_merges: int = BPE_MERGES) -> str:
    """The shared unrolled training chain: w0..wK and t1..tK CTEs —
    the SELF-CONTAINED SQL re-derivation of every merge decision (the
    kmeans unrolled-oracle precedent)."""
    parts = [
        f"""w0 AS (
  SELECT {_word_chars_duck('word')} AS wstr, freq FROM (
    SELECT word, COUNT(*) AS freq FROM (
      SELECT unnest({_D_WORDS}) AS word FROM documents
    ) GROUP BY word
  )
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS (
  SELECT pr[1] AS l, pr[2] AS r, SUM(freq) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len({_D_SYMS})),
                  i -> [{_D_SYMS}[i], {_D_SYMS}[i+1]])) AS pr, freq
    FROM w{k - 1}
  ) GROUP BY 1, 2
), t{k} AS (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
), w{k} AS (
  SELECT replace(wstr, ' ' || l || '; ' || r || ';',
                 ' ' || l || r || ';') AS wstr, freq
  FROM w{k - 1} CROSS JOIN t{k}
)"""
        )
    return ",\n".join(parts)


def _oracle_bpe_train(n_merges: int = BPE_MERGES) -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, l AS left_sym, r AS right_sym, "
        f"CAST(cnt AS BIGINT) AS pair_freq FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {_oracle_ctes(n_merges)}\n{legs}"


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, n_bpe): per-document symbol counts before and
    after applying the learned merges — train once (bounded driver
    reads), then ONE map-only projection over the corpus with the K
    replaces folded in (no joins, whole-stage codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_merges(word_freq(docs))
    estr = (
        f"array_join(transform({_WORDS}, "
        "w -> ' ' || array_join(filter(split(w, ''), c -> c != ''), '; ')"
        " || ';'), '|')"
    )
    merged = estr
    for _, l, r, _c in merges:
        merged = f"replace({merged}, ' {l}; {r};', ' {l}{r};')"

    def count(expr: str) -> str:
        return (
            "CAST(size(filter(split(replace(replace("
            f"{expr}, ';', ''), '|', ' '), ' '), x -> x != '')) AS BIGINT)"
        )

    return docs.selectExpr(
        "doc_id", f"{count(estr)} AS n_chars", f"{count(merged)} AS n_bpe"
    )


def _oracle_bpe_encode(n_merges: int = BPE_MERGES) -> str:
    estr = (
        f"array_to_string(list_transform({_D_WORDS}, "
        "w -> ' ' || array_to_string(list_filter(string_split(w, ''), "
        "c -> c <> ''), '; ') || ';'), '|')"
    )
    # chain the merges through the doc string via the 1-row t_k CTEs
    chain = [f"d0 AS (SELECT doc_id, {estr} AS estr FROM documents)"]
    for k in range(1, n_merges + 1):
        chain.append(
            f"""d{k} AS (
  SELECT doc_id, replace(estr, ' ' || l || '; ' || r || ';',
                 ' ' || l || r || ';') AS estr
  FROM d{k - 1} CROSS JOIN t{k}
)"""
        )

    def count(expr: str) -> str:
        return (
            "CAST(len(list_filter(string_split(replace(replace("
            f"{expr}, ';', ''), '|', ' '), ' '), x -> x <> '')) AS BIGINT)"
        )

    return (
        f"WITH {_oracle_ctes(n_merges)},\n"
        + ",\n".join(chain)
        + f"""
SELECT a.doc_id, {count('a.estr')} AS n_chars, {count('b.estr')} AS n_bpe
FROM d0 a JOIN d{n_merges} b USING (doc_id)
"""
    )


QUERIES = {
    "text_bpe_train": (q_bpe_train, _oracle_bpe_train()),
    "text_bpe_encode": (q_bpe_encode, _oracle_bpe_encode()),
}
