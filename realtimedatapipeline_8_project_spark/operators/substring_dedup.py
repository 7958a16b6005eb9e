"""Exact-substring (duplicated-span) dedup across documents.

The remaining named public method in the training-data dedup family:
Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) remove every substring of >= 50 tokens that appears in more
than one document, reporting that exact-substring dedup beats
whole-document near-dup on LM quality. The engine's existing family
covers whole-document exact (``dedup_exact_fingerprint``), near-dup
(MinHash/SimHash banding), semantic (codebook blocks) and train/test
contamination (``contamination_ngram_overlap``, doc-pair overlap
ratios); this module adds the SPAN-level operator: for every document,
the maximal token ranges in which EVERY TOKEN is covered by at least
one K-gram that also occurs in some OTHER document (adjacent covered
regions merge, so a merged span may contain straddling K-grams that
are themselves unique — the invariant is token coverage, not per-gram
duplication), plus the per-document duplication accounting a curation
pipeline thresholds on.

Pipeline (all DataFrame ops, one logical shape in Spark and DuckDB):

1. tokenize — the shared engine tokenizer (lowercase, [a-z0-9] words,
   the exact `_WORDS`/`_D_WORDS` spellings from ``operators/bpe.py``;
   ASCII whitespace classes keep Java and RE2 agreeing).
2. K-grams with positions — ``transform(sequence(1, n-K+1), i ->
   array_join(slice(words, i, K), ' '))`` + ``posexplode``: one
   map-side pass, no join, one row per (doc_id, start, gram).
3. cross-document duplicates — ``GROUP BY gram HAVING
   count(DISTINCT doc_id) >= 2``. Within-document repetition is
   deliberately NOT flagged (that is ``text_repetition``'s job; the
   dedup decision here is "this text exists elsewhere in the corpus").
4. hit positions — left-semi join of the gram table against the
   duplicated grams.
5. island merge — per document, overlapping-or-adjacent hit spans
   [start, start+K-1] fold into maximal spans via the classic
   running-max window: a hit starts a new island iff
   start > max(previous starts) + K (gap of at least one
   non-duplicated token); island id = running sum of the flag.
6. report — (doc_id, n_spans, dup_tokens, n_tokens) for documents
   with at least one duplicated span. ``dup_tokens / n_tokens`` is the
   removal ratio Lee et al. cut on; span boundaries themselves are
   served by :func:`duplicated_spans` for the removal projection.

Scale story (SCALE.md §Substring-dedup): the only corpus-sized
exchange carries (gram-key, doc_id, start) rows. The oracle-checked
spelling keeps the K-token STRING as the key (engine-portable, exactly
reproducible in DuckDB); the production spelling
(:func:`substring_spans_hashed`) replaces it with ``xxhash64`` — an
8-byte key through the shuffle, the same hashed-twin discipline as
``dedup_minhash_portable`` vs the portable-hash registered form — and
is machine-pinned output-identical to the string spelling on the
fixtures (tests/test_substring_dedup.py). A 64-bit collision at corpus
scale can only ADD a false duplicated span (never lose one), the same
one-sided error every hash-banded dedup in this engine carries.

Reference parity: the reference engine has no dedup surface at all
(its whole pipeline is stream-processor.py's enrich/aggregate loop);
this is a SURVEY §2.13 extension operator from the LLM-pipeline
mandate, so there is no reference file to cite — the cited public
algorithm is the parity target.

Earmark status: registry is at its 148-slot capacity (see
plans/registry.py CAPACITY DECISION), so this lands as a
permanent-tier earmark gated by the same DuckDB harness the driver
runs (tests/test_substring_dedup.py), first in line for an r15+ slot
if one frees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .bpe import _D_WORDS, _WORDS

# K = 8 tokens at fixture scale (the synthetic docs average ~55 words;
# Lee et al.'s production setting is 50 — the knob, not the shape).
SUBDUP_K = 8


def _gram_table(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, start, gram, n_tokens): every K-token window of every
    document, 1-based start. One map-side pass (sequence + transform +
    posexplode); documents shorter than K yield no rows. n_tokens rides
    along so the final report never re-scans the corpus."""
    words = docs.select("doc_id", F.expr(_WORDS).alias("words"))
    return (
        words.where(F.size("words") >= k)
        .select(
            "doc_id",
            F.size("words").alias("n_tokens"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(words) - {k} + 1), "
                    f"i -> array_join(slice(words, i, {k}), ' '))"
                )
            ).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("pos0") + 1).alias("start"),
            "gram",
        )
    )


def _spans_from_hits(hits: DataFrame, k: int) -> DataFrame:
    """(doc_id, n_tokens, span_start, span_end): maximal
    overlapping-or-adjacent merged spans from (doc_id, n_tokens, start)
    hit rows — the island window described in the module docstring.
    Both windows share ONE (doc_id, start) sort exchange."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    new_island = F.when(
        F.col("start")
        > F.coalesce(F.max("start").over(w_prev), F.lit(-k)) + k,
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        hits.withColumn("new_island", new_island)
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("doc_id", "island")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.min("start").alias("span_start"),
            (F.max("start") + F.lit(k - 1)).alias("span_end"),
        )
        .drop("island")
    )


def duplicated_spans(
    docs: DataFrame, k: int = SUBDUP_K, hashed: bool = False
) -> DataFrame:
    """(doc_id, n_tokens, span_start, span_end): the maximal token
    spans of each document in which every token is covered by a
    K-gram that occurs in at least one other document (see the module
    docstring's coverage-not-per-gram invariant) — the removal
    intervals of Lee et al.'s exact-substring dedup. ``hashed=True``
    swaps the K-token string shuffle key for xxhash64 (the production
    spelling; 8 bytes through the exchange, one-sided span-adding
    error on collision)."""
    grams = _gram_table(docs, k)
    if hashed:
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    # "appears in >= 2 distinct docs" spelled as min(doc_id) !=
    # max(doc_id) over a gram-partitioned WINDOW (optimization r16,
    # guide §2.4 "remove shuffles outright"): the r15 shape derived the
    # gram table twice (dup aggregation + semi-join probe) — two full
    # tokenize+gram corpus passes and two gram-keyed exchanges; the
    # window computes the same per-row predicate after ONE pass and ONE
    # exchange, and both min and max share one WindowExec. Trade-off,
    # recorded: a pathologically hot gram's rows sort on one task here
    # (spill-safe), where the semi-join could AQE-skew-split them —
    # while the join shape paid a full extra corpus scan on EVERY run.
    w_gram = Window.partitionBy("gram")
    hits = (
        grams.withColumn("d0", F.min("doc_id").over(w_gram))
        .withColumn("d1", F.max("doc_id").over(w_gram))
        .where(F.col("d0") != F.col("d1"))
        .select("doc_id", "n_tokens", "start")
    )
    return _spans_from_hits(hits, k)


def _span_report(spans: DataFrame) -> DataFrame:
    """(doc_id, n_spans, dup_tokens, n_tokens): the per-document
    accounting every query form serves — ONE spelling so the hashed
    twin and the incremental form can never drift from the registered
    report shape (review r14)."""
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("dup_tokens"),
        F.first("n_tokens").cast("long").alias("n_tokens"),
    )


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_spans, dup_tokens, n_tokens) for every document with
    at least one cross-document duplicated K-token span — the
    per-document accounting a curation threshold (e.g. "drop documents
    more than half duplicated") consumes."""
    return _span_report(
        duplicated_spans(load_table(spark, sf_dir, "documents"))
    )


def q_substring_spans_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-key spelling of :func:`q_substring_spans`
    (xxhash64 gram keys) — machine-pinned output-identical to the
    string spelling on the fixtures."""
    return _span_report(
        duplicated_spans(load_table(spark, sf_dir, "documents"), hashed=True)
    )


def _words_of(docs: DataFrame) -> DataFrame:
    """(doc_id, words) for the cut projection. NULL text tokenizes as
    the empty document (review r14): the DuckDB oracle's pos CTE
    yields zero rows for it and coalesces to (0, sha256('')), so the
    Spark side must not null-propagate through _WORDS -> filter ->
    sha2. (The span queries are immune: a NULL-words doc fails
    size >= K on both engines.)"""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    ).select("doc_id", F.expr(_WORDS).alias("words"))


def cut_projection(words: DataFrame, spans: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, cleaned_sha) from a
    (doc_id, words) frame and RAW (doc_id, span_start, span_end) span
    rows: the removal projection — tokens inside any duplicated span
    are cut, and the cleaned text is fingerprinted with the
    engine-portable sha256 (the dedup_exact_fingerprint digest
    discipline) so an oracle value-checks the RECONSTRUCTED text, not
    just counts. A fully-duplicated document keeps 0 tokens and
    fingerprints the empty string; documents without spans keep
    everything. ONE spelling shared by the full operator, the
    incremental form, and the streaming loop, so they can never
    drift."""
    grouped = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                F.col("span_end").alias("e"),
            )
        ).alias("spans")
    )
    # left join: most docs have no spans; the spans side is the small,
    # corpus-dependent one (unhinted — AQE decides, as in the gram join)
    return (
        words.join(grouped, "doc_id", "left")
        .withColumn(
            "cleaned",
            F.expr(
                "filter(words, (w, i) -> spans IS NULL OR "
                "NOT exists(spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e))"
            ),
        )
        .select(
            "doc_id",
            F.size("words").cast("long").alias("n_tokens"),
            F.size("cleaned").cast("long").alias("kept_tokens"),
            F.sha2(F.array_join(F.col("cleaned"), " "), 256).alias(
                "cleaned_sha"
            ),
        )
    )


def q_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal projection for EVERY document (see
    :func:`cut_projection` for the output contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return cut_projection(
        _words_of(docs), duplicated_spans(docs, SUBDUP_K)
    )


def _oracle_substring_cut(k: int = SUBDUP_K) -> str:
    """DuckDB re-derivation of the removal projection: the span
    pipeline, then positional anti-join + ordered string_agg + sha256
    of the reconstructed cleaned text. NULL text coalesces to the
    empty document on BOTH engines (review r14)."""
    return f"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), w AS (
  SELECT doc_id, {_D_WORDS} AS words FROM t
), g AS (
  SELECT doc_id, u.i AS start,
         array_to_string(list_slice(words, u.i, u.i + {k} - 1), ' ') AS gram
  FROM w, unnest(range(1, len(words) - {k} + 2)) u(i)
  WHERE len(words) >= {k}
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.start FROM g JOIN d USING (gram)
), isl AS (
  SELECT doc_id, start,
         CASE WHEN start > coalesce(max(start) OVER (
                  PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{k}) + {k}
              THEN 1 ELSE 0 END AS new_island
  FROM hits
), num AS (
  SELECT doc_id, start,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, island, min(start) AS span_start,
         max(start) + {k} - 1 AS span_end
  FROM num GROUP BY doc_id, island
), pos AS (
  SELECT w.doc_id, u.i AS i, words[u.i] AS word
  FROM w, unnest(range(1, len(words) + 1)) u(i)
), cut AS (
  SELECT p.doc_id, p.i, p.word
  FROM pos p LEFT JOIN spans s
    ON p.doc_id = s.doc_id AND p.i BETWEEN s.span_start AND s.span_end
  WHERE s.doc_id IS NULL
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         string_agg(word, ' ' ORDER BY i) AS cleaned
  FROM cut GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.words) AS BIGINT) AS n_tokens,
       coalesce(a.kept_tokens, 0) AS kept_tokens,
       sha256(coalesce(a.cleaned, '')) AS cleaned_sha
FROM w LEFT JOIN agg a USING (doc_id)
"""


def _oracle_substring_spans(k: int = SUBDUP_K) -> str:
    """DuckDB re-derivation: the same six stages over the same
    tokenizer, K-grams via list_slice, the same island window."""
    return f"""
WITH w AS (
  SELECT doc_id, {_D_WORDS} AS words FROM documents
), g AS (
  SELECT doc_id, len(words) AS n_tokens, u.i AS start,
         array_to_string(list_slice(words, u.i, u.i + {k} - 1), ' ') AS gram
  FROM w, unnest(range(1, len(words) - {k} + 2)) u(i)
  WHERE len(words) >= {k}
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.n_tokens, g.start FROM g JOIN d USING (gram)
), isl AS (
  SELECT doc_id, n_tokens, start,
         CASE WHEN start > coalesce(max(start) OVER (
                  PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{k}) + {k}
              THEN 1 ELSE 0 END AS new_island
  FROM hits
), num AS (
  SELECT doc_id, n_tokens, start,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, any_value(n_tokens) AS n_tokens, island,
         min(start) AS span_start, max(start) + {k} - 1 AS span_end
  FROM num GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       CAST(any_value(n_tokens) AS BIGINT) AS n_tokens
FROM spans GROUP BY doc_id
"""


# --- incremental (delta-vs-base) form ---------------------------------------
# The crawl-snapshot question: classify a NEW batch of documents
# against the existing corpus WITHOUT recomputing the corpus's own
# spans. Exactly the dedup_incremental fixture discipline: the delta
# is derived deterministically from the fixture (prefix-copies that
# duplicate base passages + token-reversed fresh docs), so the DuckDB
# oracle reproduces it verbatim.

INC_SUB_COPY_EVERY = 7  # every 7th doc contributes a prefix copy
INC_SUB_COPY_OFFSET = 1_000_000
INC_SUB_FRESH_EVERY = 11  # every 11th doc contributes a reversed doc
INC_SUB_FRESH_OFFSET = 2_000_000
INC_SUB_PREFIX = 20  # the copied passage: the base doc's first 20 tokens


def _sub_delta(docs: DataFrame) -> DataFrame:
    """The deterministic incoming batch: (a) prefix copies — the first
    INC_SUB_PREFIX tokens of every INC_SUB_COPY_EVERY-th document (a
    passage that IS duplicated against base), (b) token-reversed copies
    of every INC_SUB_FRESH_EVERY-th document (same vocabulary, but no
    K-gram survives reversal — fresh text)."""
    words = F.expr(_WORDS)
    copies = docs.where(
        F.col("doc_id") % INC_SUB_COPY_EVERY == 0
    ).select(
        (F.col("doc_id") + INC_SUB_COPY_OFFSET).alias("doc_id"),
        F.array_join(F.slice(words, 1, INC_SUB_PREFIX), " ").alias("text"),
    )
    fresh = docs.where(
        F.col("doc_id") % INC_SUB_FRESH_EVERY == 0
    ).select(
        (F.col("doc_id") + INC_SUB_FRESH_OFFSET).alias("doc_id"),
        F.array_join(F.reverse(words), " ").alias("text"),
    )
    return copies.unionByName(fresh)


def incremental_substring_spans(
    base: DataFrame, delta: DataFrame, k: int = SUBDUP_K
) -> DataFrame:
    """Maximal duplicated spans of the DELTA documents against
    (base ∪ delta): a delta K-gram is duplicated iff it occurs in the
    base gram set OR in >= 2 delta documents. Machine-pinned identical
    to the full-corpus operator restricted to delta ids
    (tests/test_substring_dedup.py) — the scoping is the report, not
    the semantics. The base side contributes ONLY its distinct gram
    set (at scale: the maintained gram artifact — base text is never
    re-scanned per batch once that set is stored); base documents'
    own span reports are the FULL operator's business."""
    gb = _gram_table(base, k).select("gram").distinct()
    gd = _gram_table(delta, k)
    dup_delta = (
        gd.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    dup = gb.unionByName(dup_delta)
    # unhinted semi join, the full operator's discipline (AQE decides)
    hits = gd.join(dup, "gram", "left_semi").select(
        "doc_id", "n_tokens", "start"
    )
    return _spans_from_hits(hits, k)


def incremental_substring_cut(
    base: DataFrame, delta: DataFrame, k: int = SUBDUP_K
) -> DataFrame:
    """The removal projection for the DELTA documents against
    (base ∪ delta): :func:`cut_projection` over the incremental span
    rows. Because the incremental spans are machine-pinned identical
    to the full operator's spans restricted to delta ids, and the cut
    is a deterministic per-document function of (words, spans), this
    equals the full-union :func:`q_substring_cut` output restricted to
    delta ids — the identity the streaming cleaned-output pin rides
    (tests/test_gram_ingest.py)."""
    return cut_projection(
        _words_of(delta), incremental_substring_spans(base, delta, k)
    )


def q_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_spans, dup_tokens, n_tokens) for the delta documents
    with at least one span duplicated against (corpus ∪ batch) — the
    per-batch curation report for incoming crawl data."""
    docs = load_table(spark, sf_dir, "documents")
    return _span_report(incremental_substring_spans(docs, _sub_delta(docs)))


def _oracle_substring_incremental(k: int = SUBDUP_K) -> str:
    """DuckDB re-derivation via the IDENTITY the incremental spelling
    is pinned to: the full span pipeline over (base ∪ delta),
    restricted to delta doc_ids."""
    dw_text = _D_WORDS
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
), bw AS (
  SELECT doc_id, {dw_text} AS words FROM base
), delta AS (
  SELECT doc_id + {INC_SUB_COPY_OFFSET} AS doc_id,
         array_to_string(list_slice(words, 1, {INC_SUB_PREFIX}), ' ') AS text
  FROM bw WHERE doc_id % {INC_SUB_COPY_EVERY} = 0
  UNION ALL
  SELECT doc_id + {INC_SUB_FRESH_OFFSET},
         array_to_string(list_reverse(words), ' ')
  FROM bw WHERE doc_id % {INC_SUB_FRESH_EVERY} = 0
), everything AS (
  SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM delta
), w AS (
  SELECT doc_id, {dw_text} AS words FROM everything
), g AS (
  SELECT doc_id, len(words) AS n_tokens, u.i AS start,
         array_to_string(list_slice(words, u.i, u.i + {k} - 1), ' ') AS gram
  FROM w, unnest(range(1, len(words) - {k} + 2)) u(i)
  WHERE len(words) >= {k}
), d AS (
  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.n_tokens, g.start FROM g JOIN d USING (gram)
  WHERE g.doc_id >= {INC_SUB_COPY_OFFSET}
), isl AS (
  SELECT doc_id, n_tokens, start,
         CASE WHEN start > coalesce(max(start) OVER (
                  PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -{k}) + {k}
              THEN 1 ELSE 0 END AS new_island
  FROM hits
), num AS (
  SELECT doc_id, n_tokens, start,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
), spans AS (
  SELECT doc_id, any_value(n_tokens) AS n_tokens, island,
         min(start) AS span_start, max(start) + {k} - 1 AS span_end
  FROM num GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       CAST(any_value(n_tokens) AS BIGINT) AS n_tokens
FROM spans GROUP BY doc_id
"""


# Registered r15 (VERDICT r14 #2 — fund a driver slot for the family
# representative of the Lee et al. exact-substring dedup mandate):
# dedup_substring_spans, funded by retiring dedup_jaccard_vs_probe by
# the covered-by-fresher-machinery rule — see the r15 retirement block
# in plans/registry.py for the named covering pins.
QUERIES: dict = {
    "dedup_substring_spans": (q_substring_spans, _oracle_substring_spans()),
}

# Permanent earmark tier (plans/registry.py capacity decision): the
# removal projection and the delta-vs-base batch form — gated every
# build by tests/test_substring_dedup.py's DuckDB compare (the same
# harness the driver runs) plus the planted-corpus battery, the
# hashed-twin pin, and the generic earmark parity gate; their family
# representative dedup_substring_spans is driver-registered (r15), so
# the tier stays family-represented.
EARMARKS = {
    "dedup_substring_cut": (q_substring_cut, _oracle_substring_cut()),
    "dedup_substring_incremental": (
        q_substring_incremental,
        _oracle_substring_incremental(),
    ),
}
