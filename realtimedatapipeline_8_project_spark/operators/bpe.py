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

ALPHABET PRECONDITION (enforced, not assumed): the symbol-string
encoding reserves ``' '``/``';'`` as symbol delimiters and ``'|'`` as
the encode-time word guard, and learned symbols are interpolated into
``replace(...)`` SQL string literals in BOTH engines — so the token
alphabet must be free of quotes and the three structural characters.
The tokenizer therefore normalizes to ``[a-z0-9]`` words (lowercase +
strip everything else) in the Spark AND DuckDB spellings identically,
and :func:`bpe_train_merges` additionally raises if a learned symbol
ever escapes that alphabet (defense in depth: a silent breach would
miscount identically in both engines, which the oracle compare cannot
catch — ADVICE r12).

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


# tokenizer: lowercase, strip everything outside [a-z0-9\s] (the
# alphabet precondition — see module docstring), collapse whitespace
_WORDS = (
    r"filter(split(trim(regexp_replace(regexp_replace(lower(text), "
    r"'[^a-z0-9\\s]+', ''), '\\s+', ' ')), ' '), x -> x != '')"
)
_D_WORDS = (
    r"list_filter(string_split(trim(regexp_replace(regexp_replace("
    r"lower(text), '[^a-z0-9\s]+', '', 'g'), '\s+', ' ', 'g')), ' '), "
    r"x -> x <> '')"
)

# learned symbols are concatenations of alphabet characters; anything
# else means the precondition was breached upstream — raise loudly
# rather than interpolate into SQL
_SYM_ALPHABET = frozenset("abcdefghijklmnopqrstuvwxyz0123456789")


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


def bpe_train_merges(
    w: DataFrame, n_merges: int = BPE_MERGES, checkpoint_every: int = 8
) -> list:
    """Run the merge rounds; returns [(rank, left, right, pair_freq)].
    One aggregation + one 1-row driver read per round.

    The word-freq state is localCheckpoint()ed at entry (review r13, the
    kmeans/PageRank iteration discipline): each round's collect() is a
    separate action, so without that checkpoint round k would re-execute
    the FULL lineage — corpus scan and word_freq shuffle — making
    training O(K) corpus scans instead of the ONE pass the module
    contract promises. Past the entry checkpoint, each round adds only
    one vocab-sized replace() projection, so re-deriving round k's state
    replays at most ``checkpoint_every - 1`` string projections over the
    dictionary — far cheaper than the eager checkpoint job the previous
    every-round spelling paid per merge (optimization r15: 6 fewer
    actions per training run at the fixture K; the PageRank
    ``checkpoint_every`` pattern applied here)."""
    w = w.localCheckpoint()
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
        if not (set(l) <= _SYM_ALPHABET and set(r) <= _SYM_ALPHABET):
            raise ValueError(
                f"BPE symbol escaped the [a-z0-9] alphabet: ({l!r}, {r!r})"
                " — the tokenizer precondition is breached (module"
                " docstring); refusing to interpolate into SQL"
            )
        merges.append((k + 1, l, r, int(cnt)))
        w = w.selectExpr(
            f"replace(wstr, ' {l}; {r};', ' {l}{r};') AS wstr", "freq"
        )
        if (k + 1) % checkpoint_every == 0:
            w = w.localCheckpoint()
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


def bpe_encode_counts_arrow(docs: DataFrame, merges: list) -> DataFrame:
    """Production-scale encode twin (the SCALE.md §BPE escape hatch,
    landed r13 per VERDICT r12 #5): the chained-replace projection folds
    K merges into a K-deep expression tree, which caps at the tens of
    merges a fixture trains — a 32k-merge production vocabulary needs a
    per-word algorithm whose cost is O(word symbols), independent of K.
    This is that algorithm, as one Arrow-batched ``mapInPandas`` pass:
    per word, repeatedly merge the PRESENT pair with the lowest learned
    rank (leftmost-first within a pass) until no learned pair remains.

    Equality with the chained-replace spelling: this is the standard
    reference algorithm (Sennrich apply_bpe / HF tokenizers), and it
    replays the chained passes exactly whenever no later merge can
    re-create a lower-rank pair's adjacency — which holds unless the
    trained list contains two rules whose outputs are the SAME string
    via different splits (e.g. (a,bc) and (ab,c) both making 'abc'), a
    degenerate corpus shape; the machine pin in tests/test_bpe.py
    (fixture merges + a planted K=64 vocabulary) is the check that the
    two spellings agree on the corpora we serve, not an assumption.
    NOTE a longest-match-over-final-vocab tokenizer (the classic trie
    spelling) would NOT be equivalent at all: with merges
    [(b,c), (a,b)] the word 'abc' encodes as [a, bc] under BPE merge
    order but [ab, c] under maximal munch — so the production twin
    replays ranks, it does not munch.

    The closure is self-contained (ships by value — the consuming
    SparkSession may not have this package on the executor sys.path,
    so the generator imports everything it needs locally).
    """
    ranks = {(l, r): k for k, l, r, _c in merges}

    def gen(batches):
        import re as _re

        import pandas as _pd

        # ASCII classes, NOT \s: Python's \s is unicode-aware while
        # Java (Spark) and RE2 (DuckDB) \s are ASCII-only — a U+00A0 in
        # the corpus would make the engines tokenize 'a b' as one
        # word 'ab' while Python split two, breaking the pinned
        # chained==twin equality (review r13, verified by execution)
        strip = _re.compile(r"[^a-z0-9 \t\n\x0b\f\r]+")
        ws = _re.compile(r"[ \t\n\x0b\f\r]+")

        def word_syms(w: str) -> int:
            syms = list(w)
            while len(syms) >= 2:
                best_rank = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank = r
                if best_rank is None:
                    break
                # one full left-to-right non-overlapping pass of the
                # lowest-rank present pair — the replace() semantics
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and ranks.get((syms[i], syms[i + 1])) == best_rank
                    ):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return len(syms)

        # Zipf cache (the standard HF-tokenizers word cache): the same
        # few thousand vocabulary words recur across a corpus, so the
        # merge replay runs once per DISTINCT word per partition, not
        # once per occurrence. BOUNDED (ADVICE r13): a high-cardinality
        # text column (id-laden logs) would otherwise grow the cache
        # O(distinct words) per task; like HF tokenizers'
        # cache_capacity, the cache resets when full — correctness is
        # untouched (entries are pure word -> count), only amortization
        # restarts, and a natural-language corpus never hits the cap.
        _CACHE_CAP = 1 << 16
        syms_cache: dict[str, int] = {}

        for pdf in batches:
            n_chars, n_bpe = [], []
            for text in pdf["text"]:
                if text is None or (
                    isinstance(text, float) and _pd.isna(text)
                ):
                    # null text counts as an empty document — NEVER the
                    # literal words 'none'/'nan' str() would fabricate
                    # (review r13). Known divergence, by construction:
                    # the chained SQL spelling null-PROPAGATES (size of
                    # split(NULL) is NULL) while this Arrow schema is
                    # non-null bigint, so the machine-pinned equality
                    # applies to non-null-text corpora (the fixture and
                    # every registered table guarantee that).
                    words = []
                else:
                    words = [
                        w
                        for w in ws.split(strip.sub("", str(text).lower()))
                        if w
                    ]
                n_chars.append(sum(len(w) for w in words))
                # NOT setdefault(w, word_syms(w)): Python evaluates the
                # default eagerly, which would run the replay once per
                # OCCURRENCE and make the cache decorative (review r13)
                total = 0
                for w in words:
                    n = syms_cache.get(w)
                    if n is None:
                        if len(syms_cache) >= _CACHE_CAP:
                            syms_cache.clear()
                        n = syms_cache[w] = word_syms(w)
                    total += n
                n_bpe.append(total)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": _pd.array(n_chars, dtype="int64"),
                    "n_bpe": _pd.array(n_bpe, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id bigint, n_chars bigint, n_bpe bigint"
    )


def _oracle_bpe_encode(n_merges: int = BPE_MERGES) -> str:
    estr = (
        f"array_to_string(list_transform({_D_WORDS}, "
        "w -> ' ' || array_to_string(list_filter(string_split(w, ''), "
        "c -> c <> ''), '; ') || ';'), '|')"
    )
    # chain the merges through the doc string via the t_k CTEs. LEFT
    # JOIN ON TRUE, not CROSS JOIN (review r13): when the vocabulary
    # runs dry before n_merges rounds, t_k is EMPTY and a cross join
    # would annihilate the whole doc chain to zero rows — the Spark
    # side keeps serving one row per document with the merges it DID
    # learn, so the oracle must no-op the dry rounds instead.
    chain = [f"d0 AS (SELECT doc_id, {estr} AS estr FROM documents)"]
    for k in range(1, n_merges + 1):
        chain.append(
            f"""d{k} AS (
  SELECT doc_id, CASE WHEN l IS NULL THEN estr
                 ELSE replace(estr, ' ' || l || '; ' || r || ';',
                              ' ' || l || r || ';') END AS estr
  FROM d{k - 1} LEFT JOIN t{k} ON TRUE
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
}

# Permanent earmark tier (plans/registry.py capacity decision): the
# encode path's production-scale Arrow twin is pinned chained==twin at
# K=64; oracle-gated every build by tests/test_bpe.py. Registers only
# if a slot frees.
EARMARKS = {
    "text_bpe_encode": (q_bpe_encode, _oracle_bpe_encode()),
}
