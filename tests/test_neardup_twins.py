"""Machine-checked relationship between the cheap-hash (xxhash64) near-dup
paths — permanently rows-only in the driver check — and their oracle-green
portable twins, on the planted (truncated-copy) corpus:

* MinHash: the hash family changes CANDIDATE GENERATION only. Verified
  scores agree bit-for-bit on every pair both pipelines surface; pairs
  only one pipeline surfaces are still true >= 0.5 pairs (precision is
  perfect on both sides — banding recall is the only difference), and
  both recover nearly all planted above-threshold pairs.
* SimHash: Hamming <= 3 over 4 x 16-bit bands is pigeonhole-LOSSLESS —
  the banded pipeline must emit exactly the brute-force all-pairs
  Hamming <= 3 set, no more, no less.

These turn the two `no_oracle` driver rows into "rows-only but
twin-equivalent / exhaustively-checked" (VERDICT r4 item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators import dedup
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def _planted(spark, sf_dir):
    return dedup._pmh_corpus(load_table(spark, sf_dir, "documents"))


def _string_shingle_jaccard(planted, pairs_df):
    shs = planted.select("doc_id", dedup.shingles("text").alias("s"))
    return (
        pairs_df.join(
            shs.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")),
            "doc_a",
        )
        .join(
            shs.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("j"),
        )
    )


def test_minhash_cheap_path_is_twin_equivalent(spark, sf_small):
    planted = _planted(spark, sf_small)
    cheap = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_neardup(planted).collect()
    }
    port = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.q_minhash_portable(spark, sf_small).collect()
    }
    assert cheap and port

    # 1. verification semantics identical wherever both banded pipelines
    #    surfaced the pair: hashed-shingle jaccard == string-shingle
    #    jaccard (no xxhash64 collisions on the fixture), to the 6 dp
    #    both emit
    shared = set(cheap) & set(port)
    assert len(shared) >= 0.9 * max(len(cheap), len(port))
    assert all(abs(cheap[p] - port[p]) < 1e-9 for p in shared)

    # 2. the symmetric difference is pure banding recall, never a false
    #    emission: every one-sided pair's TRUE string-shingle jaccard is
    #    still >= the 0.5 threshold
    only = set(cheap) ^ set(port)
    if only:
        pdf = spark.createDataFrame(
            sorted(only), "doc_a long, doc_b long"
        )
        assert all(
            r.j >= dedup.PMH_THRESHOLD
            for r in _string_shingle_jaccard(planted, pdf).collect()
        )

    # 3. both recover nearly all planted truncated-copy pairs whose true
    #    jaccard clears the threshold (LSH banding recall; deterministic
    #    on the fixture)
    docs = load_table(spark, sf_small, "documents")
    planted_pairs = {
        (r.doc_id, r.doc_id + dedup.PMH_ID_OFFSET)
        for r in docs.where(
            F.col("doc_id") % dedup.PMH_COPY_EVERY == 0
        ).collect()
    }
    pdf = spark.createDataFrame(sorted(planted_pairs), "doc_a long, doc_b long")
    above = {
        (r.doc_a, r.doc_b)
        for r in _string_shingle_jaccard(planted, pdf).collect()
        if r.j >= dedup.PMH_THRESHOLD
    }
    assert len(above) > 0
    assert len(above & set(cheap)) >= 0.85 * len(above)
    assert len(above & set(port)) >= 0.85 * len(above)


def test_simhash_banding_is_exhaustive_for_its_hamming_radius(spark, sf_small):
    """Pigeonhole guarantee, checked exhaustively: 4 disjoint 16-bit bands
    mean any signature pair within Hamming 3 agrees on >= 1 band, so the
    banded self-join surfaces EVERY such pair — emitted set == brute-force
    all-pairs Hamming <= 3, including all planted copies that stayed
    within the radius."""
    planted = _planted(spark, sf_small)
    emitted = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_neardup(planted).collect()
    }
    sims = dedup.simhash(planted)
    a = sims.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sims.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = {
        (r.doc_a, r.doc_b): r.hamming
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert emitted == brute
    # the planted copies inside the radius are part of that set
    docs = load_table(spark, sf_small, "documents")
    planted_pairs = {
        (r.doc_id, r.doc_id + dedup.PMH_ID_OFFSET)
        for r in docs.where(
            F.col("doc_id") % dedup.PMH_COPY_EVERY == 0
        ).collect()
    }
    assert len(planted_pairs & set(brute)) > 0
    assert planted_pairs & set(brute) == planted_pairs & set(emitted)


def test_incremental_dedup_keeps_new_content_flags_copies(spark, sf_small):
    """Ingestion-time dedup invariants on the planted delta: every
    token-REVERSED doc is genuinely new content and must be kept (even an
    accidental band collision is rejected by exact verification); nearly
    all truncated copies must be flagged with their source as best match
    (banding recall); flagged rows carry a >= threshold jaccard."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        INC_REV_OFFSET,
        PMH_ID_OFFSET,
        PMH_THRESHOLD,
        q_dedup_incremental,
    )

    rows = {r.doc_id: r for r in q_dedup_incremental(spark, sf_small).collect()}
    rev = {i for i in rows if i >= INC_REV_OFFSET}
    trunc = {i for i in rows if PMH_ID_OFFSET <= i < INC_REV_OFFSET}
    assert rev and trunc and rev | trunc == set(rows)
    assert all(rows[i].is_kept for i in rev)
    flagged = {i for i in trunc if not rows[i].is_kept}
    assert len(flagged) >= 0.85 * len(trunc)
    for i in flagged:
        assert rows[i].jaccard >= PMH_THRESHOLD
    # the dominant case: a truncated copy's best match is its own source
    own = sum(1 for i in flagged if rows[i].dup_of == i - PMH_ID_OFFSET)
    assert own >= 0.9 * len(flagged)


def test_incremental_dedup_stored_band_table_round_trip(spark, sf_small, tmp_path):
    """The production path: base bands written once at ingest, read back
    from parquet, passed to incremental_dedup — results must be identical
    to deriving bands inline."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        _inc_delta,
        base_band_table,
        incremental_dedup,
    )

    base = load_table(spark, sf_small, "documents").select("doc_id", "text")
    delta = _inc_delta(base)
    path = str(tmp_path / "base_bands")
    base_band_table(base).write.parquet(path)
    stored = spark.read.parquet(path)
    inline = {
        tuple(r) for r in incremental_dedup(base, delta).collect()
    }
    from_store = {
        tuple(r)
        for r in incremental_dedup(base, delta, base_bands=stored).collect()
    }
    assert inline == from_store and inline


def test_quality_survivor_keeps_original_where_min_id_would_not(
    spark, sf_small
):
    """The planted corpus puts a truncated copy at the ORIGINAL's id and
    the full text at id + offset, so the min-id policy would keep the
    degraded copy; the quality policy must keep the original in every
    planted cluster, and singletons must survive as themselves."""
    from realtimedatapipeline_8_project_spark.operators.curation import (
        SURVQ_EVERY,
        SURVQ_OFFSET,
        q_dedup_survivors_quality,
    )

    rows = q_dedup_survivors_quality(spark, sf_small).collect()
    # pure planted pairs: {degraded copy at id, original at id + offset}.
    # (A few planted clusters legitimately merge with other corpus
    # near-dups — there the richest member may be a third doc.)
    pairs = [
        r
        for r in rows
        if r.n_members == 2
        and r.cluster_id % SURVQ_EVERY == 0
        and r.cluster_id < SURVQ_OFFSET
        and r.survivor_doc_id in (r.cluster_id, r.cluster_id + SURVQ_OFFSET)
    ]
    assert len(pairs) >= 10
    assert all(
        r.survivor_doc_id == r.cluster_id + SURVQ_OFFSET for r in pairs
    )
    singles = [r for r in rows if r.n_members == 1]
    assert singles and all(
        r.survivor_doc_id == r.cluster_id for r in singles
    )


def test_retired_jaccard_vs_probe_oracle_gate(spark, sf_small):
    """Retired-slot gate (r15): dedup_jaccard_vs_probe left the driver
    registry to fund dedup_substring_spans (plans/registry.py r15
    retirement block), but its full Spark-vs-DuckDB oracle compare
    stays machine-checked here — the same-oracle retirement policy's
    dead-oracle guard (review r14). Its shingle/verify core also stays
    driver-verified through dedup_incremental's registered oracle
    chain, which embeds the identical exact-Jaccard formula."""
    from tests.oracle_harness import compare, duck_connection

    df = dedup.QUERIES["dedup_jaccard_vs_probe"][0](spark, sf_small)
    sql = dedup.QUERIES["dedup_jaccard_vs_probe"][1]
    con = duck_connection(sf_small)
    problems = compare(df, con, sql, "dedup_jaccard_vs_probe")
    assert not problems, "\n".join(problems)


def test_pmh_sig_hash_once_twin(spark, sf_small):
    """Optimization r16 (VERDICT r15 #3): the hash-once portable MinHash
    signature (one sha256 + one 14-hex-digit conv per shingle, integer
    split into the two 28-bit halves inside each min-fold) must be
    ROW-IDENTICAL to the retired two-sha2 spelling on the planted
    corpus — same doc_ids, same K-element signatures, bit for bit."""
    planted = _planted(spark, sf_small)
    sh = planted.select("doc_id", dedup.shingles("text").alias("s"))
    new = {
        r.doc_id: list(r.sig) for r in dedup._pmh_sig_of(sh).collect()
    }
    old = {
        r.doc_id: list(r.sig)
        for r in dedup._pmh_sig_of_twosha_r15(sh).collect()
    }
    assert new == old and len(new) > 0
