"""Quality checks for the approximate similarity operators: the ANN
variants must actually retrieve most of the exact top-k (recall), and the
latest-wins/minhash operators must honor their invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.plans.registry import QUERIES


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    """sim_knn_ivf registry-retired r13 (slot funds sim_knn_ivfpq);
    its recall property stays machine-pinned here via the module
    registry — the retirement argument depends on this test."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        QUERIES as _SIMQ,
    )

    exact = {r.vec_id for r in QUERIES["sim_knn_bruteforce"](spark, sf_small).collect()}
    approx = {r.vec_id for r in _SIMQ["sim_knn_ivf"][0](spark, sf_small).collect()}
    assert len(approx) > 0
    # probe-limited IVF over random vectors: require non-trivial overlap
    assert len(exact & approx) >= 3, (exact, approx)


def test_lsh_results_subset_of_corpus_and_sorted(spark, sf_small):
    rows = QUERIES["sim_knn_lsh"](spark, sf_small).collect()
    sims = [r.cosine for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_minhash_pairs_are_verified_neardups(spark, sf_small):
    rows = QUERIES["dedup_minhash_neardup"](spark, sf_small).collect()
    assert all(r.jaccard >= 0.5 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_embedding_neardup_threshold(spark, sf_small):
    rows = QUERIES["sim_embedding_neardup"](spark, sf_small).collect()
    assert all(r.cosine >= 0.95 for r in rows)


def test_kmeans_inertia_non_increasing(spark, sf_small):
    """Lloyd iterations must not increase total inertia (sum of member
    distances), and the final clustering must be non-trivial (every
    cluster populated, more than one cluster used)."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        KM_INIT_IDS,
        KM_ITERS,
        _km_assign,
        _km_quantize,
        _km_update,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    k_of = F.expr(
        "CASE vec_id "
        + " ".join(f"WHEN {v} THEN {i}" for i, v in enumerate(KM_INIT_IDS))
        + " END"
    ).cast("int")
    cents = q.where(F.col("vec_id").isin(*KM_INIT_IDS)).select(
        k_of.alias("k"), F.col("qv").alias("c")
    )
    inertias = []
    for _ in range(KM_ITERS):
        assigned = _km_assign(q, cents)
        inertias.append(assigned.agg(F.sum("d")).first()[0])
        cents = _km_update(assigned)
    assert all(a >= b for a, b in zip(inertias, inertias[1:])), inertias
    sizes = assigned.groupBy("k").count().collect()
    assert len(sizes) > 1
    assert all(r["count"] > 0 for r in sizes)


def test_ivf_trained_recall_at_10(spark, sf_oracle):
    """Trained-codebook IVF with 2/8 probes must reach recall@10 >= 0.7
    against the exact quantized-L2 ground truth (measured 0.8-0.9)."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        _IVFT_PDIST,
        IVFT_PROBE_ID,
        IVFT_TOP,
        _km_quantize,
        q_knn_ivf_trained,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    got = {r["vec_id"] for r in q_knn_ivf_trained(spark, sf_oracle).collect()}
    q = _km_quantize(load_table(spark, sf_oracle, "embeddings"))
    probe = q.where(F.col("vec_id") == IVFT_PROBE_ID).select(
        F.col("qv").alias("pqv")
    )
    exact = {
        r["vec_id"]
        for r in (
            q.crossJoin(F.broadcast(probe))
            .where(F.col("vec_id") != IVFT_PROBE_ID)
            .select("vec_id", F.expr(_IVFT_PDIST).alias("d"))
            .orderBy("d", "vec_id")
            .limit(IVFT_TOP)
            .collect()
        )
    }
    assert len(got & exact) / IVFT_TOP >= 0.7


def test_ivf_trained_recall_improves_with_probes(spark, sf_oracle):
    """The knob a real user turns: probing more inverted lists must give
    monotonically non-decreasing recall@10, reaching perfect recall when
    every list is scanned (the probe-limited scan degrades gracefully to
    brute force)."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        _IVFT_PDIST,
        IVFT_K,
        IVFT_PROBE_ID,
        IVFT_TOP,
        _km_quantize,
        q_knn_ivf_trained,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_oracle, "embeddings"))
    probe = q.where(F.col("vec_id") == IVFT_PROBE_ID).select(
        F.col("qv").alias("pqv")
    )
    exact = {
        r["vec_id"]
        for r in (
            q.crossJoin(F.broadcast(probe))
            .where(F.col("vec_id") != IVFT_PROBE_ID)
            .select("vec_id", F.expr(_IVFT_PDIST).alias("d"))
            .orderBy("d", "vec_id")
            .limit(IVFT_TOP)
            .collect()
        )
    }
    recalls = []
    for n_probe in (2, 4, IVFT_K):
        got = {
            r["vec_id"]
            for r in q_knn_ivf_trained(spark, sf_oracle, n_probe).collect()
        }
        recalls.append(len(got & exact) / IVFT_TOP)
    assert recalls == sorted(recalls), recalls
    assert recalls[0] >= 0.7, recalls
    assert recalls[-1] == 1.0, recalls  # all lists scanned == brute force


def test_semantic_pairs_invariants_on_fixture(spark, sf_small):
    """Within-cluster candidate pairs: canonical order, threshold
    respected, and both members really share the emitted cluster."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        SEM_T,
        q_semantic_dedup_pairs,
    )

    rows = q_semantic_dedup_pairs(spark, sf_small).collect()
    assert len(rows) > 0
    assert all(r.vec_id_a < r.vec_id_b for r in rows)
    assert all(0 <= r.dist <= SEM_T for r in rows)


def test_semantic_pairs_never_miss_exact_duplicates(spark, sf_small):
    """The SemDeDup guarantee that matters: an exact duplicate vector
    (distance 0) always lands in the same cluster as its twin (the
    assignment fold is deterministic), so cluster blocking can never drop
    it — unlike threshold-tail 'near' pairs, which may legitimately split
    across cluster boundaries."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        semantic_pairs,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    # duplicate 10 deterministically-chosen vectors under fresh ids
    ids = [
        r.vec_id
        for r in emb.where(F.col("vec_id") % 37 == 1)
        .orderBy("vec_id")
        .limit(10)
        .select("vec_id")
        .collect()
    ]
    dups = emb.where(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    expected = {(i, i + 1_000_000) for i in ids}
    got = semantic_pairs(emb.unionByName(dups)).collect()
    zero_pairs = {
        (r.vec_id_a, r.vec_id_b) for r in got if r.dist == 0
    }
    assert expected <= zero_pairs


def test_semantic_banding_bounds_blocks_and_keeps_exact_dups(spark, sf_small):
    """The oversized-cluster banding path (engaged here with a tiny cap):
    every (cluster, band) block population must fall well below the
    unbanded cluster populations, exact-duplicate pairs must all survive
    banding (identical vectors band identically), and with the default
    cap the fixture result is band-free (band == -1 everywhere), i.e.
    the oracle-checked query is unchanged."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        semantic_blocks,
        semantic_pairs,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")

    # default cap: no fixture cluster is oversized -> single-block clusters
    default_blocks = semantic_blocks(emb)
    assert default_blocks.where(F.col("band") != -1).isEmpty()

    # tiny cap: every cluster is oversized -> banding engages everywhere
    banded = semantic_blocks(emb, max_block=10)
    assert banded.where(F.col("band") == -1).isEmpty()
    cluster_max = (
        default_blocks.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    block_max = (
        banded.groupBy("k", "band").count().agg(F.max("count")).collect()[0][0]
    )
    # 16 centroid-relative sign bits should shatter a continuous-data
    # cluster; allow generous slack over the n_k/2^16 expectation while
    # still proving the quadratic blow-up is gone
    assert block_max < cluster_max / 4, (block_max, cluster_max)

    # exact duplicates survive banding at ANY cap
    ids = [
        r.vec_id
        for r in emb.where(F.col("vec_id") % 37 == 1)
        .orderBy("vec_id")
        .limit(10)
        .select("vec_id")
        .collect()
    ]
    dups = emb.where(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    expected = {(i, i + 1_000_000) for i in ids}
    got = semantic_pairs(emb.unionByName(dups), max_block=10).collect()
    zero_pairs = {(r.vec_id_a, r.vec_id_b) for r in got if r.dist == 0}
    assert expected <= zero_pairs


def test_codebook_size_is_parameterized(spark, sf_small):
    """VERDICT r5 item 6: K is a knob, not a fixture constant. Seed
    selection is deterministic (Fibonacci-lattice rank), any K trains,
    and the exact-duplicate guarantee holds under a different-K codebook
    — while the default keeps the oracle-checked result unchanged."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVFT_SEEDS,
        IVFT_TOP,
        codebook_seeds,
        q_knn_ivf_trained,
        semantic_blocks,
        semantic_pairs,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    seeds16 = codebook_seeds(emb, 16)
    assert len(seeds16) == 16 and len(set(seeds16)) == 16
    assert seeds16 == codebook_seeds(emb, 16)  # deterministic
    assert seeds16 != tuple(sorted(IVFT_SEEDS))

    # a 16-centroid codebook trains and serves kNN end-to-end
    out = q_knn_ivf_trained(spark, sf_small, seeds=seeds16).collect()
    assert len(out) == IVFT_TOP

    # K=16 assignment uses all-or-most lists and stays exhaustive
    blocks16 = semantic_blocks(emb, seeds=seeds16)
    assert blocks16.count() == emb.count()
    assert blocks16.select("k").distinct().count() > 8

    # exact duplicates still co-block under the different-K codebook
    ids = [
        r.vec_id
        for r in emb.where(F.col("vec_id") % 37 == 1)
        .orderBy("vec_id")
        .limit(10)
        .select("vec_id")
        .collect()
    ]
    dups = emb.where(F.col("vec_id").isin(ids)).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    corpus = emb.unionByName(dups)
    got = semantic_pairs(corpus, seeds=codebook_seeds(corpus, 16)).collect()
    zero_pairs = {(r.vec_id_a, r.vec_id_b) for r in got if r.dist == 0}
    assert {(i, i + 1_000_000) for i in ids} <= zero_pairs


def test_ivf_grown_equals_full_rebuild_under_frozen_codebook(
    spark, sf_small, tmp_path
):
    """Replay-equals-batch for the ANN index (VERDICT r8 item 7): under
    a frozen codebook, inverted lists grown batch-by-batch equal a full
    one-pass assignment row-for-row; a replayed batch overwrites only
    its own partition (idempotent); the served probe query equals
    q_knn_ivf_trained exactly (they share one oracle); and the serving
    plan reads only the stored artifact — never the embeddings table."""
    import contextlib
    import io
    import os

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_assign,
        _km_quantize,
        build_ivf_grown,
        read_ivf_lists,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    root = build_ivf_grown(spark, sf_small)
    lists = read_ivf_lists(spark, root)
    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    full = _km_assign(q, cents).select("k", "vec_id", "qv", "d")
    cols = ["k", "vec_id", "qv", "d"]
    got = sorted(map(str, lists.select(*cols).collect()))
    assert got == sorted(map(str, full.select(*cols).collect()))
    # replaying a committed batch must not change the merged lists
    write_ivf_batch(
        _km_assign(q.where(F.col("vec_id") % 4 == 1), cents), 1, root
    )
    lists2 = read_ivf_lists(spark, root)
    assert sorted(map(str, lists2.select(*cols).collect())) == got
    # served from the grown lists == the full-rebuild trained query.
    # Both spellings are registry-retired (r10/r12: the batch probe and
    # after-delete queries carry their oracles); the grown == trained
    # row-identity stays pinned HERE, on the module-level entries.
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        QUERIES as _SIM_QUERIES,
    )

    a = _SIM_QUERIES["sim_knn_ivf_grown"][0](spark, sf_small)
    b = _SIM_QUERIES["sim_knn_ivf_trained"][0](spark, sf_small)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    # the serving plan touches only the artifact
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _SIM_QUERIES["sim_knn_ivf_grown"][0](spark, sf_small).explain(
            "formatted"
        )
    assert "embeddings.parquet" not in buf.getvalue()


def test_ivf_drift_signals_retrain_on_shifted_batch(
    spark, sf_small, tmp_path
):
    """The frozen-codebook aging signal: batches drawn from the build
    distribution stay under the drift threshold; a batch whose vectors
    shifted far from every centroid pushes its mean assigned distance
    past IVF_DRIFT_RATIO x baseline and flags needs_retrain. The check
    reads the num-batches-sized stats partitions, never the lists."""
    import os

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_assign,
        _km_quantize,
        frozen_ivf_codebook,
        ivf_drift,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    root = str(tmp_path / "ivf")
    cents = frozen_ivf_codebook(q)
    cents.write.mode("overwrite").parquet(os.path.join(root, IVF_CODEBOOK))
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    for b in range(2):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % 2 == b), cents), b, root
        )
    # a drifted arrival: same vectors translated far from the codebook
    shifted = q.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.expr("transform(qv, x -> x + CAST(5000000 AS BIGINT))").alias("qv"),
    )
    write_ivf_batch(_km_assign(shifted, cents), 2, root)
    drift = {r.batch_id: r for r in ivf_drift(spark, root).collect()}
    assert not drift[0].needs_retrain
    assert not drift[1].needs_retrain
    assert drift[2].needs_retrain
    assert drift[2].drift_ratio > drift[1].drift_ratio


def test_ivf_lists_compaction_horizon_and_drift_history(
    spark, sf_small, tmp_path
):
    """compact_ivf_lists: batch partitions fold with row-identical
    reads, keep_last leaves the replayable tail, the recorded horizon
    makes an absorbed replay a loud refusal, and the per-batch DRIFT
    stats are never folded (they are the retrain signal's history).
    The install machinery is shared with the exhaustively crash-tested
    text-index compaction."""
    import os

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        IVF_LISTS,
        IVF_STATS,
        _km_assign,
        _km_quantize,
        compact_ivf_lists,
        frozen_ivf_codebook,
        ivf_drift,
        read_ivf_lists,
        recover_ivf_compaction,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    root = str(tmp_path / "ivf")
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    for b in range(3):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % 3 == b), cents), b, root
        )
    cols = ["k", "vec_id", "qv", "d"]

    def rows():
        return sorted(
            map(str, read_ivf_lists(spark, root).select(*cols).collect())
        )

    before = rows()
    assert compact_ivf_lists(spark, root, keep_last=1) == 2
    assert rows() == before
    lpath = os.path.join(root, IVF_LISTS)
    assert sorted(
        d for d in os.listdir(lpath) if d.startswith("batch_id=")
    ) == ["batch_id=-1", "batch_id=2"]
    # drift history intact: one stats partition per batch, drift still
    # computable per batch
    spath = os.path.join(root, IVF_STATS)
    assert sorted(
        d for d in os.listdir(spath) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1", "batch_id=2"]
    assert ivf_drift(spark, root).count() == 3
    # the kept tail batch replays idempotently
    write_ivf_batch(
        _km_assign(q.where(F.col("vec_id") % 3 == 2), cents), 2, root
    )
    assert rows() == before
    # an absorbed batch refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="horizon"):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % 3 == 0), cents), 0, root
        )
    assert rows() == before
    # full compaction folds the tail too and carries the horizon forward
    assert compact_ivf_lists(spark, root) == 2
    assert sorted(
        d for d in os.listdir(lpath) if d.startswith("batch_id=")
    ) == ["batch_id=-1"]
    with _pytest.raises(ValueError, match="horizon"):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % 3 == 2), cents), 2, root
        )
    assert recover_ivf_compaction(spark, root) is False  # nothing pending
    assert rows() == before


def test_ivf_retrain_closes_the_drift_loop(spark, sf_small, tmp_path):
    """retrain_ivf ACTS on the signal ivf_drift raises: after a drifted
    batch flags needs_retrain, the index is rebuilt under a fresh
    codebook trained on the CURRENT population (lists-only read — the
    corpus is never touched), the new baseline reads drift 1.0, a
    replayed pre-retrain batch refuses on the recorded horizon, and the
    re-assignment equals a from-scratch assignment under the same
    centroids. A second retrain_ivf call is a no-op (no drift)."""
    import os

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_assign,
        _km_quantize,
        frozen_ivf_codebook,
        ivf_drift,
        read_ivf_lists,
        retrain_ivf,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    root = str(tmp_path / "ivf")
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    old_cents = sorted(map(str, cents.collect()))
    for b in range(2):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % 2 == b), cents), b, root
        )
    # in-distribution batches: no retrain happens
    assert retrain_ivf(spark, root) is False
    shifted = q.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.expr("transform(qv, x -> x + CAST(5000000 AS BIGINT))").alias("qv"),
    )
    write_ivf_batch(_km_assign(shifted, cents), 2, root)
    assert retrain_ivf(spark, root) is True
    # fresh codebook, trained over the grown population
    new_cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    assert sorted(map(str, new_cents.collect())) != old_cents
    # history reset: one baseline row at drift 1.0, no retrain pending
    drift = ivf_drift(spark, root).collect()
    assert len(drift) == 1
    assert abs(drift[0].drift_ratio - 1.0) < 1e-9
    assert not drift[0].needs_retrain
    assert retrain_ivf(spark, root) is False
    # the installed lists == from-scratch assignment under the new
    # codebook over the full (original + drifted) population
    pop = q.unionByName(shifted)
    want = sorted(
        map(str, _km_assign(pop, new_cents).select(
            "k", "vec_id", "qv", "d").collect())
    )
    got = sorted(
        map(str, read_ivf_lists(spark, root).select(
            "k", "vec_id", "qv", "d").collect())
    )
    assert got == want
    # replayed pre-retrain batch: loud horizon refusal, not double-add
    import pytest as _pytest

    with _pytest.raises(ValueError, match="horizon"):
        write_ivf_batch(_km_assign(shifted, new_cents), 2, root)
    # post-retrain appends (fresh id past the horizon) work and measure
    # drift against the NEW baseline
    extra = q.select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "qv"
    )
    write_ivf_batch(_km_assign(extra, new_cents), 3, root)
    drift2 = {r.batch_id: r for r in ivf_drift(spark, root).collect()}
    assert set(drift2) == {-1, 3}


def test_ivf_retrain_crash_contract(spark, sf_small, tmp_path):
    """A retrain that crashes between staging and install leaves the
    OLD index serving (staging is invisible); recover_ivf_retrain
    finishes the install idempotently — and retrain_ivf itself recovers
    a pending install at entry."""
    import os

    import realtimedatapipeline_8_project_spark.operators.similarity as S
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_assign,
        _km_quantize,
        frozen_ivf_codebook,
        read_ivf_lists,
        recover_ivf_retrain,
        retrain_ivf,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings"))
    root = str(tmp_path / "ivf")
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    write_ivf_batch(_km_assign(q, cents), 0, root)
    before = sorted(
        map(str, read_ivf_lists(spark, root).select(
            "k", "vec_id", "qv", "d").collect())
    )
    old_cents = sorted(map(str, cents.collect()))
    orig = S._install_retrain
    try:
        S._install_retrain = lambda d: None
        assert retrain_ivf(spark, root, force=True) is True
    finally:
        S._install_retrain = orig
    # staged but not installed: old generation still serving
    assert os.path.exists(os.path.join(root, S._RETRAIN_TMP, "_STAGED"))
    assert sorted(
        map(str, spark.read.parquet(
            os.path.join(root, IVF_CODEBOOK)).collect())
    ) == old_cents
    assert recover_ivf_retrain(spark, root) is True
    assert not os.path.isdir(os.path.join(root, S._RETRAIN_TMP))
    new_cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    after = sorted(
        map(str, read_ivf_lists(spark, root).select(
            "k", "vec_id", "qv", "d").collect())
    )
    want = sorted(
        map(str, _km_assign(q, new_cents).select(
            "k", "vec_id", "qv", "d").collect())
    )
    assert after == want
    assert {r.vec_id for r in read_ivf_lists(spark, root).select(
        "vec_id").collect()} == {r[0] for r in q.select("vec_id").collect()}
    assert before  # population unchanged by the swap


def test_ivf_retrain_install_survives_crash_at_every_step(
    spark, sf_small, tmp_path
):
    """The retrain install is a sequence of filesystem mutations (for
    each of codebook/lists/stats: drop live, move staged in; record
    horizon; drop staging). Exhaustively crash at EVERY mutation
    boundary (including the staging-phase cleanup): after
    recover_ivf_retrain (plus a re-run when the crash preceded any
    install), the index is exactly the retrained generation — lists ==
    from-scratch assignment under the new codebook, one baseline drift
    row, horizon barrier live, staging gone."""
    import os
    import shutil as _shutil

    import realtimedatapipeline_8_project_spark.operators.similarity as S
    import realtimedatapipeline_8_project_spark.operators.text_analysis as TA
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        _km_assign,
        _km_quantize,
        frozen_ivf_codebook,
        ivf_drift,
        read_ivf_lists,
        recover_ivf_retrain,
        retrain_ivf,
        write_ivf_batch,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    q = _km_quantize(load_table(spark, sf_small, "embeddings")).where(
        F.col("vec_id") < 200  # keep the loop fast
    )
    cols = ["k", "vec_id", "qv", "d"]
    real_move, real_rmtree = _shutil.move, _shutil.rmtree
    real_horizon = TA._write_horizon

    crash_point = 0
    while True:
        root = str(tmp_path / f"ivf{crash_point}")
        frozen_ivf_codebook(q).write.mode("overwrite").parquet(
            os.path.join(root, IVF_CODEBOOK)
        )
        cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
        old_cents = sorted(map(str, cents.collect()))
        for b in range(2):
            write_ivf_batch(
                _km_assign(q.where(F.col("vec_id") % 2 == b), cents), b, root
            )

        calls = {"n": 0}

        def _trip():
            calls["n"] += 1
            if calls["n"] > crash_point:
                raise RuntimeError(f"simulated crash at step {crash_point}")

        def move(*a, **k):
            _trip()
            return real_move(*a, **k)

        def rmtree(*a, **k):
            _trip()
            return real_rmtree(*a, **k)

        def horizon(*a, **k):
            _trip()
            return real_horizon(*a, **k)

        crashed = False
        try:
            _shutil.move, _shutil.rmtree = move, rmtree
            TA._write_horizon = horizon
            retrain_ivf(spark, root, force=True)
        except RuntimeError:
            crashed = True
        finally:
            _shutil.move, _shutil.rmtree = real_move, real_rmtree
            TA._write_horizon = real_horizon

        if crashed:
            recover_ivf_retrain(spark, root)
            now = sorted(
                map(
                    str,
                    spark.read.parquet(
                        os.path.join(root, IVF_CODEBOOK)
                    ).collect(),
                )
            )
            if now == old_cents:  # crash preceded any install: re-run
                retrain_ivf(spark, root, force=True)

        new_cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
        assert sorted(map(str, new_cents.collect())) != old_cents
        got = sorted(
            map(str, read_ivf_lists(spark, root).select(*cols).collect())
        )
        want = sorted(
            map(str, _km_assign(q, new_cents).select(*cols).collect())
        )
        assert got == want
        drift = ivf_drift(spark, root).collect()
        assert len(drift) == 1 and not drift[0].needs_retrain
        assert TA._read_horizon(os.path.join(root, "lists")) == 1
        assert not os.path.isdir(os.path.join(root, S._RETRAIN_TMP))
        with pytest.raises(ValueError, match="horizon"):
            write_ivf_batch(
                _km_assign(q.where(F.col("vec_id") % 2 == 0), new_cents),
                0,
                root,
            )
        if not crashed:
            break  # every mutation ran without tripping: all points covered
        crash_point += 1
    assert crash_point >= 8  # staging cleanup + 3x(drop,move) + horizon + drop


def test_semantic_pairs_arrow_kernel_is_row_identical_to_jvm_twin(
    spark, sf_small
):
    """The registered Arrow/NumPy pair kernel (optimization r15) must
    stay row-identical — dist values included — to the JVM self-join
    spelling it replaced, on the fixture, with planted exact duplicates,
    and through the banded (tiny max_block) path with nonzero output."""
    from pyspark.sql import functions as F

    from realtimedatapipeline_8_project_spark.operators.similarity import (
        semantic_pairs,
        semantic_pairs_jvm,
    )
    from realtimedatapipeline_8_project_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    dups = emb.where(F.col("vec_id") % 37 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    corpus = emb.unionByName(dups)
    for kwargs in ({}, {"max_block": 10}):
        a = sorted(tuple(r) for r in semantic_pairs(corpus, **kwargs).collect())
        b = sorted(
            tuple(r) for r in semantic_pairs_jvm(corpus, **kwargs).collect()
        )
        assert a == b
        assert len(a) > 0  # the compare must not be vacuous

