"""Parameterized ANN serving probe (VERDICT r10 #1): ivf_probe answers
"nearest neighbors of THIS caller-supplied vector" — the reference's
implied point-lookup serving surface for vectors (the Redis HGETALL
analog, reference processing-layer/stream-processor.py:96-111) — instead
of locating a fixture probe by scanning the index lists. The registered
trained/grown/after-delete queries all route through it with a
source-table point lookup; an external vector needs no corpus row at
all."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.similarity import (
    IVF_CODEBOOK,
    IVFT_PROBE,
    IVFT_PROBE_ID,
    IVFT_TOP,
    _km_assign,
    _km_quantize,
    frozen_ivf_codebook,
    ivf_probe,
    quantized_probe_vector,
    read_ivf_lists,
    write_ivf_batch,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table

from .test_plans import plan_of_df


def _grow(spark, sf_dir, root, batches=3):
    q = _km_quantize(load_table(spark, sf_dir, "embeddings"))
    frozen_ivf_codebook(q).write.mode("overwrite").parquet(
        os.path.join(root, IVF_CODEBOOK)
    )
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    for b in range(batches):
        write_ivf_batch(
            _km_assign(q.where(F.col("vec_id") % batches == b), cents),
            b,
            root,
        )


def _sq(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _expected(spark, root, qv, top=IVFT_TOP, exclude_id=None):
    """Pure-Python re-derivation of the probe over the collected index —
    exact integer math, so equality is exact."""
    cb = {
        r.k: list(r.c)
        for r in spark.read.parquet(
            os.path.join(root, IVF_CODEBOOK)
        ).collect()
    }
    probed = set(sorted(cb, key=lambda k: (_sq(cb[k], qv), k))[:IVFT_PROBE])
    cands = [
        r
        for r in read_ivf_lists(spark, root).collect()
        if r.k in probed and r.vec_id != exclude_id
    ]
    return sorted(((_sq(list(r.qv), qv), r.vec_id) for r in cands))[:top]


def test_external_vector_probe_matches_python_rederivation(
    spark, sf_small, tmp_path
):
    """Probe a vector that exists in NO corpus row: the served top-10
    must equal the exact re-derivation (centroid ranking + pruned-list
    candidates + integer L2), bit-for-bit."""
    root = str(tmp_path / "ivf")
    _grow(spark, sf_small, root)
    # an external query vector: a corpus vector shifted off-lattice —
    # the re-derivation below proves no candidate is at distance 0
    qv = [x + 777 for x in quantized_probe_vector(spark, sf_small, 3)]
    want = _expected(spark, root, qv)
    assert want and want[0][0] > 0  # genuinely not in the corpus
    lists = read_ivf_lists(spark, root)
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    got = [(r.dist, r.vec_id) for r in ivf_probe(lists, cents, qv).collect()]
    assert got == want


def test_in_corpus_probe_without_exclusion_returns_self_first(
    spark, sf_small, tmp_path
):
    """Probing a corpus vector's own embedding with no exclusion must
    return the vector itself first at distance 0 (the point-lookup
    identity), and the rest must match the re-derivation."""
    root = str(tmp_path / "ivf")
    _grow(spark, sf_small, root)
    qv = quantized_probe_vector(spark, sf_small, IVFT_PROBE_ID)
    lists = read_ivf_lists(spark, root)
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    got = [(r.dist, r.vec_id) for r in ivf_probe(lists, cents, qv).collect()]
    assert got[0] == (0, IVFT_PROBE_ID)
    assert got == _expected(spark, root, qv)
    # and the excluding spelling = the same list minus the self-hit
    excl = [
        (r.dist, r.vec_id)
        for r in ivf_probe(
            lists, cents, qv, exclude_id=IVFT_PROBE_ID
        ).collect()
    ]
    assert excl == _expected(spark, root, qv, exclude_id=IVFT_PROBE_ID)


def test_batch_probe_matches_per_query_rederivation(
    spark, sf_small, tmp_path
):
    """ivf_probe_batch over a mixed query frame (in-corpus vectors with
    self-exclusion + a synthetic external vector) must equal the
    pure-Python per-query re-derivation, including the per-qid rank."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        ivf_probe_batch,
    )

    root = str(tmp_path / "ivf")
    _grow(spark, sf_small, root)
    qvs = {
        0: quantized_probe_vector(spark, sf_small, 0),
        7: quantized_probe_vector(spark, sf_small, 7),
        900001: [x + 555 for x in quantized_probe_vector(spark, sf_small, 2)],
    }
    queries = spark.createDataFrame(
        [(qid, qv) for qid, qv in qvs.items()],
        "qid long, qv array<bigint>",
    )
    lists = read_ivf_lists(spark, root)
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    got = sorted(
        (r.qid, r.rank, r.vec_id, r.dist)
        for r in ivf_probe_batch(
            lists, cents, queries, exclude_self=True
        ).collect()
    )
    want = []
    for qid, qv in qvs.items():
        for rank, (d, v) in enumerate(
            [
                (d, v)
                for d, v in _expected(spark, root, qv, exclude_id=qid)
            ],
            start=1,
        ):
            want.append((qid, rank, v, d))
    assert got == sorted(want)
    # and a 1-query batch equals the single-vector serving path
    one = spark.createDataFrame(
        [(0, qvs[0])], "qid long, qv array<bigint>"
    )
    batch1 = sorted(
        (r.vec_id, r.dist)
        for r in ivf_probe_batch(
            lists, cents, one, exclude_self=True
        ).collect()
    )
    single = sorted(
        (r.vec_id, r.dist)
        for r in ivf_probe(
            lists, cents, qvs[0], exclude_id=0
        ).collect()
    )
    assert batch1 == single


def test_batch_query_matches_duckdb_oracle(spark, sf_oracle):
    """q_knn_batch (the r12 registration candidate) against its DuckDB
    oracle at the driver's scale — the same gate the driver would run,
    carried locally until the registry slot opens."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        _oracle_knn_batch,
        q_knn_batch,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_knn_batch(spark, sf_oracle)
        assert df.count() == 3 * IVFT_TOP
        assert not compare(df, con, _oracle_knn_batch(), "knn_batch")
    finally:
        con.close()


def test_batch_probe_plan_scans_lists_once_no_cartesian(spark, sf_small):
    """Scale-shape pin for the fleet probe: the lists artifact is
    scanned ONCE (candidates only — queries fan in via the broadcast
    (qid, list) pairs), the K x Q centroid product is broadcast-side
    (never a CartesianProduct over the lists), and the per-qid top-k is
    a Window, not a global sort."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_LISTS,
        ivf_index_path,
        q_knn_batch,
    )

    df = q_knn_batch(spark, sf_small)
    p = plan_of_df(df)
    lists_loc = os.path.join(ivf_index_path(spark, sf_small), IVF_LISTS)
    assert p.count(lists_loc) == 1, p
    assert "CartesianProduct" not in p, p
    assert "Window" in p, p


def test_served_probe_plan_scans_lists_once_without_probe_lookup(
    spark, sf_small
):
    """The serving-path pin (VERDICT r10 #1 'done' clause): the
    registered grown-index query's plan reads the lists artifact exactly
    ONCE (the pruned candidate scan) — no second scan locating the probe
    — and the only vec_id-equality predicate on it is the NEGATED
    self-exclusion, never a probe lookup."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_LISTS,
        QUERIES as SIM_QUERIES,  # grown retired from the registry (r12)
        ivf_index_path,
    )

    df = SIM_QUERIES["sim_knn_ivf_grown"][0](spark, sf_small)
    p = plan_of_df(df)
    lists_loc = os.path.join(ivf_index_path(spark, sf_small), IVF_LISTS)
    assert p.count(lists_loc) == 1, p
    probe_eq = f"EqualTo(vec_id,{IVFT_PROBE_ID})"
    assert p.count(probe_eq) == p.count(f"Not({probe_eq})"), p


def test_probe_vector_memoized_per_fixture_identity(
    spark, sf_small, tmp_path, monkeypatch
):
    """VERDICT r11 #1: the probe-vector point lookup is a per-FIXTURE
    cost, not a per-serving-call Spark job — a memo hit must not touch
    the source table at all, the memo must hand out copies (caller
    mutation can't poison later serves), and a changed fixture identity
    (same path, new mtime) must recompute rather than serve stale."""
    import shutil

    import realtimedatapipeline_8_project_spark.operators.similarity as sim

    v1 = quantized_probe_vector(spark, sf_small, 3)
    assert v1 is not None

    def boom(*a, **k):  # a memo hit never reaches the source table
        raise AssertionError("memo miss: re-read the source embeddings")

    monkeypatch.setattr(sim, "load_table", boom)
    assert quantized_probe_vector(spark, sf_small, 3) == v1
    # hands out a copy, never its own state
    got = quantized_probe_vector(spark, sf_small, 3)
    got[0] += 999
    assert quantized_probe_vector(spark, sf_small, 3) == v1
    monkeypatch.undo()

    # identity invalidation: a COPY of the fixture under a new dir is a
    # new identity (cold call computes), and bumping its mtime in place
    # is ANOTHER new identity (recompute, not a stale serve)
    fx = tmp_path / "fx"
    fx.mkdir()
    shutil.copyfile(
        os.path.join(sf_small, "embeddings.parquet"),
        fx / "embeddings.parquet",
    )
    calls = {"n": 0}
    real = sim.load_table

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(sim, "load_table", counting)
    v2 = quantized_probe_vector(spark, str(fx), 3)
    assert v2 == v1 and calls["n"] == 1
    assert quantized_probe_vector(spark, str(fx), 3) == v1
    assert calls["n"] == 1  # second call was a memo hit
    st = os.stat(fx / "embeddings.parquet")
    os.utime(fx / "embeddings.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert quantized_probe_vector(spark, str(fx), 3) == v1
    assert calls["n"] == 2  # new identity: recomputed


def test_fleet_vectors_memoized_and_serving_scans_no_source(
    spark, sf_small, tmp_path, monkeypatch
):
    """VERDICT r12 #3: the fleet query frame is built from MEMOIZED
    quantized vectors — a warm q_knn_batch serving call must not touch
    the source embeddings table at all (the query frame is a local
    relation), the memo must hand out copies, and a changed fixture
    identity must recompute rather than serve stale (the
    quantized_probe_vector discipline, fleet-shaped)."""
    import shutil

    import realtimedatapipeline_8_project_spark.operators.similarity as sim
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        BATCH_QIDS,
        q_knn_batch,
        quantized_fleet_vectors,
    )

    v1 = quantized_fleet_vectors(spark, sf_small, BATCH_QIDS)
    assert [qid for qid, _ in v1] == sorted(BATCH_QIDS)
    # per-id agreement with the single-probe memo (same quantization)
    for qid, qv in v1:
        assert qv == quantized_probe_vector(spark, sf_small, qid)

    # warm the index artifacts once, then starve load_table: the warm
    # serving call must not re-read ANY source table
    q_knn_batch(spark, sf_small).collect()

    def boom(*a, **k):
        raise AssertionError("warm fleet serve re-read a source table")

    monkeypatch.setattr(sim, "load_table", boom)
    assert quantized_fleet_vectors(spark, sf_small, BATCH_QIDS) == v1
    got = quantized_fleet_vectors(spark, sf_small, BATCH_QIDS)
    got[0][1][0] += 999  # mutate the handed-out copy
    assert quantized_fleet_vectors(spark, sf_small, BATCH_QIDS) == v1
    assert len(q_knn_batch(spark, sf_small).collect()) > 0
    monkeypatch.undo()

    # identity invalidation: new mtime => recompute, not a stale serve
    fx = tmp_path / "fx"
    fx.mkdir()
    shutil.copyfile(
        os.path.join(sf_small, "embeddings.parquet"),
        fx / "embeddings.parquet",
    )
    calls = {"n": 0}
    real = sim.load_table

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(sim, "load_table", counting)
    assert quantized_fleet_vectors(spark, str(fx), BATCH_QIDS) == v1
    assert calls["n"] == 1
    assert quantized_fleet_vectors(spark, str(fx), BATCH_QIDS) == v1
    assert calls["n"] == 1  # memo hit
    st = os.stat(fx / "embeddings.parquet")
    os.utime(fx / "embeddings.parquet", ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert quantized_fleet_vectors(spark, str(fx), BATCH_QIDS) == v1
    assert calls["n"] == 2  # new identity: recomputed


def test_batch_probe_never_broadcasts_query_frame(spark, sf_small):
    """VERDICT r11 #2 'done' clause: Q is the scale-growing side of the
    fleet probe, so NO plan node may broadcast the query frame. The only
    broadcast hint in the whole logical plan is the K-row CODEBOOK
    (right side of the centroid-ranking cross join, streamed against
    the query frame); the (qid, list) pairs join the lists with no
    forced side (AQE-decided: broadcast at interactive Q, shuffle on k
    at fleet Q)."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        q_knn_batch,
    )

    df = q_knn_batch(spark, sf_small)
    op = df._jdf.queryExecution().optimizedPlan().toString()
    hints = [l for l in op.splitlines() if "strategy=broadcast" in l]
    assert len(hints) == 1, op
    # the one hint is the codebook on the RIGHT of the cross join —
    # never a leftHint (the query frame streams on the left)
    assert "Join Cross, rightHint=(strategy=broadcast)" in hints[0], op
    assert "leftHint" not in op, op
    # and the candidate join carries no hint at all
    inner = [l for l in op.splitlines() if "Join Inner" in l]
    assert inner and all("Hint" not in l for l in inner), op


def test_filtered_probe_matches_oracle_and_rederivation(
    spark, sf_oracle, sf_small, tmp_path
):
    """Filtered vector search (r12): the label-restricted probe equals
    both its DuckDB oracle (trained-IVF oracle + the label IN-filter on
    the candidate set) and the pure-Python re-derivation with the
    filter applied BEFORE the top-k (a post-top-k filter would return
    fewer valid neighbors — the planted assertion below would catch
    it). The filter must never grow the result: every served id
    carries the label."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        FILTER_LABEL,
        _oracle_knn_filtered_label,
        q_knn_filtered_label,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_knn_filtered_label(spark, sf_oracle)
        rows = df.collect()
        assert rows  # the fixture label slice reaches the probed lists
        assert not compare(
            df, con, _oracle_knn_filtered_label(), "knn_filtered"
        )
    finally:
        con.close()
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    assert all(labels[r.vec_id] == FILTER_LABEL for r in rows)
    # re-derivation on the small fixture: filter-then-topk, bit-exact
    root = str(tmp_path / "ivf")
    _grow(spark, sf_small, root)
    qv = quantized_probe_vector(spark, sf_small)
    lab_small = {
        r.vec_id: r.label
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    want = [
        (d, v)
        for d, v in _expected(
            spark, root, qv, top=10**9, exclude_id=IVFT_PROBE_ID
        )
        if lab_small[v] == FILTER_LABEL
    ][:IVFT_TOP]
    lists = read_ivf_lists(spark, root)
    cents = spark.read.parquet(os.path.join(root, IVF_CODEBOOK))
    allowed = (
        load_table(spark, sf_small, "embeddings")
        .where(F.col("label") == FILTER_LABEL)
        .select("vec_id")
    )
    got = [
        (r.dist, r.vec_id)
        for r in ivf_probe(
            lists, cents, qv, exclude_id=IVFT_PROBE_ID, allowed=allowed
        ).collect()
    ]
    assert got == want


def test_fleet_query_frame_is_one_slice_and_empty_qids_short_circuit(
    spark, sf_small
):
    """VERDICT r13 #1: createDataFrame on a Q-row Python list splits it
    into defaultParallelism (32) near-empty slices, and every stage
    above the fleet frame then schedules 32 near-empty tasks — a
    measured ~2x serving regression at fixture scale. The frame must be
    ONE partition. ADVICE r13: an empty qid set must return [] (the
    documented absent-ids contract), not raise from isin()."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        BATCH_QIDS,
        fleet_query_frame,
        quantized_fleet_vectors,
    )

    frame = fleet_query_frame(spark, sf_small, BATCH_QIDS)
    assert frame.rdd.getNumPartitions() == 1
    assert frame.count() == len(BATCH_QIDS)
    assert quantized_fleet_vectors(spark, sf_small, []) == []
