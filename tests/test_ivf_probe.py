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
from realtimedatapipeline_8_project_spark.plans.registry import QUERIES
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
        ivf_index_path,
    )

    df = QUERIES["sim_knn_ivf_grown"](spark, sf_small)
    p = plan_of_df(df)
    lists_loc = os.path.join(ivf_index_path(spark, sf_small), IVF_LISTS)
    assert p.count(lists_loc) == 1, p
    probe_eq = f"EqualTo(vec_id,{IVFT_PROBE_ID})"
    assert p.count(probe_eq) == p.count(f"Not({probe_eq})"), p
