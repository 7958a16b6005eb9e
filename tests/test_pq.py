"""Product-quantization ADC serving (operators/similarity.py PQ
section): deterministic integer PQ — per-subspace seed codebooks + one
Lloyd iteration, stored codes, asymmetric-distance top-k — the r13
registration candidate, carried with the same oracle gate the driver
would run plus a pure-Python bit-exact re-derivation and a recall
floor vs exact quantized L2."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.similarity import (
    IVFT_PROBE_ID,
    IVFT_TOP,
    PQ_CODEBOOK,
    PQ_CODES,
    PQ_M,
    PQ_SEEDS,
    PQ_SUBDIM,
    _km_quantize,
    _oracle_knn_pq_adc,
    build_pq_index,
    pq_adc_topk,
    q_knn_pq_adc,
    quantized_probe_vector,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table

from .test_plans import plan_of_df


def _qvecs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return {
        r.vec_id: [int(x) for x in r.qv]
        for r in _km_quantize(emb).collect()
    }


def _sub(qv, m):  # m 1-based
    lo = PQ_SUBDIM * (m - 1)
    return qv[lo:lo + PQ_SUBDIM]


def _sd(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _py_pq(qvs):
    """Pure-Python re-derivation of codebook + codes (exact ints)."""
    c0 = {
        (m, j): _sub(qvs[v], m)
        for j, v in enumerate(PQ_SEEDS)
        for m in range(1, PQ_M + 1)
    }
    # assign each slice to its nearest seed slice (ties by j)
    members: dict[tuple, list] = {}
    for vid, qv in qvs.items():
        for m in range(1, PQ_M + 1):
            s = _sub(qv, m)
            j = min(
                (j for (mm, j) in c0 if mm == m),
                key=lambda j: (_sd(s, c0[(m, j)]), j),
            )
            members.setdefault((m, j), []).append(s)
    # one Lloyd iteration: element-wise floor-mean
    c1 = {
        k: [
            int(math.floor(sum(s[i] for s in v) / len(v)))
            for i in range(PQ_SUBDIM)
        ]
        for k, v in members.items()
    }
    codes = {}
    for vid, qv in qvs.items():
        codes[vid] = [
            min(
                (j for (mm, j) in c1 if mm == m),
                key=lambda j: (_sd(_sub(qv, m), c1[(m, j)]), j),
            )
            for m in range(1, PQ_M + 1)
        ]
    return c1, codes


def test_pq_codes_and_serving_match_python_rederivation(spark, sf_small):
    qvs = _qvecs(spark, sf_small)
    c1, codes = _py_pq(qvs)
    root = build_pq_index(spark, sf_small)
    got_cb = {
        (int(r.m), int(r.j)): [int(x) for x in r.c]
        for r in spark.read.parquet(os.path.join(root, PQ_CODEBOOK)).collect()
    }
    assert got_cb == c1
    got_codes = {
        int(r.vec_id): [int(x) for x in r.codes]
        for r in spark.read.parquet(os.path.join(root, PQ_CODES)).collect()
    }
    assert got_codes == codes
    # served ADC top-k == the exact table-lookup re-derivation
    probe = qvs[IVFT_PROBE_ID]
    tbl = {k: _sd(_sub(probe, k[0]), c) for k, c in c1.items()}
    want = sorted(
        (
            sum(tbl[(m, codes[v][m - 1])] for m in range(1, PQ_M + 1)),
            v,
        )
        for v in qvs
        if v != IVFT_PROBE_ID
    )[:IVFT_TOP]
    got = [
        (r.adc_dist, r.vec_id)
        for r in pq_adc_topk(
            spark, root, probe, exclude_id=IVFT_PROBE_ID
        ).collect()
    ]
    assert got == want


def test_pq_query_matches_duckdb_oracle(spark, sf_oracle):
    """q_knn_pq_adc against its DuckDB oracle at the driver's scale —
    the gate the r13 registration will run every round."""
    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_knn_pq_adc(spark, sf_oracle)
        assert df.count() == IVFT_TOP
        assert not compare(df, con, _oracle_knn_pq_adc(), "knn_pq_adc")
    finally:
        con.close()


def test_pq_shortlist_recall_curve_and_rerank_floor(spark, sf_small):
    """ADC is lossy by design (measured recall@10 0.2 at top-10 on this
    fixture); what must hold is the SHORTLIST curve — recall of the
    exact top-10 inside the ADC top-R grows with R and reaches the
    re-rank operating point by R = PQ_RERANK — and the two-phase
    re-rank query itself (exact re-score of the top-R shortlist) stays
    high-recall. Pinned so a silent codebook/encoding regression can't
    hide behind the (always-self-consistent) oracle."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        PQ_RERANK,
        q_knn_pq_rerank,
    )

    qvs = _qvecs(spark, sf_small)
    probe = qvs[IVFT_PROBE_ID]
    exact = {
        v
        for _, v in sorted(
            (_sd(qv, probe), v)
            for v, qv in qvs.items()
            if v != IVFT_PROBE_ID
        )[:IVFT_TOP]
    }
    root = build_pq_index(spark, sf_small)
    adc = [
        r.vec_id
        for r in pq_adc_topk(
            spark, root, probe, top=2 * PQ_RERANK, exclude_id=IVFT_PROBE_ID
        ).collect()
    ]
    recalls = [
        len(exact & set(adc[:r])) / IVFT_TOP
        for r in (IVFT_TOP, PQ_RERANK // 2, PQ_RERANK, 2 * PQ_RERANK)
    ]
    assert recalls == sorted(recalls), recalls  # monotone in R
    assert recalls[2] >= 0.8, recalls  # the re-rank operating point
    # the two-phase query: exact re-rank of the shortlist
    got = {r.vec_id for r in q_knn_pq_rerank(spark, sf_small).collect()}
    assert len(exact & got) / IVFT_TOP >= 0.8, sorted(got)


def test_pq_serving_plan_scans_only_codes(spark, sf_small):
    """Serving-cost pin: the plan's only scan is the codes artifact —
    the codebook is a memoized 128-row driver read folded into the
    literal ADC table, the probe vector is the memoized point lookup,
    and the source embeddings are never touched."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        pq_index_path,
    )

    df = q_knn_pq_adc(spark, sf_small)
    p = plan_of_df(df)
    assert "embeddings.parquet" not in p, p
    codes_loc = os.path.join(pq_index_path(spark, sf_small), PQ_CODES)
    assert p.count(codes_loc) == 1, p  # the ONE scan, listed once
    # and the ADC expression is pure row-local lookups (no join at all)
    assert "Join" not in p, p


def test_pq_codebook_memo_and_empty_corpus(spark, sf_small, tmp_path):
    """The codebook collect happens once per (process, root); an empty
    corpus serves an empty frame through the standard contract."""
    import realtimedatapipeline_8_project_spark.operators.similarity as sim

    import shutil

    root = build_pq_index(spark, sf_small)
    rows1 = sim._pq_codebook_rows(spark, root)
    assert 0 < len(rows1) <= PQ_M * 16
    # a memo hit must not touch the artifact at all: with the directory
    # moved away, only the memo can answer
    shutil.move(root, root + ".bak")
    try:
        assert sim._pq_codebook_rows(spark, root) == rows1
    finally:
        shutil.move(root + ".bak", root)
    # empty corpus -> empty answer (vec_id, adc_dist schema)
    empty_sf = str(tmp_path / "empty")
    os.makedirs(empty_sf)
    load_table(spark, sf_small, "embeddings").limit(0).write.parquet(
        os.path.join(empty_sf, "embeddings.parquet")
    )
    out = q_knn_pq_adc(spark, empty_sf)
    assert out.columns == ["vec_id", "adc_dist"] and out.count() == 0


def test_pq_rerank_matches_duckdb_oracle(spark, sf_oracle):
    """q_knn_pq_rerank (shortlist + exact re-rank) against its composed
    DuckDB oracle at the driver's scale."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        _oracle_knn_pq_rerank,
        q_knn_pq_rerank,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_knn_pq_rerank(spark, sf_oracle)
        assert df.count() == IVFT_TOP
        assert not compare(df, con, _oracle_knn_pq_rerank(), "knn_pq_rerank")
    finally:
        con.close()


def test_ivfpq_matches_duckdb_oracle_and_pruned_rederivation(
    spark, sf_oracle
):
    """q_knn_ivfpq against its composed DuckDB oracle at the driver's
    scale, plus a cross-artifact consistency pin: the IVFPQ answer must
    equal the flat-PQ ADC ranking restricted to the coarse candidates
    (derived from the independently verified grown-IVF artifact — same
    trained codebook)."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        IVFT_PROBE,
        _oracle_knn_ivfpq,
        build_ivf_grown,
        q_knn_ivfpq,
        read_ivf_lists,
    )

    from .oracle_harness import compare, duck_connection

    con = duck_connection(sf_oracle)
    try:
        df = q_knn_ivfpq(spark, sf_oracle)
        assert df.count() == IVFT_TOP
        assert not compare(df, con, _oracle_knn_ivfpq(), "knn_ivfpq")
    finally:
        con.close()

    qvs = _qvecs(spark, sf_oracle)
    probe = qvs[IVFT_PROBE_ID]
    groot = build_ivf_grown(spark, sf_oracle)
    cb = {
        r.k: [int(x) for x in r.c]
        for r in spark.read.parquet(
            os.path.join(groot, IVF_CODEBOOK)
        ).collect()
    }
    probed = set(
        sorted(cb, key=lambda k: (_sd(cb[k], probe), k))[:IVFT_PROBE]
    )
    cand = {
        r.vec_id
        for r in read_ivf_lists(spark, groot).collect()
        if r.k in probed and r.vec_id != IVFT_PROBE_ID
    }
    c1, codes = _py_pq(qvs)
    tbl = {k: _sd(_sub(probe, k[0]), c) for k, c in c1.items()}
    want = sorted(
        (
            sum(tbl[(m, codes[v][m - 1])] for m in range(1, PQ_M + 1)),
            v,
        )
        for v in cand
    )[:IVFT_TOP]
    got = [
        (r.adc_dist, r.vec_id)
        for r in q_knn_ivfpq(spark, sf_oracle).collect()
    ]
    assert got == want


def test_ivfpq_plan_scans_only_code_lists(spark, sf_small):
    """Serving-cost pin for the composition: the plan's only corpus-
    side scan is lists_pq (8-int code rows — no qv column anywhere in
    the read schema), pruned by the broadcast probe-list ids; the
    coarse codebook is the one K-row side scan; no source scan, no
    flat-PQ codes scan."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVFPQ_LISTS,
        ivfpq_index_path,
        q_knn_ivfpq,
    )

    df = q_knn_ivfpq(spark, sf_small)
    p = plan_of_df(df)
    assert "embeddings.parquet" not in p, p
    lists_loc = os.path.join(ivfpq_index_path(spark, sf_small), IVFPQ_LISTS)
    assert p.count(lists_loc) == 1, p
    scans = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scans and all("qv" not in l for l in scans), scans


def test_pq_family_empty_corpus_contracts(spark, tmp_path):
    """Every new serving path honors the empty-input contract: an empty
    embeddings fixture serves an empty frame with the query's schema,
    never a raise (ingest F3 discipline, extended to the r13 earmark
    family)."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        q_knn_filtered_label,
        q_knn_ivfpq,
        q_knn_pq_rerank,
    )

    empty_sf = str(tmp_path / "empty")
    os.makedirs(empty_sf)
    load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(
        0
    ).write.parquet(os.path.join(empty_sf, "embeddings.parquet"))
    out = q_knn_ivfpq(spark, empty_sf)
    assert out.columns == ["vec_id", "adc_dist"] and out.count() == 0
    out = q_knn_pq_rerank(spark, empty_sf)
    assert out.columns == ["vec_id", "dist"] and out.count() == 0
    out = q_knn_filtered_label(spark, empty_sf)
    assert out.columns == ["vec_id", "dist"] and out.count() == 0


def test_pq_rerank_refine_leg_pushes_id_filter(spark, sf_small):
    """The re-rank claim is 'R point reads of the source, never a
    corpus scan' — pin that the refine leg's In(vec_id) actually
    reaches the source parquet scan (PushedFilters)."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        q_knn_pq_rerank,
    )

    p = plan_of_df(q_knn_pq_rerank(spark, sf_small))
    pushed = [
        l for l in p.splitlines() if "PushedFilters" in l and "In(vec_id" in l
    ]
    assert pushed, p


def test_ivfpq_external_vector_probe(spark, sf_small):
    """The IVFPQ serve is parameterized like ivf_probe: an external
    (non-corpus) vector costs the same plan and matches the
    re-derivation — coarse ranking and the ADC table both fold against
    the caller's literal."""
    from realtimedatapipeline_8_project_spark.operators.similarity import (
        IVF_CODEBOOK,
        IVFT_PROBE,
        build_ivfpq_index,
        ivfpq_probe,
    )

    qvs = _qvecs(spark, sf_small)
    ext = [x + 333 for x in qvs[5]]  # off-lattice: in no corpus row
    root = build_ivfpq_index(spark, sf_small)
    cb = {
        r.k: [int(x) for x in r.c]
        for r in spark.read.parquet(
            os.path.join(root, IVF_CODEBOOK)
        ).collect()
    }
    probed = set(sorted(cb, key=lambda k: (_sd(cb[k], ext), k))[:IVFT_PROBE])
    coarse = {
        r.vec_id: r.k
        for r in spark.read.parquet(os.path.join(root, "lists_pq")).collect()
    }
    c1, codes = _py_pq(qvs)
    tbl = {k: _sd(_sub(ext, k[0]), c) for k, c in c1.items()}
    want = sorted(
        (
            sum(tbl[(m, codes[v][m - 1])] for m in range(1, PQ_M + 1)),
            v,
        )
        for v, k in coarse.items()
        if k in probed
    )[:IVFT_TOP]
    got = [
        (r.adc_dist, r.vec_id)
        for r in ivfpq_probe(spark, root, ext).collect()
    ]
    assert got == want and want
