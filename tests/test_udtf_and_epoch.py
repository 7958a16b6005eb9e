"""Round-5 additions: the Python UDTF chunker (§2.11 surface completion)
and the per-epoch deterministic training shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.sampling import (
    epoch_shuffle,
)
from realtimedatapipeline_8_project_spark.operators.udtf_ops import (
    CHUNK_S,
    CHUNK_W,
    chunk_windows,
    chunk_windows_native,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def test_chunk_windows_cover_and_overlap(spark, sf_small):
    """Chunks tile every document: stride-prefixes concatenate back to the
    original text, consecutive chunks overlap by W - S tokens, and only
    the last chunk may be short."""
    docs = load_table(spark, sf_small, "documents").limit(50)
    out = chunk_windows(spark, docs).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        toks = texts[doc_id].split(" ")
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        # every chunk equals the slice it claims to be
        for i, r in enumerate(rows):
            want = toks[i * CHUNK_S : i * CHUNK_S + CHUNK_W]
            assert r.chunk.split(" ") == want
            assert r.n_tokens == len(want)
        # a chunk is full-width exactly when it fits before the end
        for i, r in enumerate(rows):
            assert (r.n_tokens == CHUNK_W) == (i * CHUNK_S + CHUNK_W <= len(toks))
        # reconstruction from stride-prefixes
        rebuilt: list[str] = []
        for r in rows:
            rebuilt.extend(r.chunk.split(" ")[:CHUNK_S])
        assert rebuilt[: len(toks)] == toks or rebuilt == toks[: len(rebuilt)]


def test_chunk_windows_null_and_empty_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    rows = chunk_windows(spark, df).collect()
    assert {r.doc_id for r in rows} == {3}


def test_chunk_windows_native_is_row_identical_twin(spark, sf_small):
    """The built-in sequence()+explode form and the UDTF form are the SAME
    operator: multiset-equal output on real documents plus the NULL/empty
    edge rows."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "text"
    ).limit(80).unionByName(
        spark.createDataFrame(
            [(90_000_001, None), (90_000_002, ""), (90_000_003, "solo")],
            "doc_id long, text string",
        )
    )
    a = chunk_windows(spark, docs)
    b = chunk_windows_native(docs)
    # same names and types (the native form's chunk_idx is non-nullable —
    # strictly more precise, a schema improvement not a mismatch)
    assert [(f.name, f.dataType) for f in a.schema] == [
        (f.name, f.dataType) for f in b.schema
    ]
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_chunk_windows_native_plan_is_maponly_jvm(spark, sf_small):
    """Plan pin for the production chunker: one map-only Generate inside
    whole-stage codegen — no shuffle, no Python worker of any kind."""
    docs = load_table(spark, sf_small, "documents")
    plan = (
        chunk_windows_native(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / PythonUDTF / Arrow
    # one codegen span: Project, Generate, and the scan's ColumnarToRow
    # all carry the same *(1) codegen-stage marker
    assert "*(1) Generate" in plan and "*(1) Project" in plan
    assert "*(2)" not in plan


def test_epoch_shuffle_is_a_permutation_that_changes_with_epoch(
    spark, sf_small
):
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    p3 = epoch_shuffle(docs, 3).collect()
    assert len(p3) == n
    assert len({r.doc_id for r in p3}) == n  # each doc exactly once
    # positions are dense 1..len(shard) per shard
    by_shard: dict[int, list[int]] = {}
    for r in p3:
        by_shard.setdefault(r.shard, []).append(r.position)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # a different epoch yields a different arrangement, same invariants
    p4 = {(r.shard, r.position): r.doc_id for r in epoch_shuffle(docs, 4).collect()}
    s3 = {(r.shard, r.position): r.doc_id for r in p3}
    assert s3 != p4
    assert sorted(s3.values()) == sorted(p4.values())
