"""Trained quality filter (operators/quality_filter.py): DuckDB oracle
parity rides the generic earmark gates (test_oracle_parity at
sf0.001/sf0.01, test_full_sweep at sf0.1); this battery pins the
LEARNING properties the oracle compare can't see — the loss actually
descends, the learned weights actually separate the planted
degradation, scoring composes with training, and the empty corpus
contract holds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.quality_filter import (
    QF_ITERS,
    QF_W,
    q_quality_lr_score,
    q_quality_lr_train,
    train_quality_lr,
)


def test_loss_strictly_decreases(spark, sf_small):
    """Fixed-step GD with lr * lambda_max ~ 0.64 must descend at every
    one of the QF_ITERS rounds — an oscillating trace means the tuned
    shift no longer matches the feature spectrum (e.g. a feature was
    added or rescaled without re-deriving the bound)."""
    _, trace = train_quality_lr(spark, sf_small)
    assert len(trace) == QF_ITERS
    assert all(b < a for a, b in zip(trace, trace[1:]))


def test_learned_weights_separate_planted_degradation(spark, sf_small):
    """The classifier must actually LEARN: >= 95% accuracy on the
    planted task (originals vs token-doubled copies), and both error
    directions bounded — not a constant prediction."""
    rows = q_quality_lr_score(spark, sf_small).collect()
    assert rows
    acc = sum(
        1 for r in rows if r.is_low_quality == (r.label == 0)
    ) / len(rows)
    assert acc >= 0.95, acc
    # every degraded doc id mirrors an original; margins order them
    flagged = {r.doc_id for r in rows if r.is_low_quality}
    degraded = {r.doc_id for r in rows if r.label == 0}
    assert degraded and flagged
    assert len(flagged & degraded) / len(degraded) >= 0.95
    # mean margin of originals is decisively above degraded
    m1 = [r.margin_q for r in rows if r.label == 1]
    m0 = [r.margin_q for r in rows if r.label == 0]
    assert sum(m1) / len(m1) > sum(m0) / len(m0) + QF_W // 4


def test_train_output_shape_and_determinism(spark, sf_small):
    a = sorted(map(tuple, q_quality_lr_train(spark, sf_small).collect()))
    b = sorted(map(tuple, q_quality_lr_train(spark, sf_small).collect()))
    assert a == b
    assert len(a) == 6
    assert {f for f, _ in a} == {
        "f_intercept", "f_tokens", "f_distinct", "f_repeat",
        "f_stop", "f_len",
    }
    # integer sufficient statistics: weights are exact across runs AND
    # across partitionings (sums of int64 commute)
    assert all(isinstance(w, int) for _, w in a)


def test_degraded_ids_mirror_without_collision(spark, sf_small):
    """Degraded ids are the negative mirror -(id)-1: injective for any
    non-negative corpus id, so no additive-offset collision exists at
    ANY scale (review r15)."""
    rows = q_quality_lr_score(spark, sf_small).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    originals = {r.doc_id for r in rows if r.label == 1}
    degraded = {r.doc_id for r in rows if r.label == 0}
    assert all(i >= 0 for i in originals)
    assert all(i < 0 for i in degraded)
    # bijection back onto the every-3rd originals
    assert {-i - 1 for i in degraded} == {
        i for i in originals if i % 3 == 0
    }


def test_empty_corpus_contract(spark, tmp_path):
    """Zero documents: zero weights, empty scoring frame, no division
    by zero anywhere (the F3 empty-batch discipline)."""
    empty_sf = str(tmp_path / "sf_empty")
    os.makedirs(empty_sf)
    docs = spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    docs.write.parquet(os.path.join(empty_sf, "documents.parquet"))
    w, trace = train_quality_lr(spark, empty_sf)
    assert w == [0] * 6 and trace == []
    out = q_quality_lr_train(spark, empty_sf)
    assert sorted(r.weight for r in out.collect()) == [0] * 6
    assert q_quality_lr_score(spark, empty_sf).count() == 0


def test_null_and_negative_rows_are_gated(spark, tmp_path):
    """NULL doc_id / NULL text / negative doc_id rows never reach the
    feature pass in either engine — the doc_id >= 0 gate is the
    contract that keeps the negative-mirror degraded ids injective,
    and it is part of the oracle too."""
    sf = str(tmp_path / "sf_nulls")
    os.makedirs(sf)
    spark.createDataFrame(
        [
            (0, "a a b c d", "en", "s", 9),
            (None, "x y z", "en", "s", 5),
            (3, None, "en", "s", 0),
            (-1, "w w w w", "en", "s", 7),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = q_quality_lr_score(spark, sf).collect()
    # doc 0 (label 1) + its degraded mirror -1 (0 % 3 == 0): two rows;
    # the REAL doc_id=-1 row was gated, so the mirror id is free
    assert sorted((r.doc_id, r.label) for r in rows) == [(-1, 0), (0, 1)]


def test_scoring_plan_is_one_scan_with_literal_weights(spark, sf_small):
    """The scoring projection embeds the learned weights as literals —
    no join against a weights frame, no second documents scan beyond
    the corpus union's two branch reads of the same file."""
    df = q_quality_lr_score(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
