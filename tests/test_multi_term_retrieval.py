"""Multi-term AND forms of the suffix and fuzzy duals (VERDICT r10 #7):
the single-term registered queries generalize to "a doc must match
EVERY pattern/typo" with the SAME dual artifacts, one pushed scan each,
and per-pattern conditional-MAX qualification on the one aggregate —
no second postings pass. Registration is earmarked for the r12 rotation
(the r11 prefix budget is spent); these tests carry the correctness pin
until the driver row lands."""

from __future__ import annotations

import pytest

from realtimedatapipeline_8_project_spark.operators.text_analysis import (
    MULTI_FUZZY_QUERY,
    MULTI_SUFFIX_QUERY,
    ORACLE_MULTI_FUZZY_SEARCH,
    ORACLE_MULTI_SUFFIX_SEARCH,
    _within_one_edit,
    fuzzy_hits_from_index,
    q_search_multi_fuzzy_from_index,
    q_search_multi_suffix_from_index,
)
from realtimedatapipeline_8_project_spark.plans.registry import QUERIES

from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connection(sf_oracle)
    yield con
    con.close()


def test_multi_suffix_matches_oracle(spark, sf_oracle, duck):
    df = q_search_multi_suffix_from_index(spark, sf_oracle)
    assert df.count() > 0  # the AND form is non-degenerate at sf0.01
    assert not compare(df, duck, ORACLE_MULTI_SUFFIX_SEARCH, "multi_suffix")


def test_multi_fuzzy_matches_oracle(spark, sf_oracle, duck):
    df = q_search_multi_fuzzy_from_index(spark, sf_oracle)
    assert df.count() > 0
    assert not compare(df, duck, ORACLE_MULTI_FUZZY_SEARCH, "multi_fuzzy")


def test_single_typo_form_is_the_registered_query(spark, sf_small):
    """fuzzy_hits_from_index with one typo IS the registered
    text_search_fuzzy_from_index (same helper, same plan family) —
    the refactor must not have changed the served rows."""
    from realtimedatapipeline_8_project_spark.operators.text_analysis import (
        FUZZY_QUERY,
    )

    a = sorted(
        map(
            str,
            fuzzy_hits_from_index(spark, sf_small, (FUZZY_QUERY,)).collect(),
        )
    )
    b = sorted(
        map(
            str,
            QUERIES["text_search_fuzzy_from_index"](
                spark, sf_small
            ).collect(),
        )
    )
    assert a == b and a


def test_unmatched_typo_in_and_returns_empty(spark, sf_small):
    df = fuzzy_hits_from_index(
        spark, sf_small, ("sart", "zzzqqqxyzzy")
    )
    assert df.count() == 0
    assert df.columns == ["doc_id", "n_terms_matched", "total_tf"]


def test_within_one_edit_matches_levenshtein_reference():
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    alphabet = "abc"
    words = [
        "".join(w)
        for n in range(4)
        for w in itertools.product(alphabet, repeat=n)
    ]
    for a in words:
        for b in words:
            assert _within_one_edit(a, b) == (lev(a, b) <= 1), (a, b)


def test_multi_patterns_are_nonempty_constants():
    assert len(MULTI_SUFFIX_QUERY) > 1 and len(MULTI_FUZZY_QUERY) > 1


def _n_scans(p: str) -> int:
    # formatted explain prints each scan in the tree AND a numbered
    # detail block — count the detail blocks only
    import re

    return len(re.findall(r"\(\d+\) Scan parquet", p))


def test_multi_suffix_plan_is_one_pushed_dual_scan(spark, sf_small):
    """The AND form must keep the single-pattern plan shape: ONE scan
    of the reversed dual with the suffix disjunction pushed to it —
    never a per-pattern scan or a corpus pass."""
    from .test_plans import plan_of_df

    p = plan_of_df(q_search_multi_suffix_from_index(spark, sf_small))
    assert "StringStartsWith(rterm," in p, p
    assert _n_scans(p) == 1, p


def test_multi_fuzzy_plan_is_one_pushed_postings_probe(spark, sf_small):
    """Multi-typo fuzzy = ONE pushed IN(term) postings probe (the
    verified candidate union as compile-time constants) — the variant
    probe happens before plan construction, and no second postings
    scan appears for the second typo."""
    from .test_plans import plan_of_df

    p = plan_of_df(q_search_multi_fuzzy_from_index(spark, sf_small))
    assert "In(term, [" in p, p
    assert _n_scans(p) == 1, p
