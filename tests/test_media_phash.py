"""Perceptual near-dup (operators/multimodal.py: phash_media +
phash_neardup_pairs): the Arrow average-hash pass equals a pure-Python
reference bit for bit; the banded pipeline's output is EXACTLY the
brute-force all-pairs answer at Hamming <= PH_HAM_T (recall is the
4-band pigeonhole guarantee, precision is the exact verify); planted
single-byte edits are recovered; the plan is banded equi-join, never
cartesian. Oracle parity at sf0.001/sf0.01 and the sf0.1 sweep run via
the generic registry.EARMARKS gates."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from realtimedatapipeline_8_project_spark.operators.multimodal import (
    PH_EVERY,
    PH_HAM_T,
    PH_OFFSET,
    phash_media,
    phash_neardup_pairs,
    q_media_phash_neardup,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table

CORPUS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def ref_phash(payload: bytes | None) -> tuple[int, int]:
    """Pure-Python reference of the stub hash: 64 chunk-sum cells
    (cell of byte p = (p*64)//n), average-hash bits, two int64
    halves."""
    b = payload or b""
    n = len(b)
    cells = [0] * 64
    for p, byte in enumerate(b):
        cells[(p * 64) // n] += byte
    total = sum(cells)
    bits = [1 if 64 * c >= total else 0 for c in cells]
    lo = sum(bits[i] << i for i in range(32))
    hi = sum(bits[32 + i] << i for i in range(32))
    return lo, hi


def ref_hamming(a: tuple[int, int], b: tuple[int, int]) -> int:
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def _corpus_df(spark, rows):
    return spark.createDataFrame(
        [(i, p) for i, p in rows], CORPUS_SCHEMA
    )


def test_phash_matches_python_reference(spark):
    """The Arrow pass reproduces the reference hash bit for bit,
    including the degenerate shapes: empty payload and NULL payload
    hash to all-ones (zero cells, zero total), short payloads leave
    trailing cells empty."""
    rows = [
        (1, b"the quick brown fox jumps over the lazy dog " * 4),
        (2, b"abc"),  # n < 64: most cells empty
        (3, b""),  # all-ones hash
        (4, None),  # NULL payload == empty
        (5, bytes(range(256)) * 3),
    ]
    got = {
        r["media_id"]: (r["phash_lo"], r["phash_hi"])
        for r in phash_media(_corpus_df(spark, rows)).collect()
    }
    for mid, payload in rows:
        assert got[mid] == ref_phash(payload), mid
    all_ones = (2**32 - 1, 2**32 - 1)
    assert got[3] == all_ones and got[4] == all_ones


def test_neardup_exactly_bruteforce_at_threshold(spark, sf_small):
    """THE exactness pin: on the registered query's own corpus
    (fixture + planted edits) the banded pipeline emits EXACTLY the
    pairs a brute-force all-pairs scan finds at Hamming <= PH_HAM_T —
    recall (pigeonhole: 4 bands, T=3 < 4) AND precision (exact
    verify), checked against the pure-Python reference."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    }
    hashes = {did: ref_phash(t.encode()) for did, t in docs.items()}
    for did, t in docs.items():
        if did % PH_EVERY == 0:
            p = len(t) // 2
            edited = t[:p] + "~" + t[p + 1 :]
            hashes[did + PH_OFFSET] = ref_phash(edited.encode())
    want = {
        (a, b, ref_hamming(hashes[a], hashes[b]))
        for a, b in combinations(sorted(hashes), 2)
        if ref_hamming(hashes[a], hashes[b]) <= PH_HAM_T
    }
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in q_media_phash_neardup(spark, sf_small).collect()
    }
    assert got == want
    # the planted single-byte edits land at small Hamming: every
    # planted pair within the threshold is recovered, and there are
    # enough of them for the check to mean something
    planted = {
        (d, d + PH_OFFSET)
        for d in docs
        if d % PH_EVERY == 0
        and ref_hamming(hashes[d], hashes[d + PH_OFFSET]) <= PH_HAM_T
    }
    assert len(planted) >= 10
    assert planted <= {(a, b) for a, b, _ in got}


def test_identical_and_unrelated_payloads(spark):
    """Byte-identical payloads pair at Hamming 0; structurally
    different payloads (ascending vs descending byte ramps -> opposite
    half-split hashes) never pair."""
    same = b"x" * 40 + b"y" * 40
    ramp_up = bytes(range(128))
    ramp_dn = bytes(reversed(range(128)))
    assert ref_hamming(ref_phash(ramp_up), ref_phash(ramp_dn)) > PH_HAM_T
    rows = [(1, same), (2, same), (3, ramp_up), (4, ramp_dn)]
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_neardup_pairs(_corpus_df(spark, rows)).collect()
    }
    assert got.get((1, 2)) == 0
    assert (3, 4) not in got


def test_single_cell_edit_is_recovered(spark):
    """A payload differing in one byte region (the re-encode/edit
    analog) moves one cell and must be recovered by the banding —
    the recall half of the pigeonhole contract on a constructed
    case with a provable reference Hamming."""
    base = bytes(range(64)) * 4  # 256 bytes, 4 per cell
    edited = bytearray(base)
    edited[130] = 255  # one cell perturbed
    h = ref_hamming(ref_phash(base), ref_phash(bytes(edited)))
    assert 1 <= h <= PH_HAM_T
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in phash_neardup_pairs(
            _corpus_df(spark, [(1, base), (2, bytes(edited))])
        ).collect()
    }
    assert got == {(1, 2): h}


def test_plan_is_banded_equi_join(spark, sf_small):
    """The candidate join is a banded equi-join: no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the physical plan."""
    plan = q_media_phash_neardup(spark, sf_small)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_empty_corpus(spark):
    """Zero rows in -> zero pairs out, typed schema intact."""
    out = phash_neardup_pairs(_corpus_df(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "media_id_a",
        "media_id_b",
        "hamming",
    ]


def test_degenerate_payloads_never_pair(spark):
    """Review r15: NULL and EMPTY payloads are MISSING media — they
    all hash to the identical all-ones signature, so without the gate
    k of them would emit C(k,2) Hamming-0 "pairs" and one maximally
    hot band. They are excluded from pairing entirely; genuinely
    UNIFORM payloads (the flat-image aHash degeneracy) still pair."""
    # cell-uniform payloads (length a multiple of 64, so every cell
    # gets the same sum) hash to all-ones, like the zero payload
    flat_a, flat_b = b"\x00" * 80, b"z" * 128
    rows = [
        (1, None),
        (2, b""),
        (3, None),
        (4, flat_a),
        (5, flat_a),
        (6, flat_b),
    ]
    got = {
        (r["media_id_a"], r["media_id_b"])
        for r in phash_neardup_pairs(_corpus_df(spark, rows)).collect()
    }
    assert not any({1, 2, 3} & {a, b} for a, b in got)
    # the uniform-payload collision is kept, documented behavior:
    # all three flat payloads share the all-ones hash
    assert {(4, 5), (4, 6), (5, 6)} <= got


def test_incremental_is_restricted_full(spark, sf_small):
    """The pinned identity the streaming loop rides: incremental(base,
    delta) == the FULL operator over (base ∪ delta) restricted to
    pairs touching a delta id — and incremental(∅, corpus) == the full
    operator exactly."""
    from realtimedatapipeline_8_project_spark.operators.multimodal import (
        _ph_delta,
        incremental_phash_pairs,
        phash_neardup_pairs,
    )

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    delta = _ph_delta(docs).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    delta_ids = {r[0] for r in delta.select("media_id").collect()}
    full_union = {
        tuple(t)
        for t in map(
            tuple, phash_neardup_pairs(base.unionByName(delta)).collect()
        )
    }
    want = {
        t for t in full_union if t[0] in delta_ids or t[1] in delta_ids
    }
    got = {
        tuple(t)
        for t in map(
            tuple,
            incremental_phash_pairs(
                phash_media(base), phash_media(delta)
            ).collect(),
        )
    }
    assert got == want
    assert len(got) > 0
    # empty base: incremental degenerates to the full operator
    empty = phash_media(_corpus_df(spark, []))
    got0 = {
        tuple(t)
        for t in map(
            tuple,
            incremental_phash_pairs(empty, phash_media(base)).collect(),
        )
    }
    full_base = {
        tuple(t) for t in map(tuple, phash_neardup_pairs(base).collect())
    }
    assert got0 == full_base


def test_clusters_collapse_transitively(spark):
    """A -edit- B -edit- C chains into ONE cluster even when A and C
    are individually outside the pair threshold — the pair report is
    half of dedup; the cluster decision is what a pipeline consumes."""
    from realtimedatapipeline_8_project_spark.operators.dedup import (
        connected_components,
    )

    base = bytes(range(64)) * 4
    b1 = bytearray(base)
    b1[147] = 255
    b2 = bytearray(b1)
    b2[227] = 255
    b2[46] = 255
    hA, hB, hC = map(
        ref_phash, (base, bytes(b1), bytes(b2))
    )
    assert ref_hamming(hA, hB) <= PH_HAM_T
    assert ref_hamming(hB, hC) <= PH_HAM_T
    assert ref_hamming(hA, hC) > PH_HAM_T  # only transitively linked
    rows = [(1, base), (2, bytes(b1)), (3, bytes(b2)), (4, b"q" * 200)]
    pairs = phash_neardup_pairs(_corpus_df(spark, rows)).select(
        F.col("media_id_a").alias("src"), F.col("media_id_b").alias("dst")
    )
    comp = {
        r["id"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1}


def test_clusters_match_python_union_find(spark, sf_small):
    """The registered cluster report equals a pure-Python union-find
    over the (already brute-force-validated) pair report: cluster_id =
    min member, exactly one keep per cluster, sizes consistent."""
    from realtimedatapipeline_8_project_spark.operators.multimodal import (
        q_media_phash_clusters,
        q_media_phash_neardup,
    )

    pairs = [
        (r["media_id_a"], r["media_id_b"])
        for r in q_media_phash_neardup(spark, sf_small).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = {}
    for x in parent:
        members.setdefault(find(x), set()).add(x)
    want = {
        (m, root, len(ms), 1 if m == root else 0)
        for root, ms in members.items()
        for m in ms
    }
    got = {
        tuple(t)
        for t in map(
            tuple, q_media_phash_clusters(spark, sf_small).collect()
        )
    }
    assert got == want
    # exactly one survivor per cluster
    per_cluster = {}
    for m, c, n, keep in got:
        per_cluster[c] = per_cluster.get(c, 0) + keep
    assert set(per_cluster.values()) == {1}


def test_property_pipeline_equals_bruteforce(spark):
    """Hypothesis: on ARBITRARY small corpora (random lengths 1-300,
    random bytes, including duplicate payloads) the banded pipeline
    emits exactly the brute-force all-pairs answer at the threshold —
    the candidate-superset (pigeonhole) and exact-verify guarantees on
    inputs nobody hand-picked."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(st.data())
    def _run(data):
        n = data.draw(st.integers(min_value=2, max_value=10))
        payloads = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255), min_size=1, max_size=300
                    )
                )
            )
            for _ in range(n)
        ]
        # duplicate one payload sometimes so Hamming-0 pairs exist
        if data.draw(st.booleans()):
            payloads[-1] = payloads[0]
        rows = list(enumerate(payloads))
        hashes = {i: ref_phash(p) for i, p in rows}
        want = {
            (a, b, ref_hamming(hashes[a], hashes[b]))
            for a, b in combinations(sorted(hashes), 2)
            if ref_hamming(hashes[a], hashes[b]) <= PH_HAM_T
        }
        got = {
            (r["media_id_a"], r["media_id_b"], r["hamming"])
            for r in phash_neardup_pairs(
                _corpus_df(spark, rows)
            ).collect()
        }
        assert got == want

    _run()


def test_hamming_symmetry_and_ordering(spark):
    """Emitted pairs are id-ordered (a < b) and unique — the banding's
    dropDuplicates over multi-band co-hits collapses to one row per
    pair."""
    same = b"q" * 100
    rows = [(7, same), (3, same), (5, same)]
    got = sorted(
        (r["media_id_a"], r["media_id_b"])
        for r in phash_neardup_pairs(_corpus_df(spark, rows)).collect()
    )
    assert got == [(3, 5), (3, 7), (5, 7)]
