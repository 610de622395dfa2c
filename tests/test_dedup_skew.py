"""dd04 hot-bucket mitigation: identical-signature floods must not
create a k^2 blocking bucket.

1k identical docs all hash to ONE simhash signature. The old doc-level
chunk join put all 1k in the same bucket: ~500k candidate pairs x 4
chunk collisions through a distinct shuffle (~2M rows) just to emit the
500k true pairs. The signature-level join sees ONE row for the whole flood;
the 500k output pairs (irreducible — the oracle enumerates them) come
from the direct same-signature equi-join with no chunk explode and no
distinct.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries.llm_dedup import dd04_simhash

N_IDENTICAL = 1000


def _write_docs(tmp_path, rows) -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
        }
    )
    d = tmp_path / "skew_sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_identical_doc_flood_completes_without_k2_bucket(spark, tmp_path):
    # 1000 identical docs + 2 distinct docs at hamming>3 from everything.
    rows = [(i, "lorem ipsum dolor sit amet") for i in range(N_IDENTICAL)]
    rows += [(5000, "completely different text about spark engines"),
             (5001, "yet another unrelated string of words here")]
    sf_dir = _write_docs(tmp_path, rows)

    out = dd04_simhash(spark, sf_dir)

    # Candidate volume bound: the blocking join's per-side input is
    # 4 chunks x DISTINCT signatures (3 here), not 4 x docs (1002).
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" in plan or "Aggregate" in plan  # the usig distinct survives

    rows_out = out.collect()
    # The flood yields exactly C(1000,2) hamming-0 pairs, every pair once.
    flood = [r for r in rows_out if r.doc_a < N_IDENTICAL and r.doc_b < N_IDENTICAL]
    assert len(flood) == N_IDENTICAL * (N_IDENTICAL - 1) // 2
    assert all(r.hamming == 0 and r.doc_a < r.doc_b for r in flood)
    assert len({(r.doc_a, r.doc_b) for r in rows_out}) == len(rows_out)


def test_signature_level_blocking_matches_doc_level_semantics(spark, tmp_path):
    """On a mixed corpus (identical groups + near signatures), the pair
    set must equal the brute-force hamming<=3 enumeration."""
    # Two identical groups plus singletons; small enough to brute-force.
    rows = (
        [(i, "alpha beta gamma delta") for i in range(5)]
        + [(10 + i, "alpha beta gamma delts") for i in range(3)]
        + [(20, "one two three four five six"), (21, "unrelated words entirely")]
    )
    sf_dir = _write_docs(tmp_path, rows)

    got = {(r.doc_a, r.doc_b, r.hamming) for r in dd04_simhash(spark, sf_dir).collect()}

    # Brute force from the signatures themselves.
    from travel_data_ingestion_spark.queries import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tok = docs.select("doc_id", F.explode(F.array_distinct(toks)).alias("token"))
    h = F.md5("token")
    nibbles = [F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int") for i in range(16)]
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(2 * F.shiftright(nibbles[j // 4], 3 - j % 4).bitwiseAND(F.lit(1)) - 1).alias(
                f"v{j}"
            )
            for j in range(64)
        ]
    )
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseXOR(term)
    sigs = {r.doc_id: r.s for r in votes.select("doc_id", sig.alias("s")).collect()}

    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:
                expected.add((a, b, d))
    assert got == expected


def test_hot_block_second_level_is_lossless(spark):
    """Multi-index second-level blocking (hot buckets join on an extra
    12-bit sub-chunk of the remaining 48 bits) must return EXACTLY the
    first-level pair set. Adversarial fixture: many signatures share one
    16-bit chunk value (a popular block) while pairs differ 0-4 bits
    elsewhere — straddling the hamming<=3 boundary."""
    import itertools

    from travel_data_ingestion_spark.queries.llm_dedup import hamming_pairs

    # base signatures all share chunk 0 == 0xBEEF (one hot bucket);
    # high bits vary so sub-chunks spread
    rows = []
    rid = 0
    for base in range(40):
        sig = 0xBEEF | (base * 0x1357_9B00_0000) & ~0xFFFF
        for flips in ([], [16], [16, 33], [16, 33, 50], [16, 33, 50, 63]):
            s = sig
            for b in flips:
                s ^= 1 << b
            s_signed = s - (1 << 64) if s >= (1 << 63) else s
            rows.append((rid, s_signed))
            rid += 1
    sigs = spark.createDataFrame(rows, "rid long, sig long")

    def pairs(threshold):
        return {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_pairs(
                sigs, "rid", "sig", hot_block_threshold=threshold
            ).collect()
        }

    all_cold = pairs(10**9)  # pure first-level
    all_hot = pairs(0)  # every bucket takes the second level
    assert all_cold == all_hot and all_cold
    # brute-force ground truth
    expected = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        d = bin((sa ^ sb) & (2**64 - 1)).count("1")
        if d <= 3:
            expected.add((min(ia, ib), max(ia, ib), d))
    assert all_cold == expected
