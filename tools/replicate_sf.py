#!/usr/bin/env python3
"""Shared corpus replication for the scale/spill probes.

Replicates an sf-dir N-fold into ``out``: key-like ids shift per
replica so join fan-outs stay realistic (no artificial key
collisions). The ``documents`` table supports two shapes (the same
two scale_probe.py documents — see its module docstring for the full
rationale):

- ``density=False`` (near-dup): every replica appends a `` repN``
  marker token — replicas are NEAR-dups of their base doc, the
  duplicate-HEAVY stress shape whose true pair output grows
  quadratically in the multiplier;
- ``density=True`` (constant duplicate density — the real crawl
  shape): replica 0 is the untouched base corpus and every other
  replica is FRESH filler via doc-salted token perturbation (hard
  break every 4th token, ~62% of positions substituted), so no
  5-gram survives (t12), 3-shingle Jaccard stays far below 0.35
  (dd02/dd03), and >half the distinct unigrams churn (dd04) — true
  pair output stays ~constant at every multiplier.

``doc_only=True`` copies the TPC-H tables at base scale (the
documents-family focus tiers never read them); otherwise lineitem/
orders/customer/events replicate with shifted keys.
"""

from __future__ import annotations

import os
import shutil

_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
_COPY = ("region", "nation", "supplier", "part", "embeddings")


def _fresh_filler_text(F, r: int):
    """Replica-salted token perturbation for density mode: substitute
    the token at position i whenever i % 4 == 0 (hard break — no 5
    original tokens in a row) or a (doc, position, replica) hash is
    odd. Substitutes hash the doc id too (docs sharing a base phrase
    must NOT share its perturbation, else filler manufactures new
    cross-doc spans) but draw from a bounded vocabulary (99991
    values), so at scale the filler keeps a document-frequency tail by
    birthday collision — buckets still see load, it just never
    verifies into pairs."""
    salt = F.lit(r * 7919)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pert = F.transform(
        toks,
        lambda t, i: F.when(
            (F.pmod(i, F.lit(4)) != 0)
            & (F.pmod(F.xxhash64(F.col("doc_id"), i, salt), F.lit(2)) == 0),
            t,
        ).otherwise(
            F.concat(
                F.lit("q"),
                F.pmod(
                    F.xxhash64(t, i, salt, F.col("doc_id")), F.lit(99991)
                ).cast("string"),
            )
        ),
    )
    return F.array_join(pert, " ")


def replicate_tables(spark, base: str, out: str, mult: int,
                     density: bool = False, doc_only: bool = False) -> None:
    """Build the replicated sf-dir (overwrites ``out``)."""
    from pyspark.sql import functions as F

    from travel_data_ingestion_spark.queries import load_table

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    shifts = dict(_SHIFTS)
    if doc_only:
        for table in shifts:
            shutil.copy(f"{base}/{table}.parquet", f"{out}/{table}.parquet")
        shifts = {}
    for table in _COPY:
        shutil.copy(f"{base}/{table}.parquet", f"{out}/{table}.parquet")
    docs = load_table(spark, base, "documents")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    doc_reps = []
    for r in range(mult):
        rep = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * max_doc))
        if r > 0:
            rep = rep.withColumn(
                "text",
                _fresh_filler_text(F, r)
                if density
                else F.concat(F.col("text"), F.lit(f" rep{r}")),
            )
        doc_reps.append(rep)
    out_docs = doc_reps[0]
    for rep in doc_reps[1:]:
        out_docs = out_docs.unionByName(rep)
    out_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for table, keys in shifts.items():
        df = load_table(spark, base, table)
        max_ids = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        replicas = []
        for r in range(mult):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * max_ids[k]))
            replicas.append(rep)
        out_df = replicas[0]
        for rep in replicas[1:]:
            out_df = out_df.unionByName(rep)
        out_df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
