"""NULL-stratum handling in the mixture sampler (cu07's kernel).

A corpus with untagged-language docs has a real NULL stratum; the
sampler must give it a weight AND actually sample from it — an
equi-join on lang silently excludes NULL-lang docs from the sampling
pass while still reporting a positive sample_rate (the misreport a
data card would publish)."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_ingestion_spark.queries.llm_curation import mixture_sample


def test_null_lang_stratum_is_sampled(spark):
    rows = [(i, "en") for i in range(200)] + [(1000 + i, None) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.lang: r for r in mixture_sample(docs).collect()}
    assert set(out) == {"en", None}
    null_row = out[None]
    assert null_row.n_docs == 200
    assert null_row.sample_rate > 0
    # the whole point: the NULL stratum's docs actually get sampled
    # (md5-bucket predicate at rate ~0.5 over 200 docs — far from 0)
    assert null_row.n_sampled > 0
    # and the report is consistent: n_sampled <= n_docs
    for r in out.values():
        assert 0 <= r.n_sampled <= r.n_docs
