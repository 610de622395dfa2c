"""The chunked within-label KNN (sim04, the registry primary since
round 6) must equal the dense quadratic kernel exactly.

The chunked kernel is primary because the dense kernel's per-group
n x n cosine matrix is a memory cliff under label skew; chunking bounds
the matrix to chunk x n (dominant-label probe numbers in NOTES.md).
Same semantics, same oracle — so the two kernels must agree row-for-row
on real data and on adversarial fixtures (dominant label spanning many
chunks, duplicate vectors stressing the id-asc tiebreak).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries.llm_similarity import (
    within_label_knn_chunked,
    within_label_knn_dense,
)


def _rows(df) -> set[tuple]:
    return {(r.vec_id, r.label, r.nbr, r.cos_sim) for r in df.collect()}


def test_chunked_equals_full_on_testdata(spark):
    assert _rows(within_label_knn_chunked(spark, SF_DIR)) == _rows(
        within_label_knn_dense(spark, SF_DIR)
    )


def test_chunked_equals_full_on_skewed_fixture(spark, tmp_path):
    """One dominant label (197 vecs across many chunk_size=16 blocks,
    including exact-duplicate vectors -> tied 1.0 scores) plus a tiny
    label and a 2-vec label (the n<3 preselect branch)."""
    dim = 8
    rows = []
    for i in range(197):
        base = [((i % 7) + d * 0.25 + 1.0) for d in range(dim)]
        rows.append((i, 0, base))
    # exact duplicates: ids 300/301/302 share one vector — top-2 must
    # pick the two smallest ids among score-1.0 ties
    dup = [1.5] * dim
    rows += [(300 + k, 0, dup) for k in range(3)]
    rows += [(400 + k, 1, [float(k + 1)] * dim) for k in range(5)]
    rows += [(500, 2, [1.0] * dim), (501, 2, [2.0, 1.0] + [1.0] * (dim - 2))]

    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "label": pa.array([r[1] for r in rows], type=pa.int32()),
            "embedding": pa.array(
                [r[2] for r in rows], type=pa.list_(pa.float64())
            ),
        }
    )
    d = tmp_path / "skew_emb"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    sf_dir = str(d)

    full = _rows(within_label_knn_dense(spark, sf_dir))
    chunked = _rows(within_label_knn_chunked(spark, sf_dir, chunk_size=16))
    assert chunked == full
    # duplicate-vector tiebreak: 300's neighbors are 301, 302 at 1.0
    assert {(300, 0, 301, 1.0), (300, 0, 302, 1.0)} <= chunked


def test_auto_chunk_sizing_and_equality(spark):
    """_auto_chunk pins the block budget: chunk*n*8 <= 128 MB for any
    group size above the floor, capped at 4096 for small groups; and
    the auto-sized kernel equals the old hand-tuned 256 constant
    row-for-row (chunk boundaries cannot change any score)."""
    from travel_data_ingestion_spark.queries.llm_similarity import (
        _CHUNK_BLOCK_BUDGET,
        _auto_chunk,
    )

    for n in (1, 10, 4096, 100_000, 1_000_000, 50_000_000):
        cs = _auto_chunk(n)
        assert 16 <= cs <= 4096
        if cs > 16:  # above the floor the budget is a hard bound
            assert cs * n * 8 <= _CHUNK_BLOCK_BUDGET
    assert _auto_chunk(100) == 4096  # small group -> one GEMM
    assert _auto_chunk(1_000_000) == 16  # huge group -> floor

    assert _rows(within_label_knn_chunked(spark, SF_DIR)) == _rows(
        within_label_knn_chunked(spark, SF_DIR, chunk_size=256)
    )
