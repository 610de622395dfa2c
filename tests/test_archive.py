"""Archive-shard ingestion (tar/WebDataset + zip) unit evidence."""

from __future__ import annotations

import gzip
import io
import random
import tarfile
import zipfile

from travel_data_ingestion_spark.llm.archive import (
    iter_members,
    webdataset_samples,
)
from travel_data_ingestion_spark.queries.llm_crawl import (
    _WDS_MEMBERS,
    planted_webdataset_tar,
)


def _tar(members, gz=False, fmt=tarfile.USTAR_FORMAT) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw, mtime=0) if gz else raw


def _zip(members) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def test_tar_and_gzipped_tar_members():
    members = [("a.txt", b"alpha"), ("d/b.bin", b"\x00\x01")]
    for gz in (False, True):
        got = list(iter_members(_tar(members, gz=gz)))
        assert [(p, d) for p, d, _u in got] == members
        assert all(not u for _p, _d, u in got)


def test_zip_members():
    members = [("x.txt", b"zip text"), ("sub/y.json", b"{}")]
    got = list(iter_members(_zip(members)))
    assert [(p, d) for p, d, _u in got] == members


def test_traversal_paths_sanitized_and_flagged():
    evil = [("../../etc/passwd", b"no"), ("/abs/path.txt", b"abs"),
            ("ok/file.txt", b"fine")]
    got = list(iter_members(_tar(evil)))
    by_data = {d: (p, u) for p, d, u in got}
    assert by_data[b"no"] == ("etc/passwd", True)
    assert by_data[b"abs"] == ("abs/path.txt", True)
    assert by_data[b"fine"] == ("ok/file.txt", False)
    # zip side too
    got = list(iter_members(_zip(evil)))
    assert {d: u for _p, d, u in got} == {b"no": True, b"abs": True,
                                          b"fine": False}


def test_planted_shard_is_deterministic_and_parses():
    a, b = planted_webdataset_tar(), planted_webdataset_tar()
    assert a == b
    got = list(iter_members(a))
    assert [(p, d) for p, d, _u in got] == _WDS_MEMBERS


def test_bomb_caps():
    big = bytes(100 << 20)  # 100 MB member: over the 64 MiB cap
    t = _tar([("small.txt", b"ok"), ("big.bin", big), ("after.txt", b"z")])
    got = [(p, d) for p, d, _u in iter_members(t)]
    assert got == [("small.txt", b"ok"), ("after.txt", b"z")]


def test_hostility_total():
    rng = random.Random(4)
    for n in (0, 10, 512, 5000):
        blob = bytes(rng.randrange(256) for _ in range(n))
        list(iter_members(blob))
        list(iter_members(b"PK\x03\x04" + blob))
        list(iter_members(gzip.compress(blob)))
    # truncated tar / zip
    t = _tar([("a.txt", b"x" * 2000)])
    for cut in (10, 100, len(t) - 7):
        list(iter_members(t[:cut]))
    z = _zip([("a.txt", b"x" * 2000)])
    list(iter_members(z[: len(z) // 2]))


def test_webdataset_grouping_operator(spark):
    df = spark.createDataFrame(
        [(3, bytearray(planted_webdataset_tar()))],
        "archive_id long, payload binary",
    )
    rows = {r.sample_key: r for r in webdataset_samples(df).collect()}
    assert set(rows) == {"000001", "000002", "nested/dir/000003", "000004"}
    s1 = rows["000001"]
    assert s1.n_components == 3
    assert s1.extensions == "jpg,json,txt"
    assert s1.text == "a photo of a travel graph"  # json is metadata
    assert s1.total_bytes == 70
    assert rows["000004"].text == "7"  # .cls label
    assert rows["000002"].text == "second caption"  # stripped
