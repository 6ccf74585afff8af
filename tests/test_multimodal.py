"""Multimodal binary-column plumbing."""

import pytest

from data_misc_tools_spark.operators import multimodal as M


def _df(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, "a longer text payload with more bytes")],
        "doc_id long, text string",
    )


def test_binary_payload_and_meta(spark):
    out = M.extract_meta(M.with_binary_payload(_df(spark), "text"))
    rows = {r.doc_id: r for r in out.collect()}
    assert bytes(rows[1].payload) == b"hello"
    assert rows[1].media_meta.n_bytes == 5
    assert rows[1].media_meta.width is None  # decoder-owned fields stay null
    assert rows[1].payload_md5 == "5d41402abc4b2a76b9719d911017c592"


def test_decode_batches_fake_is_deterministic(spark):
    b = M.with_binary_payload(_df(spark), "text")
    r1 = sorted(map(tuple, M.decode_batches(b, fake=True).collect()))
    r2 = sorted(map(tuple, M.decode_batches(b, fake=True).collect()))
    assert r1 == r2
    for _, w, h, px in r1:
        assert px == w * h  # schema + row alignment are real


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        M.decode_stub("image")
    b = M.with_binary_payload(_df(spark), "text")
    with pytest.raises(Exception):  # surfaces from the executor as PythonException
        M.decode_batches(b, fake=False).collect()


def test_udtf_probe_lifecycle(spark):
    from data_misc_tools_spark.operators.probes import udtf_probe

    df = spark.range(1000).repartition(4)
    out = udtf_probe(df).collect()
    assert len(out) == 1000
    parts = {r.partition_id for r in out}
    assert len(parts) == 4  # one "client scope" per partition
    # batch sizes are consistent with Arrow batching and rows align
    for r in out[:5]:
        assert r.batch_rows >= 1 and r.batch_index >= 0
