"""TSDB format codecs: XOR chunk round-trip (incl. NaN/Inf/counter
patterns, property-based), segment framing, index, full block ->
distributed Spark ingest."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from agni_spark.sources import converter, tsdb_format as tf


def roundtrip(samples):
    return tf.decode_xor_chunk(tf.encode_xor_chunk(samples))


def eq_samples(a, b):
    assert len(a) == len(b)
    for (t1, v1), (t2, v2) in zip(a, b):
        assert t1 == t2
        if math.isnan(v1):
            assert math.isnan(v2)
        else:
            assert v1 == v2


def test_xor_empty_and_single():
    assert roundtrip([]) == []
    eq_samples(roundtrip([(1700000000000, 3.14)]), [(1700000000000, 3.14)])


def test_xor_counter_pattern():
    s = [(1700000000000 + i * 15000, float(i * 7)) for i in range(120)]
    eq_samples(roundtrip(s), s)


def test_xor_special_values():
    s = [
        (0, float("nan")),
        (15000, float("inf")),
        (30000, float("-inf")),
        (45001, -0.0),
        (60007, 1e-308),
        (75009, 1.7976931348623157e308),
    ]
    eq_samples(roundtrip(s), s)


def test_xor_irregular_timestamps():
    # jittery scrape intervals exercise every dod bucket
    ts = [0, 1, 10000, 10001, 200000, 1700000, 99999999, 100000000]
    s = [(t, float(i)) for i, t in enumerate(ts)]
    eq_samples(roundtrip(s), s)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.floats(allow_nan=False, width=64),
        ),
        max_size=130,
    )
)
def test_xor_property_roundtrip(pairs):
    ts = sorted({t for t, _ in pairs})
    s = [(t, v) for t, (_, v) in zip(ts, pairs)]
    eq_samples(roundtrip(s), s)


def test_segment_framing(tmp_path):
    chunks = [tf.encode_xor_chunk([(i, float(i))]) for i in range(5)]
    seg = str(tmp_path / "000001")
    offsets = tf.write_chunk_segment(seg, chunks)
    for off, data in zip(offsets, chunks):
        assert tf.read_chunk_at(seg, off) == data
    streamed = list(iter_data for _, iter_data in tf.iter_segment_chunks(seg))
    assert streamed == chunks


def test_crc32c_golden_vectors():
    # RFC 3720 / Go crc32.Castagnoli check value for "123456789", plus
    # the empty- and zeros-input values the spec table implies.
    assert tf._crc32c(b"123456789") == 0xE3069283
    assert tf._crc32c(b"") == 0
    assert tf._crc32c(bytes(32)) == 0x8A9136AA


def test_segment_crc_detects_corruption(tmp_path):
    seg = str(tmp_path / "000001")
    [off] = tf.write_chunk_segment(seg, [tf.encode_xor_chunk([(1, 2.0)])])
    blob = bytearray(open(seg, "rb").read())
    blob[-6] ^= 0xFF  # flip a data byte
    open(seg, "wb").write(blob)
    with pytest.raises(ValueError, match="CRC"):
        tf.read_chunk_at(seg, off)


def test_index_roundtrip(tmp_path):
    entries = [
        ({"__name__": "up", "job": "api"}, [tf.ChunkMeta(1 << 32 | 8, 0, 99)]),
        (
            {"__name__": "up", "job": "web", "pod": "p1"},
            [tf.ChunkMeta(1 << 32 | 64, 0, 50), tf.ChunkMeta(1 << 32 | 90, 51, 99)],
        ),
    ]
    p = str(tmp_path / "index")
    tf.write_index(p, entries)
    assert tf.read_index(p) == entries


def test_meta_version_gate(tmp_path):
    p = str(tmp_path / "meta.json")
    tf.write_meta(p, "BLK1", 0, 100, {"numSamples": 1}, level=2)
    meta = tf.read_meta(p)
    assert meta["compaction"]["level"] == 2
    import json

    json.dump({"version": 3}, open(p, "w"))
    with pytest.raises(ValueError, match="version"):
        tf.read_meta(p)


@pytest.fixture(scope="module")
def block_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("blocks")
    mk = lambda i: [  # noqa: E731
        (
            {"__name__": "m", "job": f"j{s}"},
            [(i * 7_200_000 + k * 15_000, float(s * 1000 + k)) for k in range(250)],
        )
        for s in range(3)
    ]
    converter.write_block(str(root / "01AAA"), mk(0), "01AAA", level=1)
    converter.write_block(str(root / "01BBB"), mk(1), "01BBB", level=1)
    converter.write_block(str(root / "01CCC"), mk(2), "01CCC", level=2)
    return str(root)


def test_discover_level_filter(block_root):
    assert len(converter.discover_blocks(block_root, level=1)) == 2
    assert len(converter.discover_blocks(block_root, level=None)) == 3


def test_block_local_roundtrip(block_root):
    rows = converter.read_block_samples(converter.discover_blocks(block_root)[0])
    assert len(rows) == 750  # 3 series x 250 samples (chunked at 120)
    labels, t, v = rows[0]
    assert labels["__name__"] == "m" and t == 0 and v == 0.0


def test_spark_distributed_ingest(spark, block_root):
    df = converter.spark_read_tsdb_blocks(spark, block_root, level=1)
    assert df.count() == 1500  # 2 level-1 blocks x 750
    got = df.groupBy("labels_json").count().collect()
    assert all(r["count"] == 500 for r in got) and len(got) == 3
    # decoded values survive the distributed path bit-exactly
    row = df.where("ts_ms = 15000").orderBy("labels_json").first()
    assert row.value in (1.0, 1001.0, 2001.0)
