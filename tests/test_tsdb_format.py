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


# -- index v1 binary layout ---------------------------------------------------
def _u(v):  # uvarint
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def test_index_v1_hand_built_fixture(tmp_path):
    """Decode an index built BY HAND from the vendor spec (index.go
    write side), independent of our writer: one series {a="b"} with one
    chunk (ref=8, mint=0, maxt=99)."""
    import struct

    crc = tf._crc32c
    buf = bytearray(struct.pack(">I", 0xBAAAD700) + bytes([1]))
    # symbols section at 5: content = BE32 count + uvarint-len strings
    toc_symbols = len(buf)
    sym = bytearray(struct.pack(">i", 2))
    off_a = toc_symbols + 4 + len(sym)
    sym += _u(1) + b"a"
    off_b = toc_symbols + 4 + len(sym)
    sym += _u(1) + b"b"
    buf += struct.pack(">i", len(sym)) + sym + struct.pack(">I", crc(bytes(sym)))
    # series entry: uvarint total-len | content | crc
    toc_series = len(buf)
    series_ref = len(buf)
    ent = bytearray()
    ent += _u(1)              # one label
    ent += _u(off_a) + _u(off_b)
    ent += _u(1)              # one chunk
    ent += _u(0 << 1)         # varint mint=0 (zigzag)
    ent += _u(99)             # maxt - mint
    ent += _u(8)              # chunk ref
    buf += _u(len(ent)) + ent + struct.pack(">I", crc(bytes(ent)))
    # label index for "a" (4-aligned)
    buf += bytes((4 - len(buf) % 4) % 4)
    toc_label_indices = len(buf)
    li_off = len(buf)
    li = struct.pack(">ii", 1, 1) + struct.pack(">I", off_b)
    buf += struct.pack(">i", len(li)) + li + struct.pack(">I", crc(li))
    # postings: ("","") all-postings and ("a","b"), 4-aligned, sorted
    buf += bytes((4 - len(buf) % 4) % 4)
    toc_postings = len(buf)
    p_all_off = len(buf)
    pl = struct.pack(">i", 1) + struct.pack(">I", series_ref)
    buf += struct.pack(">i", len(pl)) + pl + struct.pack(">I", crc(pl))
    buf += bytes((4 - len(buf) % 4) % 4)
    p_ab_off = len(buf)
    buf += struct.pack(">i", len(pl)) + pl + struct.pack(">I", crc(pl))
    # label offset table
    toc_ltable = len(buf)
    lt = bytearray(struct.pack(">i", 1))
    lt += _u(1) + _u(1) + b"a" + _u(li_off)
    buf += struct.pack(">i", len(lt)) + lt + struct.pack(">I", crc(bytes(lt)))
    # postings offset table: ("","") then ("a","b")
    toc_ptable = len(buf)
    pt = bytearray(struct.pack(">i", 2))
    pt += _u(2) + _u(0) + _u(0) + _u(p_all_off)
    pt += _u(2) + _u(1) + b"a" + _u(1) + b"b" + _u(p_ab_off)
    buf += struct.pack(">i", len(pt)) + pt + struct.pack(">I", crc(bytes(pt)))
    # TOC
    tocb = struct.pack(
        ">QQQQQQ", toc_symbols, toc_series, toc_label_indices,
        toc_ltable, toc_postings, toc_ptable,
    )
    buf += tocb + struct.pack(">I", crc(tocb))

    p = str(tmp_path / "index")
    open(p, "wb").write(bytes(buf))
    got = tf.read_index(p)
    assert got == [({"a": "b"}, [tf.ChunkMeta(8, 0, 99)])]
    assert tf.read_index_postings(p, "a", "b") == [series_ref]
    assert tf.read_index_label_values(p, "a") == ["b"]


def test_index_v1_roundtrip_multi_chunk_unsorted(tmp_path):
    # writer must sort series into label-set order and delta-code
    # multi-chunk metas (incl. a ref delta that goes BACKWARD)
    entries = [
        (
            {"__name__": "up", "job": "web"},
            [tf.ChunkMeta((1 << 32) | 500, 0, 49),
             tf.ChunkMeta((1 << 32) | 90, 50, 99),   # ref decreases
             tf.ChunkMeta((1 << 32) | 700, 100, 149)],
        ),
        ({"__name__": "up", "job": "api"}, [tf.ChunkMeta((1 << 32) | 8, 0, 99)]),
    ]
    p = str(tmp_path / "index")
    tf.write_index(p, entries)
    got = tf.read_index(p)
    assert got == [entries[1], entries[0]]  # api sorts before web
    assert tf.read_index_label_values(p, "job") == ["api", "web"]
    assert tf.read_index_label_values(p, "nope") == []
    # postings for job=web -> exactly the web series' file offset,
    # and it resolves back to the right series
    [ref] = tf.read_index_postings(p, "job", "web")
    blob = open(p, "rb").read()
    toc = __import__("struct").unpack(">QQQQQQ", blob[-52:-4])
    syms = tf._read_symbols(blob, toc[0])
    lbls, chks = tf._read_series_at(blob, ref, syms)
    assert lbls["job"] == "web" and len(chks) == 3


def test_index_v1_detects_corruption(tmp_path):
    entries = [({"a": "b"}, [tf.ChunkMeta(8, 0, 9)])]
    p = str(tmp_path / "index")
    tf.write_index(p, entries)
    blob = bytearray(open(p, "rb").read())
    blob[-5] ^= 0xFF  # corrupt TOC bytes
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        tf.read_index(p)


def test_spark_distributed_export_roundtrip(spark, tmp_path):
    """Store -> TSDB blocks (distributed export) -> distributed ingest:
    the full interop loop through real v1 blocks."""
    import json

    rows = [
        (json.dumps({"__name__": "m", "job": f"j{s}"}, sort_keys=True),
         b * 7_200_000 + k * 50_000, float(s * 100 + k + b))
        for s in range(3) for b in range(2) for k in range(130)
    ]
    df = spark.createDataFrame(
        rows, "labels_json string, ts_ms long, value double"
    )
    out_root = str(tmp_path / "export")
    summary = converter.spark_write_tsdb_blocks(df, out_root).collect()
    assert sorted(r.block_id for r in summary) == [0, 1]
    assert all(r.n_series == 3 and r.n_samples == 390 for r in summary)
    # block dirs are complete and v1-valid
    blocks = converter.discover_blocks(out_root, level=1)
    assert len(blocks) == 2
    idx = tf.read_index(blocks[0] + "/index")
    assert len(idx) == 3 and all(len(chks) == 2 for _, chks in idx)  # 130 > 120
    # full round-trip back through the distributed reader
    back = converter.spark_read_tsdb_blocks(spark, out_root, level=1)
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.dictionaries(
                st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    min_size=1, max_size=8,
                ),
                st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    min_size=0, max_size=8,
                ),
                min_size=1, max_size=4,
            ),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=2**40),
                    st.integers(min_value=0, max_value=2**40),
                    st.integers(min_value=0, max_value=2**45),
                ),
                min_size=1, max_size=5,
            ),
        ),
        min_size=1, max_size=8,
    )
)
def test_index_v1_property_roundtrip(tmp_path_factory, entries):
    # random label sets + chunk metas survive the v1 byte layout;
    # chunk time ranges normalized to non-decreasing (mint <= maxt) but
    # deliberately NOT ordered across chunks (delta coding must wrap)
    import os
    import uuid

    fixed = []
    seen = set()
    for labels, chunks in entries:
        key = tuple(sorted(labels.items()))
        if key in seen:  # writer requires unique label sets
            continue
        seen.add(key)
        cms = [
            tf.ChunkMeta(ref, min(a, b), max(a, b)) for a, b, ref in chunks
        ]
        fixed.append((labels, cms))
    if not fixed:
        return
    tmp = tmp_path_factory.mktemp("idxprop")
    p = os.path.join(str(tmp), f"index-{uuid.uuid4().hex}")
    tf.write_index(p, fixed)
    got = tf.read_index(p)
    assert got == sorted(fixed, key=lambda e: tuple(sorted(e[0].items())))


# -- block tombstones file (vendor tsdb tombstones.go:28-137) ----------------
def test_tombstones_roundtrip(tmp_path):
    stones = [(16, 1000, 2000), (16, 5000, 6000), (4096, -500, 0)]
    tf.write_tombstones(str(tmp_path), stones)
    got = tf.read_tombstones(str(tmp_path))
    assert got == {16: [(1000, 2000), (5000, 6000)], 4096: [(-500, 0)]}
    # missing file == no deletions (empty reader)
    assert tf.read_tombstones(str(tmp_path / "nope")) == {}


def test_tombstones_detects_corruption(tmp_path):
    tf.write_tombstones(str(tmp_path), [(7, 10, 20)])
    p = tmp_path / "tombstones"
    b = bytearray(p.read_bytes())
    b[7] ^= 0xFF  # flip a byte inside the stones region
    p.write_bytes(bytes(b))
    with pytest.raises(ValueError, match="checksum"):
        tf.read_tombstones(str(tmp_path))
    b2 = bytearray(p.read_bytes())
    b2[0] ^= 0xFF  # bad magic
    p.write_bytes(bytes(b2))
    with pytest.raises(ValueError, match="magic"):
        tf.read_tombstones(str(tmp_path))


def test_ingest_applies_tombstones(spark, tmp_path):
    """A block whose tombstones file deletes [t0, t1] for one series
    must come back without those samples — local AND distributed path
    (reference: deleted intervals honored at select time, vendor
    querier.go via tombstones.Get)."""
    series = [
        ({"__name__": "m", "job": "a"}, [(k * 1000, float(k)) for k in range(300)]),
        ({"__name__": "m", "job": "b"}, [(k * 1000, float(k + 500)) for k in range(300)]),
    ]
    # delete samples 100..199 (inclusive bounds land exactly on ts) of job=a
    converter.write_block(
        str(tmp_path / "01TMB"), series, "01TMB", level=1,
        stones=[({"__name__": "m", "job": "a"}, 100_000, 199_000)],
    )
    rows = converter.read_block_samples(str(tmp_path / "01TMB"))
    a = [(t, v) for lbl, t, v in rows if lbl["job"] == "a"]
    b = [(t, v) for lbl, t, v in rows if lbl["job"] == "b"]
    assert len(b) == 300  # untouched series intact
    assert len(a) == 200
    assert not any(100_000 <= t <= 199_000 for t, _ in a)
    df = converter.spark_read_tsdb_blocks(spark, str(tmp_path), level=1)
    assert df.count() == 500
    assert (
        df.where("ts_ms between 100000 and 199000")
        .where("labels_json like '%\"job\": \"a\"%'")
        .count()
        == 0
    )


def test_multi_segment_block_roundtrip(tmp_path):
    """A block whose chunks exceed one segment file must write
    chunks/000001, 000002, ... and resolve refs (segment<<32 | offset,
    chunks.go:113-116) across ALL of them on read."""
    series = [
        (
            {"__name__": "m", "job": f"j{s}"},
            [(k * 1000, float(s * 1_000 + k)) for k in range(600)],
        )
        for s in range(4)
    ]
    bd = str(tmp_path / "01SEG")
    # ~600/120 = 5 chunks x 4 series; cap segments at 2 KiB so several
    # segment files are required
    tf.write_block_dir(bd, series, "01SEG", seg_max_bytes=2048)
    import os

    segs = sorted(os.listdir(os.path.join(bd, "chunks")))
    assert len(segs) >= 2 and segs[0] == "000001"
    # index refs must point past segment 1
    entries = tf.read_index_series(os.path.join(bd, "index"))
    assert any(
        cm.ref >> 32 >= 2 for _, _, chunks in entries for cm in chunks
    )
    rows = converter.read_block_samples(bd)
    assert len(rows) == 4 * 600
    got = {(labels["job"], t): v for labels, t, v in rows}
    assert got[("j3", 599_000)] == 3_599.0
