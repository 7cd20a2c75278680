"""Pure-Python snappy block-format codec (no external deps).

The remote-read protocol snappy-compresses its protobuf bodies
(reference: vendor prometheus storage/remote/codec.go:29-61 uses
github.com/golang/snappy). Format per google/snappy
format_description.txt (public):

- preamble: uvarint uncompressed length
- elements: tag byte, low 2 bits select
  00 literal (len-1 in high 6 bits; 60..63 = 1..4 extra LE len bytes)
  01 copy, 1-byte offset (len-4 in bits 2-4; offset 11 bits)
  10 copy, 2-byte LE offset (len-1 in high 6 bits)
  11 copy, 4-byte LE offset (len-1 in high 6 bits)

compress() emits all-literal output — valid snappy any decoder
accepts (compression ratio 1.0; correctness path, not a perf path).
decompress() handles every element type incl. overlapping copies.
"""

from __future__ import annotations


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[pos]
        out |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return out, pos
        shift += 7


def compress(data: bytes) -> bytes:
    out = bytearray(_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        n = len(chunk)
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0xFF:
            out.append(60 << 2)
            out.append(n - 1)
        else:
            out.append(61 << 2)
            out += (n - 1).to_bytes(2, "little")
        out += chunk
        pos += n
    return bytes(out)


def decompress(data: bytes) -> bytes:
    total, pos = _read_uvarint(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        typ = tag & 3
        if typ == 0:  # literal
            ln = tag >> 2
            if ln < 60:
                ln += 1
            else:
                extra = ln - 59  # 60->1 .. 63->4 bytes
                ln = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            out += data[pos : pos + ln]
            pos += ln
        else:
            if typ == 1:
                ln = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif typ == 2:
                ln = (tag >> 2) + 1
                offset = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                offset = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy: invalid copy offset")
            # overlapping copies are legal and byte-at-a-time semantic
            start = len(out) - offset
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != total:
        raise ValueError(
            f"snappy: length mismatch, expected {total} got {len(out)}"
        )
    return bytes(out)
