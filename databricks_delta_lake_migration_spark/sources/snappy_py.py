"""Vendored pure-Python Snappy block codec (VERDICT r9 #6).

Implements Google's PUBLIC Snappy block format — the
``format_description.txt`` spec shipped with github.com/google/snappy —
so the pure-Python Avro OCF source (:mod:`.avro_py`) can read the
snappy-compressed files a real HDFS migration routinely contains
(reference ``migration/migrate_from_hdfs.py:121-134`` reads arbitrary
avro), with NO native ``python-snappy`` dependency (absent from this
environment; the gap was environmental, not format).

Format recap (block format, NOT the framing format):

- preamble: uncompressed length as a little-endian varint;
- then tagged elements. Tag low 2 bits: 00 literal, 01 copy/1-byte
  offset, 10 copy/2-byte offset, 11 copy/4-byte offset.
  - literal: upper 6 bits = len−1 when < 60; values 60..63 mean len−1
    follows in 1..4 little-endian bytes;
  - copy-1: len = 4 + ((tag>>2) & 7) (4..11), offset = 11 bits —
    (tag>>5)<<8 | next byte;
  - copy-2: len = (tag>>2) + 1 (1..64), offset = next 2 bytes LE;
  - copy-4: same lengths, offset = next 4 bytes LE.
  Copies may self-overlap (offset < len ⇒ repeat the pattern), which
  is why the decoder appends byte-ranges bounded by the CURRENT output
  length instead of slicing blindly.

The compressor is the standard greedy hash-match (4-byte anchors,
2-byte-offset copies, 64-byte copy chunks) — deterministic, no RNG, no
clock — used for write-side ``codec="snappy"`` and for generating
roundtrip fixtures; any conformant decoder (including the C library)
reads its output. Throughput note: this codec runs INSIDE the Arrow
batch iterator of the pyavro DataSource on executors; it is a
compatibility path, not a speed path — at 100 TB you route avro through
the JVM connector when present (``sources/files.py`` prefers it) and
this module is the fallback that keeps the data readable anywhere.
"""

from __future__ import annotations


class SnappyError(ValueError):
    """Corrupt or truncated snappy stream."""


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated snappy varint preamble")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise SnappyError("snappy varint overflow")


def decompress(data: bytes) -> bytes:
    """Decode one snappy block-format stream → raw bytes."""
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59  # 60..63 → 1..4 length bytes
                if pos + nb > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise SnappyError("truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise SnappyError("truncated copy-1 offset")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy-2 offset")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy-4 offset")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise SnappyError(
                f"snappy copy offset {off} outside {len(out)} decoded bytes"
            )
        if off >= ln:  # disjoint: one slice
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping: the pattern repeats as the output grows
            while ln > 0:
                start = len(out) - off
                take = min(ln, off)
                out += out[start : start + take]
                ln -= take
                off += take  # pattern window widened by what we appended
    if len(out) != expected:
        raise SnappyError(
            f"snappy length mismatch: preamble {expected}, decoded {len(out)}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    ln1 = (end - start) - 1  # spec allows literals up to 2^32 bytes
    if ln1 < 60:
        out.append(ln1 << 2)
    elif ln1 < 1 << 8:
        out.append(60 << 2)
        out.append(ln1)
    elif ln1 < 1 << 16:
        out.append(61 << 2)
        out += ln1.to_bytes(2, "little")
    elif ln1 < 1 << 24:
        out.append(62 << 2)
        out += ln1.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += ln1.to_bytes(4, "little")
    out += data[start:end]


def compress(data: bytes) -> bytes:
    """Encode raw bytes as one snappy block-format stream (greedy
    4-byte hash matching, 2-byte-offset copies ≤ 64 bytes each —
    plain, deterministic, conformant)."""
    n = len(data)
    out = bytearray()
    # varint preamble
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    if n < 4:
        if n:
            _emit_literal(out, data, 0, n)
        return bytes(out)
    table: dict[bytes, int] = {}
    i, lit_start = 0, 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            # extend the match forward
            m = 4
            while i + m < n and data[j + m] == data[i + m]:
                m += 1
            if lit_start < i:
                _emit_literal(out, data, lit_start, i)
            off = i - j
            rem = m
            while rem > 0:
                ln = min(rem, 64)
                if ln < 4:
                    # tail shorter than the minimum copy: fold it into
                    # the next literal instead
                    break
                out.append(((ln - 1) << 2) | 0x02)
                out += off.to_bytes(2, "little")
                rem -= ln
            i += m - rem
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data, lit_start, n)
    return bytes(out)
