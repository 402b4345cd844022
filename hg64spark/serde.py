"""One shared binary envelope for every sketch type.

The reference declares but never implements `hg64_export`
(`/root/reference/hg64.h:132-139`, marked TODO), so the wire format here is
new design.  Per the north rule, ALL sketch types (hg64, HLL, count-min, KLL,
Bloom) share a single envelope so heterogeneous sketch columns stay
self-describing:

    magic   : 4 bytes  b"SKE1"
    type    : u8       sketch type id (below)
    version : u8       per-type payload version
    hdr_len : u16 LE   length of the type-specific header
    header  : hdr_len bytes (packed params, e.g. sigbits)
    payload : the rest

hg64 payload mirrors the reference's snapshot layout (`hg64.c:46-53`):
a u64 binmap of occupied bins followed by the occupied bins' counter blocks
(each ``2**sigbits`` little-endian u64) — so size on the wire stays
proportional to the data's *range*, not the stream length
(`/root/reference/README.md:15-17`).
"""

from __future__ import annotations

import struct

MAGIC = b"SKE1"

TYPE_HG64 = 1
TYPE_HLL = 2
TYPE_CMS = 3
TYPE_BLOOM = 4
TYPE_KLL = 5
TYPE_TDIGEST = 6
TYPE_MG = 7

_ENV = struct.Struct("<4sBBH")


def pack(sketch_type: int, header: bytes, payload: bytes, version: int = 1) -> bytes:
    if len(header) > 0xFFFF:
        raise ValueError("header too long")
    return _ENV.pack(MAGIC, sketch_type, version, len(header)) + header + payload


def unpack(buf: bytes) -> tuple[int, int, bytes, bytes]:
    """Return (sketch_type, version, header, payload)."""
    buf = bytes(buf)
    if len(buf) < _ENV.size:
        raise ValueError(f"buffer too short for envelope: {len(buf)} bytes")
    magic, stype, version, hdr_len = _ENV.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    off = _ENV.size
    header = buf[off : off + hdr_len]
    payload = buf[off + hdr_len :]
    return stype, version, header, payload


def expect(buf: bytes, sketch_type: int) -> tuple[int, bytes, bytes]:
    """Unpack and assert the sketch type; return (version, header, payload)."""
    stype, version, header, payload = unpack(buf)
    if stype != sketch_type:
        raise ValueError(f"expected sketch type {sketch_type}, got {stype}")
    return version, header, payload
