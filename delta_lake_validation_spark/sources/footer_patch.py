"""Parquet footer shim for VARIANT-annotated files (VERDICT r6 task 6).

Spark 4.1 annotates the variant ``group { value, metadata }`` schema
element with the parquet ``VARIANT`` LogicalType (parquet-format 2.10,
LogicalType union field 16).  The pyarrow in this container (16.1)
predates that union member and refuses to parse the FOOTER — so no
pyarrow-based scan can even plan such files, although their DATA pages are
plain BYTE_ARRAY columns pyarrow reads perfectly well.

This module rewrites the footer in memory: a minimal Thrift
compact-protocol transformer walks ``FileMetadata.schema`` (field 2) and
drops each ``SchemaElement.logicalType`` (field 10) whose union member is
VARIANT (16) — turning the element into the *unannotated* plain group that
Spark-4.0-era writers produce and the deltapy scan already handles
(pydatasource._variant_assemble).  Everything else — row groups, column
chunks, key-value metadata, column orders — is copied verbatim; Thrift is
a sequential encoding with no internal offsets, and the data-page offsets
it contains point at file positions *before* the footer, so shrinking the
footer is safe.  The patched bytes are wrapped in a synthetic
``PAR1 … footer len PAR1`` buffer and handed to
``pyarrow.parquet.read_metadata``; scans then open the original file with
``ParquetFile(fh, metadata=patched)`` so pyarrow never re-reads the
on-disk footer.

Only the VARIANT member is touched: any other unknown LogicalType still
surfaces pyarrow's own error (and the callers' typed refusal).
"""

from __future__ import annotations

import struct

# Thrift compact-protocol wire types
_BOOL_TRUE, _BOOL_FALSE, _I8, _I16, _I32, _I64 = 1, 2, 3, 4, 5, 6
_DOUBLE, _BINARY, _LIST, _SET, _MAP, _STRUCT = 7, 8, 9, 10, 11, 12

_SCHEMA_FIELD = 2  # FileMetadata.schema
_LOGICAL_TYPE_FIELD = 10  # SchemaElement.logicalType
_VARIANT_MEMBER = 16  # LogicalType union: VariantType VARIANT


class FooterPatchError(ValueError):
    """The footer bytes did not parse as compact-protocol FileMetadata."""


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise FooterPatchError("varint overflow")


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    n, pos = _read_varint(buf, pos)
    return (n >> 1) ^ -(n & 1), pos


def _skip_value(buf: bytes, pos: int, ftype: int) -> int:
    """Advance past one value of wire type ``ftype`` (container-element
    form for bools: one byte)."""
    if ftype in (_BOOL_TRUE, _BOOL_FALSE):
        return pos  # value lives in the field header
    if ftype == _I8:
        return pos + 1
    if ftype in (_I16, _I32, _I64):
        return _read_varint(buf, pos)[1]
    if ftype == _DOUBLE:
        return pos + 8
    if ftype == _BINARY:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if ftype in (_LIST, _SET):
        head = buf[pos]
        pos += 1
        size, etype = head >> 4, head & 0xF
        if size == 15:
            size, pos = _read_varint(buf, pos)
        for _ in range(size):
            pos = _skip_element(buf, pos, etype)
        return pos
    if ftype == _MAP:
        size, pos = _read_varint(buf, pos)
        if size:
            head = buf[pos]
            pos += 1
            kt, vt = head >> 4, head & 0xF
            for _ in range(size):
                pos = _skip_element(buf, pos, kt)
                pos = _skip_element(buf, pos, vt)
        return pos
    if ftype == _STRUCT:
        return _skip_struct(buf, pos)
    raise FooterPatchError(f"unknown compact wire type {ftype}")


def _skip_element(buf: bytes, pos: int, etype: int) -> int:
    if etype in (_BOOL_TRUE, _BOOL_FALSE):
        return pos + 1  # container bools are one byte each
    return _skip_value(buf, pos, etype)


def _read_field_header(buf: bytes, pos: int, last_id: int):
    """Return (field_id, wire_type, value_start) or (None, None, pos') at
    STOP."""
    b = buf[pos]
    pos += 1
    if b == 0:
        return None, None, pos
    delta, ftype = b >> 4, b & 0xF
    if delta:
        return last_id + delta, ftype, pos
    fid, pos = _read_zigzag(buf, pos)
    return fid, ftype, pos


def _skip_struct(buf: bytes, pos: int) -> int:
    last_id = 0
    while True:
        fid, ftype, pos = _read_field_header(buf, pos, last_id)
        if fid is None:
            return pos
        last_id = fid
        pos = _skip_value(buf, pos, ftype)


def _encode_field_header(fid: int, prev_id: int, ftype: int) -> bytes:
    delta = fid - prev_id
    if 1 <= delta <= 15:
        return bytes([(delta << 4) | ftype])
    # long form: type byte with zero delta nibble + zigzag field id
    zz = (fid << 1) ^ (fid >> 63) if fid < 0 else fid << 1
    out = bytearray([ftype])
    while True:
        if zz < 0x80:
            out.append(zz)
            return bytes(out)
        out.append((zz & 0x7F) | 0x80)
        zz >>= 7


def _transform_schema_element(buf: bytes, pos: int, out: bytearray) -> tuple[int, int]:
    """Copy one SchemaElement struct into ``out``, dropping a VARIANT
    logicalType field.  Returns (new_pos, n_dropped)."""
    last_id = 0  # decode-side delta chain
    last_kept = 0  # encode-side delta chain (diverges after a drop)
    dropped = 0
    while True:
        fid, ftype, vstart = _read_field_header(buf, pos, last_id)
        if fid is None:
            out.append(0)
            return vstart, dropped
        vend = _skip_value(buf, vstart, ftype)
        if fid == _LOGICAL_TYPE_FIELD and ftype == _STRUCT:
            member, _mtype, _mpos = _read_field_header(buf, vstart, 0)
            if member == _VARIANT_MEMBER:
                dropped += 1
                last_id = fid
                pos = vend
                continue  # drop header + value; last_kept unchanged
        if dropped == 0:
            out += buf[pos:vend]  # verbatim header + value
        else:
            out += _encode_field_header(fid, last_kept, ftype)
            out += buf[vstart:vend]
        last_id = fid
        last_kept = fid
        pos = vend


def patch_variant_footer(footer: bytes) -> tuple[bytes, int]:
    """Drop every VARIANT logicalType annotation from a serialized
    ``FileMetadata``; returns (patched_bytes, n_dropped).  n_dropped == 0
    means the footer carried no VARIANT annotation (returned verbatim)."""
    out = bytearray()
    pos = 0
    last_id = 0
    dropped = 0
    while True:
        fstart = pos
        fid, ftype, vstart = _read_field_header(footer, pos, last_id)
        if fid is None:
            out += footer[fstart:]
            return bytes(out), dropped
        last_id = fid
        if fid == _SCHEMA_FIELD and ftype == _LIST:
            head = footer[vstart]
            hpos = vstart + 1
            size, etype = head >> 4, head & 0xF
            if size == 15:
                size, hpos = _read_varint(footer, hpos)
            if etype != _STRUCT:
                raise FooterPatchError("FileMetadata.schema is not list<struct>")
            out += footer[fstart:hpos]  # field header + list header verbatim
            pos = hpos
            for _ in range(size):
                pos, d = _transform_schema_element(footer, pos, out)
                dropped += d
            # nothing after the schema list needs modification
            out += footer[pos:]
            return bytes(out), dropped
        pos = _skip_value(footer, vstart, ftype)
        out += footer[fstart:pos]


def read_patched_metadata(fh):
    """Read a parquet footer from an open random-access file, drop VARIANT
    annotations, and return a pyarrow ``FileMetaData`` parsed from the
    patched bytes.  Raises FooterPatchError when the file is not parquet
    or no VARIANT annotation was found (callers fall back to their typed
    refusal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    size = fh.size()
    if size < 12:
        raise FooterPatchError("file too small to be parquet")
    fh.seek(size - 8)
    tail = fh.read(8)
    flen = struct.unpack("<I", tail[:4])[0]
    if tail[4:] != b"PAR1" or flen + 12 > size:
        raise FooterPatchError("not a parquet footer")
    fh.seek(size - 8 - flen)
    footer = fh.read(flen)
    patched, dropped = patch_variant_footer(footer)
    if not dropped:
        raise FooterPatchError("no VARIANT annotation in footer")
    buf = b"PAR1" + patched + struct.pack("<I", len(patched)) + b"PAR1"
    return pq.read_metadata(pa.BufferReader(buf))
