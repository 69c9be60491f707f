"""Shredded-VARIANT reassembly for the deltapy scan leg (VERDICT r7 task 3).

Spark 4.1 writes variant columns SHREDDED by default
(``spark.sql.variant.writeShredding.enabled``): the parquet group grows a
``typed_value`` subtree per the parquet variant-shredding spec
(parquet-format VariantShredding.md), the ``value`` binary holds only the
residual (unshredded fields / type-mismatch rows), and a value/metadata-only
assembly would silently read nulls.  Until r7 deltapy REFUSED such files;
this module reconstructs them, closing the last reader asymmetry with the
JVM leg.

Approach: per row, decode the residual ``value`` (variant binary, field ids
resolved against the row's ``metadata`` dictionary), walk the typed_value
subtree (arrow arrays, accessed by absolute row index so nothing is
converted wholesale), merge per the spec:

- typed_value non-null, OBJECT shape: the object's fields are the union of
  the shredded field groups (a field is present iff its own ``value`` or
  ``typed_value`` is non-null) and the residual object's fields.
- typed_value non-null, LIST/primitive shape: the typed value wins;
  a non-null residual alongside is corrupt per spec and refuses loudly.
- typed_value null: the residual value is the value; both null at a field
  means the field is absent, both null at the top level is variant null.

The reconstructed tree is re-encoded as a fresh, spec-valid variant pair
(sorted metadata dictionary), which Spark's VariantType reads natively —
semantically identical to the JVM leg's reconstruction (to_json /
variant_get agree; the raw bytes may differ in dictionary layout, which the
encoding spec explicitly permits).

Spec references (both public, apache/parquet-format):
- VariantEncoding.md  — the value/metadata binary layout decoded+encoded here
- VariantShredding.md — the typed_value reconstruction rules
"""

from __future__ import annotations

import struct
from typing import Any

_MISSING = object()

# primitive type ids from VariantEncoding.md (basic type 0)
_T_NULL, _T_TRUE, _T_FALSE = 0, 1, 2
_T_INT8, _T_INT16, _T_INT32, _T_INT64 = 3, 4, 5, 6
_T_DOUBLE = 7
_T_DEC4, _T_DEC8, _T_DEC16 = 8, 9, 10
_T_DATE = 11
_T_TS_US_TZ, _T_TS_US_NTZ = 12, 13
_T_FLOAT = 14
_T_BINARY, _T_STRING = 15, 16
_T_TIME = 17
_T_TS_NS_TZ, _T_TS_NS_NTZ = 18, 19
_T_UUID = 20

#: node tag -> primitive type id (fixed-width payloads)
_TAG_TO_ID = {
    "int8": _T_INT8,
    "int16": _T_INT16,
    "int32": _T_INT32,
    "int64": _T_INT64,
    "double": _T_DOUBLE,
    "date": _T_DATE,
    "ts_us_tz": _T_TS_US_TZ,
    "ts_us_ntz": _T_TS_US_NTZ,
    "float": _T_FLOAT,
    "time": _T_TIME,
    "ts_ns_tz": _T_TS_NS_TZ,
    "ts_ns_ntz": _T_TS_NS_NTZ,
}
_ID_TO_TAG = {v: k for k, v in _TAG_TO_ID.items()}
_INT_WIDTH = {"int8": 1, "int16": 2, "int32": 4, "int64": 8}
_TS_WIDTH = {
    "date": 4,
    "ts_us_tz": 8,
    "ts_us_ntz": 8,
    "time": 8,
    "ts_ns_tz": 8,
    "ts_ns_ntz": 8,
}
_DEC_WIDTH = {"dec4": 4, "dec8": 8, "dec16": 16}
_DEC_ID = {"dec4": _T_DEC4, "dec8": _T_DEC8, "dec16": _T_DEC16}


class VariantCodecError(ValueError):
    """Corrupt or out-of-spec variant binary / shredding layout."""


def _le(b: bytes, pos: int, n: int, signed: bool = True) -> int:
    return int.from_bytes(b[pos : pos + n], "little", signed=signed)


# ---------------------------------------------------------------------------
# decode: variant binary -> tagged python tree
#   node = (tag, payload); object payload = dict[str, node], array = list
# ---------------------------------------------------------------------------
def decode_metadata(m: bytes) -> list[str]:
    """Metadata dictionary -> key list (index == field id)."""
    if not m:
        raise VariantCodecError("empty variant metadata")
    h = m[0]
    if h & 0x0F != 1:
        raise VariantCodecError(f"unsupported variant metadata version {h & 0x0F}")
    off_sz = ((h >> 6) & 3) + 1
    n = _le(m, 1, off_sz, signed=False)
    offs = [
        _le(m, 1 + off_sz * (1 + i), off_sz, signed=False) for i in range(n + 1)
    ]
    base = 1 + off_sz * (n + 2)
    return [m[base + offs[i] : base + offs[i + 1]].decode("utf-8") for i in range(n)]


def decode_value(b: bytes, pos: int, keys: list[str]) -> tuple:
    b0 = b[pos]
    basic, header = b0 & 3, b0 >> 2
    pos += 1
    if basic == 0:  # primitive
        t = header
        if t == _T_NULL:
            return ("null", None)
        if t == _T_TRUE:
            return ("bool", True)
        if t == _T_FALSE:
            return ("bool", False)
        for tag, w in _INT_WIDTH.items():
            if t == _TAG_TO_ID[tag]:
                return (tag, _le(b, pos, w))
        if t == _T_DOUBLE:
            return ("double", struct.unpack_from("<d", b, pos)[0])
        if t == _T_FLOAT:
            return ("float", struct.unpack_from("<f", b, pos)[0])
        if t in (_T_DEC4, _T_DEC8, _T_DEC16):
            tag = {_T_DEC4: "dec4", _T_DEC8: "dec8", _T_DEC16: "dec16"}[t]
            return (tag, (b[pos], _le(b, pos + 1, _DEC_WIDTH[tag])))
        if t == _T_DATE:
            return ("date", _le(b, pos, 4))
        for tag in ("ts_us_tz", "ts_us_ntz", "time", "ts_ns_tz", "ts_ns_ntz"):
            if t == _TAG_TO_ID[tag]:
                return (tag, _le(b, pos, 8))
        if t == _T_BINARY:
            ln = _le(b, pos, 4, signed=False)
            return ("binary", bytes(b[pos + 4 : pos + 4 + ln]))
        if t == _T_STRING:
            ln = _le(b, pos, 4, signed=False)
            return ("string", b[pos + 4 : pos + 4 + ln].decode("utf-8"))
        if t == _T_UUID:
            return ("uuid", bytes(b[pos : pos + 16]))
        raise VariantCodecError(f"unknown variant primitive type id {t}")
    if basic == 1:  # short string
        return ("string", b[pos : pos + header].decode("utf-8"))
    if basic == 2:  # object
        off_sz = (header & 3) + 1
        id_sz = ((header >> 2) & 3) + 1
        large = (header >> 4) & 1
        nsz = 4 if large else 1
        n = _le(b, pos, nsz, signed=False)
        pos += nsz
        ids = [_le(b, pos + i * id_sz, id_sz, signed=False) for i in range(n)]
        pos += n * id_sz
        offs = [
            _le(b, pos + i * off_sz, off_sz, signed=False) for i in range(n + 1)
        ]
        pos += (n + 1) * off_sz
        return (
            "object",
            {
                keys[ids[i]]: decode_value(b, pos + offs[i], keys)
                for i in range(n)
            },
        )
    # basic == 3: array
    off_sz = (header & 3) + 1
    large = (header >> 2) & 1
    nsz = 4 if large else 1
    n = _le(b, pos, nsz, signed=False)
    pos += nsz
    offs = [_le(b, pos + i * off_sz, off_sz, signed=False) for i in range(n + 1)]
    pos += (n + 1) * off_sz
    return ("array", [decode_value(b, pos + offs[i], keys) for i in range(n)])


# ---------------------------------------------------------------------------
# encode: tagged tree -> fresh (metadata, value) pair
# ---------------------------------------------------------------------------
def _collect_keys(node: tuple, acc: set) -> None:
    tag, v = node
    if tag == "object":
        for k, c in v.items():
            acc.add(k)
            _collect_keys(c, acc)
    elif tag == "array":
        for c in v:
            _collect_keys(c, acc)


def _nbytes(x: int) -> int:
    """Minimal byte width (1..4) holding unsigned x."""
    n = (x.bit_length() + 7) // 8
    return min(max(n, 1), 4)


def _enc_value(node: tuple, key_id: dict[str, int], out: bytearray) -> None:
    tag, v = node
    if tag == "null":
        out.append(_T_NULL << 2)
    elif tag == "bool":
        out.append((_T_TRUE if v else _T_FALSE) << 2)
    elif tag in _INT_WIDTH:
        out.append(_TAG_TO_ID[tag] << 2)
        out += int(v).to_bytes(_INT_WIDTH[tag], "little", signed=True)
    elif tag == "double":
        out.append(_T_DOUBLE << 2)
        out += struct.pack("<d", v)
    elif tag == "float":
        out.append(_T_FLOAT << 2)
        out += struct.pack("<f", v)
    elif tag in _DEC_WIDTH:
        scale, unscaled = v
        out.append(_DEC_ID[tag] << 2)
        out.append(scale)
        out += int(unscaled).to_bytes(_DEC_WIDTH[tag], "little", signed=True)
    elif tag in _TS_WIDTH:
        out.append(_TAG_TO_ID[tag] << 2)
        out += int(v).to_bytes(_TS_WIDTH[tag], "little", signed=True)
    elif tag == "uuid":
        out.append(_T_UUID << 2)
        out += v
    elif tag == "binary":
        out.append(_T_BINARY << 2)
        out += len(v).to_bytes(4, "little") + v
    elif tag == "string":
        enc = v.encode("utf-8")
        if len(enc) < 64:
            out.append(1 | (len(enc) << 2))  # short string
            out += enc
        else:
            out.append(_T_STRING << 2)
            out += len(enc).to_bytes(4, "little") + enc
    elif tag == "object":
        items = sorted(v.items())  # field ids sorted <=> keys lexicographic
        n = len(items)
        bufs: list[bytes] = []
        for _, child in items:
            cb = bytearray()
            _enc_value(child, key_id, cb)
            bufs.append(bytes(cb))
        offs = [0]
        for bb in bufs:
            offs.append(offs[-1] + len(bb))
        ids = [key_id[k] for k, _ in items]
        id_sz = _nbytes(max(ids) if ids else 0)
        off_sz = _nbytes(offs[-1])
        large = 1 if n > 0xFF else 0
        out.append(2 | ((large << 4 | (id_sz - 1) << 2 | (off_sz - 1)) << 2))
        out += n.to_bytes(4 if large else 1, "little")
        for fid in ids:
            out += fid.to_bytes(id_sz, "little")
        for o in offs:
            out += o.to_bytes(off_sz, "little")
        for bb in bufs:
            out += bb
    elif tag == "array":
        n = len(v)
        bufs = []
        for child in v:
            cb = bytearray()
            _enc_value(child, key_id, cb)
            bufs.append(bytes(cb))
        offs = [0]
        for bb in bufs:
            offs.append(offs[-1] + len(bb))
        off_sz = _nbytes(offs[-1])
        large = 1 if n > 0xFF else 0
        out.append(3 | ((large << 2 | (off_sz - 1)) << 2))
        out += n.to_bytes(4 if large else 1, "little")
        for o in offs:
            out += o.to_bytes(off_sz, "little")
        for bb in bufs:
            out += bb
    else:  # pragma: no cover - all tags enumerated above
        raise VariantCodecError(f"cannot encode variant node tag {tag!r}")


def encode_variant(node: tuple) -> tuple[bytes, bytes]:
    """Tagged tree -> (metadata, value) spec-valid variant binaries with a
    fresh sorted dictionary."""
    keys: set[str] = set()
    _collect_keys(node, keys)
    ordered = sorted(keys)  # code-point order == UTF-8 byte order
    key_id = {k: i for i, k in enumerate(ordered)}
    enc_keys = [k.encode("utf-8") for k in ordered]
    total = sum(len(k) for k in enc_keys)
    off_sz = _nbytes(max(total, len(ordered)))
    m = bytearray()
    m.append(((off_sz - 1) << 6) | (1 << 4) | 1)  # sorted, version 1
    m += len(ordered).to_bytes(off_sz, "little")
    o = 0
    m += o.to_bytes(off_sz, "little")
    for k in enc_keys:
        o += len(k)
        m += o.to_bytes(off_sz, "little")
    for k in enc_keys:
        m += k
    val = bytearray()
    _enc_value(node, key_id, val)
    return bytes(m), bytes(val)


# ---------------------------------------------------------------------------
# typed_value walkers: arrow arrays -> tagged nodes per row
# ---------------------------------------------------------------------------
def _prim_converter(t):
    """arrow type -> (tag builder)(arr, i) for shredded primitive leaves."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return lambda a, i: ("bool", a[i].as_py())
    for tag, pred in (
        ("int8", pa.types.is_int8),
        ("int16", pa.types.is_int16),
        ("int32", pa.types.is_int32),
        ("int64", pa.types.is_int64),
    ):
        if pred(t):
            return lambda a, i, tg=tag: (tg, a[i].as_py())
    if pa.types.is_float32(t):
        return lambda a, i: ("float", a[i].as_py())
    if pa.types.is_float64(t):
        return lambda a, i: ("double", a[i].as_py())
    if pa.types.is_decimal(t):
        tag = "dec4" if t.precision <= 9 else "dec8" if t.precision <= 18 else "dec16"
        s = t.scale
        return lambda a, i, tg=tag, sc=s: (
            tg,
            (sc, int(a[i].as_py().scaleb(sc))),
        )
    if pa.types.is_date32(t):
        return lambda a, i: ("date", a[i].value)
    if pa.types.is_timestamp(t):
        tag = {
            ("us", True): "ts_us_tz",
            ("us", False): "ts_us_ntz",
            ("ns", True): "ts_ns_tz",
            ("ns", False): "ts_ns_ntz",
        }.get((t.unit, t.tz is not None))
        if tag is None:
            raise VariantCodecError(
                f"unsupported shredded timestamp unit {t.unit}"
            )
        return lambda a, i, tg=tag: (tg, a[i].value)
    if pa.types.is_time64(t):
        return lambda a, i: ("time", a[i].value)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return lambda a, i: ("string", a[i].as_py())
    if pa.types.is_fixed_size_binary(t) and t.byte_width == 16:
        # parquet shredding stores uuid as FIXED_LEN_BYTE_ARRAY(16)
        return lambda a, i: ("uuid", a[i].as_py())
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return lambda a, i: ("binary", a[i].as_py())
    raise VariantCodecError(f"unsupported shredded typed_value leaf type {t}")


class _Shred:
    """Pre-resolved view of one shredding GROUP (value?/typed_value?) —
    rows addressed by absolute index; lists recurse into their flattened
    element group with translated indices."""

    def __init__(self, arr):
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.group = arr
        names = {arr.type.field(i).name for i in range(arr.type.num_fields)}
        self.value = arr.field("value") if "value" in names else None
        tv = arr.field("typed_value") if "typed_value" in names else None
        self.tv = tv
        self.kind = None
        if tv is not None:
            t = tv.type
            if pa.types.is_struct(t):
                self.kind = "object"
                self.fields = {
                    t.field(i).name: _Shred(tv.field(i))
                    for i in range(t.num_fields)
                }
            elif pa.types.is_list(t) or pa.types.is_large_list(t):
                self.kind = "array"
                self.elem = _Shred(tv.values)
                self.offsets = tv.offsets.to_numpy(zero_copy_only=False)
            else:
                self.kind = "primitive"
                self.conv = _prim_converter(t)

    def node(self, i: int, keys: list[str]):
        """Reconstruct row ``i`` -> tagged node, or _MISSING when both
        value and typed_value are null (field absent)."""
        tv_valid = self.tv is not None and self.tv[i].is_valid
        residual = None
        if self.value is not None and self.value[i].is_valid:
            residual = self.value[i].as_py()
        if tv_valid:
            if self.kind == "object":
                fields: dict[str, Any] = {}
                for name, fg in self.fields.items():
                    child = fg.node(i, keys)
                    if child is not _MISSING:
                        fields[name] = child
                if residual is not None:
                    extra = decode_value(residual, 0, keys)
                    if extra[0] != "object":
                        raise VariantCodecError(
                            "shredded object carries a non-object residual "
                            "value (corrupt per VariantShredding.md)"
                        )
                    for k, c in extra[1].items():
                        # spec forbids the same field in both; typed wins
                        fields.setdefault(k, c)
                return ("object", fields)
            if residual is not None:
                raise VariantCodecError(
                    "shredded non-object typed_value with a non-null value "
                    "alongside (corrupt per VariantShredding.md)"
                )
            if self.kind == "array":
                lo, hi = int(self.offsets[i]), int(self.offsets[i + 1])
                elems = []
                for j in range(lo, hi):
                    e = self.elem.node(j, keys)
                    # array elements cannot be missing; treat as null
                    elems.append(("null", None) if e is _MISSING else e)
                return ("array", elems)
            return self.conv(self.tv, i)
        if residual is not None:
            return decode_value(residual, 0, keys)
        return _MISSING


def assemble_shredded(col, at):
    """Shredded physical variant struct (metadata/value/typed_value) ->
    the tagged (value, metadata) arrow struct ``at`` expects, rebuilt per
    row.  Row-wise Python is acceptable here: this is the compatibility
    path for FOREIGN shredded files (the engine's own writers stage
    variant parquet unshredded), and the JVM scan leg remains the fast
    path for bulk reads."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    meta_arr = col.field("metadata")
    top = _Shred(col)
    n = len(col)
    metas: list[bytes | None] = [None] * n
    vals: list[bytes | None] = [None] * n
    key_cache: dict[bytes, list[str]] = {}
    for i in range(n):
        if not col[i].is_valid:
            continue
        mb = meta_arr[i].as_py()
        keys = key_cache.get(mb)
        if keys is None:
            keys = decode_metadata(mb)
            key_cache[mb] = keys
        node = top.node(i, keys)
        if node is _MISSING:
            # both null at the top level: out-of-spec; read as variant null
            node = ("null", None)
        m2, v2 = encode_variant(node)
        metas[i], vals[i] = m2, v2
    import pyarrow.compute as pc

    mask = pc.is_null(col)
    return pa.StructArray.from_arrays(
        [pa.array(vals, type=pa.binary()), pa.array(metas, type=pa.binary())],
        fields=[at.field(0), at.field(1)],
        mask=mask if pc.any(mask).as_py() else None,
    )
