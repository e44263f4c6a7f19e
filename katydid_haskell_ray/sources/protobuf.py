"""Minimal protobuf wire-format decoder producing Relapse forests.

From-scratch re-expression of the reference's protobuf tree builder
(/root/reference/src/Data/Katydid/Parser/Protobuf/Protobuf.hs:165-293,
Bytes.hs:47-114): decode wire bytes against a descriptor into the same tree
shape the grammar evaluates over.

Conventions preserved:
- field           -> Node(String(field_name), value children)
                     (Protobuf.hs:183 mergeRepeated non-repeated arm)
- repeated field  -> CONSECUTIVE occurrences grouped under one
                     Node(String(name), [Node(Int 0, ...), Node(Int 1, ...)])
                     (Protobuf.hs:171-183: grouping is per consecutive run,
                     an interleaved occurrence starts a new group)
- unknown fields  -> skipped by wire type, not an error (Protobuf.hs:199-214)
- scalar leaves   -> Int / Uint / Double / Bool / String / Bytes labels per
                     the declared field type; zigzag for sint*, little-endian
                     IEEE for fixed float/double (Bytes.hs)

Descriptors are plain dicts (the driver-side spec-compilation analog of
mkDescMap, Descriptor.hs:94-126)::

    {"fields": {1: {"name": "Name", "type": "string"},
                2: {"name": "Addr", "type": "message", "repeated": True,
                    "message": {...nested descriptor...}}}}

Supported types: int32 int64 sint32 sint64 uint32 uint64 bool string bytes
double float fixed64 sfixed64 fixed32 sfixed32 message.
"""

from __future__ import annotations

import struct

from katydid_haskell_ray.trees import Tree

_VARINT_TYPES = {"int32", "int64", "sint32", "sint64", "uint32", "uint64", "bool"}
_WIRE_VARINT, _WIRE_F64, _WIRE_LEN, _WIRE_F32 = 0, 1, 2, 5


class ProtoError(ValueError):
    pass


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ProtoError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ProtoError("varint too long")


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _scalar_leaf(ftype: str, raw, payload: bytes | None) -> Tree:
    if ftype in ("int32", "int64"):
        v = raw - (1 << 64) if raw >= (1 << 63) else raw  # two's complement
        return (("int", v), ())
    if ftype in ("sint32", "sint64"):
        return (("int", _zigzag(raw)), ())
    if ftype in ("uint32", "uint64"):
        return (("uint", raw), ())
    if ftype == "bool":
        return (("bool", bool(raw)), ())
    if ftype == "double":
        return (("double", struct.unpack("<d", raw)[0]), ())
    if ftype == "float":
        return (("double", float(struct.unpack("<f", raw)[0])), ())
    if ftype in ("fixed64",):
        return (("uint", struct.unpack("<Q", raw)[0]), ())
    if ftype in ("sfixed64",):
        return (("int", struct.unpack("<q", raw)[0]), ())
    if ftype in ("fixed32",):
        return (("uint", struct.unpack("<I", raw)[0]), ())
    if ftype in ("sfixed32",):
        return (("int", struct.unpack("<i", raw)[0]), ())
    if ftype == "string":
        return (("string", payload.decode("utf-8", errors="replace")), ())
    if ftype == "bytes":
        return (("bytes", payload), ())
    raise ProtoError(f"unsupported field type {ftype}")


def _parse_fields(data: bytes, desc: dict) -> list[tuple[int, list[Tree]]]:
    """Parse one message's wire bytes into (field_number, children) pairs in
    wire order; unknown fields are skipped (Protobuf.hs:199-206)."""
    fields = desc.get("fields", {})
    out: list[tuple[int, list[Tree]]] = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        fnum, wire = tag >> 3, tag & 7
        fdesc = fields.get(fnum)
        if wire == _WIRE_VARINT:
            raw, pos = _read_varint(data, pos)
            payload = None
        elif wire == _WIRE_F64:
            payload, raw = data[pos:pos + 8], None
            if len(payload) != 8:
                raise ProtoError("truncated fixed64")
            pos += 8
        elif wire == _WIRE_F32:
            payload, raw = data[pos:pos + 4], None
            if len(payload) != 4:
                raise ProtoError("truncated fixed32")
            pos += 4
        elif wire == _WIRE_LEN:
            ln, pos = _read_varint(data, pos)
            payload, raw = data[pos:pos + ln], None
            if len(payload) != ln:
                raise ProtoError("truncated length-delimited field")
            pos += ln
        else:
            raise ProtoError(f"unsupported wire type {wire}")
        if fdesc is None:
            continue  # unknown field: skipped, not an error
        ftype = fdesc["type"]
        if ftype == "message":
            children = decode_forest(payload, fdesc["message"])
        elif ftype in _VARINT_TYPES and wire == _WIRE_VARINT:
            children = [_scalar_leaf(ftype, raw, None)]
        elif ftype in ("double", "fixed64", "sfixed64") and wire == _WIRE_F64:
            children = [_scalar_leaf(ftype, payload, None)]
        elif ftype in ("float", "fixed32", "sfixed32") and wire == _WIRE_F32:
            children = [_scalar_leaf(ftype, payload, None)]
        elif ftype in ("string", "bytes") and wire == _WIRE_LEN:
            children = [_scalar_leaf(ftype, None, payload)]
        else:
            raise ProtoError(f"wire type {wire} does not match field "
                             f"type {ftype} for field {fnum}")
        out.append((fnum, list(children)))
    return out


def decode_forest(data: bytes, desc: dict) -> list[Tree]:
    """Wire bytes + descriptor -> forest (the `decode` entry point,
    Protobuf.hs:165-169)."""
    parsed = _parse_fields(data, desc)
    fields = desc.get("fields", {})
    out: list[Tree] = []
    i = 0
    while i < len(parsed):
        fnum, children = parsed[i]
        fdesc = fields[fnum]
        name = fdesc["name"]
        if fdesc.get("repeated"):
            # group CONSECUTIVE occurrences (Protobuf.hs:185-191)
            run = [children]
            j = i + 1
            while j < len(parsed) and parsed[j][0] == fnum:
                run.append(parsed[j][1])
                j += 1
            indexed = tuple((("int", idx), tuple(ch))
                            for idx, ch in enumerate(run))
            out.append((("string", name), indexed))
            i = j
        else:
            out.append((("string", name), tuple(children)))
            i += 1
    return out


# -- tiny encoder (for tests/fixtures only) ---------------------------------


def _write_varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_field(fnum: int, ftype: str, value) -> bytes:
    """Encode one field occurrence (test fixture helper)."""
    if ftype in _VARINT_TYPES:
        if ftype in ("sint32", "sint64"):
            value = (value << 1) ^ (value >> 63)
        elif ftype == "bool":
            value = int(value)
        return _write_varint(fnum << 3 | _WIRE_VARINT) + _write_varint(value)
    if ftype == "double":
        return _write_varint(fnum << 3 | _WIRE_F64) + struct.pack("<d", value)
    if ftype == "float":
        return _write_varint(fnum << 3 | _WIRE_F32) + struct.pack("<f", value)
    if ftype in ("string", "bytes", "message"):
        payload = value.encode() if isinstance(value, str) else value
        return (_write_varint(fnum << 3 | _WIRE_LEN)
                + _write_varint(len(payload)) + payload)
    raise ProtoError(f"encode: unsupported type {ftype}")
