"""Tree model: labeled ordered trees built from JSON text or Arrow values.

The reference validates forests of labeled trees (Tree typeclass,
/root/reference/src/Data/Katydid/Parser/Parser.hs:34-36); a "document" is a
forest, not a single tree (Relapse.hs:10-14).  This module reproduces the
reference's encoding conventions:

JSON (/root/reference/src/Data/Katydid/Parser/Json.hs:39-58):
- object  -> one child node per key, key as String label, value's forest as
  that node's children
- array   -> children labeled with Int indexes 0,1,2,...; each index node's
  children are the element's forest
- null    -> NO node at all
- number  -> Int if integral else Double
- scalars -> leaf nodes

Arrow (new, for nested struct/list columns — SURVEY.md §1.3): a struct value
behaves like a JSON object (field order), a list like a JSON array, null like
JSON null; signed ints -> Int, unsigned -> Uint, floats -> Double, str ->
String, bytes -> Bytes.
"""

from __future__ import annotations

import json
import math
from typing import Any

import pyarrow as pa

# A tree node is (label, children); label is (vtype, value); forest = tuple.
Label = tuple  # (vtype, value)
Tree = tuple  # (Label, tuple[Tree, ...])


def leaf(vtype: str, value: Any) -> Tree:
    return ((vtype, value), ())


def node(vtype: str, value: Any, children) -> Tree:
    return ((vtype, value), tuple(children))


def _scalar_label(v: Any) -> Label:
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if v.is_integer() and not math.isinf(v):
            # JSRational with denominator 1 -> Int (Json.hs:42-44)
            return ("int", int(v))
        return ("double", v)
    if isinstance(v, str):
        return ("string", v)
    if isinstance(v, bytes):
        return ("bytes", v)
    raise TypeError(f"unsupported scalar {type(v)}")


def json_value_to_forest(v: Any) -> tuple[Tree, ...]:
    """uValue (Json.hs:39-47)."""
    if v is None:
        return ()
    if isinstance(v, dict):
        return tuple(node("string", k, json_value_to_forest(val))
                     for k, val in v.items())
    if isinstance(v, list):
        return tuple(node("int", i, json_value_to_forest(el))
                     for i, el in enumerate(v))
    return ((_scalar_label(v), ()),)


def json_to_forest(text: str) -> tuple[Tree, ...]:
    """decodeJSON (Json.hs:34-37). Raises ValueError on malformed input."""
    return json_value_to_forest(json.loads(text))


def arrow_value_to_forest(v: Any, typ: pa.DataType) -> tuple[Tree, ...]:
    """Convert one (python-ified) Arrow cell to a forest with JSON-like
    conventions; the Arrow type disambiguates Int/Uint/Double/Bytes."""
    if v is None:
        return ()
    if pa.types.is_struct(typ):
        out = []
        for field in typ:
            out.append(node("string", field.name,
                            arrow_value_to_forest(v.get(field.name), field.type)))
        return tuple(out)
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return tuple(node("int", i, arrow_value_to_forest(el, typ.value_type))
                     for i, el in enumerate(v))
    if pa.types.is_map(typ):
        return tuple(node("string", k, arrow_value_to_forest(val, typ.item_type))
                     for k, val in v)
    if pa.types.is_boolean(typ):
        return (leaf("bool", v),)
    if pa.types.is_signed_integer(typ):
        return (leaf("int", v),)
    if pa.types.is_unsigned_integer(typ):
        return (leaf("uint", v),)
    if pa.types.is_floating(typ):
        return (leaf("double", float(v)),)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return (leaf("string", v),)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return (leaf("bytes", v),)
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ):
        return (leaf("string", str(v)),)
    raise TypeError(f"unsupported arrow type {typ}")


def row_to_forest(row: dict, schema: pa.Schema,
                  columns: list[str] | None = None) -> tuple[Tree, ...]:
    """View a flat table row as a forest: one String-labeled node per column
    (the record→tree view of SURVEY.md §1.3)."""
    out = []
    for name in columns or schema.names:
        typ = schema.field(name).type
        out.append(node("string", name, arrow_value_to_forest(row.get(name), typ)))
    return tuple(out)


def _parse_text_label(s: str) -> Label:
    """XML text/tag -> label: Int if it reads as an integer, else String
    (/root/reference/src/Data/Katydid/Parser/Xml.hs:46-47 parseLabel)."""
    t = s.strip()
    if t and (t.lstrip("+-").isdigit()):
        try:
            return ("int", int(t))
        except ValueError:
            pass
    return ("string", s)


def xml_to_forest(text: str) -> tuple[Tree, ...]:
    """decodeXML analog (/root/reference/src/Data/Katydid/Parser/Xml.hs):
    element -> node labeled with the tag (numeric tags become Int), children
    = child elements + non-empty text nodes (numeric text becomes Int).
    Attributes are not emitted, matching the reference's behavior
    (Xml.hs:41: attrs are an acknowledged TODO there)."""
    import xml.etree.ElementTree as ET

    def conv(el) -> Tree:
        children: list[Tree] = []
        if el.text and el.text.strip():
            children.append((_parse_text_label(el.text), ()))
        for ch in el:
            children.append(conv(ch))
            if ch.tail and ch.tail.strip():
                children.append((_parse_text_label(ch.tail), ()))
        return (_parse_text_label(el.tag), tuple(children))

    # parse as a forest: wrap in a synthetic root, return its children
    root = ET.fromstring(f"<_forest_>{text}</_forest_>")
    return tuple(conv(ch) for ch in root)
