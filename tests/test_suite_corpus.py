"""Vendored mini relapse-testsuite corpus, in the reference Suite layout.

The reference consumes an external conformance corpus
(/root/reference/test/Suite.hs:63-77,205-207,274-278): one directory per
case holding a concrete-syntax grammar (``relapse.txt``), a document file
(any basename != relapse with the format extension), and an empty marker
file named ``valid`` when the document is expected to match.  That corpus
is absent from the reference snapshot, so ``tests/data/relapse_suite``
vendors 40 freshly-authored cases covering the same feature axes (name
choices/negation/literals, contains, interleave+optional+star, concat
order, pattern-not, type asserts, regex/prefix leaves, function leaves
with typed lists, nested/array depth children, refs+decls, <empty>,
casts, comments, error-as-value).

Suite.hs runs every case through 4 algorithms (deriv, zip, map, vpa) and
requires agreement; this mirror runs the plain derivative, the memoized
zipper deriver, and the VPA deriver — all must agree with the marker.
"""

import glob
import json
import os

import pytest

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import relapse_parser as RP
from katydid_haskell_ray import trees as T

SUITE = os.path.join(os.path.dirname(__file__), "data", "relapse_suite",
                     "json")


def _cases():
    for d in sorted(glob.glob(os.path.join(SUITE, "*"))):
        if os.path.isdir(d):
            yield os.path.basename(d), d


def _read_case(d: str):
    """Mirror Suite.hs readJsonTest: grammar = the txt file with basename
    'relapse'; doc = the format file with any other basename; expected =
    exactly one file with basename 'valid' exists."""
    files = os.listdir(d)
    grammar_f = [f for f in files
                 if f.endswith(".txt") and os.path.splitext(f)[0] == "relapse"]
    doc_f = [f for f in files
             if f.endswith(".json") and os.path.splitext(f)[0] != "relapse"]
    assert len(grammar_f) == 1 and len(doc_f) == 1, d
    expected = sum(os.path.splitext(f)[0] == "valid" for f in files) == 1
    with open(os.path.join(d, grammar_f[0])) as f:
        grammar_src = f.read()
    with open(os.path.join(d, doc_f[0])) as f:
        doc_text = f.read()
    return grammar_src, doc_text, expected


@pytest.mark.parametrize("name,path", list(_cases()))
def test_suite_case_all_algorithms_agree(name, path):
    grammar_src, doc_text, expected = _read_case(path)
    g = RP.compile_relapse(grammar_src)
    forest = T.json_to_forest(doc_text)
    got_plain = D.validate_forest(g, forest)
    got_mem = D.MemDeriver(g).validate(forest)
    got_vpa = D.VpaDeriver(g).validate(forest)
    assert got_plain == got_mem == got_vpa == expected, (
        name, got_plain, got_mem, got_vpa, expected)


def test_suite_corpus_is_nontrivial():
    cases = list(_cases())
    assert len(cases) >= 30
    valids = sum(_read_case(p)[2] for _, p in cases)
    assert 10 <= valids <= len(cases) - 10  # both polarities well-covered


def test_pb_corpus_is_nontrivial():
    """r5: pb wire corpus >= 30 cases (nested descriptor maps, per-wire-
    type unknown-field skips, zigzag/fixed edges), both polarities."""
    cases = list(_dirs(PB_SUITE))
    assert len(cases) >= 30
    valids = sum(_read_layout_case(p, ".pb")[2] for _, p in cases)
    assert 5 <= valids <= len(cases) - 5


# ---------------------------------------------------------------------------
# xml/ and pb/ layout cases (Suite.hs readXMLTest / readProtoTest analogs)
# ---------------------------------------------------------------------------

XML_SUITE = os.path.join(os.path.dirname(SUITE), "xml")
PB_SUITE = os.path.join(os.path.dirname(SUITE), "pb")


def _dirs(root):
    for d in sorted(glob.glob(os.path.join(root, "*"))):
        if os.path.isdir(d):
            yield os.path.basename(d), d


def _read_layout_case(d: str, ext: str):
    files = os.listdir(d)
    grammar_f = [f for f in files
                 if f.endswith(".txt") and os.path.splitext(f)[0] == "relapse"]
    doc_f = [f for f in files
             if f.endswith(ext) and os.path.splitext(f)[0] != "relapse"]
    assert len(grammar_f) == 1 and len(doc_f) == 1, d
    expected = sum(os.path.splitext(f)[0] == "valid" for f in files) == 1
    with open(os.path.join(d, grammar_f[0])) as f:
        grammar_src = f.read()
    return grammar_src, os.path.join(d, doc_f[0]), expected


def _agree(grammar_src: str, forest, expected, name):
    g = RP.compile_relapse(grammar_src)
    got_plain = D.validate_forest(g, forest)
    got_mem = D.MemDeriver(g).validate(forest)
    got_vpa = D.VpaDeriver(g).validate(forest)
    assert got_plain == got_mem == got_vpa == expected, (
        name, got_plain, got_mem, got_vpa, expected)


@pytest.mark.parametrize("name,path", list(_dirs(XML_SUITE)))
def test_suite_xml_case_all_algorithms_agree(name, path):
    """XML layout (Suite.hs:readXMLTest): numeric tags/text become Int,
    attributes are omitted (reference Xml.hs:41 TODO parity)."""
    grammar_src, doc_path, expected = _read_layout_case(path, ".xml")
    with open(doc_path) as f:
        forest = T.xml_to_forest(f.read())
    _agree(grammar_src, forest, expected, name)


@pytest.mark.parametrize("name,path", list(_dirs(PB_SUITE)))
def test_suite_pb_case_all_algorithms_agree(name, path):
    """Protobuf WIRE layout: each case carries raw wire bytes (doc.pb) +
    a descriptor (desc.json); covers varint/zigzag/string/double/nested
    message, repeated-field Int indexing with consecutive-run grouping
    (Protobuf.hs:185-191), and unknown-field skipping."""
    import json as _json

    from katydid_haskell_ray.sources import protobuf as PB

    grammar_src, doc_path, expected = _read_layout_case(path, ".pb")

    def intkeys(desc):
        return {"fields": {
            int(k): ({**v, "message": intkeys(v["message"])}
                     if v.get("message") else v)
            for k, v in desc["fields"].items()}}

    with open(os.path.join(path, "desc.json")) as f:
        desc = intkeys(_json.load(f))
    with open(doc_path, "rb") as f:
        forest = tuple(PB.decode_forest(f.read(), desc))
    _agree(grammar_src, forest, expected, name)


def test_layout_corpora_both_polarities():
    for root, ext in ((XML_SUITE, ".xml"), (PB_SUITE, ".pb")):
        cases = list(_dirs(root))
        assert len(cases) >= 10
        valids = sum(_read_layout_case(p, ext)[2] for _, p in cases)
        assert 2 <= valids <= len(cases) - 2
