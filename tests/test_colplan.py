"""Column-plan lowering: vectorized grammar evaluation must agree row-for-row
with the scalar derivative evaluator over the row_to_forest view — the
per-algorithm cross-validation strategy of the reference
(/root/reference/test/Suite.hs:46-61) applied to the lowered plan."""

import numpy as np
import pyarrow as pa
import pytest

from katydid_haskell_ray import colplan as CP
from katydid_haskell_ray import derive as D
from katydid_haskell_ray import spec as S
from katydid_haskell_ray import trees as T


def batch():
    return pa.table({
        "w": pa.array([8, 0, None, 40000, 12], type=pa.int32()),
        "fmt": pa.array(["png", "bmp", "gif", None, "png"]),
        "caption": pa.array(["a cat", "", "dog", "x", None]),
    })


def oracle(g, b):
    m = D.MemDeriver(g)
    return np.array([m.validate(T.row_to_forest(r, b.schema))
                     for r in b.to_pylist()])


def check(doc, expect_lowered=True):
    g = S.compile_spec(doc)
    b = batch()
    try:
        plan = CP.lower_grammar(g, b.schema)
        lowered = True
        got = CP.evaluate_plan(plan, b)
    except CP.NotLowerable:
        lowered = False
        got = CP.validate_batch(g, b)
    assert lowered == expect_lowered, f"lowered={lowered}"
    exp = oracle(g, b)
    assert (got == exp).all(), f"{got} != {exp} for {doc}"
    return got


FIELD_W = {"field": "w", "child": {"leaf": {"op": ">=", "value": {"int": 1}}}}
FIELD_FMT = {"field": "fmt", "child": {"leaf": {
    "func": "contains", "args": [{"var": "string"},
                                 {"list_string": ["png", "bmp"]}]}}}
FIELD_CAP = {"field": "caption", "child": "zany"}


def test_interleave_plan():
    got = check({"main": {"interleave": [FIELD_W, FIELD_FMT, FIELD_CAP]}})
    assert list(got) == [True, False, False, False, True]


def test_partial_coverage_with_star():
    doc = {"main": {"interleave": [FIELD_W, {"star": "zany"}]}}
    # a bare zany-star covers the unnamed columns
    got = check(doc)
    assert list(got) == [True, False, False, True, True]


def test_empty_leaf_means_null():
    doc = {"main": {"interleave": [
        {"field": "caption", "child": "empty"},  # caption must be NULL
        {"star": "zany"},
    ]}}
    got = check(doc)
    assert list(got) == [False, False, False, False, True]


def test_boolean_closure_on_leaf():
    doc = {"main": {"interleave": [
        {"field": "fmt", "child": {"or": [
            {"leaf": {"op": "==", "value": {"string": "png"}}},
            {"leaf": {"op": "==", "value": {"string": "gif"}}},
        ]}},
        {"star": "zany"},
    ]}}
    got = check(doc)
    assert list(got) == [True, False, True, False, True]
    doc2 = {"main": {"interleave": [
        {"field": "fmt", "child": {"not": {"leaf": {"op": "==", "value": {"string": "png"}}}}},
        {"star": "zany"},
    ]}}
    # not(png-leaf): matches bmp/gif leaves AND the null cell (empty forest
    # is not matched by the leaf, so its negation matches)
    got2 = check(doc2)
    assert list(got2) == [False, True, True, True, False]


def test_missing_columns_not_lowerable():
    doc = {"main": FIELD_W}  # names only w, no star: outside the fragment
    check(doc, expect_lowered=False)


def test_nested_child_not_lowerable_but_falls_back():
    doc = {"main": {"interleave": [
        {"field": "caption", "child": {"field": "inner", "child": "zany"}},
        {"star": "zany"},
    ]}}
    check(doc, expect_lowered=False)


def test_wrong_typed_leaf_errors_like_tree():
    # $int leaf over the string fmt column: label var errors on every cell
    doc = {"main": {"interleave": [
        {"field": "fmt", "child": {"leaf": {"op": "==", "value": {"int": 3}}}},
        {"star": "zany"},
    ]}}
    got = check(doc)
    assert not got.any()


def test_concat_non_trailing_star_not_lowerable():
    # concat[star(zany), F_w]: the star could absorb the w column node, so
    # "covers the rest" is position-dependent in a Concat — tree path only
    # (ADVICE r1: lowered plan wrongly accepted rows here).
    doc = {"main": {"concat": [{"star": "zany"}, FIELD_W]}}
    check(doc, expect_lowered=False)
    # leading bare zany has the same absorption behavior
    doc2 = {"main": {"concat": ["zany", FIELD_W]}}
    check(doc2, expect_lowered=False)


def test_optional_field_with_covering_star():
    # interleave[optional(F_w), star(zany)]: the star can absorb a
    # NON-matching w node while Optional matches empty, so w is
    # unconstrained — every row valid (ADVICE r1: lowered path wrongly
    # rejected rows the derivative accepts).
    doc = {"main": {"interleave": [
        {"optional": FIELD_W}, {"star": "zany"}]}}
    got = check(doc)
    assert got.all()


def test_optional_field_without_star_equals_field():
    # with NO covering star, Optional must consume its node: = plain field
    doc = {"main": {"interleave": [
        {"optional": FIELD_W}, FIELD_FMT, FIELD_CAP]}}
    got = check(doc)
    assert list(got) == [True, False, False, False, True]


def test_concat_optional_with_star_falls_back():
    # Concat + Optional + covering star: emptiness shifts the match left,
    # position-dependent — conservative tree path, must still agree
    doc = {"main": {"concat": [
        {"optional": FIELD_W}, FIELD_FMT, {"star": "zany"}]}}
    check(doc, expect_lowered=False)


def test_concat_order_matches_schema():
    doc = {"main": {"concat": [FIELD_W, FIELD_FMT, FIELD_CAP]}}
    got = check(doc)  # schema order is w, fmt, caption -> lowerable
    assert list(got) == [True, False, False, False, True]
    # reversed order is NOT schema order: falls back, still agrees
    doc2 = {"main": {"concat": [FIELD_CAP, FIELD_FMT, FIELD_W]}}
    check(doc2, expect_lowered=False)


def test_contains_field_lowered():
    # .w:>=1  — Contains(Node): the named column must match, rest free
    check({"main": {"contains": FIELD_W}}, expect_lowered=True)
    # optional-wrapped / unknown column / non-node inner: tree path
    check({"main": {"contains": {"optional": FIELD_W}}}, expect_lowered=False)
    check({"main": {"contains": {"field": "nope", "child": "zany"}}},
          expect_lowered=False)
    check({"main": {"contains": {"concat": [FIELD_W, FIELD_FMT]}}},
          expect_lowered=False)


def test_meta_plus_bytes_grammar_equals_full():
    """The metadata/bytes scan split must be semantics-preserving: the
    full IMAGES_GRAMMAR verdict equals the conjunction of the
    bytes-pruned IMAGES_META_GRAMMAR verdict and the bytes-only
    conjunct, on a corpus with injected anomalies."""
    import numpy as np

    from katydid_haskell_ray import colplan as CP
    from katydid_haskell_ray import spec as S
    from katydid_haskell_ray.pipelines.validate import (
        IMAGES_GRAMMAR, IMAGES_META_GRAMMAR, METADATA_COLUMNS)
    from katydid_haskell_ray.sources import synth_images as SI

    batch = SI.make_batch(0, 400)  # includes anomaly rows
    full = CP.validate_batch(S.compile_spec(IMAGES_GRAMMAR), batch)
    meta = CP.validate_batch(S.compile_spec(IMAGES_META_GRAMMAR),
                             batch.select(METADATA_COLUMNS))
    bytes_g = {"main": {"interleave": [
        {"field": "bytes", "child": {"leaf": {
            "func": "gt",
            "args": [{"func": "length", "args": [{"var": "bytes"}]},
                     {"int": 8}]}}},
        {"star": "zany"}]}}
    byt = CP.validate_batch(S.compile_spec(bytes_g),
                            batch.select(["image_id", "bytes"]))
    assert (full == (meta & byt)).all()
    assert not full.all() and full.any()  # anomalies present, both ways
