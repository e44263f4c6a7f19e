"""Property-based cross-validation: plain, memoized, and VPA evaluators must
agree on random grammars x random documents — the reference's all-algorithms-
agree strategy (/root/reference/test/Suite.hs:46-61) with generated corpora
instead of the golden testsuite (which is not vendored in the snapshot)."""

import json

from hypothesis import given, settings, strategies as st

from katydid_haskell_ray import derive as D
from katydid_haskell_ray import spec as S
from katydid_haskell_ray import trees as T

NAMES = ["a", "b", "c"]
INTS = [0, 1, 5]
STRS = ["x", "y"]


def leaf_exprs():
    return st.one_of(
        st.just(True),
        st.sampled_from([{"op": "==", "value": {"int": i}} for i in INTS]),
        st.sampled_from([{"op": ">=", "value": {"int": i}} for i in INTS]),
        st.sampled_from([{"op": "==", "value": {"string": s}} for s in STRS]),
        st.sampled_from([{"op": "::", "value": {"int": 0}},
                         {"op": "::", "value": {"string": ""}}]),
        st.sampled_from([{"func": "not", "args": [
            {"func": "eq", "args": [{"var": "int"}, {"int": i}]}]} for i in INTS]),
    )


def patterns(depth):
    base = st.one_of(
        st.just("empty"),
        st.just("zany"),
        st.builds(lambda e: {"leaf": e}, leaf_exprs()),
        st.builds(lambda n, e: {"field": n, "child": {"leaf": e}},
                  st.sampled_from(NAMES), leaf_exprs()),
    )
    if depth <= 0:
        return base
    sub = patterns(depth - 1)
    return st.one_of(
        base,
        st.builds(lambda n, p: {"field": n, "child": p}, st.sampled_from(NAMES), sub),
        st.builds(lambda ps: {"or": ps}, st.lists(sub, min_size=2, max_size=3)),
        st.builds(lambda ps: {"and": ps}, st.lists(sub, min_size=2, max_size=3)),
        st.builds(lambda p: {"not": p}, sub),
        st.builds(lambda ps: {"concat": ps}, st.lists(sub, min_size=2, max_size=3)),
        st.builds(lambda ps: {"interleave": ps}, st.lists(sub, min_size=2, max_size=2)),
        st.builds(lambda p: {"star": p}, sub),
        st.builds(lambda p: {"optional": p}, sub),
        st.builds(lambda p: {"contains": p}, sub),
    )


def json_values(depth):
    base = st.one_of(st.sampled_from(INTS), st.sampled_from(STRS),
                     st.booleans(), st.none(), st.just(2.5))
    if depth <= 0:
        return base
    sub = json_values(depth - 1)
    return st.one_of(
        base,
        st.lists(sub, max_size=3),
        st.dictionaries(st.sampled_from(NAMES), sub, max_size=3),
    )


@settings(max_examples=250, deadline=None)
@given(pat=patterns(2), doc=json_values(2))
def test_all_evaluators_agree(pat, doc):
    try:
        g = S.compile_spec({"main": pat})
    except S.SpecError:
        return  # e.g. malformed combinator list; construction parity only
    forest = T.json_value_to_forest(doc)
    plain = D.validate_forest(g, forest)
    memo = D.MemDeriver(g).validate(forest)
    vpa = D.VpaDeriver(g).validate(forest)
    assert plain == memo == vpa, (
        f"disagreement on {json.dumps(pat)} / {doc!r}: "
        f"plain={plain} memo={memo} vpa={vpa}")


@settings(max_examples=60, deadline=None)
@given(pat=patterns(1), docs=st.lists(json_values(2), min_size=1, max_size=6))
def test_memo_reuse_across_documents(pat, docs):
    """One warm MemDeriver over many docs equals fresh evaluation per doc
    (the shared-Mem filter path, Relapse.hs:65-70)."""
    try:
        g = S.compile_spec({"main": pat})
    except S.SpecError:
        return
    m = D.MemDeriver(g)
    warm = [m.validate(T.json_value_to_forest(d)) for d in docs]
    cold = [D.MemDeriver(g).validate(T.json_value_to_forest(d)) for d in docs]
    assert warm == cold


# -- colplan fragment: lowered plan vs row-as-forest oracle ------------------

import numpy as np
import pyarrow as pa

from katydid_haskell_ray import colplan as CP

_COLS = {"w": "int", "fmt": "string", "flag": "bool"}


def _flat_table():
    return pa.table({
        "w": pa.array([0, 1, 5, None], type=pa.int64()),
        "fmt": pa.array(["x", "y", None, "x"]),
        "flag": pa.array([True, None, False, True]),
    })


def leaf_for(col):
    t = _COLS[col]
    if t == "int":
        consts = [{"int": i} for i in INTS]
    elif t == "string":
        consts = [{"string": s} for s in STRS]
    else:
        consts = [{"bool": True}, {"bool": False}]
    return st.one_of(
        st.just("zany"),
        st.just("empty"),
        st.sampled_from([{"leaf": {"op": "==", "value": c}} for c in consts]),
        st.sampled_from([{"not": {"leaf": {"op": "==", "value": c}}}
                         for c in consts]),
        st.sampled_from([{"or": [{"leaf": {"op": "==", "value": c}}, "empty"]}
                         for c in consts]),
    )


def flat_grammars():
    def build(leaves, opts, shape):
        fields = [{"field": c, "child": lf} for c, lf in zip(_COLS, leaves)]
        fields = [({"optional": f} if o else f)
                  for f, o in zip(fields, opts)]
        if shape == "contains":
            return {"main": {"contains": fields[0]}}
        return {"main": {"interleave": fields + [{"star": "zany"}]}}
    return st.builds(build, st.tuples(*[leaf_for(c) for c in _COLS]),
                     st.tuples(*[st.booleans() for _ in _COLS]),
                     st.sampled_from(["interleave", "contains"]))


@settings(max_examples=120, deadline=None)
@given(doc=flat_grammars())
def test_colplan_matches_tree_oracle(doc):
    g = S.compile_spec(doc)
    b = _flat_table()
    try:
        plan = CP.lower_grammar(g, b.schema)
    except CP.NotLowerable:
        return  # e.g. whole grammar folded to emptyset
    got = CP.evaluate_plan(plan, b)
    m = D.MemDeriver(g)
    exp = np.array([m.validate(T.row_to_forest(r, b.schema))
                    for r in b.to_pylist()])
    assert (got == exp).all(), f"{doc}: {got} != {exp}"


@settings(max_examples=15, deadline=None)
@given(
    keys=st.lists(st.one_of(st.integers(-5, 5), st.none()),
                  min_size=1, max_size=60),
    nb=st.integers(1, 7),
)
def test_modular_exchange_equals_pandas_groupby(ray_session, keys, nb):
    """Property: the modular bucketed exchange reproduces a plain pandas
    groupby-sum for any key multiset (nulls included) at any bucket
    count."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from katydid_haskell_ray.stages.exchange import bucket_map_groups
    from katydid_haskell_ray.stages.keys import add_hash_fn

    df = pd.DataFrame({"k": pd.array(keys, dtype="Int64"),
                       "v": np.arange(len(keys), dtype=np.int64)})
    ds = (ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
          .map_batches(add_hash_fn("k"), batch_format="pyarrow"))
    got = bucket_map_groups(
        ds, lambda g: (g.drop(columns="__bucket")
                       .groupby("k", as_index=False, dropna=False)["v"]
                       .sum()),
        n_buckets=nb, modular=True,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.groupby("k", as_index=False, dropna=False)["v"].sum()
            .sort_values("k").reset_index(drop=True))
    assert got["v"].tolist() == want["v"].tolist()
    assert got["k"].isna().sum() == want["k"].isna().sum()
    assert (got["k"].dropna().tolist() == want["k"].dropna().tolist())
