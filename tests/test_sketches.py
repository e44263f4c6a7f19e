"""Sketch accuracy + mergeability tests (SURVEY.md §2.6 additions)."""

import numpy as np
import pyarrow as pa

from katydid_haskell_ray.state import sketches as S


def test_hash64_deterministic_across_types():
    a = S.hash64_array(pa.array(["x", "y", "z"]))
    b = S.hash64_array(["x", "y", "z"])
    assert (a == b).all()
    c = S.hash64_array(pa.chunked_array([pa.array([1, 2]), pa.array([3])]))
    assert len(c) == 3 and c.dtype == np.uint64


def test_hash64_null_containing_batch_matches_null_free():
    """A nullable int64 batch must hash its non-null values exactly like a
    null-free batch of the same column (the to_pandas float64 round-trip
    would re-key them), and nulls map to the fixed sentinel."""
    clean = S.hash64_array(pa.array([5, 7, 9], type=pa.int64()))
    mixed = S.hash64_array(pa.array([5, None, 7, 9, None], type=pa.int64()))
    assert (mixed[[0, 2, 3]] == clean).all()
    assert mixed[1] == mixed[4] == S._NULL_HASH
    # same contract for strings and chunked arrays
    sc = S.hash64_array(pa.array(["a", "b"]))
    sm = S.hash64_array(pa.chunked_array(
        [pa.array(["a", None]), pa.array(["b"])]))
    assert sm[0] == sc[0] and sm[2] == sc[1] and sm[1] == S._NULL_HASH


def test_hll_accuracy_and_merge():
    vals = S.hash64_array(np.arange(200_000))  # full-range 64-bit hashes
    true_card = len(np.unique(vals))
    h1, h2 = S.HLL(), S.HLL()
    h1.add_hashes(vals[:100_000])
    h2.add_hashes(vals[100_000:])
    h1.merge(h2)
    est = h1.estimate()
    assert abs(est - true_card) / true_card < 0.03, (est, true_card)
    # merge of identical halves == union (idempotent registers)
    h3 = S.HLL().add_hashes(vals)
    assert abs(h3.estimate() - est) / true_card < 0.02


def test_hll_small_range_linear_counting():
    h = S.HLL().add_hashes(S.hash64_array([f"k{i}" for i in range(100)]))
    assert abs(h.estimate() - 100) < 5


def test_kll_quantiles_and_merge():
    rng = np.random.RandomState(2)
    data = rng.normal(50, 10, size=100_000)
    k1, k2 = S.KLL(), S.KLL()
    k1.add_values(data[:50_000])
    k2.add_values(data[50_000:])
    k1.merge(k2)
    qs = np.array([0.1, 0.5, 0.9])
    est = k1.quantiles(qs)
    true = np.quantile(data, qs)
    assert np.abs(est - true).max() < 1.5, (est, true)
    assert k1.count == 100_000


def test_quantile_drift_detects_shift():
    rng = np.random.RandomState(3)
    base = S.KLL().add_values(rng.normal(100, 5, 50_000))
    same = S.KLL().add_values(rng.normal(100, 5, 50_000))
    shifted = S.KLL().add_values(rng.normal(130, 5, 50_000))
    assert S.quantile_drift(base, same) < 0.05
    assert S.quantile_drift(base, shifted) > 0.15


def test_bloom_membership():
    keys = S.hash64_array([f"tok{i}" for i in range(50_000)])
    probe_in = S.hash64_array([f"tok{i}" for i in range(0, 50_000, 7)])
    probe_out = S.hash64_array([f"miss{i}" for i in range(20_000)])
    b = S.Bloom(50_000, fp_rate=0.01).add_hashes(keys)
    assert b.contains_hashes(probe_in).all()  # no false negatives, ever
    fp = b.contains_hashes(probe_out).mean()
    assert fp < 0.03, fp
    # merge: union of two filters built with the same geometry
    b1 = S.Bloom(50_000, 0.01).add_hashes(keys[:25_000])
    b2 = S.Bloom(50_000, 0.01).add_hashes(keys[25_000:])
    b1.merge(b2)
    assert b1.contains_hashes(probe_in).all()


def test_minhash_jaccard_estimate():
    mh = S.MinHasher(k=256)
    a = S.hash64_array([f"sh{i}" for i in range(1000)])
    b = S.hash64_array([f"sh{i}" for i in range(500, 1500)])  # J = 1/3
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    assert abs(est - 1 / 3) < 0.08, est
    # identical sets -> identical signatures
    assert (mh.signature(a) == mh.signature(a.copy())).all()


def test_simhash_similarity():
    toks_a = S.hash64_array([f"w{i}" for i in range(100)])
    toks_b = S.hash64_array([f"w{i}" for i in range(95)] + ["x1", "x2", "x3", "x4", "x5"])
    toks_c = S.hash64_array([f"z{i}" for i in range(100)])
    ha, hb, hc = (S.simhash64(t) for t in (toks_a, toks_b, toks_c))
    near = S.hamming_distance64(np.array([ha]), hb)[0]
    far = S.hamming_distance64(np.array([ha]), hc)[0]
    assert near < 12 < far, (near, far)


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert list(S.popcount64(x)) == [0, 1, 2, 64]


def test_tree_reduce_sketch_merge(ray_session):
    """tree_reduce over many HLL partials equals sequential merging."""
    import numpy as np
    from katydid_haskell_ray.state.reduce import tree_reduce

    parts = []
    for i in range(100):
        h = S.HLL()
        h.add_hashes(S.hash64_array([f"k{i}-{j}" for j in range(500)]))
        parts.append(h)
    seq = S.HLL()
    for p in parts:
        seq.merge(p)
    treed = tree_reduce([S.HLL().merge(p) for p in parts],
                        lambda a, b: a.merge(b), branch=4)
    assert (treed.regs == seq.regs).all()
    # small input: local path
    small = tree_reduce(parts[:3], lambda a, b: a.merge(b))
    assert small.estimate() > 0


def test_merge_stats_associative():
    import pyarrow as pa
    from katydid_haskell_ray.stages import stats as ST

    t1 = pa.table({"x": pa.array([1.0, 2.0, None]), "k": pa.array(["a", "b", "a"])})
    t2 = pa.table({"x": pa.array([10.0, 20.0]), "k": pa.array(["c", "a"])})
    fn = ST.StatsPartials(numeric=("x",), keys=("k",))
    s1 = ST.merge_partials(fn(t1), finalize=False)
    s2 = ST.merge_partials(fn(t2), finalize=False)
    merged = ST.finalize_stats(ST.merge_stats(s1, s2))
    both = ST.merge_partials(pa.concat_tables([fn(t1), fn(t2)]))
    assert merged["x"]["count"] == both["x"]["count"] == 5
    assert merged["x"]["min"] == both["x"]["min"] == 1.0
    assert merged["x"]["max"] == both["x"]["max"] == 20.0
    assert merged["x"]["nulls"] == 1
    assert round(merged["k"]["cardinality"]) == round(both["k"]["cardinality"]) == 3


def test_tdigest_accuracy_and_merge():
    import numpy as np
    from katydid_haskell_ray.state.sketches import TDigest

    rng = np.random.default_rng(0)
    data = rng.exponential(50, 200_000)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    exact = np.quantile(data, qs)

    td = TDigest(100)
    for chunk in np.array_split(data, 40):
        td.add_values(chunk)
    rel = np.abs(td.quantiles(qs) - exact) / np.maximum(exact, 1e-9)
    assert (rel < 0.08).all(), rel

    # merging two halves approximates the whole
    a, b = TDigest(100), TDigest(100)
    for chunk in np.array_split(data[:100_000], 20):
        a.add_values(chunk)
    for chunk in np.array_split(data[100_000:], 20):
        b.add_values(chunk)
    a.merge(b)
    assert a.count == 200_000
    rel2 = np.abs(a.quantiles(qs) - exact) / np.maximum(exact, 1e-9)
    assert (rel2 < 0.08).all(), rel2


def test_tdigest_deterministic_and_pickle_safe():
    import pickle
    import numpy as np
    from katydid_haskell_ray.state.sketches import TDigest

    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 50_000)

    def build():
        t = TDigest(64)
        for chunk in np.array_split(data, 10):
            t.add_values(chunk)
        t._compress()
        return t

    t1, t2 = build(), build()
    assert np.array_equal(t1.means, t2.means)
    assert np.array_equal(t1.weights, t2.weights)

    # zero-copy-style round trip then merge must not blow up on read-only
    # buffers (the Ray object-store deserialization contract)
    frozen = pickle.loads(pickle.dumps(t1, protocol=5))
    frozen.means.flags.writeable = False
    frozen.weights.flags.writeable = False
    t2.merge(frozen)
    assert t2.count == 100_000


def test_tdigest_empty_and_nan():
    import numpy as np
    from katydid_haskell_ray.state.sketches import TDigest

    t = TDigest()
    assert np.isnan(t.quantiles([0.5])).all()
    t.add_values(np.array([np.nan, np.nan]))
    assert t.count == 0
    t.add_values(np.array([5.0, np.nan, 7.0]))
    assert t.count == 2
    assert 5.0 <= t.quantiles([0.5])[0] <= 7.0


def test_stats_partials_tdigest_option(ray_session):
    import pickle
    import numpy as np
    import pyarrow as pa
    from katydid_haskell_ray.stages.stats import StatsPartials
    from katydid_haskell_ray.state.sketches import TDigest

    rng = np.random.default_rng(2)
    tab = pa.table({"v": pa.array(rng.normal(10, 2, 5000))})
    parts = StatsPartials(numeric=["v"], quantile_sketch="tdigest")(tab)
    sk = pickle.loads(parts.column("kll")[0].as_py())
    assert isinstance(sk, TDigest)
    q = sk.quantiles([0.5])[0]
    assert 9.5 < q < 10.5


def test_countmin_one_sided_and_mergeable():
    """CMS never underestimates; merged partials estimate like one pass."""
    import numpy as np
    from katydid_haskell_ray.state import sketches as SK

    rng = np.random.default_rng(11)
    # zipf-ish token stream split into two halves
    toks = np.array([f"t{int(z)}" for z in rng.zipf(1.5, 20000)], dtype=object)
    h = SK.hash64_array(toks)
    uniq, true = np.unique(toks.astype(str), return_counts=True)
    hu = SK.hash64_array(uniq.astype(object))

    one = SK.CountMin().add_hashes(h)
    a = SK.CountMin().add_hashes(h[:10000])
    b = SK.CountMin().add_hashes(h[10000:])
    merged = a.merge(b)
    assert (merged.counts == one.counts).all()
    est = merged.estimate(hu)
    assert (est >= true).all()  # one-sided error
    # heavy hitters are exact: the top tokens dominate the noise floor
    top_true = set(uniq[np.argsort(-true)[:10]])
    top_est = set(uniq[np.argsort(-est)[:10]])
    assert len(top_true & top_est) >= 8


def test_docs_top_tokens_approx_vs_exact(ray_session, sf_dir):
    """The CMS heavy-hitter query must reproduce the exact top-k on the
    test corpus (estimates upper-bound the exact counts)."""
    import __ray_entry__ as E

    approx = E.queries()["docs_top_tokens_approx"](sf_dir)
    exact = E.queries()["docs_top_tokens"](sf_dir)
    ex = dict(zip(exact["token"], exact["n"]))
    assert list(approx["token"]) == list(exact["token"])
    for t, n_est in zip(approx["token"], approx["n_est"]):
        assert n_est >= ex[t]


def test_popcount64_swar_vs_int_bit_count():
    """The SWAR popcount (which replaced the byte-LUT and backs every
    Hamming operator) matches Python's exact int.bit_count on edge
    values and random draws, for both 1-D and 2-D shapes."""
    import numpy as np

    from katydid_haskell_ray.state.sketches import popcount64

    edge = np.array([0, 1, 2**63, 2**64 - 1, 0x5555555555555555,
                     0xAAAAAAAAAAAAAAAA, 0x0101010101010101],
                    dtype=np.uint64)
    rng = np.random.default_rng(11)
    rand = rng.integers(0, 2**64, size=500, dtype=np.uint64)
    for arr in (edge, rand, rand.reshape(50, 10)):
        got = popcount64(arr)
        ref = np.array([int(v).bit_count() for v in arr.ravel()],
                       dtype=np.int64).reshape(arr.shape)
        assert (got == ref).all()
    # input must not be mutated (popcount64 copies)
    before = rand.copy()
    popcount64(rand)
    assert (rand == before).all()
