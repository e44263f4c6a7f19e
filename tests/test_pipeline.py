"""End-to-end validation pipeline tests over the synthetic images table.

Golden expectations come from the synthesizer's injected anomaly classes
(synth_images module docstring) — the analog of the reference corpus's
file-named-`valid` golden bits (/root/reference/test/Suite.hs:205-207).
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from katydid_haskell_ray.sources import synth_images as SI
from katydid_haskell_ray.stages.constraint import FlatConstraints, TreeConstraints, extract_violations
from katydid_haskell_ray.stages.decode import DecodeValidator
from katydid_haskell_ray.pipelines import validate as V

N = 3000  # covers each %1000 anomaly class 3 times


@pytest.fixture(scope="module")
def images_tab():
    return SI.make_batch(0, N)


def test_flat_constraints_golden(images_tab):
    out = FlatConstraints(V.DEFAULT_CHECKS)(images_tab)
    cap_present = out.column("check_caption_present").to_numpy(zero_copy_only=False)
    cap_len = out.column("check_caption_len").to_numpy(zero_copy_only=False)
    for i in range(N):
        m = i % 1000
        assert cap_present[i] == (m not in (9, 17)), i  # empty + null captions
        assert cap_len[i] == (m not in (13, 17)), i     # overlong + null
    # eval_err flags exactly the null-caption rows
    ev = out.column("eval_err").to_numpy(zero_copy_only=False)
    assert {i % 1000 for i in np.nonzero(ev)[0]} == {17}


def test_decode_validator_golden(images_tab):
    out = DecodeValidator(check_roundtrip=True)(images_tab)
    dec = out.column("check_decodes").to_numpy(zero_copy_only=False)
    dims = out.column("check_dims").to_numpy(zero_copy_only=False)
    fmtm = out.column("check_fmt_magic").to_numpy(zero_copy_only=False)
    ph = out.column("check_phash").to_numpy(zero_copy_only=False)
    rt = out.column("check_roundtrip").to_numpy(zero_copy_only=False)
    for i in range(N):
        m = i % 1000
        assert dec[i] == (m != 3), i          # truncated payloads fail decode
        if dec[i]:
            assert dims[i] == (m != 5), i     # injected w mismatch
            assert ph[i] == (i % 20 != 11), i  # hot-phash rows: stored != actual
            assert rt[i], i                   # round-trip (PSNR>=40 lossy) holds
        # truncation (m==3) keeps magic bytes, so only m==7 disagrees
        assert fmtm[i] == (m != 7), i


def test_violations_long_form(images_tab):
    out = FlatConstraints(V.DEFAULT_CHECKS)(images_tab)
    v = extract_violations(out)
    checks = set(v.column("check").to_pylist())
    assert "caption_present" in checks and "caption_len" in checks
    # row 9's empty caption produces exactly one caption_present violation
    ids = v.filter(
        np.isin(np.array(v.column("check")), ["caption_present"])).column("image_id")
    assert f"img-{9:012d}" in set(ids.to_pylist())


def test_tree_constraints_on_props_column(ray_session, sf_dir):
    # events.props is a JSON string column: validate {"k": <int 0..89>}
    import ray.data
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "props"])
    spec_doc = {"main": {"field": "k", "child": {"leaf": {
        "func": "and", "args": [
            {"func": "ge", "args": [{"var": "int"}, {"int": 0}]},
            {"func": "lt", "args": [{"var": "int"}, {"int": 90}]},
        ]}}}}
    out = ds.map_batches(
        TreeConstraints, fn_constructor_args=(spec_doc, {"props_k": ("props", "json")}),
        batch_format="pyarrow", concurrency=2).to_pandas()
    # oracle: parse the json and check directly
    import json as J
    expected = [0 <= J.loads(p)["k"] < 90 for p in out["props"]]
    assert list(out["check_props_k"]) == expected
    assert any(expected) and not all(expected)


def test_full_pipeline_resume(ray_session, tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # two input files -> two shards
    pq.write_table(SI.make_batch(0, 1500), img_dir / "part-0.parquet")
    pq.write_table(SI.make_batch(1500, 3000), img_dir / "part-1.parquet")
    out = tmp_path / "out"
    rep = V.run_validation(str(img_dir), str(out), n_shards=2)
    assert rep["n_rows"] == 3000
    assert rep["n_fail"] > 0 and rep["n_pass"] + rep["n_fail"] == 3000
    # duplicate image_ids: rows i%1000==1 copy i-1's id -> 3 dup ids
    assert rep["n_dup_image_ids"] == 3
    # hot phash: ~5% of rows share HOT_PHASH
    top = rep["hot_phash_top5"][0]
    assert top["phash"] == SI.HOT_PHASH and top["dup_count"] == 150
    assert rep["stats"]["image_id"]["cardinality"] == pytest.approx(2997, rel=0.05)
    assert rep["stats"]["w"]["min"] >= 8.0
    # resume: nothing re-runs (manifest complete), report reproduced
    rep2 = V.run_validation(str(img_dir), str(out), n_shards=2)
    assert rep2["n_rows"] == 3000 and rep2["n_fail"] == rep["n_fail"]
    # drift: validate same data against own profile -> no drift
    rep3 = V.run_validation(str(img_dir), str(out), n_shards=2,
                            profile=rep["profile"])
    assert rep3["drift"] is not None
    assert not any(d["drifted"] for d in rep3["drift"].values())


def test_drift_detection_positive_and_negative(ray_session, tmp_path):
    """FIXTURES.md F2: profile from a clean table, validate a SHIFTED table
    -> drift detected on the shifted column; unshifted -> no false positive."""
    import pyarrow as pa

    base = SI.make_batch(0, 2000)
    img_a = tmp_path / "a"; img_a.mkdir()
    pq.write_table(base, img_a / "part.parquet")
    rep_a = V.run_validation(str(img_a), str(tmp_path / "out_a"), n_shards=1)

    # shifted variant: w distribution moved by +40 (metadata-only shift)
    w = base.column("w").to_numpy(zero_copy_only=False) + 40
    shifted = base.set_column(base.column_names.index("w"), "w",
                              pa.array(w, type=pa.int32()))
    img_b = tmp_path / "b"; img_b.mkdir()
    pq.write_table(shifted, img_b / "part.parquet")
    rep_b = V.run_validation(str(img_b), str(tmp_path / "out_b"), n_shards=1,
                             profile=rep_a["profile"])
    assert rep_b["drift"]["w"]["drifted"], rep_b["drift"]
    assert not rep_b["drift"]["h"]["drifted"]
    # same data against its own profile: no false positive anywhere
    rep_c = V.run_validation(str(img_a), str(tmp_path / "out_a"), n_shards=1,
                             profile=rep_a["profile"])
    assert not any(d["drifted"] for d in rep_c["drift"].values())


def test_caption_vocab_referential_in_flagship(ray_session, tmp_path):
    img = tmp_path / "imgs_ref"; img.mkdir()
    pq.write_table(SI.make_batch(0, 1000), img / "part.parquet")
    rep = V.run_validation(str(img), str(tmp_path / "out_ref"), n_shards=1,
                           caption_vocab=SI._VOCAB)
    viol = pq.read_table(str(tmp_path / "out_ref" / "violations"))
    ref_fails = viol.filter(
        __import__("pyarrow.compute", fromlist=["compute"]).equal(
            viol.column("check"), "caption_ref"))
    ids = set(ref_fails.column("image_id").to_pylist())
    # the non-ASCII injection (i%1000==15: 'café über') is out-of-vocab,
    # as are empty (m==9), overlong-with-trailing-empty-token (m==13) and
    # null (m==17) captions
    assert f"img-{15:012d}" in ids
    assert f"img-{9:012d}" in ids
    assert f"img-{17:012d}" in ids
    assert f"img-{0:012d}" not in ids


def test_resume_does_not_rewrite_completed_shards(ray_session, tmp_path):
    img = tmp_path / "imgs_nr"; img.mkdir()
    pq.write_table(SI.make_batch(0, 800), img / "p0.parquet")
    pq.write_table(SI.make_batch(800, 1600), img / "p1.parquet")
    out = tmp_path / "out_nr"
    V.run_validation(str(img), str(out), n_shards=2)
    import glob
    shard_files = sorted(glob.glob(str(out / "shard=*/*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in shard_files}
    recs = V.M.completed_shards(str(out))
    assert len(recs) == 2
    assert all("rows_per_sec" in r["metrics"] for r in recs.values())
    V.run_validation(str(img), str(out), n_shards=2)  # resume: full skip
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"shard output rewritten: {f}"


def test_resume_invalidated_by_lineage_change(ray_session, tmp_path):
    """ADVICE r1: a manifest record only skips a shard when its recorded
    input_files match the CURRENT split — changed inputs or a different
    shard count must recompute, and stale out-of-range manifests must not
    leak into the totals."""
    img = tmp_path / "imgs_lin"; img.mkdir()
    pq.write_table(SI.make_batch(0, 600), img / "p0.parquet")
    pq.write_table(SI.make_batch(600, 1200), img / "p1.parquet")
    out = tmp_path / "out_lin"
    rep = V.run_validation(str(img), str(out), n_shards=2)
    assert rep["n_rows"] == 1200
    # shard count change 2 -> 1: old per-file shards are stale; the run must
    # recompute and count only the current split's single shard
    rep2 = V.run_validation(str(img), str(out), n_shards=1)
    assert rep2["n_rows"] == 1200, "stale shard-1 manifest double-counted"
    # input file set change with same shard count: lineage mismatch -> redo
    pq.write_table(SI.make_batch(1200, 1500), img / "p2.parquet")
    rep3 = V.run_validation(str(img), str(out), n_shards=2)
    assert rep3["n_rows"] == 1500


def test_incremental_append_only_processes_new_files(ray_session, tmp_path):
    """incremental=True: committed content-keyed shards are kept verbatim;
    appended files form a NEW shard and only its bytes are processed."""
    import glob
    img = tmp_path / "imgs_inc"; img.mkdir()
    pq.write_table(SI.make_batch(0, 500), img / "p0.parquet")
    pq.write_table(SI.make_batch(500, 1000), img / "p1.parquet")
    out = tmp_path / "out_inc"
    rep = V.run_validation(str(img), str(out), incremental=True)
    assert rep["n_rows"] == 1000
    assert len(V.M.completed_shards(str(out))) == 1  # byte-sized group
    files = sorted(glob.glob(str(out / "shard=*/*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in files}

    pq.write_table(SI.make_batch(1000, 1300), img / "p2.parquet")
    rep2 = V.run_validation(str(img), str(out), incremental=True)
    assert rep2["n_rows"] == 1300
    for f, t in mtimes.items():  # the old shard was not rewritten
        assert os.path.exists(f) and os.path.getmtime(f) == t, f
    # kept shard + one new shard for the appended file
    assert len(V.M.completed_shards(str(out))) == 2
    # n_shards is refused in incremental mode, empty input never prunes
    with pytest.raises(ValueError):
        V.run_validation(str(img), str(out), incremental=True, n_shards=2)
    empty = tmp_path / "imgs_none"; empty.mkdir()
    with pytest.raises(ValueError):
        V.run_validation(str(empty), str(out), incremental=True)
    assert len(V.M.completed_shards(str(out))) == 2  # state untouched


def test_prune_removes_stale_shard_outputs(ray_session, tmp_path):
    img = tmp_path / "imgs_pr"; img.mkdir()
    pq.write_table(SI.make_batch(0, 400), img / "p0.parquet")
    pq.write_table(SI.make_batch(400, 800), img / "p1.parquet")
    out = tmp_path / "out_pr"
    V.run_validation(str(img), str(out), n_shards=2)
    import glob
    assert len(glob.glob(str(out / "shard=*"))) == 2
    # re-shard 2 -> 1: the two old content keys are stale and pruned
    rep = V.run_validation(str(img), str(out), n_shards=1)
    assert rep["n_rows"] == 800
    assert len(glob.glob(str(out / "shard=*"))) == 1
    assert len(V.M.completed_shards(str(out))) == 1


def test_relapse_cli_single_doc():
    """The CLI mirrors the reference app (Main.hs): verdict strings and
    the error:<err> shape, no Ray session for single docs."""
    import subprocess
    import sys

    def run(*args):
        return subprocess.run([sys.executable, "scripts/relapse_cli.py",
                               *args], capture_output=True, text=True,
                              cwd="/root/repo")

    r = run("validate", "--grammar", ".DragonsExist == true",
            "--json", '{"DragonsExist": false}')
    assert r.stdout.strip() == "dragons are fictional"
    r = run("validate", "--grammar", ".DragonsExist == true",
            "--json", '{"DragonsExist": true}')
    assert r.stdout.strip() == "dragons exist"
    r = run("validate", "--grammar", "(", "--json", "{}")
    assert r.stdout.startswith("error:") and r.returncode == 1
