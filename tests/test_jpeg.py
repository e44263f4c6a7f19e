"""Baseline JPEG codec (functions/jpeg.py): spec conformance, round-trip
quality, the SIMD-across-streams batch decoder's bit-equality with the
scalar walker, the entropy-free round-trip shortcut, and the validator's
anomaly classification over real lossy bytes."""

from __future__ import annotations

import numpy as np
import pytest

from katydid_haskell_ray.functions import codecs as C
from katydid_haskell_ray.functions import jpeg as J
from katydid_haskell_ray.sources.synth_images import _dims, _pixels


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _corpus(n=120, step=3):
    out = []
    for i in range(0, n * step, step):
        w, h = _dims(i)
        out.append(_pixels(i, w, h))
    return out


def test_roundtrip_psnr_above_gate():
    """Every fixture pattern round-trips above the 40 dB input_hint gate
    at the engine's default quality (the sawtooth patterns are the
    adversarial case — q95 measured 35.3 dB on them, hence q98)."""
    worst = 99.0
    for arr in _corpus():
        out = J.decode_baseline(J.encode_baseline(arr, quality=C.JPEG_QUALITY))
        assert out.shape == arr.shape
        worst = min(worst, _psnr(arr, out))
    assert worst >= 40.0, f"worst PSNR {worst:.2f} below gate"


def test_stream_structure():
    """SOI/EOI framing, JFIF APP0, both DQTs, four DHTs, SOF0, SOS — and
    the scan actually exercises 0xFF byte stuffing somewhere in the
    corpus (stuffed bytes decode transparently)."""
    saw_stuffing = False
    for arr in _corpus(40):
        d = J.encode_baseline(arr, quality=C.JPEG_QUALITY)
        assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
        assert d[2:4] == b"\xff\xe0" and d[6:10] == b"JFIF"
        assert d.count(b"\xff\xdb") >= 2 and d.count(b"\xff\xc4") >= 4
        assert b"\xff\xc0" in d and b"\xff\xda" in d
        sos = d.index(b"\xff\xda")
        if b"\xff\x00" in d[sos:]:
            saw_stuffing = True
    assert saw_stuffing


def test_batch_bit_identical_to_scalar():
    """The lockstep batch decoder is BIT-identical to the scalar walker
    lane for lane, including corrupt lanes (which surface the scalar
    decoder's exact error class)."""
    datas = [J.encode_baseline(a, quality=C.JPEG_QUALITY)
             for a in _corpus(90)]
    datas[7] = datas[7][: len(datas[7]) // 2]  # truncated mid-scan
    datas[13] = datas[13][:40] + b"\x00" * 10  # mangled header
    datas[21] = b"\xff\xd8\xff\xe0junk"        # no SOF/SOS
    ref = []
    for d in datas:
        try:
            ref.append(J.decode_baseline(d))
        except J.JpegError as e:
            ref.append(type(e))
    got = J.decode_baseline_batch(datas, errors="return")
    for a, b in zip(ref, got):
        if isinstance(a, type):
            assert isinstance(b, J.JpegError)
        else:
            assert isinstance(b, np.ndarray) and np.array_equal(a, b)
    # errors="raise" surfaces the first lane's exception
    with pytest.raises(J.JpegError):
        J.decode_baseline_batch(datas)


def test_lossy_roundtrip_shortcut_exact():
    """Skipping the bijective entropy stage yields bit-identical pixels
    to a full encode+decode — the hot-path roundtrip contract."""
    for arr in _corpus(30):
        full = J.decode_baseline(J.encode_baseline(arr, quality=C.JPEG_QUALITY))
        fast = J.lossy_roundtrip(arr, quality=C.JPEG_QUALITY)
        assert np.array_equal(full, fast)


def test_non_baseline_rejected():
    """Progressive (SOF2) and subsampled (non-1x1) streams fail closed."""
    d = bytearray(J.encode_baseline(_corpus(1)[0], quality=C.JPEG_QUALITY))
    sof = bytes(d).index(b"\xff\xc0")
    prog = bytes(d[:sof]) + b"\xff\xc2" + bytes(d[sof + 2:])
    with pytest.raises(J.JpegError, match="progressive|non-baseline"):
        J.decode_baseline(prog)
    sub = bytearray(d)
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then (cid, samp,
    # tq) triplets — first component's sampling byte is sof+11
    sub[sof + 11] = 0x22  # first component sampling 2x2
    with pytest.raises(J.JpegError, match="subsampling"):
        J.decode_baseline(bytes(sub))


def test_codecs_dispatch_and_errors():
    """codecs.decode_jpeg wraps JpegError into DecodeError (the engine's
    decode-verdict contract); corrupt magic rejected."""
    arr = _corpus(1)[0]
    d = C.encode_jpeg(arr)
    out = C.decode_image(d, "jpeg")
    assert np.array_equal(out, J.decode_baseline(d))
    assert C.sniff_format(d) == "jpeg"
    with pytest.raises(C.DecodeError):
        C.decode_jpeg(b"\xff\xd8\xffgarbage")
    res = C.decode_jpeg_batch([d, b"\xff\xd8\xffgarbage"])
    assert isinstance(res[0], np.ndarray)
    assert isinstance(res[1], C.DecodeError)


def test_validator_anomaly_classes_real_jpeg():
    """DecodeValidator over fresh synth rows (real jpeg bytes): verdicts
    land exactly on the generator's anomaly residue classes — the same
    contract the images_verdict_full oracle encodes in SQL."""
    from katydid_haskell_ray.sources import synth_images as SI
    from katydid_haskell_ray.stages.decode import DecodeValidator

    t = SI.make_batch(0, 60)
    out = DecodeValidator(check_roundtrip=True)(t)

    def fails(col):
        return [i for i, v in enumerate(out.column(col).to_pylist()) if not v]

    assert fails("check_decodes") == [3]          # truncated payload
    assert fails("check_fmt_magic") == [7]        # label/magic mismatch
    assert fails("check_dims") == [3, 5]          # decode-fail + w skew
    assert fails("check_phash") == [3, 11, 31, 51]  # decode-fail + hot rows
    assert fails("check_roundtrip") == [3]        # only the undecodable row


def test_malformed_segment_bodies_fail_closed():
    """Short/truncated segment bodies (DRI, SOF, SOS) raise JpegError /
    DecodeError, never a bare struct.error or IndexError (review
    finding: ImageOps catches only DecodeError, so a foreign exception
    type would crash the whole actor batch)."""
    bads = [
        b"\xff\xd8\xff\xdd\x00\x02\xff\xd9",          # DRI with no body
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00\xff\xd9",  # SOF cut mid-dims
        b"\xff\xd8\xff\xda\x00\x03\x01\xff\xd9",      # SOS short comps
        b"\xff\xd8\xff\xc4\x00\x04\x00\x01\xff\xd9",  # DHT short bits
    ]
    for bad in bads:
        with pytest.raises(J.JpegError):
            J.decode_baseline(bad)
        with pytest.raises(C.DecodeError):
            C.decode_jpeg(bad)


def test_scalar_decode_linear_in_scan_length():
    """The scalar walker masks its bit accumulator, so decode time is
    ~linear in scan bytes (review finding: the unmasked accumulator made
    every shift O(bits-read), i.e. quadratic — 6.7s for one 256px
    image)."""
    import time
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(256, 256, 3)).astype(np.uint8)
    d = J.encode_baseline(arr, quality=C.JPEG_QUALITY)
    t0 = time.perf_counter()
    out = J.decode_baseline(d)
    el = time.perf_counter() - t0
    assert out.shape == arr.shape
    assert el < 2.0, f"256px decode took {el:.1f}s (quadratic regression?)"


def test_decode_lut_cache_bounded():
    """The per-DHT LUT cache evicts past 16 entries (foreign adversarial
    tables must not grow a long-lived decode actor unboundedly)."""
    J._DEC_LUTS.clear()
    for i in range(24):
        # distinct single-symbol tables: one 2-bit code for value i
        J._decode_lut([0, 1] + [0] * 14, [i])
    assert len(J._DEC_LUTS) <= 16
    # standard tables still round-trip fine after evictions
    arr = _corpus(1)[0]
    assert np.array_equal(J.decode_baseline(J.encode_baseline(arr)),
                          J.decode_baseline_batch(
                              [J.encode_baseline(arr)])[0])


def test_quality_tables_ijg_scaling():
    """IJG quality scaling endpoints: q=50 returns the Annex-K base
    tables; q=100 all-ones (lossless quantization)."""
    l50, c50 = J._quality_tables(50)
    assert np.array_equal(l50, J.QT_LUM) and np.array_equal(c50, J.QT_CHROMA)
    l100, c100 = J._quality_tables(100)
    assert (l100 == 1).all() and (c100 == 1).all()


def test_packed_lut_shape_and_injection_bit_identical():
    """packed_lut() is a pure function of the Annex-K constants; injecting
    a pickled/shared copy (set_packed_lut) leaves batch decode output
    bit-identical, and a wrong-shaped injection is rejected."""
    import pickle

    lut = J.packed_lut()
    assert lut.shape == (4, 65536) and lut.dtype == np.int16
    datas = [J.encode_baseline(a) for a in _corpus(n=12, step=7)]
    before = J.decode_baseline_batch(datas)
    # a serialization round-trip is what a plasma broadcast amounts to:
    # same values, different (possibly read-only) backing pages
    shared = pickle.loads(pickle.dumps(lut))
    shared.setflags(write=False)
    try:
        J.set_packed_lut(shared)
        assert J.packed_lut() is shared
        after = J.decode_baseline_batch(datas)
    finally:
        J.set_packed_lut(lut)
    for a, b in zip(before, after):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        J.set_packed_lut(np.zeros((4, 16), dtype=np.int16))


def test_shared_jpeg_lut_ref_session_cached(ray_session):
    """One ray.put per session: the ref is cached (same object returned),
    ray.get yields a zero-copy view equal to the local build, and the
    DecodeValidator constructor accepts the ref."""
    from katydid_haskell_ray.stages.decode import (DecodeValidator,
                                                   shared_jpeg_lut_ref)

    r1 = shared_jpeg_lut_ref()
    r2 = shared_jpeg_lut_ref()
    assert r1 is not None and r1 == r2
    got = ray_session.get(r1)
    assert np.array_equal(got, J.packed_lut())
    local = J.packed_lut()
    try:
        DecodeValidator(lut_ref=r1)  # binds the shared pages
        assert J.packed_lut() is not local  # injected view now active
        assert np.array_equal(J.packed_lut(), local)
    finally:
        J.set_packed_lut(local)
