"""Image decode-validation stage (actor pool).

The binary-payload analog of the reference's protobuf decoder
(/root/reference/src/Data/Katydid/Parser/Protobuf/Protobuf.hs:165-293):
decode opaque bytes, tolerate malformed input as per-row verdicts (unknown
fields/corrupt payloads are data, not crashes — Protobuf.hs:199-206).

Checks per row (FIXTURES.md F1 anomaly classes):
- ``check_decodes``     bytes decode under the claimed/sniffed format
- ``check_dims``        decoded (w, h) equal the metadata columns
- ``check_fmt_magic``   fmt label agrees with the payload magic bytes
- ``check_phash``       recomputed perceptual hash equals the phash column
  (exact for lossless formats; Hamming distance <= 8 for lossy formats,
  since quantization noise can flip threshold-adjacent phash bits)
- (optional) ``check_roundtrip`` re-encode + decode PSNR >= 40 dB for lossy
  formats — the per-row invariant of BASELINE.json input_hint.

This is a callable CLASS: decoding state (codec dispatch) binds once per
actor; work is per-batch.  Decoding is inherently per-image, so the inner
loop is per-row by necessity — batches stay small because rows are fat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from katydid_haskell_ray.functions import codecs
from katydid_haskell_ray.state.sketches import hamming_distance64 as _ham


_LUT_SHARE: tuple = (None, None)  # (ray job id, ObjectRef)


def shared_jpeg_lut_ref():
    """``ray.put`` the packed jpeg Huffman LUT once per Ray session and
    return the ObjectRef (None when Ray isn't initialized — callers fall
    back to a process-local build).  Workers that ``ray.get`` it receive
    a zero-copy read-only view of the SAME plasma pages, so a node runs
    one 512 KB gather table total instead of one per worker — the
    broadcast-once-per-node pattern, and measurably less LLC pressure at
    high per-box concurrency.  Keyed by job id so a ref from a shut-down
    session can't leak into the next ``ray.init`` in the same process."""
    import ray
    if not ray.is_initialized():
        return None
    global _LUT_SHARE
    key = ray.get_runtime_context().get_job_id()
    if _LUT_SHARE[0] != key:
        from katydid_haskell_ray.functions import jpeg as _J
        _LUT_SHARE = (key, ray.put(_J.packed_lut()))
    return _LUT_SHARE[1]


class DecodeValidator:
    def __init__(self, check_roundtrip: bool = False, psnr_db: float = 40.0,
                 phash_tolerance: int = 8, lut_ref=None):
        self.check_roundtrip = check_roundtrip
        self.psnr_db = psnr_db
        self.phash_tolerance = phash_tolerance
        if lut_ref is not None:
            # bind the node-shared Huffman LUT before the first decode;
            # ray.get of a numpy object is zero-copy from plasma
            import ray
            from katydid_haskell_ray.functions import jpeg as _J
            _J.set_packed_lut(ray.get(lut_ref))

    def _one(self, data, fmt, w, h, pre=None):
        """Returns (decodes, dims_ok, fmt_ok, rt_ok, err, arr, magic).
        ``pre`` carries a pre-decoded array or DecodeError from the
        batched jpeg path so this stays the single verdict brain."""
        if data is None:
            return False, False, False, False, "null bytes", None, None
        magic = codecs.sniff_format(data)
        fmt_ok = magic == fmt
        if pre is None:
            try:
                arr = codecs.decode_image(data, magic or fmt)
            except codecs.DecodeError as e:
                return False, False, fmt_ok, False, str(e), None, magic
        elif isinstance(pre, codecs.DecodeError):
            return False, False, fmt_ok, False, str(pre), None, magic
        else:
            arr = pre
        ah, aw = arr.shape[:2]
        dims_ok = (aw == w) and (ah == h)
        rt_ok = True
        if self.check_roundtrip and magic in codecs.ENCODERS:
            try:
                if magic == "png":  # fast-compression re-encode: pixels identical
                    enc = codecs.encode_png(arr, level=1)
                    rt = codecs.decode_image(enc, magic)
                    rt_ok = bool((rt == arr).all())
                elif magic == "jpeg":
                    # deferred: jpeg round-trips run as ONE batched DCT
                    # pass after the row loop (entropy coding is
                    # bijective, so the quant-domain round-trip is
                    # bit-identical to encode+decode — tested)
                    rt_ok = True
                else:
                    rt = codecs.decode_image(codecs.ENCODERS[magic](arr),
                                             magic)
                    if magic in codecs.LOSSY_FMTS:
                        rt_ok = codecs.psnr(arr, rt) >= self.psnr_db
                    else:
                        rt_ok = bool((rt == arr).all())
            except (codecs.DecodeError, ValueError):
                rt_ok = False
        return True, dims_ok, fmt_ok, rt_ok, "", arr, magic

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        data = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        phs = batch.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
        res = np.zeros((n, 5), dtype=bool)
        errs = []
        # jpeg rows decode as ONE lockstep batch (the entropy pass
        # vectorizes across streams); results feed the per-row brain
        jpeg_rows = [i for i in range(n) if data[i] is not None
                     and codecs.sniff_format(data[i]) == "jpeg"]
        pre: dict = {}
        if jpeg_rows:
            decoded = codecs.decode_jpeg_batch([data[i] for i in jpeg_rows])
            pre = dict(zip(jpeg_rows, decoded))
        by_shape: dict = {}  # (h, w) -> ([indices], [arrays], [lossy])
        rt_jpeg: list = []  # (row, arr) pairs for the batched round-trip
        for i in range(n):
            d, dm, f, rt, err, arr, magic = self._one(
                data[i], fmts[i], ws[i], hs[i], pre=pre.get(i))
            res[i] = (d, dm, f, False, rt)
            errs.append(err)
            if arr is not None:
                idxs, arrs, lossy = by_shape.setdefault(arr.shape[:2], ([], [], []))
                idxs.append(i)
                arrs.append(arr)
                lossy.append(magic in codecs.LOSSY_FMTS)
                if self.check_roundtrip and magic == "jpeg":
                    rt_jpeg.append((i, arr))
        if rt_jpeg:
            rts = codecs.jpeg_roundtrip_batch([a for _, a in rt_jpeg])
            for (i, arr), rt_arr in zip(rt_jpeg, rts):
                res[i, 4] = codecs.psnr(arr, rt_arr) >= self.psnr_db
        # phash check vectorized per same-size group (bit-identical to the
        # per-image path; see codecs.phash64_batch)
        for (ih, iw), (idxs, arrs, lossy) in by_shape.items():
            actual = codecs.phash64_batch(np.stack(arrs))
            stored = phs[idxs]
            dist = _ham(actual, stored)
            tol = np.where(np.array(lossy), self.phash_tolerance, 0)
            res[idxs, 3] = dist <= tol
        out = (
            batch
            .append_column("check_decodes", pa.array(res[:, 0]))
            .append_column("check_dims", pa.array(res[:, 1]))
            .append_column("check_fmt_magic", pa.array(res[:, 2]))
            .append_column("check_phash", pa.array(res[:, 3]))
        )
        if self.check_roundtrip:
            out = out.append_column("check_roundtrip", pa.array(res[:, 4]))
        return out.append_column("decode_err", pa.array(errs, type=pa.string()))
