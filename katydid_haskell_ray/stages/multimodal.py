"""Multimodal column stages: decode / resize / feature-extract / frame-sample.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
(the input_hint layout).  The Ray-side plumbing here — schemas, actor
signatures, byte-sized batches, fixed-size-list feature outputs — is real
and tested; the codec boundary is:

- image decode:   REAL for png/bmp (+ the deterministic jpeg stand-in) via
  functions.codecs; a production deployment swaps in Pillow/cv2 in
  ``ImageOps.__init__`` without touching the pipeline.
- audio/video:    STUBBED — ``decode_audio``/``sample_video_frames`` raise
  NotImplementedError unless ``allow_stub=True``, in which case a clearly
  deterministic fake is produced (so the downstream plumbing is testable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from katydid_haskell_ray.functions import codecs


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy, deterministic)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, bins: int = 8) -> np.ndarray:
    """Deterministic feature vector: mean RGB (3) + per-channel histogram
    (3*bins), L1-normalized — a stand-in embedding with real plumbing."""
    mean = arr.reshape(-1, 3).mean(axis=0) / 255.0
    hists = [np.histogram(arr[..., c], bins=bins, range=(0, 256))[0]
             for c in range(3)]
    hist = np.concatenate(hists).astype(np.float64)
    hist /= max(1.0, hist.sum())
    return np.concatenate([mean, hist]).astype(np.float32)


class ImageOps:
    """Actor stage over the images table: decode -> resize -> features.

    Output columns: ``thumb`` (binary PNG, out_w x out_h), ``feat``
    (fixed_size_list<float32>[3 + 3*bins]), ``decode_ok`` (bool).
    Batches must stay small (rows are fat): size by bytes, not rows.
    """

    def __init__(self, out_w: int = 8, out_h: int = 8, bins: int = 8):
        self.out_w, self.out_h, self.bins = out_w, out_h, bins
        self.feat_dim = 3 + 3 * bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        thumbs, feats, oks = [], [], []
        for d in data:
            try:
                arr = codecs.decode_image(d)
                small = resize_nearest(arr, self.out_w, self.out_h)
                thumbs.append(codecs.encode_png(np.ascontiguousarray(small)))
                feats.append(image_features(arr, self.bins))
                oks.append(True)
            except (codecs.DecodeError, TypeError):
                thumbs.append(None)
                feats.append(np.zeros(self.feat_dim, dtype=np.float32))
                oks.append(False)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), type=pa.float32()), self.feat_dim)
        return (batch.drop_columns(["bytes"])
                .append_column("thumb", pa.array(thumbs, type=pa.binary()))
                .append_column("feat", feat_arr)
                .append_column("decode_ok", pa.array(oks)))


class AudioOps:
    """Actor stage over an (id, bytes) audio table: decode (codec-gated —
    see :func:`decode_audio`) -> fixed-size waveform features.

    The Ray-side plumbing is REAL and tested: opaque ``binary`` column in,
    ``fixed_size_list<float32>`` feature column + ``decode_ok`` out,
    byte-sized batches, one stage instance per actor.  Swapping the stub
    for soundfile/ffmpeg in ``__init__`` touches nothing downstream."""

    def __init__(self, id_col: str = "audio_id", col: str = "bytes",
                 n_windows: int = 16, allow_stub: bool = False):
        self.id_col, self.col = id_col, col
        self.n_windows = n_windows
        self.allow_stub = allow_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, oks = [], []
        for d in batch.column(self.col).to_pylist():
            try:
                wave = decode_audio(d, allow_stub=self.allow_stub)
                # windowed RMS energy: 1024 samples -> n_windows features
                w = wave[: (len(wave) // self.n_windows) * self.n_windows]
                rms = np.sqrt((w.reshape(self.n_windows, -1) ** 2).mean(axis=1))
                feats.append(rms.astype(np.float32))
                oks.append(True)
            except (NotImplementedError, TypeError, ValueError):
                feats.append(np.zeros(self.n_windows, dtype=np.float32))
                oks.append(False)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), type=pa.float32()),
            self.n_windows)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "audio_feat": feat_arr,
                         "decode_ok": pa.array(oks)})


class VideoOps:
    """Actor stage over an (id, bytes) video table: frame-sample
    (codec-gated — see :func:`sample_video_frames`) -> per-frame image
    features -> one flattened ``fixed_size_list<float32>`` per video.

    Same plumbing contract as :class:`AudioOps`/:class:`ImageOps`."""

    def __init__(self, id_col: str = "video_id", col: str = "bytes",
                 n_frames: int = 4, bins: int = 4,
                 allow_stub: bool = False):
        self.id_col, self.col = id_col, col
        self.n_frames, self.bins = n_frames, bins
        self.frame_dim = 3 + 3 * bins
        self.allow_stub = allow_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        dim = self.n_frames * self.frame_dim
        feats, oks = [], []
        for d in batch.column(self.col).to_pylist():
            try:
                frames = sample_video_frames(d, self.n_frames,
                                             allow_stub=self.allow_stub)
                feats.append(np.concatenate(
                    [image_features(f, self.bins) for f in frames]))
                oks.append(True)
            except (NotImplementedError, TypeError, ValueError):
                feats.append(np.zeros(dim, dtype=np.float32))
                oks.append(False)
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), type=pa.float32()), dim)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "video_feat": feat_arr,
                         "decode_ok": pa.array(oks)})


def decode_audio(data: bytes, *, allow_stub: bool = False) -> np.ndarray:
    """STUB — no audio codec library in this environment.

    With ``allow_stub=True`` returns a deterministic fake waveform derived
    from the byte content (length 1024 float32 in [-1, 1]) so downstream
    plumbing (framing, feature windows) is exercisable in tests."""
    if not allow_stub:
        raise NotImplementedError(
            "audio decode requires a codec library (soundfile/ffmpeg); "
            "pass allow_stub=True for the deterministic test fake")
    h = np.frombuffer(data[:4096].ljust(4096, b"\0"), dtype=np.uint8)
    wave = np.interp(np.linspace(0, len(h) - 1, 1024), np.arange(len(h)), h)
    return ((wave / 127.5) - 1.0).astype(np.float32)


def sample_video_frames(data: bytes, n_frames: int = 4, *,
                        allow_stub: bool = False) -> list[np.ndarray]:
    """STUB — no video codec library in this environment.

    With ``allow_stub=True`` slices the byte stream into ``n_frames``
    deterministic 8x8 RGB fakes."""
    if not allow_stub:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg; pass allow_stub=True "
            "for the deterministic test fake")
    frames = []
    seg = max(1, len(data) // n_frames)
    for i in range(n_frames):
        chunk = np.frombuffer(
            data[i * seg:(i + 1) * seg][:192].ljust(192, b"\0"), dtype=np.uint8)
        frames.append(chunk.reshape(8, 8, 3).copy())
    return frames
