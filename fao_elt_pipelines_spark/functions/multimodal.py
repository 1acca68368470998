"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a ``kind`` tag and a
``map<string,string>`` metadata column. The Spark-side machinery — schema,
partition-preserving mapInPandas, Arrow batch shapes, deterministic
batching — is real and tested.

Decode is REAL for three formats, implemented on the stdlib alone (the
sandbox ships no PIL/librosa/pyav):

* **WAV** (RIFF PCM16 mono) — parsed with stdlib ``wave`` + numpy; emits
  sample_rate / n_samples / duration_ms / amp_sum / amp_max from the
  actual decoded samples.
* **BMP** (24-bit uncompressed, BITMAPINFOHEADER) — header parsed with
  ``struct``, pixel array decoded with numpy including the 4-byte row
  padding and bottom-up row order; emits width / height / per-channel
  pixel sums from the actual decoded pixels.
* **AVI** (RIFF ``AVI `` with uncompressed ``DIB `` BGR24 frames) — the
  RIFF chunk tree is walked with ``struct`` (``avih`` main header,
  ``strh`` stream header, ``movi`` frame list); every k-th ``00db`` frame
  is decoded like a BMP pixel array (padded, bottom-up) — **frame
  sampling**, the op a training pipeline runs on video; emits width /
  height / n_frames / fps / n_frames_sampled / per-channel pixel sums
  over the sampled frames.

Only *compressed* video stays gated at the codec seam
(``NotImplementedError`` when the AVI stream handler is anything but raw
``DIB ``): no stdlib codec can inflate H.264/VP9. The legacy deterministic
fake path (byte statistics) remains for the plumbing tests.

At scale: mapInPandas streams Arrow batches (bounded memory per task
regardless of payload size); binary payloads never pass through the driver;
partitioning by asset hash keeps decode fanout even. Per-payload work is
numpy-vectorized (frombuffer/reshape/sum), not per-sample Python.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames_sampled", T.IntegerType()),
    ]
)

KINDS = ["image", "audio", "video"]


def synthesize_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic multimodal asset table from ``documents``:
    the utf-8 text bytes stand in for the media payload."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("declared_w"), ((F.col("doc_id") % 8 + 1) * 64).cast("string"),
            F.lit("declared_h"), ((F.col("doc_id") % 4 + 1) * 64).cast("string"),
        ).alias("meta"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("amp_max", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum_r", T.LongType()),
        T.StructField("px_sum_g", T.LongType()),
        T.StructField("px_sum_b", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("n_frames_sampled", T.IntegerType()),
    ]
)


def wav_bytes(asset_id: int) -> bytes:
    """Deterministic RIFF/WAVE PCM16 mono payload for ``asset_id``: a
    step-7 integer ramp ``s_i = ((7*i + id) % 401) - 200`` at a rate and
    length derived from the id. Real file — stdlib ``wave`` writes the
    headers, any WAV reader can decode it."""
    sr = 8000 + (asset_id % 2) * 8000
    n = 1000 + (asset_id % 50) * 100
    samples = ((7 * np.arange(n, dtype=np.int64) + asset_id) % 401 - 200).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def bmp_bytes(asset_id: int) -> bytes:
    """Deterministic 24-bit uncompressed BMP for ``asset_id``. Width is
    chosen so ``3*width`` is usually not a multiple of 4 — the decoder must
    handle the per-row padding and the bottom-up row order to read the
    pixels the formula below places at (x, y):
    r=(x+y+id)%256, g=(x+2y+id)%256, b=(3x+y+id)%256."""
    w = int(asset_id % 7) + 2
    h = int(asset_id % 5) + 2
    ys, xs = np.mgrid[0:h, 0:w]
    r = (xs + ys + asset_id) % 256
    g = (xs + 2 * ys + asset_id) % 256
    b = (3 * xs + ys + asset_id) % 256
    img = np.stack([b, g, r], axis=-1).astype(np.uint8)  # BMP stores BGR
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img.reshape(h, w * 3)
    pix = rows[::-1].tobytes()  # bottom-up row order
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, int]:
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("expected PCM16 mono WAV")
        sr = w.getframerate()
        n = w.getnframes()
        frames = w.readframes(n)
    if sr <= 0:
        raise ValueError("expected positive WAV framerate")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    # a zero-frame WAV is spec-valid: defined stats, not an opaque
    # numpy empty-reduction error from inside the executor UDF
    amp_max = int(samples.max()) if n else 0
    return sr, n, n * 1000 // sr, int(samples.sum()), amp_max


def _decode_bmp(payload: bytes) -> tuple[int, int, int, int, int]:
    magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=abs(h) * stride, offset=offset)
    img = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        img = img[::-1]  # bottom-up → top-down
    sums = img.astype(np.int64).sum(axis=(0, 1))  # BGR order
    return w, abs(h), int(sums[2]), int(sums[1]), int(sums[0])


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-length data gets a pad byte that is
    # NOT counted in the stored size
    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + data)


def _frame_pixels(asset_id: int, w: int, h: int, f: int) -> np.ndarray:
    """Frame ``f``'s BGR pixel block under the deterministic formula
    r=(x+y+f+id)%256, g=(x+2y+2f+id)%256, b=(3x+y+3f+id)%256."""
    ys, xs = np.mgrid[0:h, 0:w]
    r = (xs + ys + f + asset_id) % 256
    g = (xs + 2 * ys + 2 * f + asset_id) % 256
    b = (3 * xs + ys + 3 * f + asset_id) % 256
    return np.stack([b, g, r], axis=-1).astype(np.uint8)


def avi_bytes(asset_id: int) -> bytes:
    """Deterministic uncompressed AVI (RIFF ``AVI ``, one ``vids`` stream,
    raw ``DIB `` BGR24 bottom-up frames with BMP-style 4-byte row padding)
    for ``asset_id``: ``n_frames = id%6+2`` frames of the
    :func:`_frame_pixels` formula at ``fps = id%15+5``. Real file — the
    chunk tree (avih / strl(strh,strf) / movi 00db) follows the published
    AVI RIFF layout, any AVI demuxer can read it."""
    w = int(asset_id % 7) + 2
    h = int(asset_id % 5) + 2
    nf = int(asset_id % 6) + 2
    fps = int(asset_id % 15) + 5
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for f in range(nf):
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = _frame_pixels(asset_id, w, h, f).reshape(h, w * 3)
        frames.append(rows[::-1].tobytes())  # bottom-up row order
    frame_bytes = stride * h
    # MainAVIHeader: usec/frame, maxbytes/sec, padding, flags, total frames,
    # initial frames, streams, suggested buffer, width, height, reserved[4]
    avih = _riff_chunk(
        b"avih",
        struct.pack(
            "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
            nf, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
        ),
    )
    # AVISTREAMHEADER: type, handler, flags, prio+lang, initial, scale,
    # rate, start, length, suggested buffer, quality, sample size, rcFrame
    strh = _riff_chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIii4H", b"vids", b"DIB ", 0, 0, 0, 0,
            1, fps, 0, nf, frame_bytes, -1, 0, 0, 0, w, h,
        ),
    )
    strf = _riff_chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0),
    )
    hdrl = _riff_list(b"hdrl", avih + _riff_list(b"strl", strh + strf))
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00db", fr) for fr in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_walk(payload: bytes, start: int, end: int):
    """Yield ``(fourcc, data_start, data_len)`` for each chunk in a RIFF
    span; for LIST chunks the fourcc is the list type and the span excludes
    the 4-byte type tag, so callers recurse naturally."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        data = pos + 8
        if data + size > end:
            raise ValueError("truncated RIFF chunk")
        if fourcc == b"LIST":
            yield payload[data : data + 4], data + 4, size - 4
        else:
            yield fourcc, data, size
        pos = data + size + (size % 2)  # word alignment


def _decode_avi(
    payload: bytes, frame_stride: int = 2
) -> tuple[int, int, int, int, int, int, int, int]:
    """Decode an uncompressed DIB-in-AVI payload, sampling every
    ``frame_stride``-th frame (frame 0 always included). Returns
    (width, height, n_frames, fps, n_frames_sampled, px_r, px_g, px_b)
    with the pixel sums taken over the SAMPLED frames only. A non-``DIB ``
    stream handler raises ``NotImplementedError`` — the honest codec seam:
    parsing the container needs only struct, inflating H.264 does not."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = nf = fps = None
    frames: list[bytes] = []

    def visit(fourcc: bytes, start: int, size: int) -> None:
        nonlocal w, h, nf, fps
        if fourcc in (b"hdrl", b"strl", b"movi"):
            for sub in _riff_walk(payload, start, start + size):
                visit(*sub)
        elif fourcc == b"avih":
            vals = struct.unpack_from("<14I", payload, start)
            nf, w, h = vals[4], vals[8], vals[9]
        elif fourcc == b"strh":
            stype, handler = struct.unpack_from("<4s4s", payload, start)
            if stype == b"vids":
                if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AVI video codec {handler!r} requires a codec library "
                        "(pyav) absent from this environment; uncompressed "
                        "DIB frames decode for real"
                    )
                scale, rate = struct.unpack_from("<II", payload, start + 20)
                if scale <= 0:
                    raise ValueError("expected positive strh dwScale")
                fps = rate // scale
        elif fourcc in (b"00db", b"00dc"):
            frames.append(payload[start : start + size])

    for sub in _riff_walk(payload, 12, len(payload)):
        visit(*sub)
    if w is None or fps is None:
        raise ValueError("AVI missing avih/strh headers")
    if nf != len(frames):
        raise ValueError(f"avih declares {nf} frames, movi carries {len(frames)}")
    if frame_stride <= 0:
        raise ValueError("frame_stride must be positive")
    stride = (w * 3 + 3) // 4 * 4
    sums = np.zeros(3, dtype=np.int64)  # BGR accumulation order
    sampled = frames[::frame_stride]
    for fr in sampled:
        rows = np.frombuffer(fr, dtype=np.uint8, count=h * stride)
        img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1]
        sums += img.astype(np.int64).sum(axis=(0, 1))
    return w, h, nf, fps, len(sampled), int(sums[2]), int(sums[1]), int(sums[0])


def synthesize_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media asset table derived deterministically from ``documents``:
    doc_id % 3 picks the format — 0 → genuine WAV, 1 → genuine BMP,
    2 → genuine uncompressed AVI. Payload construction runs distributed
    (Arrow-batched mapInPandas) — bytes never pass through the driver."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    _KIND = {0: ("audio", "wav", wav_bytes), 1: ("image", "bmp", bmp_bytes),
             2: ("video", "avi", avi_bytes)}

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            picks = [_KIND[int(i) % 3] for i in ids]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "kind": [p[0] for p in picks],
                    "payload": [p[2](int(i)) for i, p in zip(ids, picks)],
                    "meta": [{"format": p[1]} for p in picks],
                }
            )

    return d.mapInPandas(synth, ASSET_SCHEMA)


def decode_media_features(assets: DataFrame, frame_stride: int = 2) -> DataFrame:
    """REAL per-asset media decode over mapInPandas (Arrow-batched):
    WAV via stdlib ``wave``, BMP and uncompressed AVI via ``struct`` +
    numpy. Video frames are SAMPLED (every ``frame_stride``-th frame,
    frame 0 always kept) before the pixel pass — the standard
    training-pipeline move that keeps per-asset decode cost bounded by
    n_frames/stride instead of n_frames. Compressed AVI streams raise at
    the codec seam — no stdlib codec can inflate them.

    Analogue of the reference's multi-format ingest dispatch
    (app/file_client.py:58-161, per-extension reader selection), re-done
    as a distributed binary-column decode instead of driver-side file IO.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in DECODED_SCHEMA.fields}
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                row = dict.fromkeys(out)
                row["asset_id"], row["kind"] = aid, kind
                if kind == "audio":
                    (
                        row["sample_rate"],
                        row["n_samples"],
                        row["duration_ms"],
                        row["amp_sum"],
                        row["amp_max"],
                    ) = _decode_wav(payload)
                elif kind == "image":
                    (
                        row["width"],
                        row["height"],
                        row["px_sum_r"],
                        row["px_sum_g"],
                        row["px_sum_b"],
                    ) = _decode_bmp(payload)
                elif kind == "video":
                    (
                        row["width"],
                        row["height"],
                        row["n_frames"],
                        row["fps"],
                        row["n_frames_sampled"],
                        row["px_sum_r"],
                        row["px_sum_g"],
                        row["px_sum_b"],
                    ) = _decode_avi(payload, frame_stride)
                else:
                    raise ValueError(f"unknown media kind {kind!r}")
                for k, v in row.items():
                    out[k].append(v)
            int_cols = {
                "sample_rate": "Int32", "n_samples": "Int32",
                "duration_ms": "Int32", "amp_sum": "Int64",
                "amp_max": "Int32", "width": "Int32", "height": "Int32",
                "px_sum_r": "Int64", "px_sum_g": "Int64", "px_sum_b": "Int64",
                "n_frames": "Int32", "fps": "Int32",
                "n_frames_sampled": "Int32",
            }
            pdf_out = pd.DataFrame(out)
            for c, t in int_cols.items():
                pdf_out[c] = pdf_out[c].astype(t)
            yield pdf_out

    return assets.mapInPandas(extract, DECODED_SCHEMA)


def decode_features(assets: DataFrame, real_decode: bool = False, frame_stride: int = 16) -> DataFrame:
    """Per-asset feature extraction over mapInPandas (Arrow-batched).

    ``real_decode=True`` routes to :func:`decode_media_features` (real WAV
    and BMP decoding) with the SAME ``frame_stride`` the caller passed (the
    real decoder's own default is 2 — callers relying on this wrapper's 16
    get 16 on both paths); the default path is the deterministic
    byte-statistic fake used by the video plumbing tests.
    """
    if real_decode:
        return decode_media_features(assets, frame_stride=frame_stride)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            byte_sum = payload.map(lambda b: sum(b))  # deterministic fake "decode"
            meta = pdf["meta"]
            width = meta.map(lambda m: int(dict(m).get("declared_w", "0")))
            height = meta.map(lambda m: int(dict(m).get("declared_h", "0")))
            frames = (n_bytes // frame_stride).clip(lower=1).astype("int32")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "n_frames_sampled": frames,
                }
            )

    return assets.mapInPandas(extract, FEATURE_SCHEMA)
