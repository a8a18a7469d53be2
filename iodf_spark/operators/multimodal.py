"""Multimodal (image/audio/video) column handling for training-data
pipelines. Media payloads are opaque `binary` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched Pandas UDFs over mapInPandas — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested.

Codec tiers (one logical operation, pluggable codecs — the reference's
serializer contract, IoType.scala:61-81):

* `decode_metadata` — clearly-marked deterministic FAKE (byte
  arithmetic), kept for oracle-replayable plumbing attestation.
* `decode_headers` — REAL metadata decode with NO dependencies
  (round-10): PNG IHDR and JPEG SOFn width/height/channels parsed from
  the actual byte layouts with stdlib ``struct`` alone, so THIS
  container runs a genuine codec end-to-end. Pixel data is untouched —
  metadata extraction over a 100 TB crawl reads a few hundred header
  bytes per blob, which is exactly what this tier models.
* `decode_media_headers` — the same real-codec tier for ALL THREE
  modalities of the build brief: adds WAV (RIFF chunk walk — channels /
  sample rate / frame-count duration) and MP4 (ISO-BMFF box walk —
  mvhd timescale+duration, trak count) to the PNG/JPEG parsers, unified
  behind one magic-byte dispatch and one nullable output schema.
* `decode_real` — the optional-dependency wiring: with PIL importable it
  decodes real image headers (any PIL format) executor-side into the
  SAME output schema; without it, it raises NotImplementedError (or
  degrades to the fake explicitly via fallback_to_fake=True) — the
  dataflow around the codec does not change either way.

Scale notes: mapInPandas streams Arrow record batches — no row-at-a-time
serde; binary payloads never pass through Python object pickling. Batch
size bounds executor memory via spark.sql.execution.arrow.maxRecordsPerBatch.
Feature vectors come back as array<float> ready for the similarity
operators (operators/similarity.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """FAKE deterministic 'decode': metadata derived from byte arithmetic so
    tests and the DuckDB oracle can reproduce it. Replace with a real codec
    (PIL.Image.open etc.) in production."""
    n = len(payload)
    return n, 1 + n % 64, 1 + n % 48, 3


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """FAKE deterministic feature vector: polynomial byte hash per dim."""
    out = []
    acc = 7
    for d in range(dim):
        acc = (acc * 31 + (payload[d % len(payload)] if payload else 0) + d) % 1_000_000_007
        out.append(float(acc % 1000) / 1000.0)
    return out


# channels per PNG color type (spec §11.2.2): greyscale, RGB, palette,
# greyscale+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers carrying frame dims: C0-CF minus C4 (DHT), C8 (JPG
# extension), CC (DAC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def parse_image_header(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """REAL image metadata from the container byte layout, stdlib-only:

    * PNG: walk chunks (len:4BE, type:4, data, crc:4) from the 8-byte
      signature to IHDR; width/height are the first two 4-byte BE fields,
      channels map from the color-type byte (spec §11.2.2).
    * JPEG: walk markers from SOI (FFD8); any SOFn segment (FFC0-FFCF
      minus DHT/DAC/JPG) carries precision:1, height:2BE, width:2BE,
      n_components:1.

    Returns (width, height, channels), or (None, None, None) for
    unrecognized/truncated payloads — at 100 TB a crawler corpus WILL
    contain corrupt blobs and a poisoned task must not kill the stage.
    CRCs are deliberately not verified: metadata extraction reads a few
    hundred bytes per blob; integrity is the storage layer's contract."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        pos = 8
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            if ctype == b"IHDR":
                if pos + 8 + 13 > len(payload):
                    return None, None, None
                w, h = struct.unpack(">II", payload[pos + 8 : pos + 16])
                color = payload[pos + 17]
                return int(w), int(h), _PNG_CHANNELS.get(int(color))
            pos += 8 + clen + 4
        return None, None, None
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None, None, None
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
                pos += 2
                continue
            if pos + 4 > len(payload):
                return None, None, None
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if marker in _JPEG_SOF:
                if pos + 10 > len(payload):
                    return None, None, None
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                ncomp = payload[pos + 9]
                return int(w), int(h), int(ncomp)
            pos += 2 + seglen
    return None, None, None


def decode_headers(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """REAL metadata decode that runs in THIS environment: Arrow-batched
    mapInPandas over :func:`parse_image_header` (stdlib PNG IHDR / JPEG
    SOFn), schema-identical to decode_metadata/decode_real — the
    pluggable-codec contract. Unrecognized payloads yield NULL
    width/height/channels, never a failed batch."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(META_SCHEMA.fields)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, widths, heights, channels = [], [], [], []
            for p in pdf[payload_col]:
                b = bytes(p)
                n_bytes.append(len(b))
                w, h, c = parse_image_header(b)
                widths.append(w)
                heights.append(h)
                channels.append(c)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "channels": pd.array(channels, dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def attach_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Test helper: synthesize a binary payload column from text (the
    testdata has no real media; the plumbing doesn't care)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Decode media metadata via mapInPandas (Arrow-batched). Output:
    (id, n_bytes, width, height, channels)."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(META_SCHEMA.fields)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode_meta(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "channels": [m[3] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def extract_features(
    df: DataFrame, id_col: str, payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Per-payload feature vector (array<float>) via mapInPandas."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "features": [_fake_features(p, dim) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(feats, out_schema)


def frame_sample(
    df: DataFrame, id_col: str, payload_col: str = "payload", n_frames: int = 4
) -> DataFrame:
    """'Video' frame sampling: split the payload into n_frames byte ranges,
    one output row per frame with its offset/length (the decode of each
    frame would plug in here). Output: (id, frame_idx, offset, length)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                n = len(p)
                step = max(n // n_frames, 1)
                for k in range(n_frames):
                    off = min(k * step, n)
                    ids.append(i)
                    idxs.append(k)
                    offs.append(off)
                    lens.append(min(step, n - off))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "offset": offs, "length": lens}
            )

    return df.select(id_col, payload_col).mapInPandas(frames, out_schema)


def resize(
    df: DataFrame,
    id_col: str,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """'Resize' media payloads to (target_w, target_h) via mapInPandas.

    The codec is the same clearly-marked deterministic FAKE as the rest of
    this module (no image libs in this container): output size is the
    exact target_w*target_h*3 RGB byte count and the checksum is byte
    arithmetic the oracle reproduces from input lengths. Swap the body for
    PIL's Image.resize in production — the Arrow batch plumbing, schema
    and partitioning are the real, tested part.

    Output: (id, width, height, n_bytes_out, checksum)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes_out", T.LongType()),
            T.StructField("checksum", T.LongType()),
        ]
    )
    nbytes_out = target_w * target_h * 3

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_in = [len(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": target_w,
                    "height": target_h,
                    "n_bytes_out": nbytes_out,
                    # FAKE: checksum from the input length and target box
                    "checksum": [
                        (n * 31 + target_w) * 31 + target_h for n in n_in
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(do_resize, out_schema)


def decode_real(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fallback_to_fake: bool = False,
) -> DataFrame:
    """Real-codec metadata decode: PIL when importable, SCHEMA-IDENTICAL to
    :func:`decode_metadata` — (id, n_bytes, width, height, channels) — so a
    pipeline swaps the fake for the real codec without touching anything
    downstream (the pluggable-serializer contract, reference
    IoType.scala:61-81: one logical type, interchangeable codecs).

    With PIL importable, each Arrow batch decodes its payloads executor-side
    (``PIL.Image.open`` on an in-memory buffer reads only the header for
    size/bands — cheap even for large images); corrupt/undecodable payloads
    yield NULL width/height/channels rather than failing the batch, because
    at 100 TB a crawler corpus WILL contain truncated files and a poisoned
    task would otherwise kill the stage.

    Without PIL (this container): ``fallback_to_fake=True`` degrades to the
    deterministic fake (same schema, attested by the multimodal_meta
    oracle); the default raises NotImplementedError so nobody mistakes fake
    metadata for real decode output."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        if fallback_to_fake:
            return decode_metadata(df, id_col, payload_col)
        raise NotImplementedError(
            "real image decode needs PIL; this environment stubs it — use "
            "decode_metadata (deterministic fake) or fallback_to_fake=True"
        ) from e

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(META_SCHEMA.fields)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            n_bytes, widths, heights, channels = [], [], [], []
            for p in pdf[payload_col]:
                n_bytes.append(len(p))
                try:
                    with Image.open(io.BytesIO(p)) as im:
                        widths.append(im.size[0])
                        heights.append(im.size[1])
                        channels.append(len(im.getbands()))
                except Exception:  # noqa: BLE001 — corrupt payload -> NULLs
                    widths.append(None)
                    heights.append(None)
                    channels.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pd.array(n_bytes, dtype="Int64"),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "channels": pd.array(channels, dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


# ---------------------------------------------------------------------------
# audio / video container headers (round 10): WAV RIFF chunks and MP4
# ISO-BMFF boxes parsed with stdlib struct alone — with PNG/JPEG above,
# all three modalities of the build brief get a REAL metadata codec that
# runs in this container


def parse_wav_header(
    payload: bytes,
) -> tuple[int | None, int | None, int | None, int | None]:
    """REAL WAV metadata from the RIFF chunk layout (all little-endian):
    'RIFF' size 'WAVE', then (id:4, size:4LE, body) chunks — 'fmt ' carries
    (format:2, channels:2, sample_rate:4, byte_rate:4, block_align:2,
    bits:2); 'data''s declared size over block_align gives the frame count.
    Chunk walk honors the spec's word alignment (odd-sized bodies pad one
    byte). Returns (channels, sample_rate, bits, n_frames) with None for
    anything missing/truncated — a corrupt blob in a 100 TB crawl must
    degrade to nulls, never kill the batch."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None, None, None, None
    ch = rate = bits = align = data_size = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 24 <= len(payload):
            _fmt, ch, rate, _brate, align, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif cid == b"data":
            data_size = csz
        pos += 8 + csz + (csz & 1)
    n_frames = (
        data_size // align
        if data_size is not None and align not in (None, 0)
        else None
    )
    return (
        int(ch) if ch is not None else None,
        int(rate) if rate is not None else None,
        int(bits) if bits is not None else None,
        int(n_frames) if n_frames is not None else None,
    )


def _iter_boxes(payload: bytes, start: int, end: int):
    """ISO-BMFF box walk: (type, body_start, body_end) per box in
    [start, end). Handles size==1 (64-bit largesize) and size==0
    (to-end-of-enclosing); bails on any size that would not advance."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield typ, body, pos + size
        pos += size


def parse_mp4_header(
    payload: bytes,
) -> tuple[int | None, int | None, int | None]:
    """REAL MP4/ISO-BMFF metadata from the box layout (all big-endian):
    top-level boxes are (size:4BE, type:4); 'moov' contains 'mvhd' whose
    version-0 body is (ver:1, flags:3, ctime:4, mtime:4, timescale:4,
    duration:4) — version 1 widens ctime/mtime/duration to 8 bytes — and
    one 'trak' box per track. Returns (timescale, duration, n_tracks),
    Nones/0 when absent. Only ftyp-led streams are claimed (the brands in
    the wild all carry it first)."""
    import struct

    if len(payload) < 8 or payload[4:8] != b"ftyp":
        return None, None, None
    timescale = duration = None
    n_tracks = 0
    for typ, s, e in _iter_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _iter_boxes(payload, s, e):
            if t2 == b"mvhd" and s2 < e2:
                ver = payload[s2]
                if ver == 1 and s2 + 32 <= e2:
                    timescale, duration = struct.unpack(
                        ">IQ", payload[s2 + 20 : s2 + 32]
                    )
                elif ver == 0 and s2 + 20 <= e2:
                    timescale, duration = struct.unpack(
                        ">II", payload[s2 + 12 : s2 + 20]
                    )
            elif t2 == b"trak":
                n_tracks += 1
    return (
        int(timescale) if timescale is not None else None,
        int(duration) if duration is not None else None,
        int(n_tracks),
    )


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
    ]
)


def parse_media_header(payload: bytes) -> dict:
    """Unified modality dispatch on magic bytes: PNG/JPEG -> image fields,
    RIFF/WAVE -> audio fields (duration from declared frame count over
    sample rate), ftyp -> video fields (duration from mvhd
    duration/timescale). Unrecognized -> kind None, all fields None.

    Contract: a corrupt blob degrades to the all-None row, never kills the
    Arrow batch — per-blob parsing is wrapped so a truncated struct read
    (e.g. an mvhd box ending mid-field) surfaces as nulls, not an executor
    exception taking out every sibling blob in the batch."""
    try:
        return _parse_media_header_unsafe(payload)
    except (struct.error, IndexError, ValueError):
        return {
            "kind": None,
            "width": None,
            "height": None,
            "channels": None,
            "sample_rate": None,
            "duration_ms": None,
            "n_tracks": None,
        }


def _parse_media_header_unsafe(payload: bytes) -> dict:
    out = {
        "kind": None,
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "duration_ms": None,
        "n_tracks": None,
    }
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        w, h, c = parse_image_header(payload)
        out.update(
            kind="png" if payload[:2] == b"\x89P" else "jpeg",
            width=w,
            height=h,
            channels=c,
        )
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        ch, rate, _bits, n_frames = parse_wav_header(payload)
        dur = (
            n_frames * 1000 // rate
            if n_frames is not None and rate not in (None, 0)
            else None
        )
        out.update(kind="wav", channels=ch, sample_rate=rate, duration_ms=dur)
    elif len(payload) >= 8 and payload[4:8] == b"ftyp":
        ts, dur, n_tracks = parse_mp4_header(payload)
        ms = dur * 1000 // ts if dur is not None and ts not in (None, 0) else None
        out.update(kind="mp4", duration_ms=ms, n_tracks=n_tracks)
    return out


def decode_media_headers(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """REAL all-modality metadata decode in THIS environment: Arrow-batched
    mapInPandas over :func:`parse_media_header` (PNG IHDR / JPEG SOFn /
    WAV RIFF / MP4 ISO-BMFF, stdlib struct only). Output: (id, n_bytes,
    kind, width, height, channels, sample_rate, duration_ms, n_tracks);
    unrecognized payloads yield kind NULL, never a failed batch."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(MEDIA_SCHEMA.fields)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k.name: [] for k in MEDIA_SCHEMA.fields
            }
            for p in pdf[payload_col]:
                b = bytes(p)
                m = parse_media_header(b)
                cols["n_bytes"].append(len(b))
                cols["kind"].append(m["kind"])
                cols["width"].append(m["width"])
                cols["height"].append(m["height"])
                cols["channels"].append(m["channels"])
                cols["sample_rate"].append(m["sample_rate"])
                cols["duration_ms"].append(m["duration_ms"])
                cols["n_tracks"].append(m["n_tracks"])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": pd.array(cols["n_bytes"], dtype="Int64"),
                    "kind": cols["kind"],
                    "width": pd.array(cols["width"], dtype="Int32"),
                    "height": pd.array(cols["height"], dtype="Int32"),
                    "channels": pd.array(cols["channels"], dtype="Int32"),
                    "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                    "duration_ms": pd.array(cols["duration_ms"], dtype="Int64"),
                    "n_tracks": pd.array(cols["n_tracks"], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)
