"""L5 — multimodal columns: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction.

Design (north-star; no analog in the reference): media travels as a
``BinaryType`` column next to relational metadata. Decode / resize /
frame-sample are per-batch Pandas functions over ``mapInPandas`` —
Arrow moves the bytes once per batch, and the decoder is dependency-
injected so environments without image/audio libs run the pipeline
with the deterministic stub (the container has no codec libs; the
real-decoder seam raises NotImplementedError by design).

Scale notes: payload bytes never shuffle — ``extract_binary_features``
is a narrow mapInPandas directly over the scan, and only the small
typed feature rows flow downstream. Partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` against payload size, not row
count.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("tag", StringType()),
    ]
)

Decoder = Callable[[bytes], dict]


def real_media_decoder(payload: bytes) -> dict:
    """Seam for a real image/audio decoder (PIL / ffmpeg / torchaudio).
    Not available in this container — wire your own through
    ``extract_binary_features(decoder=...)``."""
    raise NotImplementedError(
        "media codecs are not installed; inject a decoder or use stub_decoder"
    )


def stub_decoder(payload: bytes) -> dict:
    """Deterministic fake decode: metadata derived only from the bytes,
    so tests and the oracle can recompute it."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
        "tag": "stub",
    }


WAV_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("tag", StringType()),
    ]
)


def wav_header_decoder(payload: bytes) -> dict:
    """A REAL (non-stub) decoder through the same seam, dependency-free:
    parses RIFF/WAVE fmt+data chunks with stdlib ``struct`` — the
    integration example for wiring an actual media decoder into
    ``extract_binary_features(decoder=..., schema=...)``. Raises
    ValueError on non-WAV payloads (a production pipeline routes those
    to a quarantine sink instead of crashing the batch)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            channels, rate = struct.unpack_from("<HI", payload, pos + 10)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    frame_bytes = channels * (bits // 8)
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_channels": channels,
        "n_frames": data_len // frame_bytes if frame_bytes else 0,
        "tag": "wav",
    }


PNG_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color_type", IntegerType()),
        StructField("n_chunks", IntegerType()),
        StructField("tag", StringType()),
    ]
)


def png_header_decoder(payload: bytes) -> dict:
    """The image-modality counterpart of ``wav_header_decoder`` — a
    REAL stdlib-only decoder through the same seam: validates the PNG
    signature, walks the chunk list (verifying each chunk's CRC32 the
    way a hardened ingest pipeline must before trusting crawled bytes),
    and reads width/height/bit-depth/color-type out of IHDR. Raises
    ValueError on non-PNG or corrupt payloads (route to quarantine at
    scale, don't crash the batch)."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, meta, n_chunks = 8, None, 0
    while pos + 8 <= len(payload):
        clen, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack_from(">IIBB", body)
            meta = (w, h, depth, color)
        pos += 12 + clen
        if ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("missing IHDR chunk")
    return {
        "n_bytes": len(payload),
        "width": meta[0],
        "height": meta[1],
        "bit_depth": meta[2],
        "color_type": meta[3],
        "n_chunks": n_chunks,
        "tag": "png",
    }


def attach_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: utf-8 bytes of the text as
    the opaque payload (stand-in for image/audio bytes) + metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def extract_binary_features(
    media: DataFrame,
    decoder: Decoder = stub_decoder,
    schema: StructType = FEATURE_SCHEMA,
    on_error: str = "raise",
) -> DataFrame:
    """L5: per-batch feature extraction over the binary column.

    ``mapInPandas`` (not a scalar UDF) so the decoder can amortize
    per-batch setup (model load, codec context) across rows — the same
    shape a real frame-sampler or embedder needs. ``schema`` must match
    the decoder's output dict plus ``doc_id`` (see WAV_FEATURE_SCHEMA /
    wav_header_decoder for a real, dependency-free decoder example).

    ``on_error='quarantine'`` is the at-scale mode: a payload the
    decoder rejects yields a row with NULL features and
    ``tag='error'`` instead of failing the whole task — one corrupt
    crawled file must not kill a 10-GB partition. Filter
    ``tag = 'error'`` into a quarantine sink downstream. The default
    stays fail-fast for pipelines that prefer loud breakage.
    Quarantine catches ``ValueError`` (a decoder's explicit reject)
    AND ``struct.error`` — the header decoders' unpack_from raises the
    latter on payloads truncated mid-field, which is exactly the
    corrupt-file shape quarantine exists for (r15 review: the first
    cut caught only ValueError, so a mid-field truncation killed the
    task anyway).
    """
    import struct

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    names = [f.name for f in schema.fields]

    def decode_one(payload: bytes) -> dict:
        if on_error == "raise":
            return decoder(payload)
        try:
            return decoder(payload)
        except (ValueError, struct.error):
            return {n: None for n in names if n != "doc_id"} | {"tag": "error"}

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[names]

    return media.mapInPandas(extract, schema)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """L5: frame sampling — ONE payload row expands to N frame rows
    (fixed-size byte windows; a video decoder would emit keyframes the
    same way). The expansion happens inside ``mapInPandas`` so frame
    extraction amortizes per batch and raw frame bytes can be dropped
    (only typed metadata + content hash flow on) — at 100 TB the whole
    point is that the big bytes die in the same task that read them.
    """
    import hashlib

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for idx in range((len(p) + frame_bytes - 1) // frame_bytes):
                    frame = p[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        (doc_id, idx + 1, len(frame), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_md5"]
            )

    return media.mapInPandas(explode_frames, FRAME_SCHEMA)
