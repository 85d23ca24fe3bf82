"""Multimodal column plumbing (SURVEY §2.H L5/L6).

Images/audio/video ride through the engine as opaque ``binary`` payload
columns beside a typed metadata struct. The Spark-side machinery here —
schema, Arrow batch shape, ``mapInPandas`` iterator contract, partition
sizing — is real and tested; the image codec (``decode_image``) activates
when Pillow is installed and raises a declared ``NotImplementedError``
where it is not (this test container ships no imaging library).

Design for 100 TB of blobs: payloads stay columnar in parquet (or are
referenced by URI and fetched inside the batch iterator); feature extraction
is ``mapInPandas`` so each task processes Arrow batches without per-row
Python overhead, and the output schema is declared up front so downstream
plans stay fully typed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_byte_features
BYTE_FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, first_byte int, last_byte int, "
    "ascii_ratio double"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach an opaque binary payload + metadata struct. In production the
    payload is the raw media; here it is the utf-8 encoding of the text
    column (deterministic, lets the oracle verify the plumbing)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Batch feature extraction over binary payloads via ``mapInPandas``:
    each Arrow batch arrives as a pandas DataFrame, features are computed
    vectorized, and the declared schema keeps the plan typed."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            lens = payloads.str.len().to_numpy(dtype=np.int64)
            # vectorize across the WHOLE batch: one concatenated uint8 view,
            # per-row ascii counts via reduceat over row offsets — no
            # per-byte Python loop (same pattern as the simhash UDF)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
            if len(flat):
                idx = np.minimum(offsets, len(flat) - 1)
                ascii_counts = np.add.reduceat(
                    (flat < 128).astype(np.int64), idx
                )
            else:
                ascii_counts = np.zeros(len(pdf), dtype=np.int64)
            nonempty = lens > 0
            ratio = np.zeros(len(pdf))
            ratio[nonempty] = ascii_counts[nonempty] / lens[nonempty]
            first = np.full(len(pdf), -1, dtype=np.int32)
            last = np.full(len(pdf), -1, dtype=np.int32)
            first[nonempty] = flat[offsets[nonempty]]
            last[nonempty] = flat[
                (offsets + lens - 1)[nonempty]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": lens.astype("int32"),
                    "first_byte": first,
                    "last_byte": last,
                    "ascii_ratio": np.round(ratio, 4),
                }
            )

    return df.mapInPandas(op, schema=BYTE_FEATURE_SCHEMA)


def rebalance_for_python(df: DataFrame) -> DataFrame:
    """Round-robin repartition ahead of a Python crossing when the
    input has FEWER partitions than the session's default parallelism.

    A ``mapInPandas`` stage inherits its input's partitioning, and a
    small single-file parquet scan yields ONE partition — so the whole
    Arrow chunker runs single-threaded no matter how many cores the
    session has (measured: the perceptual checkpoint stage dropped
    ~2.4s -> sub-second at sf0.1 once the crossing ran on 32 tasks).
    At 100 TB the scan already carries thousands of partitions, so the
    guard makes this a no-op there — the shuffle is only paid exactly
    when it is cheap (input smaller than one partition per core)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


#: output schema of sample_frames
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_len int"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    stride: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic frame sampler over binary payloads — the video
    frame-extraction SHAPE with a fake codec: the payload is treated as a
    sequence of fixed-size ``frame_bytes`` chunks and every ``stride``-th
    chunk is emitted as one output row (1→N fan-out through the Arrow
    batch iterator, schema declared up front). A real implementation swaps
    the chunk slicing for libav frame decode; nothing else changes.

    Emits (doc_id, frame_idx, frame, frame_len); a final partial chunk is
    kept (frame_len < frame_bytes) so the byte coverage is auditable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                for fi, start in enumerate(range(0, n, frame_bytes)):
                    if fi % stride:
                        continue
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(payload[start : start + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "frame_len": pd.Series(
                        [len(f) for f in frames], dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(op, schema=FRAME_SCHEMA)


#: output schema of decode_image
IMAGE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, thumb binary"
)


def _pil_image():
    """Lazy optional dependency: the container may or may not ship Pillow.
    Returning the module (or None) instead of importing at module load
    keeps the package importable everywhere; the operator gates on it."""
    try:
        from PIL import Image  # noqa: PLC0415 — optional dep, lazy by design
    except ImportError:
        return None
    return Image


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    thumb_px: int = 8,
) -> DataFrame:
    """Image decode / resize over binary payloads — a REAL operator wherever
    Pillow is installed, a clearly-declared ``NotImplementedError`` where it
    is not (this container ships no imaging library).

    With Pillow present: ``mapInPandas`` over Arrow batches, one PIL decode
    per payload, emitting (doc_id, width, height, channels, thumb) where
    ``thumb`` is a ``thumb_px``×``thumb_px`` RGB PNG — the
    decode/feature-extract/resize shape of an image-curation pipeline.
    Undecodable payloads yield (-1, -1, -1, empty) rather than failing the
    task: at 100 TB of scraped blobs, a corrupt image must not kill a batch
    (same posture as the PERMISSIVE JSON source). Per-row Python cost is
    the codec itself — exactly the work that cannot be vectorized — while
    batch transport stays Arrow.
    """
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "image decode requires Pillow, not shipped in this environment; "
            "install PIL to activate (plumbing is live — see "
            "extract_byte_features / sample_frames for the codec-free paths)"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, ws, hs, chs, thumbs = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = Image.open(io.BytesIO(payload))
                    img.load()
                    w, h = img.size
                    ch = len(img.getbands())
                    buf = io.BytesIO()
                    img.convert("RGB").resize((thumb_px, thumb_px)).save(
                        buf, format="PNG"
                    )
                    tb = buf.getvalue()
                except Exception:  # noqa: BLE001 — corrupt blob ≠ dead batch
                    w = h = ch = -1
                    tb = b""
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                chs.append(ch)
                thumbs.append(tb)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(chs, dtype="int32"),
                    "thumb": pd.Series(thumbs, dtype=object),
                }
            )

    return df.mapInPandas(op, schema=IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Codec-free PNG encode + image-header metadata decode (SURVEY §2.P P7).
#
# The one honest hole in L5 so far was that the real image decode gated on
# Pillow, which this container does not ship. Header-grain decode needs NO
# imaging library: a valid PNG is stdlib zlib plus struct packing, and the
# metadata an image-curation pipeline filters on FIRST (dimensions, bit
# depth, color type, format validity — "drop everything under 64px or not
# RGB" runs before any pixel ever decodes at 100 TB) lives entirely in the
# fixed-offset header bytes. So the encoder below emits REAL spec-valid
# PNGs (verifiable by any external tool) and the parser reads IHDR / JPEG
# SOF frames exactly as written — no fake codec, no stub.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: output schema of extract_image_metadata
IMAGE_META_SCHEMA = (
    "doc_id bigint, format string, width int, height int, bit_depth int, "
    "color_type int, n_chunks int, valid boolean"
)


def encode_png_gray8(width: int, height: int, pixels: bytes) -> bytes:
    """A REAL (spec-conformant) 8-bit grayscale PNG from raw pixel bytes —
    stdlib only: IHDR/IDAT/IEND chunks with CRC32s, scanlines filter-0,
    zlib-deflated. ``pixels`` must be exactly ``width*height`` bytes.
    Deterministic for fixed inputs (zlib level 6), so pipelines built on it
    are retry-stable."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(
            f"need {width * height} pixel bytes, got {len(pixels)}"
        )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def parse_image_header(payload: bytes) -> tuple:
    """(format, width, height, bit_depth, color_type, n_chunks, valid) from
    raw image bytes. PNG: walks the chunk list and reads IHDR at its fixed
    offset. JPEG: scans marker segments to the first SOF0-SOF15 frame
    header (the dimensional source of truth; n_chunks counts markers,
    bit_depth is sample precision, color_type is component count).
    Anything else → ('unknown', -1, ..., false) — corrupt blobs classify,
    they never throw (same posture as decode_image)."""
    import struct

    try:
        if payload[:8] == _PNG_SIG:
            if payload[12:16] != b"IHDR" or len(payload) < 33:
                return ("png", -1, -1, -1, -1, 0, False)
            w, h = struct.unpack(">II", payload[16:24])
            depth, ctype = payload[24], payload[25]
            n, pos = 0, 8
            while pos + 8 <= len(payload):
                (ln,) = struct.unpack(">I", payload[pos : pos + 4])
                n += 1
                if payload[pos + 4 : pos + 8] == b"IEND":
                    break
                pos += 12 + ln
            return ("png", w, h, depth, ctype, n, True)
        if payload[:2] == b"\xff\xd8":
            n, pos = 1, 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    break
                marker = payload[pos + 1]
                n += 1
                if 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4,
                    0xC8,
                    0xCC,
                ):
                    prec = payload[pos + 4]
                    h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                    ncomp = payload[pos + 9]
                    return ("jpeg", w, h, prec, ncomp, n, True)
                (seg,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
                pos += 2 + seg
            return ("jpeg", -1, -1, -1, -1, n, False)
    except (IndexError, struct.error):
        pass
    return ("unknown", -1, -1, -1, -1, 0, False)


def extract_image_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Header-grain image metadata over binary payloads via ``mapInPandas``
    — the dimension/format filter an image pipeline runs BEFORE pixel
    decode. Per-row work is a few fixed-offset byte reads; transport is
    Arrow batches; undecodable payloads classify as invalid rows instead of
    failing the task."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": pd.Series(
                        [r[0] for r in rows], dtype=object
                    ),
                    "width": pd.Series([r[1] for r in rows], dtype="int32"),
                    "height": pd.Series([r[2] for r in rows], dtype="int32"),
                    "bit_depth": pd.Series(
                        [r[3] for r in rows], dtype="int32"
                    ),
                    "color_type": pd.Series(
                        [r[4] for r in rows], dtype="int32"
                    ),
                    "n_chunks": pd.Series(
                        [r[5] for r in rows], dtype="int32"
                    ),
                    "valid": pd.Series([r[6] for r in rows], dtype=bool),
                }
            )

    return df.mapInPandas(op, schema=IMAGE_META_SCHEMA)


def decode_png_gray8(payload: bytes) -> tuple[int, int, bytes] | None:
    """REAL pixel decode of an 8-bit grayscale filter-0 PNG — the exact
    inverse of :func:`encode_png_gray8`, stdlib only: walk the chunk
    list, concatenate every IDAT payload (the zlib stream may be split
    across chunks — re-encoders do this), inflate, and strip the
    per-scanline filter byte. Ancillary chunks (tEXt, …) are skipped,
    so two byte-different encodes of the same pixels decode equal.
    Returns ``(width, height, pixels)`` or ``None`` for anything this
    decoder does not own (non-PNG, non-gray8, non-filter-0, corrupt
    stream) — callers classify, they never throw."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG or payload[12:16] != b"IHDR":
        return None
    if len(payload) < 33:
        return None
    w, h = struct.unpack(">II", payload[16:24])
    depth, ctype = payload[24], payload[25]
    if depth != 8 or ctype != 0 or w <= 0 or h <= 0:
        return None
    idat = b""
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        if tag == b"IEND":
            break
        pos += 12 + ln
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) != (w + 1) * h:
        return None
    out = bytearray()
    for r in range(h):
        line = raw[r * (w + 1) : (r + 1) * (w + 1)]
        if line[0] != 0:  # only filter-0 scanlines (what we encode)
            return None
        out += line[1:]
    return w, h, bytes(out)


def png_reencode_variant(payload: bytes) -> bytes:
    """A byte-DIFFERENT, pixel-IDENTICAL re-encode of a PNG: the IDAT
    stream is split across two chunks and an ancillary tEXt chunk is
    inserted — both spec-legal, both invisible to any conforming
    decoder (IDAT data concatenates before inflate; tEXt is skippable).
    The planted adversary for perceptual dedup: exact byte/content
    hashes scatter re-encodes, the decoded-pixel aHash must unify
    them."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    out = [_PNG_SIG]
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IDAT":
            cut = max(1, len(data) // 2)
            out.append(chunk(b"tEXt", b"Software\x00reencode"))
            out.append(chunk(b"IDAT", data[:cut]))
            out.append(chunk(b"IDAT", data[cut:]))
        else:
            out.append(chunk(tag, data))
        if tag == b"IEND":
            break
        pos += 12 + ln
    return b"".join(out)


def gray8_block_mean(
    w: int, h: int, pixels: bytes, grid: int = 8
) -> bytes | None:
    """``grid``×``grid`` block-mean downsample of a gray8 pixel array —
    the classic aHash "resize" step, DERANDOMIZED as pure integer
    arithmetic (block mean = pixel sum // block size) so an external
    SQL oracle can restate it verbatim. Requires dimensions divisible
    by ``grid`` (curation filters on header metadata first; odd sizes
    classify out) — returns None otherwise. Output is ``grid*grid``
    bytes, row-major: exactly the frame layout
    :func:`perceptual_frame_hash` keys on."""
    if w % grid or h % grid or len(pixels) != w * h:
        return None
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w).astype(
        np.int64
    )
    bh, bw = h // grid, w // grid
    bm = a.reshape(grid, bh, grid, bw).sum(axis=(1, 3)) // (bh * bw)
    return bytes(bm.astype(np.uint8).reshape(-1))


def decoded_thumb_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough: str = "",
    grid: int = 8,
) -> DataFrame:
    """Decoded-pixel frame rows from PNG payloads: each image decodes
    (:func:`decode_png_gray8`), block-means to a ``grid``×``grid``
    thumbnail (:func:`gray8_block_mean`), and emits ONE frame row
    ``(id, frame_idx=0, frame)`` ready for
    :func:`perceptual_frame_hash` — the real image path the identity
    64-byte "frame" stood in for (VERDICT r10 item 6). Undecodable or
    off-grid payloads are dropped (header-grain curation runs first at
    100 TB; this operator owns only what it can decode exactly).

    ``passthrough`` is an optional schema fragment (``"pm string"``) of
    input columns copied verbatim onto the output rows — e.g. a payload
    content hash for re-encode accounting. mapInPandas over Arrow
    batches; per-image Python work is one inflate + one numpy reshape.
    """
    names = [
        part.strip().split()[0]
        for part in passthrough.split(",")
        if part.strip()
    ]
    schema = f"{id_col} bigint, frame_idx int, frame binary"
    if passthrough:
        schema += ", " + passthrough

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames = [], []
            extras: dict[str, list] = {n: [] for n in names}
            for pos, (i, p) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                dec = decode_png_gray8(p) if p is not None else None
                if dec is None:
                    continue
                bm = gray8_block_mean(dec[0], dec[1], dec[2], grid)
                if bm is None:
                    continue
                ids.append(int(i))
                frames.append(bm)
                for n in names:
                    extras[n].append(pdf[n].iloc[pos])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(
                        [0] * len(ids), dtype="int32"
                    ),
                    "frame": pd.Series(frames, dtype=object),
                    **{
                        n: pd.Series(extras[n], dtype=object)
                        for n in names
                    },
                }
            )

    return df.mapInPandas(op, schema=schema)


#: output schema of extract_pcm_features
PCM_FEATURE_SCHEMA = (
    "vec_id bigint, n_samples int, rms double, n_zero_cross int, peak int"
)


def pack_pcm16(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Synthesize little-endian int16 PCM payloads from an embedding
    column (sample_i = half-away-from-zero round of component_i * 1000 —
    the same explicit rounding as the int8 quantizer, so SQL ROUND
    reproduces every sample). Stands in for a real audio decode the way
    encode_png_gray8 stands in for an image corpus: the BYTES are real
    PCM any audio tool can read."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype=np.float64) * 1000.0
                s = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype("<i2")
                payloads.append(s.tobytes())
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.mapInPandas(op, schema="vec_id bigint, payload binary")


def extract_pcm_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "vec_id"
) -> DataFrame:
    """Audio feature extraction over raw PCM bytes via ``mapInPandas``:
    ``np.frombuffer`` views each payload as int16 samples (zero-copy),
    then vectorized numpy computes RMS energy, zero-crossing count, and
    peak amplitude — the waveform-grain features an audio-curation
    pipeline filters on (silence/clipping detection) before any codec or
    model runs. Integer sums + IEEE-correctly-rounded sqrt make RMS
    exactly reproducible cross-engine (unlike ln/exp, sqrt is exact per
    IEEE 754 — the reason RMS can be hash-stamped while perplexities
    cannot). Odd-length payloads classify as invalid (-1 features)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, zc, pk = [], [], [], [], []
            for vid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(vid)
                if payload is None or len(payload) % 2:
                    ns.append(-1)
                    rms.append(-1.0)
                    zc.append(-1)
                    pk.append(-1)
                    continue
                s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
                n = len(s)
                ns.append(n)
                rms.append(
                    float(np.sqrt((s * s).sum() / n)) if n else 0.0
                )
                zc.append(int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0)
                pk.append(int(np.abs(s).max()) if n else 0)
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "n_zero_cross": pd.Series(zc, dtype="int32"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.mapInPandas(op, schema=PCM_FEATURE_SCHEMA)


#: bands per 64-bit perceptual key (16 bits each) — two frames within
#: Hamming distance 3 of each other share at least one untouched band
#: by pigeonhole, so banded grouping finds every such pair without an
#: all-pairs comparison
AHASH_BANDS = 4

#: default hot-bucket cap: band buckets with more keys than this are
#: skipped by the pair join (a degenerate hot band would go quadratic)
#: and MUST be reported by callers. ONE constant so the operator
#: default, the census filter, and the SQL oracles cannot
#: desynchronize the skip set from its mandated reporting.
MAX_BAND_BUCKET = 1000


def band_columns(hi: F.Column, lo: F.Column) -> tuple:
    """The four 16-bit band slices of a 64-bit key split as
    ``(hi, lo)`` BIGINT halves — THE band-layout definition, used by
    the key projection, the bucket explode, and the first-collision
    predicate alike so a layout change cannot desynchronize them."""
    return (
        lo.bitwiseAND(F.lit(65535)),
        F.shiftrightunsigned(lo, 16),
        hi.bitwiseAND(F.lit(65535)),
        F.shiftrightunsigned(hi, 16),
    )


def perceptual_frame_hash(
    frames: DataFrame,
    frame_bytes: int = 64,
    id_col: str = "doc_id",
    idx_col: str = "frame_idx",
    frame_col: str = "frame",
    keep: dict[str, F.Column] | None = None,
) -> DataFrame:
    """64-bit AVERAGE-HASH perceptual key per frame — the content-hash
    upgrade of the exact frame census (SURVEY §2.BL1): each of the
    frame's 64 bytes is a gray8 pixel, and bit ``i`` of the key is
    ``pixel_i * 64 > sum(pixels)`` (strict integer compare — exactly
    the classic aHash "pixel above mean" with the division cleared, so
    the whole key is DERANDOMIZED integer arithmetic an external SQL
    oracle can restate verbatim). Near-identical frames — re-encodes,
    brightness-stable watermark shifts, single-pixel noise — keep the
    same key or drift by a few bits, while exact hashes scatter.

    Output per full frame (partial tail frames carry no 8x8 grid and
    are exact-dedup territory — filtered): ``ah_hi``/``ah_lo`` (bits
    32-63 / 0-31 of the key, two BIGINTs so no sign-bit games),
    optional ``keep`` passthrough expressions (name → Column over the
    input frame, e.g. an exact content hash for merge accounting) and
    ``band0..band3`` (16-bit slices). GROUPing on the full key gives
    perceptual clusters; grouping on any band gives the Hamming-<=3
    candidate buckets (pigeonhole over :data:`AHASH_BANDS`), each of
    which a verifier can re-check with ``bit_count`` XOR popcounts —
    never an all-pairs pass.

    Everything is JVM expression arithmetic on the binary column
    (``conv(hex(substring(frame, i, 1)), 16, 10)`` per byte — byte-true
    for arbitrary payloads, not just ASCII), inside whole-stage
    codegen: no Python crossing, one narrow projection, combinable
    aggregates downstream. A real image pipeline swaps the identity
    "resize" (64 payload bytes ARE the 8x8 grid) for a decoded
    block-mean over ``decode_image``'s pixel output; the key algebra
    and the banding do not change.

    100 TB shape: frame-grain linear scan, no shuffle here; the census
    / clustering group-bys downstream shuffle once on 8-byte keys.
    """
    if frame_bytes != 64:
        raise ValueError(
            "perceptual_frame_hash packs one bit per payload byte into a "
            f"64-bit key; frame_bytes must be 64, got {frame_bytes}"
        )
    # every per-pixel expression is built as ONE generated-SQL parse
    # (F.expr) instead of a loop of F.* calls: each F.* call is a py4j
    # driver↔JVM round trip, and the ~1500 calls the loop form made
    # cost ~1.5 s of PLAN CONSTRUCTION per build at any data size
    # (measured r15; same cost class as clustering.lit_double_array).
    # The parsed strings spell out the exact tree the F.* calls built —
    # conv(hex(substring)) per byte, CASE WHEN per bit — so the
    # analyzed/optimized plan is unchanged (diffed in r15).
    fcol = f"`{frame_col}`"
    px = [
        F.expr(
            f"cast(conv(hex(substring({fcol}, {i + 1}, 1)), 16, 10) "
            f"as bigint) as __px{i}"
        )
        for i in range(64)
    ]
    keep = keep or {}
    keep_names = list(keep)
    base = frames.filter(
        F.length(F.col(frame_col)) == frame_bytes
    ).select(
        F.col(id_col),
        F.col(idx_col),
        *[c.alias(n) for n, c in keep.items()],
        *px,
    )
    # the pixel sum is materialized as a COLUMN, not inlined: each of
    # the 64 bit expressions references it, and an inline 64-term sum
    # would blow the expression tree up to ~4k nodes (64 bits x 64-term
    # sum) — measured ~1.5s of driver-side Catalyst analysis PER BUILD
    # at any data size. As a non-cheap column used 64 times,
    # CollapseProject keeps it shared and the tree stays ~500 nodes.
    base = base.withColumn(
        "__tot",
        F.expr("0 + " + " + ".join(f"__px{i}" for i in range(64))),
    )

    def _pack(lo_bit: int) -> F.Column:
        terms = " + ".join(
            f"(CASE WHEN __px{i} * 64 > __tot "
            f"THEN shiftleft(cast(1 as bigint), {i - lo_bit}) "
            f"ELSE cast(0 as bigint) END)"
            for i in range(lo_bit, lo_bit + 32)
        )
        return F.expr(f"cast(0 as bigint) + {terms}")

    keyed = base.select(
        id_col,
        idx_col,
        *keep_names,
        _pack(32).alias("ah_hi"),
        _pack(0).alias("ah_lo"),
    )
    band_cols = band_columns(F.col("ah_hi"), F.col("ah_lo"))
    return keyed.select(
        id_col,
        idx_col,
        *keep_names,
        "ah_hi",
        "ah_lo",
        *[c.alias(f"band{j}") for j, c in enumerate(band_cols)],
    )


def pcm_energy_hash(
    clips: DataFrame,
    id_col: str = "vec_id",
    payload_col: str = "payload",
    n_samples: int = 64,
    keep: dict[str, F.Column] | None = None,
) -> DataFrame:
    """64-bit ENERGY-ENVELOPE perceptual key per PCM clip — the audio
    sibling of :func:`perceptual_frame_hash`: bit ``i`` of the key is
    ``|sample_i| * 64 > sum(|samples|)`` (derandomized integer compare
    over int16 magnitudes), so the key captures WHERE the energy sits
    in the clip and is INVARIANT to phase inversion (``s -> -s``
    preserves every magnitude) — a real audio transform that scatters
    exact byte hashes. Near-identical clips (inversion, sub-LSB dither)
    keep the key or drift by a few bits; the four 16-bit band columns
    make the output directly composable with
    :func:`perceptual_band_buckets` / :func:`perceptual_near_dup_pairs`
    for Hamming<=3 retrieval without an all-pairs stage.

    Everything is JVM expression arithmetic over the binary payload:
    little-endian int16 parse per sample
    (``conv(hex(substring(payload, 2i+1, 1)))`` low byte + ``256 *``
    high byte, two's-complement fixup), magnitude, and the same
    bit-packing algebra as the image hash — restatable verbatim by a
    SQL oracle over the quantized integers (the PCM roundtrip
    discipline). Clips whose byte length is not exactly
    ``2 * n_samples`` are filtered (curation classifies them first).
    The magnitude sum is materialized as a COLUMN (the
    perceptual_frame_hash analysis lesson: inlining it into all 64 bit
    expressions costs ~1.5s of Catalyst analysis per build).

    100 TB shape: clip-grain linear scan, no shuffle, no Python."""
    keep = keep or {}
    keep_names = list(keep)

    # generated-SQL construction (one F.expr parse per column) for the
    # same reason as perceptual_frame_hash above: the loop form's ~2500
    # py4j calls cost ~3 s of plan construction per build. The strings
    # spell out the exact tree the F.* calls built (the unsigned-sample
    # subexpression u is inlined three times into the CASE, exactly as
    # the Column reuse produced); analyzed/optimized plan unchanged.
    pcol = f"`{payload_col}`"

    def _u(i: int) -> str:
        lo = (
            f"cast(conv(hex(substring({pcol}, {2 * i + 1}, 1)), 16, 10) "
            f"as bigint)"
        )
        hi = (
            f"cast(conv(hex(substring({pcol}, {2 * i + 2}, 1)), 16, 10) "
            f"as bigint)"
        )
        return f"({lo} + {hi} * 256)"

    es = [
        F.expr(
            f"abs(CASE WHEN {_u(i)} >= 32768 THEN {_u(i)} - 65536 "
            f"ELSE {_u(i)} END) as __e{i}"
        )
        for i in range(n_samples)
    ]
    base = (
        clips.filter(
            F.length(F.col(payload_col)) == 2 * n_samples
        )
        .select(
            F.col(id_col),
            *[c.alias(n) for n, c in keep.items()],
            *es,
        )
        .withColumn(
            "__tot",
            F.expr(
                "0 + " + " + ".join(f"__e{i}" for i in range(n_samples))
            ),
        )
    )

    def _pack(lo_bit: int) -> F.Column:
        terms = " + ".join(
            f"(CASE WHEN __e{i} * 64 > __tot "
            f"THEN shiftleft(cast(1 as bigint), {i - lo_bit}) "
            f"ELSE cast(0 as bigint) END)"
            for i in range(lo_bit, lo_bit + 32)
        )
        return F.expr(f"cast(0 as bigint) + {terms}")

    keyed = base.select(
        id_col,
        *keep_names,
        _pack(32).alias("ah_hi"),
        _pack(0).alias("ah_lo"),
    )
    band_cols = band_columns(F.col("ah_hi"), F.col("ah_lo"))
    return keyed.select(
        id_col,
        *keep_names,
        "ah_hi",
        "ah_lo",
        *[c.alias(f"band{j}") for j, c in enumerate(band_cols)],
    )


def perceptual_band_buckets(keys: DataFrame) -> DataFrame:
    """Band-bucket frame for near-dup retrieval: ``keys``
    (:func:`perceptual_frame_hash` output, any grain) collapsed to KEY
    grain, exploded to its :data:`AHASH_BANDS` 16-bit bands, with each
    bucket's member count windowed on as ``bucket_n``. One shuffle to
    key grain, one to band buckets; the shared input for both the pair
    join and the hot-bucket census, so a query computing both reads ONE
    exchange.

    ``keys`` needs only ``ah_hi``/``ah_lo``: when the ``band0..band3``
    columns are absent (e.g. a doc-key aggregate that dropped them),
    they are re-derived via :func:`band_columns` — the bands are pure
    functions of the key, so the rebuild is exact and lets a caller
    feed ONE materialized doc-key table to both the exact-link join and
    the banded near-dup path instead of re-running the frame pipeline."""
    from pyspark.sql import Window

    # key-grain collapse via distinct over (key, bands) — the bands are
    # FUNCTIONS of the key, so the grain is exactly (ah_hi, ah_lo); a
    # first()-style agg would plant a non-deterministic expression that
    # blocks plan canonicalization and with it every ReusedExchange
    # downstream consumers rely on
    if {"band0", "band1", "band2", "band3"} <= set(keys.columns):
        cl = keys.select(
            "ah_hi", "ah_lo", "band0", "band1", "band2", "band3"
        ).distinct()
    else:
        derived = band_columns(F.col("ah_hi"), F.col("ah_lo"))
        cl = keys.select(
            "ah_hi",
            "ah_lo",
            *[c.alias(f"band{j}") for j, c in enumerate(derived)],
        ).distinct()
    bands = cl.selectExpr(
        "ah_hi",
        "ah_lo",
        "stack(4, 0, band0, 1, band1, 2, band2, 3, band3) "
        "AS (band_id, bv)",
    )
    w = Window.partitionBy("band_id", "bv")
    return bands.withColumn("bucket_n", F.count(F.lit(1)).over(w))


def perceptual_near_dup_pairs(
    keys: DataFrame | None = None,
    max_bucket: int = MAX_BAND_BUCKET,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup PAIR retrieval over :func:`perceptual_frame_hash` keys:
    distinct 64-bit keys sharing any 16-bit band meet in a bucket join
    (pigeonhole over :data:`AHASH_BANDS`: every pair within Hamming
    distance 3 shares at least one untouched band), the candidate set
    is deduplicated across bands, and the TRUE Hamming distance comes
    from XOR ``bit_count`` — so near-dup search never runs an all-pairs
    stage and the verify arithmetic stays in JVM codegen.

    Pass ``keys`` (any grain — frames collapse to key grain first) or a
    prebuilt ``buckets`` frame from :func:`perceptual_band_buckets`
    when the caller also censuses the buckets (hot-bucket reporting)
    and wants both consumers on one shared exchange. Buckets larger
    than ``max_bucket`` keys are SKIPPED — a degenerate hot band
    (all-black frames) would otherwise go quadratic — and callers must
    REPORT the skips (``multimodal_perceptual_near_pairs`` counts both
    the skipped buckets and the keys inside them; no silent caps).

    Returns one row per candidate pair ``(hi_a, lo_a, hi_b, lo_b,
    hamming)`` with ``(hi_a, lo_a) < (hi_b, lo_b)`` lexicographically;
    filter ``hamming <= k`` for the verified near-dup set.

    100 TB shape: one shuffle to key grain, one to band buckets, a
    bucket-bounded self-join, zero Python crossings.
    """
    from pyspark.sql import Window

    if buckets is None:
        if keys is None:
            raise ValueError("pass keys or buckets")
        buckets = perceptual_band_buckets(keys)
    elif keys is not None:
        raise ValueError(
            "pass keys OR buckets, not both — silently preferring one "
            "would pair the wrong key set"
        )
    # per-key hot-band bitmask (bit j set = the key's band-j bucket is
    # hot), windowed on INSIDE the pair path so bucket consumers that
    # don't need it (the hot census) keep their shared exchange with
    # this one
    hm = buckets.withColumn(
        "hm",
        F.sum(
            F.when(
                F.col("bucket_n") > max_bucket,
                F.expr("shiftleft(1, band_id)"),
            ).otherwise(F.lit(0))
        )
        .over(Window.partitionBy("ah_hi", "ah_lo"))
        .cast("int"),
    )
    cool = hm.filter(F.col("bucket_n") <= max_bucket)
    a = cool.select(
        "band_id",
        "bv",
        F.col("ah_hi").alias("hi_a"),
        F.col("ah_lo").alias("lo_a"),
        F.col("hm").alias("hm_a"),
    )
    b = cool.select(
        "band_id",
        "bv",
        F.col("ah_hi").alias("hi_b"),
        F.col("ah_lo").alias("lo_b"),
        F.col("hm").alias("hm_b"),
    )
    # FIRST-COOL-COLLISION dedup (the standard LSH trick, hotness-
    # aware): a pair sharing several bands would surface once per
    # shared band; instead of a 4-column DISTINCT over the full
    # candidate set — a second full shuffle of ~|pairs| rows, the
    # dominant cost at scale since random 16-bit collisions alone
    # produce ~4·N²/2^16 candidates — each pair is emitted ONLY from
    # its lowest COOL shared band, enforced as a cheap expression
    # filter (earlier bands recomputed via band_columns from the keys
    # both sides already carry; hotness from the per-key bitmask).
    # Earlier-band collisions inside HOT buckets must NOT suppress —
    # that band never emits, so suppressing here would silently lose a
    # recoverable pair (a true near-dup sharing a hot band0 and a cool
    # band1 is found via band1) — exactly the DISTINCT semantics this
    # replaces, pair for pair.
    hi_a, lo_a = F.col("hi_a"), F.col("lo_a")
    hi_b, lo_b = F.col("hi_b"), F.col("lo_b")
    bands_a = band_columns(hi_a, lo_a)
    bands_b = band_columns(hi_b, lo_b)
    earlier_cool_collision = F.lit(False)
    for j in range(AHASH_BANDS - 1):
        earlier_cool_collision = earlier_cool_collision | (
            (F.col("band_id") > j)
            & (bands_a[j] == bands_b[j])
            & (F.col("hm_a").bitwiseAND(F.lit(1 << j)) == 0)
            & (F.col("hm_b").bitwiseAND(F.lit(1 << j)) == 0)
        )
    cand = (
        a.join(b, ["band_id", "bv"])
        .filter(
            (
                (hi_a < hi_b)
                | ((hi_a == hi_b) & (lo_a < lo_b))
            )
            & ~earlier_cool_collision
        )
        .select("hi_a", "lo_a", "hi_b", "lo_b")
    )
    return cand.withColumn(
        "hamming",
        (
            F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        ).cast("int"),
    )


#: consecutive-frame Hamming distance above which a shot boundary is
#: declared — shared by :func:`shot_segments`, its registered query and
#: the DuckDB oracle so all three state the same segmentation
SHOT_CUT_HAMMING = 16


def shot_segments(
    keys: DataFrame,
    threshold: int = SHOT_CUT_HAMMING,
    id_col: str = "doc_id",
    idx_col: str = "frame_idx",
) -> DataFrame:
    """Temporal shot segmentation over :func:`perceptual_frame_hash`
    output — the video shot-boundary-detection SHAPE on the engine's
    frame pipeline: frames of one document are ordered by ``idx_col``,
    the XOR ``bit_count`` Hamming distance between each frame's 64-bit
    aHash and its predecessor's is the cut signal, and a NEW shot opens
    wherever that distance exceeds ``threshold`` (a run of
    perceptually-similar frames = one shot; the first frame always
    opens shot 0). A real video pipeline swaps the fake codec upstream
    (``sample_frames``) for libav decode; the segmentation algebra —
    lag, popcount, running cut sum — does not change.

    Returns SHOT grain: one row per ``(doc_id, shot_id)`` with
    ``shot_len`` (frames), ``first_idx`` (the shot's opening frame
    index — the keyframe a sampler would keep) and ``cut_ham`` (the
    Hamming distance of the cut that opened the shot; NULL for shot 0,
    which no cut opened).

    100 TB shape: ONE shuffle partitioned by document (frames per doc
    are codec-bounded, so no skew cliff), two ordered window passes
    over each doc's frames fused into the same sort, then a combinable
    group-by on (doc, shot) — no Python crossing, no self-join.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(idx_col)
    prev_hi = F.lag("ah_hi").over(w)
    prev_lo = F.lag("ah_lo").over(w)
    lagged = keys.select(
        id_col,
        idx_col,
        "ah_hi",
        "ah_lo",
        (
            F.bit_count(F.col("ah_hi").bitwiseXOR(prev_hi))
            + F.bit_count(F.col("ah_lo").bitwiseXOR(prev_lo))
        )
        .cast("int")
        .alias("ham"),
    )
    cut = F.when(F.col("ham").isNull(), F.lit(0)).otherwise(
        (F.col("ham") > threshold).cast("int")
    )
    flagged = lagged.select(
        id_col,
        idx_col,
        "ham",
        cut.alias("cut"),
    ).withColumn(
        "shot_id",
        F.sum("cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy(id_col, "shot_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("shot_len"),
        F.min(idx_col).cast("int").alias("first_idx"),
        F.max(F.when(F.col("cut") == 1, F.col("ham")))
        .cast("int")
        .alias("cut_ham"),
    )


#: per-key total-frame cap for the temporal-alignment frame join — a key
#: carried by more frames than this is degenerate boilerplate (all-black
#: frames, blank lines) whose matches say nothing about copying; skipped
#: keys MUST be reported by callers (no silent caps). Shared by the
#: operator, the registered query and the DuckDB oracle.
MAX_ALIGN_KEY_FRAMES = 64


def frame_key_counts(keys: DataFrame) -> DataFrame:
    """Frame-grain key table for temporal alignment: the
    :func:`perceptual_frame_hash` output narrowed to
    ``(doc_id, frame_idx, ah_hi, ah_lo)`` with each key's TOTAL frame
    count windowed on as ``key_n`` — the shared input for both the
    hot-key census and the cool-key match join, so a query computing
    both pins ONE frame (the near_pairs bucket discipline at frame
    grain)."""
    from pyspark.sql import Window

    return keys.select(
        "doc_id", "frame_idx", "ah_hi", "ah_lo"
    ).withColumn(
        "key_n",
        F.count(F.lit(1)).over(Window.partitionBy("ah_hi", "ah_lo")),
    )


def temporal_alignment_pairs(
    kf: DataFrame,
    max_key_frames: int = MAX_ALIGN_KEY_FRAMES,
) -> DataFrame:
    """Offset-consistent copied-segment detection between documents —
    the video copy-detection SHAPE over perceptual frame keys: frames
    of two documents matching on their 64-bit aHash vote for the index
    offset ``fa - fb``; a run of CONSECUTIVE frame indexes at one
    offset is an aligned segment (the gaps-and-islands grouping
    ``fa - row_number()``), and the pair's ``best_run`` is its longest
    such segment — a shared intro, a quoted block, a re-broadcast clip.
    Exact frame links (any census) cannot distinguish a scattered
    coincidence from a copied RUN; offset consistency can.

    ``kf`` is :func:`frame_key_counts` output (pin it when the caller
    also censuses hot keys). Keys carried by more than
    ``max_key_frames`` frames are SKIPPED — a degenerate key (all-black
    frame) would otherwise fan out quadratically — and callers must
    REPORT the skips (no silent caps).

    Returns PAIR grain, ``doc_a < doc_b``: ``best_run`` (longest
    aligned segment, frames), ``best_offset`` (smallest offset
    achieving it — deterministic under ties), ``n_matches`` (all
    matched frame pairs), ``n_offsets`` (distinct offsets seen).

    100 TB shape: one shuffle on 8-byte keys for the match join (key
    fan-out bounded by the cap), one on (pair, offset) for the island
    window, then combinable group-bys — no all-pairs stage, no Python.
    """
    from pyspark.sql import Window

    cool = kf.filter(F.col("key_n") <= max_key_frames)
    a = cool.select(
        F.col("doc_id").alias("doc_a"),
        F.col("frame_idx").alias("fa"),
        "ah_hi",
        "ah_lo",
    )
    b = cool.select(
        F.col("doc_id").alias("doc_b"),
        F.col("frame_idx").alias("fb"),
        "ah_hi",
        "ah_lo",
    )
    m = (
        a.join(b, ["ah_hi", "ah_lo"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "fa",
            (F.col("fa") - F.col("fb")).alias("off"),
        )
    )
    # gaps-and-islands: within (pair, offset) the matched fa values are
    # unique (one key per frame), so consecutive indexes share
    # fa - row_number() — each island is one aligned segment
    wr = Window.partitionBy("doc_a", "doc_b", "off").orderBy("fa")
    runs = m.withColumn("grp", F.col("fa") - F.row_number().over(wr))
    rg = runs.groupBy("doc_a", "doc_b", "off", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    po = rg.groupBy("doc_a", "doc_b", "off").agg(
        F.max("run_len").alias("run_max"),
        F.sum("run_len").alias("n_m"),
    )
    # lexicographic struct max = (longest run, then SMALLEST offset) —
    # a deterministic argmax with no second join
    pair = po.groupBy("doc_a", "doc_b").agg(
        F.max(
            F.struct(
                F.col("run_max").alias("r"),
                (-F.col("off")).alias("no"),
            )
        ).alias("best"),
        F.sum("n_m").alias("n_matches"),
        F.count(F.lit(1)).alias("n_offsets"),
    )
    return pair.select(
        "doc_a",
        "doc_b",
        F.col("best.r").cast("bigint").alias("best_run"),
        (-F.col("best.no")).cast("int").alias("best_offset"),
        F.col("n_matches").cast("bigint").alias("n_matches"),
        F.col("n_offsets").cast("bigint").alias("n_offsets"),
    )
