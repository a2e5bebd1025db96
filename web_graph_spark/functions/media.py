"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Decode is feature-gated: ``mode='auto'`` uses real decoders where
possible — PIL/soundfile when installed, pure-stdlib P6-PPM and WAV
parsers otherwise — and falls back to the deterministic byte-derived
stub for undecodable rows (``decoded`` column reports which).
``mode='fake'`` forces the stub (the contract-query mode: fully
deterministic), ``mode='strict'`` raises where a codec would be
required.  The Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is identical in every mode and tested with real WAV
and PPM bytes.

At scale: media bytes live in their own parquet column (columnar
pruning keeps them off queries that don't touch them); frame-sample /
resize run per partition with bounded Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch) so a partition of
multi-MB blobs doesn't blow executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, media binary, "
                "meta struct<width:int, height:int, duration_ms:int, "
                "mime:string>")

FEATURE_SCHEMA = ("media_id string, kind string, n_bytes long, "
                  "sha string, feat array<float>, decoded boolean")


def make_media_df(spark, docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from documents (stand-in for
    real blobs): media bytes = utf-8 of the text, kind by id hash."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.pmod(F.xxhash64(F.col(id_col)), 3) + 1).cast("int"))
    return docs.select(
        F.concat(F.lit("m-"), F.col(id_col).cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(F.lit(64).alias("width"), F.lit(64).alias("height"),
                 (F.length(text_col) * 10).cast("int").alias("duration_ms"),
                 F.lit("application/octet-stream").alias("mime")).alias("meta"))


def make_decodable_media_df(spark, docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Derive a media table of REAL container bytes — genuine binary
    P6-PPM images and PCM WAV audio synthesized deterministically from
    the doc id (stdlib writers, content seeded by blake2b of the id) —
    so ``extract_features(mode='auto')`` exercises real decoders end
    to end, not just the stub fallback.  Every third row is
    deliberately undecodable junk to keep the fallback path live in
    the same plan."""
    import io
    import struct
    import wave as wavmod

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_kind, out_bytes = [], [], []
            for did in pdf[id_col]:
                did = int(did)
                seed = hashlib.blake2b(str(did).encode(),
                                       digest_size=8).digest()
                mod = did % 3
                if mod == 0:
                    w, h = seed[0] % 7 + 1, seed[1] % 5 + 1
                    px = bytes(seed[(2 + i) % 8] for i in range(w * h * 3))
                    raw = b"P6 %d %d 255\n" % (w, h) + px
                    kind = "image"
                elif mod == 1:
                    buf = io.BytesIO()
                    with wavmod.open(buf, "wb") as wv:
                        wv.setnchannels(1)
                        wv.setsampwidth(2)
                        wv.setframerate(8000)
                        n = 200 + seed[2] % 300
                        amp = 500 + seed[3] * 50
                        wv.writeframes(b"".join(
                            struct.pack("<h", (i % 50 - 25) * amp // 25)
                            for i in range(n)))
                    raw = buf.getvalue()
                    kind = "audio"
                else:
                    raw = b"\x00junk-" + seed  # undecodable on purpose
                    kind = "image"
                out_id.append(f"m-{did}")
                out_kind.append(kind)
                out_bytes.append(raw)
            yield pd.DataFrame({"media_id": out_id, "kind": out_kind,
                                "media": out_bytes})

    return docs.select(id_col).mapInPandas(
        gen, schema="media_id string, kind string, media binary")


def _fake_decode(raw: bytes, n: int = 8) -> list[float]:
    """Deterministic feature vector from bytes (codec stand-in)."""
    d = hashlib.blake2b(raw or b"", digest_size=4 * n).digest()
    return [int.from_bytes(d[4 * i:4 * i + 4], "big") / 2**32
            for i in range(n)]


def _pad(feats: list[float], n: int) -> list[float]:
    return (feats + [0.0] * n)[:n]


def _parse_p6(raw: bytes):
    """(w, h, rgb-bytes) from a binary-PPM (P6) blob, or None.  The
    stdlib parser is used UNCONDITIONALLY for perceptual hashing —
    unlike the feature path it never defers to PIL, so the hash is a
    fixed integer function of the bytes in any environment."""
    if not raw or not raw.startswith(b"P6"):
        return None
    try:
        parts, idx, tok = [], 2, b""
        while len(parts) < 3:
            if idx >= len(raw):
                return None
            c = raw[idx:idx + 1]
            idx += 1
            if c.isspace():
                if tok:
                    parts.append(int(tok))
                    tok = b""
            else:
                tok += c
        w, h, maxval = parts
        if w <= 0 or h <= 0 or maxval <= 0:
            return None
        px = raw[idx:idx + w * h * 3]
        if len(px) < w * h * 3:
            return None
        return w, h, px
    except Exception:
        return None


def _ahash_p6(raw: bytes):
    """64-bit average-hash of a P6 image, or None if undecodable.
    All-integer: grayscale = (r+g+b) div 3, 8×8 nearest-neighbor
    resample (source index ``g*dim div 8``), bit = pixel > integer
    mean — a fixed function of the bytes, reproducible anywhere."""
    parsed = _parse_p6(raw)
    if parsed is None:
        return None
    w, h, px = parsed
    grid = []
    for gy in range(8):
        sy = gy * h // 8
        for gx in range(8):
            sx = gx * w // 8
            o = (sy * w + sx) * 3
            grid.append((px[o] + px[o + 1] + px[o + 2]) // 3)
    mean = sum(grid) // 64
    bits = 0
    for i, g in enumerate(grid):
        if g > mean:
            bits |= 1 << i
    if bits >= 1 << 63:  # two's complement into int64
        bits -= 1 << 64
    return bits


def phash_pairs(media: DataFrame, max_dist: int = 8,
                id_col: str = "media_id",
                media_col: str = "media") -> DataFrame:
    """Perceptual near-duplicate media pairs — the aHash tier
    (Hamming distance over 64-bit average-hashes): re-encoded,
    re-scaled, or slightly-edited copies of the same image land
    within ``max_dist`` bits where the exact tier (byte digests,
    ``dedup_media_exact``) sees nothing.

    Decode+hash is an Arrow-batched pandas UDF (inherently Python —
    bytes must be parsed), but everything pairwise is the SAME
    pigeonhole chunk-join as the text SimHash tier
    (``dedup.hamming_pairs``): candidates join on one of
    ``max_dist+1`` exact 64/(d+1)-bit chunks (uniform key), verify is
    JVM ``bit_count(xor)``.  Undecodable rows hash NULL and drop out.
    At 100 TB the hash pass streams blobs once; the pair join moves
    only (id, 8-byte hash) rows."""
    from web_graph_spark.functions.dedup import hamming_pairs

    hashed = media.select(F.col(id_col).alias("id"),
                          ahash_col()(F.col(media_col)).alias("sh"))
    return hamming_pairs(hashed, max_dist)


def ahash_col():
    """Arrow-batched (binary → nullable long) average-hash column
    function — shared by the pair tier and the frame-sampling query."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ahash(col: pd.Series) -> pd.Series:
        return pd.Series([_ahash_p6(bytes(v)) if v is not None else None
                          for v in col], dtype="Int64")

    return _ahash


def _aphash_wav(raw: bytes):
    """64-bit energy-envelope hash of a 16-bit PCM WAV, or None if
    undecodable / shorter than 64 frames.  All-integer: the sample
    stream splits into 64 equal windows (boundaries ``k*n div 64``),
    each window carries its mean |amplitude| (integer div), bit =
    window energy > integer mean energy — the audio analog of the
    image average-hash (an envelope-shape signature; honest scope:
    robust to re-encoding and exact gain doubling, NOT to time
    stretch or pitch shift, which need a spectral front end this
    container lacks)."""
    import io
    import struct
    import wave as wavmod

    try:
        with wavmod.open(io.BytesIO(raw), "rb") as wv:
            if wv.getsampwidth() != 2:
                return None
            n = wv.getnframes()
            if n < 64:
                return None
            data = wv.readframes(n)
    except Exception:
        return None
    samples = struct.unpack("<%dh" % (len(data) // 2), data)
    wins = []
    for k in range(64):
        lo, hi = k * n // 64, (k + 1) * n // 64
        seg = samples[lo:hi]
        wins.append(sum(abs(s) for s in seg) // max(len(seg), 1))
    mean = sum(wins) // 64
    bits = 0
    for i, w in enumerate(wins):
        if w > mean:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def aphash_col():
    """Arrow-batched (binary → nullable long) audio energy-hash column
    function — the audio twin of ``ahash_col``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _aphash(col: pd.Series) -> pd.Series:
        return pd.Series([_aphash_wav(bytes(v)) if v is not None else None
                          for v in col], dtype="Int64")

    return _aphash


def aphash_pairs(media: DataFrame, max_dist: int = 3,
                 id_col: str = "media_id",
                 media_col: str = "media") -> DataFrame:
    """Perceptual near-duplicate AUDIO pairs — energy-envelope hashes
    within ``max_dist`` Hamming bits, paired by the SAME pigeonhole
    chunk-join as the image and text tiers (``dedup.hamming_pairs``).
    Non-audio / undecodable rows hash NULL and drop out."""
    from web_graph_spark.functions.dedup import hamming_pairs

    hashed = media.select(F.col(id_col).alias("id"),
                          aphash_col()(F.col(media_col)).alias("sh"))
    return hamming_pairs(hashed, max_dist)


def make_video_df(spark, docs: DataFrame, id_col: str = "doc_id",
                  ) -> DataFrame:
    """Deterministic multi-frame 'video' blobs for the frame-sampling
    path: a minimal documented container ``b"VID1 <n_frames> <w> <h>
    \\n"`` followed by ``n_frames`` raw RGB frames (each ``w*h*3``
    bytes) — a stand-in for a real codec (none ships in this
    container) that keeps every Spark-side concern real: binary
    column, header parse, per-frame offsets, junk rows.  Content is
    seeded from the doc id (blake2b); every 4th row is undecodable
    junk to keep the fallback live."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_bytes = [], []
            for did in pdf[id_col]:
                did = int(did)
                seed = hashlib.blake2b(str(did).encode(),
                                       digest_size=8).digest()
                if did % 4 == 3:
                    raw = b"\x00junk-video-" + seed
                else:
                    n_frames = seed[0] % 8 + 4
                    w, h = seed[1] % 6 + 1, seed[2] % 4 + 1
                    frames = []
                    for f in range(n_frames):
                        frames.append(bytes(
                            (seed[(3 + f + i) % 8] + f * 7) % 256
                            for i in range(w * h * 3)))
                    raw = (b"VID1 %d %d %d\n" % (n_frames, w, h)
                           + b"".join(frames))
                out_id.append(f"v-{did}")
                out_bytes.append(raw)
            yield pd.DataFrame({"media_id": out_id, "media": out_bytes})

    return docs.select(id_col).mapInPandas(
        gen, schema="media_id string, media binary")


def _parse_vid1(raw: bytes):
    """(n_frames, w, h, frame-bytes-offset) from a VID1 container, or
    None."""
    if not raw or not raw.startswith(b"VID1 "):
        return None
    try:
        nl = raw.index(b"\n")
        n_frames, w, h = (int(x) for x in raw[5:nl].split())
        if n_frames <= 0 or w <= 0 or h <= 0:
            return None
        if len(raw) < nl + 1 + n_frames * w * h * 3:
            return None
        return n_frames, w, h, nl + 1
    except Exception:
        return None


def sample_frames(video: DataFrame, every_k: int = 2,
                  id_col: str = "media_id",
                  media_col: str = "media") -> DataFrame:
    """Frame sampling over a binary video column — one output row per
    KEPT frame (indices 0, k, 2k, …), each frame re-encoded as a
    canonical P6 image so the sampled stream composes directly with
    the image operators (``extract_features``, ``phash_pairs``).
    Undecodable containers yield no rows.

    ``mapInPandas`` so one input row fans out to many: Arrow batches
    stream the blobs once, the per-frame slice is an offset
    computation, and downstream work shuffles (id, frame) rows —
    never the source container again.  At 100 TB sampling is the
    scan; everything after sees only the kept frames."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_frames": [],
                   "frame": []}
            for mid, raw in zip(pdf[id_col], pdf[media_col]):
                parsed = _parse_vid1(bytes(raw)) if raw is not None \
                    else None
                if parsed is None:
                    continue
                n_frames, w, h, off = parsed
                fsz = w * h * 3
                for f in range(0, n_frames, every_k):
                    px = bytes(raw[off + f * fsz:off + (f + 1) * fsz])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(n_frames)
                    out["frame"].append(b"P6 %d %d 255\n" % (w, h) + px)
            yield pd.DataFrame(out)

    return video.mapInPandas(
        gen, schema="media_id string, frame_idx int, n_frames int, "
                    "frame binary")


def _resize_p6(raw: bytes, out_w: int, out_h: int):
    """Nearest-neighbor resize of a P6 image to (out_w, out_h),
    re-encoded as canonical P6 — None if undecodable.  All-integer
    source indexing (``o*dim div out``), so the output bytes are a
    fixed function of the input bytes at any scale factor."""
    parsed = _parse_p6(raw)
    if parsed is None:
        return None
    w, h, px = parsed
    rows = []
    for oy in range(out_h):
        sy = oy * h // out_h
        for ox in range(out_w):
            sx = ox * w // out_w
            o = (sy * w + sx) * 3
            rows.append(px[o:o + 3])
    return b"P6 %d %d 255\n" % (out_w, out_h) + b"".join(rows)


def resize_media(media: DataFrame, out_w: int = 4, out_h: int = 4,
                 id_col: str = "media_id",
                 media_col: str = "media") -> DataFrame:
    """(id, resized binary-or-NULL) — the thumbnail projection every
    multimodal pipeline runs before feature extraction.  Arrow-batched
    pandas UDF (bytes-in-Python by nature); output rows carry only the
    ``out_w*out_h*3``-byte thumbnails, so downstream shuffles shrink
    by the resize factor regardless of source image size."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _resize(col: pd.Series) -> pd.Series:
        return pd.Series([
            _resize_p6(bytes(v), out_w, out_h) if v is not None else None
            for v in col])

    return media.select(F.col(id_col).alias("media_id"),
                        _resize(F.col(media_col)).alias("media"))


def _decode_image(raw: bytes, n: int):
    """Real image features: PIL when importable, else the pure-stdlib
    binary-PPM (P6) parser — None if the bytes aren't decodable."""
    import numpy as np

    try:
        import io

        from PIL import Image  # gated: not in this container

        img = Image.open(io.BytesIO(raw))
        arr = np.asarray(img.convert("RGB"), dtype=np.float64) / 255.0
        w, h = img.size
    except ImportError:
        if not raw or not raw.startswith(b"P6"):
            return None
        try:  # P6 header: "P6 <w> <h> <maxval>\n" then raw RGB
            parts, idx, tok = [], 2, b""
            while len(parts) < 3:
                if idx >= len(raw):  # truncated header: the bytes ran
                    return None      # out before 3 ints (never loop)
                c = raw[idx:idx + 1]
                idx += 1
                if c.isspace():
                    if tok:
                        parts.append(int(tok))
                        tok = b""
                else:
                    tok += c
            w, h, maxval = parts
            if w <= 0 or h <= 0 or maxval <= 0:
                return None
            arr = (np.frombuffer(raw, dtype=np.uint8, count=w * h * 3,
                                 offset=idx)
                   .reshape(h, w, 3).astype(np.float64) / maxval)
        except Exception:
            return None
    except Exception:
        return None
    return _pad([w / 4096.0, h / 4096.0,
                 float(arr[..., 0].mean()), float(arr[..., 1].mean()),
                 float(arr[..., 2].mean()), float(arr.std())], n)


def _decode_audio(raw: bytes, n: int):
    """Real audio features for WAV (stdlib wave; soundfile when
    importable) — duration, rms, zero-crossing rate."""
    import io

    import numpy as np

    try:
        import soundfile as sf  # gated: not in this container

        data, rate = sf.read(io.BytesIO(raw), dtype="float64")
        if data.ndim > 1:
            data = data.mean(axis=1)
    except ImportError:
        import wave

        try:
            with wave.open(io.BytesIO(raw), "rb") as w:
                rate = w.getframerate()
                width = w.getsampwidth()
                frames = w.readframes(w.getnframes())
            dt = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
            if dt is None:
                return None
            data = (np.frombuffer(frames, dtype=dt).astype(np.float64)
                    / float(1 << (8 * width - 1)))
        except Exception:
            return None
    except Exception:
        return None
    if len(data) == 0:
        return _pad([0.0], n)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(data)))))
    return _pad([len(data) / rate / 3600.0,
                 float(np.sqrt(np.mean(data ** 2))), zcr,
                 float(data.mean()), float(data.std())], n)


def _real_decode(kind: str, raw: bytes, n: int):
    if kind == "image":
        return _decode_image(raw, n)
    if kind == "audio":
        return _decode_audio(raw, n)
    return None  # video: needs ffmpeg-class codecs, always gated


def extract_features(media: DataFrame, mode: str = "fake",
                     feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract per partition (mapInPandas).  mode:

    * 'fake'   — deterministic blake2b stand-in for every row (the
      contract-query mode: output is a pure function of the bytes).
    * 'auto'   — REAL decode where possible (PIL/soundfile when
      installed; pure-stdlib P6-PPM and WAV parsers otherwise), the
      deterministic stub for undecodable rows; ``decoded`` reports
      which path ran.  Same schema either way.
    * 'strict' — raise where a real codec would be required (no
      silent stub in pipelines that demand real decode).
    """
    if mode not in ("fake", "strict", "auto"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, decoded = [], []
            for kind, raw in zip(pdf["kind"], pdf["media"]):
                real = (_real_decode(kind, raw, feat_dim)
                        if mode in ("auto", "strict") else None)
                if real is None and mode == "strict":
                    raise NotImplementedError(
                        "media codecs unavailable for this row; install "
                        "PIL/soundfile or use mode='fake'/'auto'")
                feats.append(real if real is not None
                             else _fake_decode(raw, feat_dim))
                decoded.append(real is not None)
            raws = pdf["media"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": raws.map(lambda b: len(b) if b is not None else 0),
                "sha": raws.map(lambda b: hashlib.sha1(b or b"").hexdigest()),
                "feat": feats,
                "decoded": decoded,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode itself stubbed; timestamps are real)."""
    frames = F.sequence(F.lit(0), F.col("meta.duration_ms"),
                        F.lit(every_ms))
    return (media.filter(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ts_ms"))
            .withColumn("frame_ref",
                        F.concat(F.col("media_id"), F.lit("@"),
                                 F.col("frame_ts_ms").cast("string"))))


def dedup_media_exact(media: DataFrame, id_col: str = "media_id",
                      bytes_col: str = "media") -> DataFrame:
    """Exact media-asset dedupe — the binary twin of the text corpus's
    exact tier: identical bytes (hotlinked logos, re-uploaded images,
    mirrored audio) collapse to one canonical copy.  At 100 TB the
    media store's biggest single win is exactly this pass: web images
    repeat across sites far more than text does.

    → ``(media_id, content_md5, keep_id, n_copies, is_dup)`` per
    asset; ``keep_id`` = lexicographic min id of the byte-identical
    group (deterministic in any engine), ``is_dup`` marks the copies a
    writer drops.

    Physical shape: one JVM md5 projection over the binary column +
    one uniform-key hash agg + a join back on the digest (AQE
    broadcasts the group dim when it fits).  The digest (not the blob)
    is the shuffle key — bytes never move; at deployment scale the
    projection runs on the store's existing content digests without
    reading blobs at all.
    """
    per = media.select(F.col(id_col).alias("media_id"),
                       F.md5(F.col(bytes_col)).alias("content_md5"))
    grp = (per.groupBy("content_md5")
           .agg(F.count(F.lit(1)).cast("long").alias("n_copies"),
                F.min("media_id").alias("keep_id")))
    return (per.join(grp, "content_md5")
            .select("media_id", "content_md5", "keep_id", "n_copies",
                    (F.col("media_id") != F.col("keep_id"))
                    .alias("is_dup")))


SNIFF_MAGICS = (
    # (kind, 1-based byte offset, hex prefix at that offset)
    ("png",  1, "89504E470D0A1A0A"),
    ("jpeg", 1, "FFD8FF"),
    ("gif",  1, "47494638"),
    ("pdf",  1, "25504446"),
    ("gzip", 1, "1F8B"),
    ("ppm",  1, "50360A"),
)


def sniff_kind(content) -> F.Column:
    """Content-type from LEADING BYTES, not headers — the ingestion
    truth a crawler needs because Content-Type lies (measured ~1% of
    the web mislabels; security scanners and Common Crawl both
    re-sniff).  Pure JVM: one ``hex(substring(bytes))`` per magic in
    a CASE chain — PNG/JPEG/GIF/PDF/gzip/P6-PPM by prefix, WAV by
    the RIFF container + WAVE form tag at offset 9 (the one magic a
    prefix test cannot catch) — no UDF, scan-bound at 100 TB of
    blobs since parquet reads only the sniffed prefix bytes when the
    binary column is dictionary/plain encoded page-aligned.

    Reference analog: the reference trusts the Content-Type header
    (``pkg/crawler/crawler.go`` ctype split); this is the
    bytes-don't-lie hardening (SURVEY §2.10 E147)."""
    c = F.when(
        (F.hex(F.substring(content, 1, 4)) == "52494646")
        & (F.hex(F.substring(content, 9, 4)) == "57415645"), "wav")
    for kind, off, mag in SNIFF_MAGICS:
        c = c.when(F.hex(F.substring(content, off, len(mag) // 2))
                   == mag, kind)
    return c.otherwise("unknown")


def interleaved_pack_stats(docs: DataFrame, budget: int,
                           media_cost: int = 576,
                           media_rx: str = r"\.(png|jpe?g|gif|wav|mp4)$",
                           spans_col: str = "spans",
                           id_col: str = "page_id") -> DataFrame:
    """Multimodal packing cost of INTERLEAVED text+media documents
    (E163) — the context-window budgeting step a multimodal training
    pipeline runs over the BASELINE input_hint span shape
    (``array<struct<kind,text,media_ref,offset>>``): text spans cost
    their length and may split across pack boundaries; media spans
    cost a FIXED ``media_cost`` tokens (the vision-encoder patch
    count — 576 for a 24×24 CLIP grid) and are ATOMIC — an image
    cannot straddle two training sequences, so a media span that
    would cross a ``budget`` boundary pads to the boundary first and
    the pad is pure waste.  Per document (packed alone from a pack
    boundary — the per-doc layout cost, additive across a corpus
    packed doc-major) the exact fold over the offset-ordered spans:

    * ``text_tokens`` / ``media_tokens`` — cost mass by modality;
    * ``pad_tokens`` — boundary padding forced by media atomicity
      (THE number that prices media_cost/budget combinations);
    * ``n_oversize`` — media spans with cost > budget (cannot be
      atomic in any layout; they place unpadded and a real pipeline
      must tile or drop them);
    * ``total_cost`` = text + media + pad; ``n_packs`` =
      ⌈total/budget⌉.

    All-integer, engine-exact.  Physical shape at 100 TB: ONE
    codegen'd projection — the fold is ``F.aggregate`` over the
    spans array (JVM higher-order function, no explode, no shuffle,
    no Python); a 10^10-doc table pays exactly its scan.  Spans are
    ``sort_array``-ordered first (offset is the struct's sort-leading
    field is NOT assumed).

    Returns ``(id, n_spans, text_tokens, media_tokens, pad_tokens,
    n_oversize, total_cost, n_packs)``.

    Reference analog: the reference stores spans but never costs
    them (pkg/crawler/crawler.go:66-78); engine extension (SURVEY
    §2.10 E163).
    """
    b = int(budget)
    if b <= 0:
        raise ValueError("budget must be > 0")
    spans = F.sort_array(F.transform(
        F.col(spans_col),
        lambda s: F.struct(s["offset"].alias("offset"),
                           s["text"].alias("text"),
                           s["media_ref"].alias("media_ref"))))
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("pad"),
        F.lit(0).cast("long").alias("media"),
        F.lit(0).cast("long").alias("text"),
        F.lit(0).cast("long").alias("oversize"))

    def step(acc, s):
        is_media = s["media_ref"].rlike(media_rx)
        c = (F.when(is_media, F.lit(media_cost))
             .otherwise(F.length(s["text"]))).cast("long")
        rem = acc["pos"] % b
        pad = (F.when(is_media & (c <= b) & (rem != 0) & (rem + c > b),
                      F.lit(b) - rem)
               .otherwise(F.lit(0))).cast("long")
        return F.struct(
            (acc["pos"] + pad + c).alias("pos"),
            (acc["pad"] + pad).alias("pad"),
            (acc["media"] + F.when(is_media, c).otherwise(0))
            .alias("media"),
            (acc["text"] + F.when(is_media, F.lit(0)).otherwise(c))
            .alias("text"),
            (acc["oversize"]
             + F.when(is_media & (c > b), 1).otherwise(0))
            .alias("oversize"))

    acc = F.aggregate(spans, zero, step)
    return docs.select(
        F.col(id_col),
        F.size(spans_col).cast("long").alias("n_spans"),
        acc["text"].alias("text_tokens"),
        acc["media"].alias("media_tokens"),
        acc["pad"].alias("pad_tokens"),
        acc["oversize"].alias("n_oversize"),
        acc["pos"].alias("total_cost")).withColumn(
        "n_packs",
        F.expr(f"(total_cost + {b - 1}) div {b}").cast("long"))


def interleave_runs(docs: DataFrame,
                    media_rx: str = r"\.(png|jpe?g|gif|wav|mp4)$",
                    spans_col: str = "spans",
                    id_col: str = "page_id") -> DataFrame:
    """Modality run-length profile of INTERLEAVED text+media
    documents (E214) — the layout audit a multimodal pipeline runs
    before packing: how the two span kinds ALTERNATE inside each
    document, over the BASELINE input_hint shape
    (``array<struct<kind,text,media_ref,offset>>``).  A document
    that is one long text run then one media run trains like two
    unimodal documents; one that alternates every span is the
    genuinely interleaved signal the format exists for.  Per
    document, exact over the offset-ordered spans:

    * ``n_spans`` / ``n_text`` / ``n_media`` — span counts by
      modality (media = ``media_ref`` matches ``media_rx``, the
      same predicate :func:`interleaved_pack_stats` costs with);
    * ``n_runs`` — maximal same-modality runs (gaps-and-islands);
    * ``max_text_run`` / ``max_media_run`` — longest run per
      modality (the packing worst case per kind);
    * ``alternation_ppm`` — ``(n_runs−1)/(n_spans−1)`` in floor
      ppm, NULL below 2 spans: 0 = fully blocked, 1e6 = perfectly
      interleaved.

    All-integer, engine-exact.  Physical shape at 100 TB: ONE
    codegen'd projection — the run fold is ``F.aggregate`` over the
    spans array (JVM higher-order function, no explode, no shuffle,
    no Python); a 10^10-doc table pays exactly its scan.  Spans are
    ``sort_array``-ordered by offset first.

    Returns ``(id, n_spans, n_text, n_media, n_runs, max_text_run,
    max_media_run, alternation_ppm)``.

    Reference analog: the reference stores spans but never profiles
    their layout (pkg/crawler/crawler.go:66-78); engine extension
    (SURVEY §2.10 E214).
    """
    spans = F.sort_array(F.transform(
        F.col(spans_col),
        lambda s: F.struct(s["offset"].alias("offset"),
                           s["media_ref"].alias("media_ref"))))
    zero = F.struct(
        F.lit(-1).alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("n_runs"),
        F.lit(0).cast("long").alias("max_text"),
        F.lit(0).cast("long").alias("max_media"),
        F.lit(0).cast("long").alias("n_media"))

    def step(acc, s):
        m = F.when(s["media_ref"].rlike(media_rx), 1).otherwise(0)
        same = acc["prev"] == m
        run = (F.when(same, acc["run"] + 1).otherwise(F.lit(1))
               .cast("long"))
        return F.struct(
            m.alias("prev"),
            run.alias("run"),
            (acc["n_runs"] + F.when(same, 0).otherwise(1))
            .alias("n_runs"),
            F.when(m == 0, F.greatest(acc["max_text"], run))
            .otherwise(acc["max_text"]).alias("max_text"),
            F.when(m == 1, F.greatest(acc["max_media"], run))
            .otherwise(acc["max_media"]).alias("max_media"),
            (acc["n_media"] + m).alias("n_media"))

    acc = F.aggregate(spans, zero, step)
    out = docs.select(
        F.col(id_col),
        F.size(spans_col).cast("long").alias("n_spans"),
        acc["n_runs"].alias("n_runs"),
        acc["max_text"].alias("max_text_run"),
        acc["max_media"].alias("max_media_run"),
        acc["n_media"].alias("n_media"))
    return out.select(
        id_col, "n_spans",
        (F.col("n_spans") - F.col("n_media")).alias("n_text"),
        "n_media", "n_runs", "max_text_run", "max_media_run",
        F.when(F.col("n_spans") >= 2,
               F.expr("(n_runs - 1) * 1000000 div (n_spans - 1)"))
        .cast("long").alias("alternation_ppm"))


def caption_align(docs: DataFrame, media_rx: str = r"\.(png|jpe?g|gif)$",
                  spans_col: str = "spans",
                  id_col: str = "page_id") -> DataFrame:
    """Media↔caption alignment over INTERLEAVED text+media documents
    (E172) — the pair-mining step an image-text training pipeline
    runs over the BASELINE input_hint span shape
    (``array<struct<kind,text,media_ref,offset>>``): for every media
    span, find the nearest text span BEFORE it and the nearest AFTER
    it in document order (captions sit on either side of a figure in
    real HTML), plus the offset gap to each — the features a caption
    picker thresholds on (a text span 40 offsets away is layout
    boilerplate, not a caption).  Media with no preceding / following
    text keep NULL on that side: the "uncaptioned media" diagnostic
    that decides drop-vs-synthetic-caption.

    Nearest = strictly smaller (resp. greater) offset, maximal (resp.
    minimal); offsets are unique within a document in the input_hint
    shape (span order), so the alignment is total and deterministic.

    Physical shape at 100 TB: ONE codegen'd projection + Generate —
    the per-media search is a nested higher-order fold
    (``transform(media, m -> aggregate(texts, ...))``) entirely
    inside the row, so there is NO shuffle, NO join, NO window and
    NO Python; a 10^10-doc table pays exactly its scan, and the
    O(|texts|·|media|) in-row work is bounded by span counts (a
    window-lag formulation would buy O(n) per doc at the price of a
    full doc-keyed Exchange — the wrong trade until documents carry
    thousands of spans).  Docs without media emit no rows (explode
    of an empty alignment array).

    → one row per media span: ``(id, media_ref, media_offset,
    prev_text, prev_offset, prev_gap, next_text, next_offset,
    next_gap)``.

    Reference analog: the reference stores spans but never aligns
    them (pkg/crawler/crawler.go:66-78); engine extension."""
    sp = F.col(spans_col)

    def is_media(s):
        return s["media_ref"].rlike(media_rx)

    texts = F.filter(sp, lambda s: ~is_media(s))
    none = F.struct(F.lit(None).cast("int").alias("offset"),
                    F.lit(None).cast("string").alias("text"))

    def best(m, cmp, better):
        # fold the text spans to the single nearest one on cmp's side
        return F.aggregate(
            texts, none,
            lambda acc, s: F.when(
                cmp(s["offset"], m["offset"])
                & (acc["offset"].isNull()
                   | better(s["offset"], acc["offset"])),
                F.struct(s["offset"].alias("offset"),
                         s["text"].alias("text"))).otherwise(acc))

    aligned = F.transform(
        F.filter(sp, is_media),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("media_offset"),
            best(m, lambda a, b: a < b, lambda a, b: a > b).alias("p"),
            best(m, lambda a, b: a > b, lambda a, b: a < b).alias("n")))
    a = F.col("a")
    return (docs.select(id_col, F.explode(aligned).alias("a"))
            .select(id_col,
                    a["media_ref"].alias("media_ref"),
                    a["media_offset"].cast("long").alias("media_offset"),
                    a["p"]["text"].alias("prev_text"),
                    a["p"]["offset"].cast("long").alias("prev_offset"),
                    (a["media_offset"] - a["p"]["offset"]).cast("long")
                    .alias("prev_gap"),
                    a["n"]["text"].alias("next_text"),
                    a["n"]["offset"].cast("long").alias("next_offset"),
                    (a["n"]["offset"] - a["media_offset"]).cast("long")
                    .alias("next_gap")))


def frame_energies_col(media_col, frame_len: int = 80):
    """Arrow-batched decode of a 16-bit mono PCM WAV binary column to
    its per-frame integer energies (Σ s²  over each COMPLETE
    ``frame_len``-sample frame; the tail partial frame is dropped —
    documented, mirrored by the oracle).  Python touches ONLY the
    container decode (the genuinely non-SQL step); everything
    downstream of the energies array stays JVM-side.  Undecodable
    bytes → NULL."""
    import io
    import struct
    import wave as wavmod

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _energies(col: pd.Series) -> pd.Series:
        out = []
        for raw in col:
            if raw is None:
                out.append(None)
                continue
            try:
                with wavmod.open(io.BytesIO(bytes(raw)), "rb") as wv:
                    if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
                        out.append(None)
                        continue
                    n = wv.getnframes()
                    pcm = np.frombuffer(wv.readframes(n), dtype="<i2")
            except (wavmod.Error, EOFError, struct.error):
                out.append(None)
                continue
            k = len(pcm) // frame_len
            if k == 0:
                out.append([])
                continue
            fr = pcm[:k * frame_len].astype(np.int64) \
                .reshape(k, frame_len)
            out.append((fr * fr).sum(axis=1).tolist())
        return pd.Series(out)

    return _energies(media_col)


def vad_segments(media: DataFrame, thr_col: str = "thr",
                 media_col: str = "media", id_col: str = "media_id",
                 frame_len: int = 80) -> DataFrame:
    """Energy-based voice-activity detection (E179) — the first step
    of every speech-data pipeline (segment before you transcribe /
    embed / dedupe): frame the PCM, mark frames whose energy clears
    the per-row threshold, and merge consecutive active frames into
    segments.  The decode is the ONLY Python stage
    (:func:`frame_energies_col`, Arrow-batched); activity flags and
    the run/segment statistics are a codegen'd higher-order fold
    over the energies array — no explode, no window, no shuffle; a
    10^10-clip table pays its scan plus one Arrow round-trip.

    → ``(id_col, n_frames, n_active, n_segments, longest_run,
    active_ppm)``; active_ppm = 10^6·n_active div n_frames (NULL
    when the clip holds no complete frame); undecodable media keep
    NULL everywhere (the triage bucket).

    Reference analog: none — engine extension (multimodal tier)."""
    en = frame_energies_col(F.col(media_col), frame_len=frame_len)
    d = media.select(F.col(id_col), F.col(thr_col).alias("__thr"),
                     en.alias("__en"))
    act = F.transform(F.col("__en"), lambda e: (e > F.col("__thr"))
                      .cast("int"))
    zero = F.struct(F.lit(0).cast("long").alias("nseg"),
                    F.lit(0).cast("long").alias("cur"),
                    F.lit(0).cast("long").alias("longest"),
                    F.lit(0).cast("long").alias("nact"))

    def step(acc, a):
        cur = F.when(a == 1, acc["cur"] + 1).otherwise(F.lit(0))
        return F.struct(
            (acc["nseg"] + F.when((a == 1) & (acc["cur"] == 0), 1)
             .otherwise(0)).cast("long").alias("nseg"),
            cur.cast("long").alias("cur"),
            F.greatest(acc["longest"], cur).cast("long")
            .alias("longest"),
            (acc["nact"] + F.when(a == 1, 1).otherwise(0)).cast("long")
            .alias("nact"))

    st = F.aggregate(act, zero, step)
    out = d.select(
        id_col,
        F.when(F.col("__en").isNotNull(), F.size("__en")).cast("long")
        .alias("n_frames"),
        st["nact"].alias("n_active"),
        st["nseg"].alias("n_segments"),
        st["longest"].alias("longest_run"))
    # integer div (not float /) so the ppm floors identically in any
    # engine; size() is -1 for a NULL array -> the > 0 guard also
    # NULLs undecodable rows
    return out.withColumn(
        "active_ppm",
        F.when(F.col("n_frames") > 0,
               F.expr("(1000000 * n_active) div n_frames"))
        .cast("long"))


def audio_fingerprint(media: DataFrame, media_col: str = "media",
                      id_col: str = "media_id",
                      frame_len: int = 80) -> DataFrame:
    """Energy-delta audio fingerprint (E243) — the Haitsma-Kalker
    sub-fingerprint idea in its time-domain form: frame the PCM,
    take per-frame energies, and emit one bit per adjacent frame
    pair (1 iff E_{f+1} > E_f).  The bit string is GAIN-INVARIANT
    (a volume change scales every energy by g² > 0, preserving every
    comparison), so re-encoded / re-levelled copies of the same
    recording collide exactly — the audio near-dup key a multimodal
    curation pipeline groups on before paying for transcription.

    Python touches only the WAV container decode
    (:func:`frame_energies_col`); the delta bits, bit string, and
    digest are one codegen'd zip_with over the energies array — no
    explode, no shuffle.  Undecodable media → NULLs (triage bucket).

    → ``(id_col, n_frames, fp, fp_md5)`` where ``fp`` is the
    '0'/'1' string (length n_frames − 1; '' for a single frame).

    Reference analog: none — engine extension (multimodal tier).
    """
    en = frame_energies_col(F.col(media_col), frame_len=frame_len)
    d = media.select(F.col(id_col), en.alias("__en"))
    fp = F.expr(
        "CASE WHEN __en IS NOT NULL THEN "
        "array_join(zip_with(slice(__en, 1, size(__en) - 1), "
        "slice(__en, 2, size(__en) - 1), "
        "(a, b) -> CASE WHEN b > a THEN '1' ELSE '0' END), '') END")
    return (d.select(
        id_col,
        F.when(F.col("__en").isNotNull(), F.size("__en")).cast("long")
        .alias("n_frames"),
        fp.alias("fp"))
        .withColumn("fp_md5", F.md5("fp")))
