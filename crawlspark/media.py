"""Audio / video payload paths: opaque binary columns with typed metadata,
decode / feature-extract / frame-sample / resize as Arrow-batched
mapInPandas stages — the multimodal plumbing a training-data pipeline needs
beyond images (images.py is the image twin).

No media codec library ships in this container, so — exactly like
images.py — the codec is a clearly-marked deterministic stand-in and
everything Spark-side (schemas, binary columns, batch shapes, partitioning,
UDF signatures) is real and is what would surround ffmpeg/libsndfile in
production:

CODEC NOTE (deterministic fake, honest math):
- audio "pcm"  = zlib(int16 little-endian samples)        -> lossless
- video "rawv" = zlib(n_frames * h * w * 3 uint8 frames)  -> lossless
Samples/pixels are a deterministic function of the media id (seeded
PCG64), so every invariant (roundtrip equality, feature values, frame
pixels) is reproducible anywhere.  A real decoder drops in by replacing
_encode_*/_decode_* only.

Scale notes: every stage is one mapInPandas pass (no per-row Python at the
DataFrame level, no driver collect); frame sampling explodes INSIDE the
Arrow batch so one task turns its videos into frame rows locally; features
are integer-quantized (milli-units) so results are bit-stable across
platforms.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .images import caption_words

AUDIO_SCHEMA = (
    "audio_id STRING, bytes BINARY, sample_rate INT, n_samples INT, "
    "fmt STRING, caption STRING"
)
VIDEO_SCHEMA = (
    "video_id STRING, bytes BINARY, w INT, h INT, n_frames INT, fps INT, "
    "fmt STRING"
)
FRAME_SCHEMA = "video_id STRING, frame_idx INT, bytes BINARY, w INT, h INT, fmt STRING"
AUDIO_FEATURES_SCHEMA = (
    "audio_id STRING, duration_ms BIGINT, rms_milli BIGINT, zcr_milli BIGINT, "
    "roundtrip_ok BOOLEAN"
)
CAPTION_WORDS_AUDIO = 10


# -- deterministic fake codec -------------------------------------------------

def _audio_samples(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-(1 << 15), 1 << 15, size=n, dtype=np.int64).astype(np.int16)


def _encode_audio(samples: np.ndarray) -> bytes:
    return zlib.compress(samples.astype("<i2").tobytes(), level=1)


def _decode_audio(b: bytes) -> np.ndarray:
    return np.frombuffer(zlib.decompress(b), dtype="<i2")


def _video_frames(seed: int, n_frames: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)


def _encode_video(frames: np.ndarray) -> bytes:
    return zlib.compress(frames.tobytes(), level=1)


def _decode_video(b: bytes, n_frames: int, w: int, h: int) -> np.ndarray:
    return np.frombuffer(zlib.decompress(b), dtype=np.uint8).reshape(n_frames, h, w, 3)


# -- deterministic per-doc metadata (closed form, SQL-replayable) -------------

def audio_rate_for(doc_id: int) -> int:
    return (8000, 16000, 44100)[doc_id % 3]


def audio_len_for(doc_id: int) -> int:
    return 1024 + doc_id % 512


def video_dims_for(doc_id: int) -> tuple[int, int]:
    return 16 + doc_id % 16, 16 + doc_id % 12


def video_frames_for(doc_id: int) -> int:
    return 4 + doc_id % 5


# -- generators (documents -> media tables) -----------------------------------

def generate_audio(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Audio twin of images.generate_images: one mapInPandas pass building
    (audio_id, bytes, sample_rate, n_samples, fmt, caption) from the
    documents table; metadata is a closed-form function of doc_id so
    oracles can replay it."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                n = audio_len_for(doc_id)
                rows.append(
                    {
                        "audio_id": f"aud-{doc_id}",
                        "bytes": _encode_audio(_audio_samples(doc_id, n)),
                        "sample_rate": audio_rate_for(doc_id),
                        "n_samples": n,
                        "fmt": "pcm",
                        "caption": " ".join(
                            caption_words(text)[:CAPTION_WORDS_AUDIO]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, AUDIO_SCHEMA)


def generate_video(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = video_dims_for(doc_id)
                nf = video_frames_for(doc_id)
                rows.append(
                    {
                        "video_id": f"vid-{doc_id}",
                        "bytes": _encode_video(_video_frames(doc_id, nf, w, h)),
                        "w": w,
                        "h": h,
                        "n_frames": nf,
                        "fps": 24,
                        "fmt": "rawv",
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, VIDEO_SCHEMA)


# -- operators -----------------------------------------------------------------

def audio_features(audio: DataFrame) -> DataFrame:
    """Decode + feature-extract in one Arrow pass: duration (exact integer
    math from metadata), RMS energy and zero-crossing rate over the DECODED
    samples, both quantized to milli-units for cross-platform bit
    stability, plus a lossless-roundtrip check against the regenerated
    reference (the per-row invariant discipline of images.validate_images)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                s = _decode_audio(r.bytes).astype(np.float64)
                n = len(s)
                rms = float(np.sqrt((s * s).mean())) if n else 0.0
                zc = int((np.signbit(s[1:]) != np.signbit(s[:-1])).sum()) if n > 1 else 0
                doc_id = int(r.audio_id.split("-", 1)[1])
                ref = _audio_samples(doc_id, audio_len_for(doc_id))
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "duration_ms": n * 1000 // int(r.sample_rate),
                        "rms_milli": int(round(rms * 1000)),
                        "zcr_milli": zc * 1000 // max(n - 1, 1),
                        "roundtrip_ok": bool(
                            n == int(r.n_samples)
                            and np.array_equal(_decode_audio(r.bytes), ref)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return audio.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def sample_frames(video: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: every ``every``-th frame of each video becomes an
    image row (png-style lossless bytes) — the explode happens INSIDE the
    Arrow batch, so a task converts its videos to frames locally with no
    extra shuffle.  Output plugs straight into the image operators
    (images.validate_images-style checks, phash near-dup)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                frames = _decode_video(r.bytes, int(r.n_frames), int(r.w), int(r.h))
                for idx in range(0, int(r.n_frames), every):
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": idx,
                            "bytes": zlib.compress(frames[idx].tobytes(), level=1),
                            "w": int(r.w),
                            "h": int(r.h),
                            "fmt": "png",
                        }
                    )
            yield pd.DataFrame(rows)

    return video.mapInPandas(sample, FRAME_SCHEMA)


def resize_frames(frames: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downscale by an integer factor (deterministic, the
    honest-math stand-in for a real resampler): each output pixel is the
    mean of a factor x factor block, edges truncated.  Same schema out,
    new dims."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                w, h = int(r.w), int(r.h)
                px = np.frombuffer(zlib.decompress(r.bytes), dtype=np.uint8).reshape(
                    h, w, 3
                )
                nh, nw = h // factor, w // factor
                t = px[: nh * factor, : nw * factor].reshape(
                    nh, factor, nw, factor, 3
                )
                small = t.mean(axis=(1, 3)).astype(np.uint8)
                rows.append(
                    {
                        "video_id": r.video_id,
                        "frame_idx": int(r.frame_idx),
                        "bytes": zlib.compress(small.tobytes(), level=1),
                        "w": nw,
                        "h": nh,
                        "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return frames.mapInPandas(work, FRAME_SCHEMA)


def pdf_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """PDF payload sniffing without a parser — version from the
    ``%PDF-1.x`` header, trailer integrity (``%%EOF`` near the end),
    ``/Linearized`` (web-optimized, byte-range streamable — the flag
    that decides whether a range fetch can render page 1), and an
    encryption marker (``/Encrypt`` in the trailer region): a
    document-corpus pipeline routes on exactly these before spending
    a real parser on the payload.

    Pure JVM expressions over the decoded latin-1 text of the first
    and last 2 KiB (PDF structure markers are ASCII by spec).  Adds
    (pdf_version, pdf_has_eof, pdf_linearized, pdf_encrypted); NULL
    family for non-PDF.
    """
    b = F.col(bytes_col)
    head = F.decode(F.expr(f"substr({bytes_col}, 1, 2048)"), "ISO-8859-1")
    tail = F.decode(
        F.expr(f"substr({bytes_col}, "
               f"greatest(1, length({bytes_col}) - 2047), 2048)"),
        "ISO-8859-1")
    is_pdf = head.startswith("%PDF-")
    version = F.regexp_extract(head, r"^%PDF-(\d\.\d)", 1)
    return (
        docs.withColumn(
            "pdf_version", F.when(is_pdf & (version != ""), version))
        .withColumn(
            "pdf_has_eof",
            F.when(is_pdf, tail.contains("%%EOF").cast("int")))
        .withColumn(
            "pdf_linearized",
            F.when(is_pdf, head.contains("/Linearized").cast("int")))
        .withColumn(
            "pdf_encrypted",
            F.when(is_pdf, tail.contains("/Encrypt").cast("int")))
    )


def zip_eocd_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """ZIP end-of-central-directory sniffing — docx/xlsx/epub/jar/apk
    are all ZIP containers, and the EOCD record (the last 22+ bytes)
    says how many entries the archive holds and where the central
    directory lives WITHOUT reading the body: the triage a crawler
    runs before deciding whether a 50 MB payload is a 3-entry epub or
    a 10k-file apk.  A trailing ZIP comment shifts the EOCD, so the
    scan searches the last 1 KiB for the PK\\x05\\x06 signature
    (bounded, per APPNOTE 4.4.1 comment <= 64 KiB; payloads with
    longer comments report truncated).

    Arrow-batched pandas UDF (byte search + LE fields).  Adds
    (zip_n_entries, zip_cd_size, zip_cd_offset, zip_comment_len,
    zip_eocd_found); NULL family for payloads without the local-file
    magic.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n long, cds long, cdo long, cl long, found int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in ("n", "cds", "cdo", "cl", "found")}
        for b in bs:
            if b is None or len(b) < 4 or bytes(b[:4]) not in (
                    b"PK\x03\x04", b"PK\x05\x06"):
                for k in out:
                    out[k].append(None)
                continue
            window = bytes(b[max(0, len(b) - 1024):])
            pos = window.rfind(b"PK\x05\x06")
            if pos < 0 or pos + 22 > len(window):
                out["n"].append(None)
                out["cds"].append(None)
                out["cdo"].append(None)
                out["cl"].append(None)
                out["found"].append(0)
                continue
            rec = window[pos:pos + 22]
            out["n"].append(int.from_bytes(rec[10:12], "little"))
            out["cds"].append(int.from_bytes(rec[12:16], "little"))
            out["cdo"].append(int.from_bytes(rec[16:20], "little"))
            out["cl"].append(int.from_bytes(rec[20:22], "little"))
            out["found"].append(1)
        return pd.DataFrame({
            "n": pd.array(out["n"], dtype="Int64"),
            "cds": pd.array(out["cds"], dtype="Int64"),
            "cdo": pd.array(out["cdo"], dtype="Int64"),
            "cl": pd.array(out["cl"], dtype="Int64"),
            "found": pd.array(out["found"], dtype="Int32"),
        })

    g = docs.withColumn("__z", scan(F.col(bytes_col)))
    return (
        g.withColumn("zip_n_entries", F.col("__z.n"))
        .withColumn("zip_cd_size", F.col("__z.cds"))
        .withColumn("zip_cd_offset", F.col("__z.cdo"))
        .withColumn("zip_comment_len", F.col("__z.cl"))
        .withColumn("zip_eocd_found", F.col("__z.found"))
        .drop("__z")
    )


def m3u8_variants(docs: DataFrame, body_col: str = "body") -> DataFrame:
    """HLS master-playlist parsing — video crawling starts at the
    .m3u8 manifest, and the #EXT-X-STREAM-INF variant list (BANDWIDTH,
    RESOLUTION, then the URI on the next line) is the fetch-planning
    table: which rendition to archive, what the byte budget is, and
    whether a "video" page actually exposes only a 240p stream.

    Pure JVM: one regexp pass pairing each STREAM-INF line with its
    following URI line.  Adds m3u8_variants:
    array<struct<bandwidth:long, width:long, height:long,
    uri:string>> — NULL for non-HLS bodies (no #EXTM3U header),
    empty array for media playlists without variants.
    """
    b = F.col(body_col)
    is_m3u8 = b.startswith("#EXTM3U")
    pairs = F.regexp_extract_all(
        b,
        F.lit(r"(?m)^#EXT-X-STREAM-INF:([^\r\n]*)\r?\n([^#\r\n][^\r\n]*)"),
        0)
    parsed = F.transform(
        pairs,
        lambda p: F.struct(
            F.nullif(
                F.regexp_extract(p, r"BANDWIDTH=(\d+)", 1), F.lit(""))
            .cast("long").alias("bandwidth"),
            F.nullif(
                F.regexp_extract(p, r"RESOLUTION=(\d+)x\d+", 1),
                F.lit("")).cast("long").alias("width"),
            F.nullif(
                F.regexp_extract(p, r"RESOLUTION=\d+x(\d+)", 1),
                F.lit("")).cast("long").alias("height"),
            F.regexp_extract(p, r"\r?\n(.+)$", 1).alias("uri"),
        ),
    )
    return docs.withColumn(
        "m3u8_variants", F.when(is_m3u8, parsed))


def wav_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """WAV header sniffing (RIFF/WAVE fmt chunk at its canonical
    offset): channels, sample rate, bits per sample, PCM-ness, and
    the implied uncompressed data rate — the triage an audio-corpus
    crawler runs before handing bytes to a real decoder.  Canonical
    layout (fmt as first chunk at byte 13) covers the overwhelming
    majority of wild WAVs; nonstandard chunk orders report NULLs and
    route to the slow path.

    Pure JVM substring arithmetic (same _le16/_le32 discipline as the
    image sniffers).  Adds (wav_channels, wav_sample_rate,
    wav_bits, wav_is_pcm, wav_bytes_per_s).
    """
    from .images import _le16, _le32

    b = F.col(bytes_col)
    is_wav = (
        (F.length(b) >= 36)
        & (F.hex(F.substring(b, 1, 4)) == "52494646")
        & (F.hex(F.substring(b, 9, 8)) == "57415645666D7420")
    )
    fmt_code = _le16(b, 21)
    ch = _le16(b, 23)
    rate = _le32(b, 25)
    bits = _le16(b, 35)
    return (
        docs.withColumn("wav_channels", F.when(is_wav, ch).cast("long"))
        .withColumn("wav_sample_rate",
                    F.when(is_wav, rate).cast("long"))
        .withColumn("wav_bits", F.when(is_wav, bits).cast("long"))
        .withColumn("wav_is_pcm",
                    F.when(is_wav, (fmt_code == 1).cast("int")))
        .withColumn(
            "wav_bytes_per_s",
            F.when(is_wav, (rate * ch * bits / 8)).cast("long"))
    )


def vtt_cues(docs: DataFrame, body_col: str = "body") -> DataFrame:
    """WebVTT cue accounting — subtitle files are the TEXT half of a
    video+caption training pair, and the cue timeline says how much
    of the video is actually captioned: cue count, captioned
    milliseconds, and the span between first start and last end
    (coverage = captioned/span).

    One regexp pass for the ``hh:mm:ss.mmm --> hh:mm:ss.mmm`` cue
    lines, pure integer time arithmetic in JVM HOFs.  Adds
    (vtt_n_cues, vtt_captioned_ms, vtt_span_ms); NULL family for
    bodies without the WEBVTT header.
    """
    b = F.col(body_col)
    is_vtt = b.startswith("WEBVTT")
    cues = F.regexp_extract_all(
        b,
        F.lit(r"(\d{2}):(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
              r"(\d{2}):(\d{2}):(\d{2})\.(\d{3})"), 0)

    def ms(c: Column, which: int) -> Column:
        g = lambda i: F.regexp_extract(
            c,
            r"(\d{2}):(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
            r"(\d{2}):(\d{2}):(\d{2})\.(\d{3})",
            i + which * 4).cast("long")
        return (g(1) * 3_600_000 + g(2) * 60_000 + g(3) * 1000 + g(4))

    durs = F.transform(cues, lambda c: ms(c, 1) - ms(c, 0))
    starts = F.transform(cues, lambda c: ms(c, 0))
    ends = F.transform(cues, lambda c: ms(c, 1))
    total = F.aggregate(durs, F.lit(0).cast("long"),
                        lambda a, x: a + x)
    span = F.when(
        F.size(cues) > 0,
        F.array_max(ends) - F.array_min(starts),
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("vtt_n_cues",
                        F.when(is_vtt, F.size(cues)).cast("long"))
        .withColumn("vtt_captioned_ms", F.when(is_vtt, total))
        .withColumn("vtt_span_ms",
                    F.when(is_vtt, span).cast("long"))
    )


def id3_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """ID3v2 tag sniffing (MP3 metadata): version, flags, and the
    SYNCSAFE tag size (four 7-bit bytes — the arithmetic decoders get
    wrong most often), which is exactly the offset where audio frames
    start: a crawler slicing podcast files for an audio corpus skips
    the tag without parsing a single frame.

    Pure JVM byte arithmetic.  Adds (id3_version, id3_tag_bytes,
    id3_unsynchronized); NULL family for non-ID3 payloads.
    """
    from .images import _byte

    b = F.col(bytes_col)
    is_id3 = (F.length(b) >= 10) & (
        F.hex(F.substring(b, 1, 3)) == "494433")
    size = (
        _byte(b, 7) * F.lit(1 << 21) + _byte(b, 8) * F.lit(1 << 14)
        + _byte(b, 9) * F.lit(1 << 7) + _byte(b, 10)
    )
    return (
        docs.withColumn(
            "id3_version",
            F.when(is_id3, F.concat(F.lit("2."),
                                    _byte(b, 4).cast("string"),
                                    F.lit("."),
                                    _byte(b, 5).cast("string"))))
        .withColumn("id3_tag_bytes", F.when(is_id3, size).cast("long"))
        .withColumn(
            "id3_unsynchronized",
            F.when(is_id3,
                   (F.shiftright(_byte(b, 6), 7) % 2 == 1).cast("int")))
    )


def web_asset_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Long-tail web-asset classification by magic bytes — the
    non-image static assets a site crawl accumulates (fonts, wasm,
    source maps) that no image/PDF sniffer claims: WOFF2/WOFF/TTF/OTF
    fonts, WebAssembly modules, gzip blobs, and a UTF-8-text
    fallback heuristic (printable-start) for css/js.  Routing these
    correctly keeps binary junk out of the text pipeline and text out
    of the binary store.

    Pure JVM prefix tests.  Adds asset_kind in {'woff2','woff','ttf',
    'otf','wasm','gzip','text','binary'}.
    """
    b = F.col(bytes_col)
    head = F.hex(F.substring(b, 1, 8))
    first = F.substring(b, 1, 64)
    printable = F.decode(first, "ISO-8859-1").rlike(
        r"^[\x09\x0A\x0D\x20-\x7E]+$")
    kind = (
        F.when(head.startswith("774F4632"), F.lit("woff2"))
        .when(head.startswith("774F4646"), F.lit("woff"))
        .when(head.startswith("00010000"), F.lit("ttf"))
        .when(head.startswith("4F54544F"), F.lit("otf"))
        .when(head.startswith("0061736D"), F.lit("wasm"))
        .when(head.startswith("1F8B"), F.lit("gzip"))
        .when(printable, F.lit("text"))
        .otherwise(F.lit("binary"))
    )
    return docs.withColumn("asset_kind", kind)


def mp4_faststart(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """MP4 top-level box layout + mvhd duration — the two facts that
    decide whether a video payload can STREAM: ``moov`` before
    ``mdat`` ("faststart") lets a player (and a frame-sampling
    crawler) start after one range request, moov-at-end forces the
    whole download; mvhd's timescale/duration give the runtime
    without decoding a frame.

    Arrow-batched pandas UDF walking top-level boxes (32-bit and
    largesize), then mvhd v0/v1 inside moov.  Adds (mp4_brand,
    mp4_faststart, mp4_duration_ms, mp4_n_boxes); NULL family for
    non-MP4 (no ftyp).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("brand string, fast int, dur long, nb int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {"brand": [], "fast": [], "dur": [], "nb": []}
        for b in bs:
            brand = fast = dur = nb = None
            if b is not None and len(b) >= 12 \
                    and bytes(b[4:8]) == b"ftyp":
                brand = bytes(b[8:12]).decode("latin1")
                i, nb = 0, 0
                moov_at = mdat_at = None
                moov_span = None
                n = len(b)
                while i + 8 <= n:
                    size = int.from_bytes(b[i:i + 4], "big")
                    typ = bytes(b[i + 4:i + 8])
                    hdr = 8
                    if size == 1 and i + 16 <= n:
                        size = int.from_bytes(b[i + 8:i + 16], "big")
                        hdr = 16
                    elif size == 0:
                        size = n - i
                    if size < hdr or i + size > n:
                        break
                    nb += 1
                    if typ == b"moov":
                        moov_at = i
                        moov_span = (i + hdr, i + size)
                    elif typ == b"mdat":
                        mdat_at = i
                    i += size
                if moov_at is not None and mdat_at is not None:
                    fast = 1 if moov_at < mdat_at else 0
                if moov_span is not None:
                    j, end = moov_span
                    while j + 8 <= end:
                        s2 = int.from_bytes(b[j:j + 4], "big")
                        t2 = bytes(b[j + 4:j + 8])
                        if s2 < 8 or j + s2 > end:
                            break
                        if t2 == b"mvhd" and j + 12 <= end:
                            ver = b[j + 8]
                            if ver == 1 and j + 8 + 4 + 8 + 8 + 4 + 8 \
                                    <= end:
                                ts = int.from_bytes(
                                    b[j + 28:j + 32], "big")
                                d = int.from_bytes(
                                    b[j + 32:j + 40], "big")
                            elif ver == 0 and j + 8 + 4 + 4 + 4 + 4 + 4 \
                                    <= end:
                                ts = int.from_bytes(
                                    b[j + 20:j + 24], "big")
                                d = int.from_bytes(
                                    b[j + 24:j + 28], "big")
                            else:
                                ts = 0
                                d = 0
                            if ts:
                                dur = d * 1000 // ts
                            break
                        j += s2
            out["brand"].append(brand)
            out["fast"].append(fast)
            out["dur"].append(dur)
            out["nb"].append(nb)
        return pd.DataFrame({
            "brand": out["brand"],
            "fast": pd.array(out["fast"], dtype="Int32"),
            "dur": pd.array(out["dur"], dtype="Int64"),
            "nb": pd.array(out["nb"], dtype="Int32"),
        })

    g = docs.withColumn("__m", scan(F.col(bytes_col)))
    return (
        g.withColumn("mp4_brand", F.col("__m.brand"))
        .withColumn("mp4_faststart", F.col("__m.fast"))
        .withColumn("mp4_duration_ms", F.col("__m.dur"))
        .withColumn("mp4_n_boxes", F.col("__m.nb"))
        .drop("__m")
    )


MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                     192, 224, 256, 320, 0)
MP3_RATES_V1 = (44100, 48000, 32000, 0)


def mp3_frame_sniff(
    docs: DataFrame,
    bytes_col: str = "bytes",
    offset_col: str | None = None,
) -> DataFrame:
    """First-MP3-frame header sniff (MPEG-1 Layer III): bitrate and
    sample rate from the 4-byte frame sync after the ID3 tag — the
    audio-corpus triage (podcast at 320 kbps vs voice note at 32)
    without any decoder.  ``offset_col`` (e.g. 10 + id3_tag_bytes
    from :func:`id3_sniff`) says where the frame starts; None = 0.

    Pure JVM: dynamic-offset substr + nibble tables as CASE chains.
    Adds (mp3_valid_sync, mp3_bitrate_kbps, mp3_sample_rate);
    non-MPEG1-L3 syncs report valid 0 with NULL fields.
    """
    off = (F.col(offset_col).cast("long") if offset_col
           else F.lit(0).cast("long"))
    b = F.col(bytes_col)
    h = F.expr(
        "conv(hex(substr({col}, CAST({o} AS INT) + 1, 4)), 16, 10)"
        .format(col=bytes_col, o="__mp3_off")
    )
    staged = docs.withColumn("__mp3_off", off)
    v = h.cast("decimal(20,0)").cast("long")
    staged = staged.withColumn("__h", v)
    hh = F.col("__h")
    sync_ok = (F.shiftright(hh, 21) % (1 << 11)) == 0x7FF
    version = F.shiftright(hh, 19) % 4     # 3 = MPEG-1
    layer = F.shiftright(hh, 17) % 4       # 1 = Layer III
    is_v1l3 = sync_ok & (version == 3) & (layer == 1)
    br_idx = (F.shiftright(hh, 12) % 16).cast("int")
    sr_idx = (F.shiftright(hh, 10) % 4).cast("int")
    br = F.lit(None).cast("long")
    for i, kbps in enumerate(MP3_BITRATES_V1L3):
        if kbps:
            br = F.when(br_idx == i, F.lit(kbps).cast("long")) \
                .otherwise(br)
    sr = F.lit(None).cast("long")
    for i, rate in enumerate(MP3_RATES_V1):
        if rate:
            sr = F.when(sr_idx == i, F.lit(rate).cast("long")) \
                .otherwise(sr)
    return (
        staged.withColumn("mp3_valid_sync", is_v1l3.cast("int"))
        .withColumn("mp3_bitrate_kbps", F.when(is_v1l3, br))
        .withColumn("mp3_sample_rate", F.when(is_v1l3, sr))
        .drop("__mp3_off", "__h")
    )


def flac_streaminfo(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """FLAC STREAMINFO sniff — the first metadata block sits at a
    FIXED offset (fLaC magic, then block header at byte 5), so sample
    rate (20 bits), channels (3), bits-per-sample (5) and total
    samples (36) come out of pure substring arithmetic, no UDF: the
    lossless-audio triage (true archival FLAC vs transcoded-from-MP3
    uploads show different rates/depths) before any decoder runs.

    Bit unpacking via the byte helpers (images._byte): the packed
    fields straddle bytes 19-26 of the stream.  Adds
    (flac_sample_rate, flac_channels, flac_bits, flac_total_samples,
    flac_duration_ms); NULL family for non-FLAC.
    """
    from .images import _byte

    b = F.col(bytes_col)
    is_flac = (
        (F.length(b) >= 42)
        & (F.hex(F.substring(b, 1, 4)) == "664C6143")
        & ((_byte(b, 5) % 128) == 0)  # STREAMINFO block type
    )
    # layout after 4B magic + 4B block header + 10B min/max block/frame:
    # bytes 19..21 : sample rate (20 bits) + channels(3) + bits_hi(1)
    # byte  22     : bits_lo(4) + total_samples_hi(4)
    # bytes 23..26 : total_samples_lo (32)
    b19, b20, b21, b22 = (_byte(b, 19), _byte(b, 20), _byte(b, 21),
                          _byte(b, 22))
    rate = (b19 * 4096 + b20 * 16 + F.floor(b21 / 16)).cast("long")
    channels = (F.floor(b21 / 2) % 8 + 1).cast("long")
    bits = ((b21 % 2) * 16 + F.floor(b22 / 16) + 1).cast("long")
    total = (
        (b22 % 16) * F.lit(1 << 32).cast("long")
        + _byte(b, 23) * F.lit(1 << 24) + _byte(b, 24) * F.lit(1 << 16)
        + _byte(b, 25) * F.lit(1 << 8) + _byte(b, 26)
    ).cast("long")
    dur = F.when(rate > 0, (total * 1000 / rate)).cast("long")
    return (
        docs.withColumn("flac_sample_rate", F.when(is_flac, rate))
        .withColumn("flac_channels", F.when(is_flac, channels))
        .withColumn("flac_bits", F.when(is_flac, bits))
        .withColumn("flac_total_samples", F.when(is_flac, total))
        .withColumn("flac_duration_ms", F.when(is_flac, dur))
    )


def ogg_page_sniff(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """First-Ogg-page sniff ('OggS' capture pattern, fixed offsets):
    stream serial, page sequence, BOS flag, and the codec identified
    from the first packet magic (OpusHead / vorbis / theora) — the
    container-level routing for audio corpora where .ogg hides three
    different codecs.

    Pure JVM substring arithmetic.  Adds (ogg_serial, ogg_page_seq,
    ogg_bos, ogg_codec); NULL family for non-Ogg.
    """
    from .images import _byte, _le32

    b = F.col(bytes_col)
    is_ogg = (
        (F.length(b) >= 28)
        & (F.hex(F.substring(b, 1, 4)) == "4F676753")
    )
    n_segs = _byte(b, 27)
    payload_start = 28 + n_segs
    # payload starts at 1-based 28 + n_segs (27-byte header + seg table)
    head = F.decode(
        F.expr(f"substr({bytes_col}, CAST(28 + "
               f"conv(hex(substr({bytes_col}, 27, 1)), 16, 10) AS INT)"
               ", 8)"),
        "ISO-8859-1")
    codec = (
        F.when(head.startswith("OpusHead"), F.lit("opus"))
        .when(F.substring(head, 2, 6) == "vorbis", F.lit("vorbis"))
        .when(F.substring(head, 2, 6) == "theora", F.lit("theora"))
        .otherwise(F.lit("unknown"))
    )
    return (
        docs.withColumn("ogg_serial",
                        F.when(is_ogg, _le32(b, 15)).cast("long"))
        .withColumn("ogg_page_seq",
                    F.when(is_ogg, _le32(b, 19)).cast("long"))
        .withColumn("ogg_bos",
                    F.when(is_ogg, (_byte(b, 6) % 4 >= 2).cast("int")))
        .withColumn("ogg_codec", F.when(is_ogg, codec))
    )


SHOT_SCHEMA = (
    "video_id STRING, frame_idx INT, diff_permille LONG, "
    "is_boundary BOOLEAN, shot_id LONG"
)


def shot_boundaries(
    frames: DataFrame,
    threshold_permille: int = 5_000,
    id_col: str = "video_id",
    idx_col: str = "frame_idx",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Shot/scene segmentation over a frame-rows relation (the
    sample_frames output shape): per frame the mean absolute pixel
    difference to the PREVIOUS frame (permille of intensity), a boundary
    flag where it exceeds the threshold, and a running shot id — the
    segmentation step a video-training pipeline runs before per-shot
    frame sampling (one keyframe per shot instead of one per N frames).

    Plan shape: ONE shuffle on video_id (the frame-pairing window and the
    running shot-id window share the same partitioning, so Catalyst plans
    a single Exchange); the pixel diff is an Arrow-vectorized pandas_udf
    over (bytes, lag(bytes)) pairs — per-frame numpy, no per-pixel
    Python.  Frames-per-video is bounded (sampling upstream), so the
    per-video window never sees unbounded partitions.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def frame_diff(cur: pd.Series, prev: pd.Series) -> pd.Series:
        out = []
        for c, p in zip(cur, prev):
            if p is None or c is None:
                out.append(None)
                continue
            a = np.frombuffer(bytes(c), dtype=np.uint8).astype(np.float64)
            b = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
            out.append(int(np.floor(np.abs(a - b).mean() * 1000)))
        return pd.Series(out, dtype="object")

    w = Window.partitionBy(id_col).orderBy(idx_col)
    d = frames.withColumn("__prev", F.lag(bytes_col).over(w)).withColumn(
        "diff_permille", frame_diff(F.col(bytes_col), F.col("__prev"))
    )
    boundary = F.coalesce(
        F.col("diff_permille") > threshold_permille, F.lit(False)
    )
    d = d.withColumn("is_boundary", boundary).withColumn(
        "shot_id",
        F.sum(F.col("is_boundary").cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return d.select(
        F.col(id_col).alias("video_id"),
        F.col(idx_col).cast("int").alias("frame_idx"),
        "diff_permille", "is_boundary", "shot_id",
    )
