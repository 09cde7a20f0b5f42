"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; the
compute pattern is Arrow-batched ``mapInPandas`` so decode/resize/
feature-extract amortize per-batch (the only sane shape for Python
media libs on Spark). Decode kernels auto-detect their library on the
WORKER (Pillow for images, soundfile for audio) and decode real bytes
when present; absent the library — as in this container — a
deterministic fake keeps every pipeline runnable and testable. The
Spark-side contract (schemas, batch iteration, partitioning) is
identical either way; the real-path kernels are unit-tested against
injected stand-in modules.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        # provenance: 'real' (library decoded the bytes), 'fake'
        # (library absent / forced off — digest-derived stand-in),
        # 'error' (library present but THIS payload failed to decode;
        # stand-in substituted). Downstream curation must be able to
        # tell real features from substitutes — silently mixing them
        # poisons the feature space undetectably.
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", media_type: str = "image/fake") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct.

    In production the binary comes off the lake (parquet/avro binary
    column or per-object files listed into a DataFrame); here it is
    derived deterministically from text so tests are reproducible.
    """
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("bigint").alias("size_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple:
    """Deterministic stand-in for image decode: dimensions + an 8-dim
    feature vector derived from the content digest."""
    digest = hashlib.sha256(bytes(payload)).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feature


def _import_pil_image():
    """Worker-side PIL probe (executors may differ from the driver)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _real_decode(payload: bytes, image_mod) -> tuple:
    """Real image decode: dimensions + an 8-dim feature (per-channel
    mean/std of an 8×8 downsample). ``image_mod`` is the PIL ``Image``
    module, injected so the kernel resolves it once per task."""
    import io

    import numpy as np

    img = image_mod.open(io.BytesIO(bytes(payload)))
    width, height = img.size
    rgb = img.convert("RGB")
    arr = np.asarray(rgb.resize((8, 8)), dtype=np.float64) / 255.0
    feature = [float(arr[..., c].mean()) for c in range(3)]
    feature += [float(arr[..., c].std()) for c in range(3)]
    feature += [float(arr.mean()), float(arr.std())]
    return int(width), int(height), [round(f, 6) for f in feature]


def _decode_row(payload: bytes, image_mod, strict: bool) -> tuple:
    """Per-payload decode decision: (width, height, feature, decoder)
    where decoder records provenance — 'real', 'fake' (no library), or
    'error' (library present, THIS payload failed; stand-in used)."""
    if image_mod is not None:
        try:
            return (*_real_decode(payload, image_mod), "real")
        except Exception:
            if strict:
                raise
            return (*_fake_decode(payload), "error")
    return (*_fake_decode(payload), "fake")


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    batch_hint: int = 1024,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``.

    The kernel sees pandas batches (zero-copy Arrow transfer), so the
    decode amortizes per batch; at 100 TB this is an embarrassingly-
    parallel map stage whose parallelism is the input partitioning
    (repartition upstream if media objects are few-but-huge).

    ``use_real_decoder=None`` auto-detects Pillow ON THE WORKER: real
    bytes decode through PIL when it is installed; otherwise (or on a
    per-payload decode failure, e.g. the synthetic test payloads) the
    deterministic fake keeps the pipeline runnable. Forcing ``True``
    raises inside the task when PIL is absent; ``False`` always fakes.
    Every row carries its provenance in the ``decoder`` column so
    substituted features are never mistaken for decoded ones.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if use_real_decoder is False else _import_pil_image()
        if use_real_decoder is True and image_mod is None:
            raise NotImplementedError("use_real_decoder=True requires Pillow on workers")
        for batch in batches:
            decoded = [
                _decode_row(p, image_mod, use_real_decoder is True) for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "media_type": [m["media_type"] for m in batch["media_meta"]],
                    "size_bytes": [int(m["size_bytes"]) for m in batch["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                    "decoder": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(kernel, DECODED_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_dhash(payload: bytes) -> int:
    """Deterministic stand-in: signed 64-bit from the content digest —
    identical payloads collide (hamming 0), unrelated payloads land
    ~32 bits apart, exactly the property the pair miner exercises."""
    digest = hashlib.sha256(bytes(payload)).digest()
    val = int.from_bytes(digest[:8], "big", signed=True)
    return val


def _real_dhash(payload: bytes, image_mod) -> int:
    """Difference hash: 9×8 grayscale downsample, bit r*8+c set when
    pixel (r,c) is brighter than its right neighbor — the standard
    64-bit perceptual dHash (resize/crop/recompress move few bits)."""
    import io

    import numpy as np

    img = image_mod.open(io.BytesIO(bytes(payload)))
    arr = np.asarray(img.convert("L").resize((9, 8)), dtype=np.float64)
    bits = arr[:, :-1] > arr[:, 1:]
    val = 0
    for i, bit in enumerate(bits.flatten()):
        if bit:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val  # wrap to signed


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    batch_hint: int = 1024,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """64-bit perceptual dHash per image payload: (doc_id, dhash,
    decoder) — the image rung of the dedup ladder. Near-identical
    images (resize, recompress, small crops) land within a few bits;
    feed the result to ``dedup.hamming_pairs`` for exact
    banded near-dup mining, the same engine text SimHash uses.

    Decoder provenance and worker-side Pillow auto-detection follow
    the ``decode_media`` contract (real / fake / error per payload).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if use_real_decoder is False else _import_pil_image()
        if use_real_decoder is True and image_mod is None:
            raise NotImplementedError("use_real_decoder=True requires Pillow on workers")
        for batch in batches:
            hashes = []
            decoders = []
            for p in batch["payload"]:
                if image_mod is not None:
                    try:
                        hashes.append(_real_dhash(p, image_mod))
                        decoders.append("real")
                        continue
                    except Exception:
                        if use_real_decoder is True:
                            raise
                        hashes.append(_fake_dhash(p))
                        decoders.append("error")
                        continue
                hashes.append(_fake_dhash(p))
                decoders.append("fake")
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                    "decoder": decoders,
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, DHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash distance:
    (id_a, id_b, hamming ≤ ``max_hamming``). Composes ``image_dhash``
    with ``dedup.hamming_pairs`` — the Arrow decode map stage feeds
    the exact pigeonhole banding, so mining stays bucket-equi-join
    shaped at any corpus size (never all-pairs)."""
    from aws_data_wrangler_spark.operators.dedup import hamming_pairs

    sig = image_dhash(df, id_col=id_col, use_real_decoder=use_real_decoder)
    return hamming_pairs(sig, id_col="doc_id", hash_col="dhash", max_hamming=max_hamming)


def _import_soundfile():
    """Worker-side soundfile probe."""
    try:
        import soundfile  # type: ignore

        return soundfile
    except ImportError:
        return None


def _fake_audio_decode(payload: bytes) -> tuple:
    """Deterministic stand-in for audio decode: sample rate, frame
    count, and a 4-dim loudness profile from the content digest."""
    digest = hashlib.sha256(bytes(payload)).digest()
    sample_rate = (8, 16, 22, 44)[digest[0] % 4] * 1000
    n_frames = 1000 + int.from_bytes(digest[1:3], "big")
    profile = [round(b / 255.0, 6) for b in digest[3:7]]
    return sample_rate, n_frames, profile


def _real_audio_decode(payload: bytes, sf_mod) -> tuple:
    """Real audio decode via soundfile: (sample_rate, n_frames,
    4-quarter RMS loudness profile)."""
    import io

    import numpy as np

    data, sample_rate = sf_mod.read(io.BytesIO(bytes(payload)))
    mono = data.mean(axis=1) if getattr(data, "ndim", 1) > 1 else data
    n = len(mono)
    quarters = [mono[i * n // 4 : (i + 1) * n // 4] for i in range(4)]
    profile = [
        round(float(np.sqrt((q**2).mean())) if len(q) else 0.0, 6) for q in quarters
    ]
    return int(sample_rate), int(n), profile


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("loudness", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),  # 'real' | 'fake' | 'error'
    ]
)


def _decode_audio_row(payload: bytes, sf_mod, strict: bool) -> tuple:
    """Audio analog of ``_decode_row``: (sample_rate, n_frames,
    loudness, decoder)."""
    if sf_mod is not None:
        try:
            return (*_real_audio_decode(payload, sf_mod), "real")
        except Exception:
            if strict:
                raise
            return (*_fake_audio_decode(payload), "error")
    return (*_fake_audio_decode(payload), "fake")


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", use_real_decoder: bool | None = None
) -> DataFrame:
    """Audio feature extraction with the same gate pattern as
    ``decode_media``: real decode through soundfile when installed on
    the worker, deterministic fake otherwise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sf_mod = None if use_real_decoder is False else _import_soundfile()
        if use_real_decoder is True and sf_mod is None:
            raise NotImplementedError("use_real_decoder=True requires soundfile on workers")
        for batch in batches:
            decoded = [
                _decode_audio_row(p, sf_mod, use_real_decoder is True) for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "sample_rate": [d[0] for d in decoded],
                    "n_frames": [d[1] for d in decoded],
                    "loudness": [d[2] for d in decoded],
                    "decoder": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, AUDIO_SCHEMA)


def resize_stub(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side; the pixel work
    would live in the decode kernel. Keeps aspect ratio, shorter side
    → ``target``."""
    scale = F.lit(float(target)) / F.least(F.col("width"), F.col("height")).cast("double")
    return df.withColumns(
        {
            "resized_width": F.round(F.col("width") * scale).cast("int"),
            "resized_height": F.round(F.col("height") * scale).cast("int"),
        }
    )


def frame_sample_plan(df: DataFrame, fps: float = 1.0, duration_col: str = "size_bytes") -> DataFrame:
    """Frame-sampling plan for video payloads: emits (doc_id, frame_idx)
    rows — the explode that a real ffmpeg kernel would consume.
    Duration is faked from payload size (1s per 100 bytes)."""
    n_frames = F.greatest(
        (F.col(duration_col) / 100.0 * fps).cast("int"), F.lit(1)
    )
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_audio_fp(payload: bytes) -> int:
    """Deterministic stand-in: signed 64-bit from a SALTED content
    digest (``afp:`` prefix, so the fake fingerprint never collides
    with the fake image dHash of the same payload) — identical
    payloads collide at hamming 0, unrelated payloads ~32 bits apart,
    the property the pair miner exercises."""
    digest = hashlib.sha256(b"afp:" + bytes(payload)).digest()
    return int.from_bytes(digest[:8], "big", signed=True)


def _real_audio_fp(payload: bytes, sf_mod) -> int:
    """Energy-delta audio fingerprint (chromaprint-lite, the audio
    analog of the image dHash's gradient sign): decode to mono, split
    into 65 equal windows, bit ``i`` set when window ``i+1`` carries
    more mean-square energy than window ``i`` — tempo-preserving
    re-encodes/level changes move few bits."""
    import io

    import numpy as np

    data, _rate = sf_mod.read(io.BytesIO(bytes(payload)))
    mono = data.mean(axis=1) if getattr(data, "ndim", 1) > 1 else data
    n = len(mono)
    if n < 65:
        raise ValueError("audio too short for a 65-window contour")
    energies = []
    for i in range(65):
        w = mono[i * n // 65 : (i + 1) * n // 65]
        energies.append(float((w**2).mean()) if len(w) else 0.0)
    val = 0
    for i in range(64):
        if energies[i + 1] > energies[i]:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """64-bit audio fingerprint per payload: (doc_id, afp, decoder) —
    the AUDIO rung of the dedup ladder, feeding the same generic
    ``dedup.hamming_pairs`` banding engine as text SimHash and image
    dHash. Decoder provenance and worker-side soundfile auto-detection
    follow the ``decode_media`` contract (real / fake / error)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sf_mod = None if use_real_decoder is False else _import_soundfile()
        if use_real_decoder is True and sf_mod is None:
            raise NotImplementedError("use_real_decoder=True requires soundfile on workers")
        for batch in batches:
            fps = []
            decoders = []
            for p in batch["payload"]:
                if sf_mod is not None:
                    try:
                        fps.append(_real_audio_fp(p, sf_mod))
                        decoders.append("real")
                        continue
                    except Exception:
                        if use_real_decoder is True:
                            raise
                        fps.append(_fake_audio_fp(p))
                        decoders.append("error")
                        continue
                fps.append(_fake_audio_fp(p))
                decoders.append("fake")
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                    "decoder": decoders,
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs by fingerprint distance — the
    composition twin of ``image_near_dup_pairs``: Arrow decode map
    stage into the exact pigeonhole banding, bucket equi-joins only."""
    from aws_data_wrangler_spark.operators.dedup import hamming_pairs

    sig = audio_fingerprint(df, id_col=id_col, use_real_decoder=use_real_decoder)
    return hamming_pairs(sig, id_col="doc_id", hash_col="afp", max_hamming=max_hamming)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fhash", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_frame_hashes(payload: bytes) -> list:
    """Deterministic stand-in for frame sampling + per-frame dHash:
    4–8 frames whose 64-bit hashes derive from the content digest via
    STRING hex chaining (``sha256(hex # idx)``), so a SQL oracle
    replicates every frame hash; identical payloads share identical
    frame sets — the property set-overlap mining exercises."""
    base = hashlib.sha256(b"vfp:" + bytes(payload)).hexdigest()
    n = 4 + int(base[0:2], 16) % 5
    return [
        int.from_bytes(
            hashlib.sha256(f"{base}#{i}".encode()).digest()[:8], "big", signed=True
        )
        for i in range(n)
    ]


def video_frame_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Per-frame 64-bit perceptual hashes per video payload:
    (doc_id, frame_idx, fhash, decoder) — the VIDEO rung's signature
    stage (sample frames, dHash each). No video decoder ships in this
    container, so ``use_real_decoder=True`` raises NotImplementedError
    (the documented multimodal strict-mode gate — wire a cv2/ffmpeg
    frame sampler into the kernel on a real deployment; the Spark
    plumbing, schema, and batch shape are what this operator pins);
    the default fake path is deterministic and oracle-replicable."""

    if use_real_decoder is True:
        # raised at plan-construction time (driver-side), not from a
        # worker, so the gate reads as a clean NotImplementedError
        raise NotImplementedError(
            "no video decoder available in this environment; install a frame "
            "sampler (cv2/ffmpeg) and wire it here"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, p in zip(batch[id_col], batch["payload"]):
                for i, h in enumerate(_fake_frame_hashes(p)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "fhash": pd.Series(hashes, dtype="int64"),
                    "decoder": ["fake"] * len(ids),
                }
            )

    return df.select(id_col, "payload").mapInPandas(kernel, VIDEO_FRAMES_SCHEMA)


def video_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_hamming: int = 4,
    use_real_decoder: bool | None = None,
    broadcast_counts: bool = False,
) -> DataFrame:
    """Video near-duplicate pairs by frame-set overlap:
    (id_a, id_b, n_match, overlap) where ``overlap = matched frames /
    min(frame counts)`` and a frame matches when its perceptual hash
    sits within ``max_hamming`` bits (the standard
    sampled-frame-pHash video dedup construction — re-encodes and
    trims keep most frame hashes near-identical).

    Scale shape: frame hashing is an Arrow map stage; frame-level
    candidate pairs come from the generic ``dedup.hamming_pairs``
    pigeonhole banding (bucket equi-joins, never all-pairs); the
    video-level rollup is one hash aggregate over matched frame pairs
    plus a frame-count join. The count table is one row per VIDEO —
    corpus-scale, not broadcast-sized — so the join strategy is left
    to AQE by default (the matched-pairs side is usually the small
    one anyway); pass ``broadcast_counts=True`` only when the video
    catalog is known-small.
    """
    from aws_data_wrangler_spark.operators.dedup import hamming_pairs

    frames = video_frame_hashes(df, id_col=id_col, use_real_decoder=use_real_decoder)
    # synthetic frame id: doc_id * 1024 + frame_idx (frame counts are
    # bounded far below 1024 by the sampler; pmod keeps the packing
    # reversible for negative doc_ids, where % would corrupt both the
    # video id and the frame index)
    fids = frames.select(
        (F.col("doc_id") * 1024 + F.col("frame_idx")).alias("fid"), "fhash"
    )
    fpairs = hamming_pairs(fids, id_col="fid", hash_col="fhash", max_hamming=max_hamming)
    va = F.floor(F.col("id_a") / 1024).cast("long")
    vb = F.floor(F.col("id_b") / 1024).cast("long")
    matched = (
        fpairs.select(
            F.least(va, vb).alias("id_a"),
            F.greatest(va, vb).alias("id_b"),
            F.when(va <= vb, F.pmod(F.col("id_a"), F.lit(1024)))
            .otherwise(F.pmod(F.col("id_b"), F.lit(1024)))
            .alias("fa"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fa").alias("n_match"))
    )
    counts = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    a = counts.toDF("id_a", "n_a")
    b = counts.toDF("id_b", "n_b")
    if broadcast_counts:
        a, b = F.broadcast(a), F.broadcast(b)
    return (
        matched.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "overlap",
            F.col("n_match").cast("double") / F.least("n_a", "n_b").cast("double"),
        )
        .filter(F.col("overlap") >= threshold)
        .select("id_a", "id_b", "n_match", "overlap")
    )
