"""Multimodal column plumbing (SURVEY.md §2.I).

Treats media as opaque `binary` columns + typed metadata, with
decode/feature-extract implemented as Arrow-batched Pandas transforms over
`mapInPandas` — the shape a 100 TB image/audio pipeline needs (per-partition
batch decode, no driver involvement, no shuffle).

The container has no image/audio libraries, so the actual codec is a
DETERMINISTIC STUB (`_fake_decode`); real decoders drop into the same seam
(`decode_fn` parameter). The Spark-side plumbing — binary columns, schema,
batch iteration, partition-parallel execution — is real and tested.

The stub codecs are pure byte arithmetic, so both registry keys carry SQL
oracles replaying the stub semantics (see ORACLES below); with a real
decoder injected they would drop back to rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("media_format", StringType()),
    ]
)

_FORMATS = ("jpeg", "png", "webp")


def attach_payload(docs: DataFrame) -> DataFrame:
    """Derive an opaque binary payload column (utf-8 bytes of text) plus
    metadata — stands in for real media blobs in the test tables."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(f) for f in _FORMATS]),
            (F.col("doc_id") % len(_FORMATS) + 1).cast("int"),
        ).alias("media_format"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives a fake
    (width, height) from the byte length. A real decoder (PIL/ffmpeg) would
    be injected via ``decode_fn`` instead."""
    n = len(payload)
    return (64 + n % 640, 64 + (n * 7) % 480)


def decode_stats(
    media: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int]] = _fake_decode,
) -> DataFrame:
    """Arrow-batched decode over mapInPandas: one Python worker per
    partition, pandas batches in/out, output schema fixed up front."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            dims = batch["payload"].map(decode_fn)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": batch["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "media_format": batch["media_format"],
                }
            )

    return media.mapInPandas(_decode_batches, DECODE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Seam for a real resize kernel; no image library in this container."""
    raise NotImplementedError(
        "image resize requires an image library (e.g. PIL) not present in "
        "this container; inject a real kernel via decode_stats(decode_fn=...)"
    )


def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_stats(attach_payload(docs))


# ----------------------------------------------------- frame sampling (video)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_n_bytes", LongType()),
    ]
)

FRAME_SIZE = 64  # stub "frame" = 64-byte chunk of the payload
FRAME_STRIDE = 4  # sample every 4th frame


def frame_sample(
    media: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Video-frame sampling plumbing: payload → every `stride`-th fixed-size
    chunk, one output row per sampled frame (fan-out inside the Arrow batch,
    no shuffle). A real implementation swaps the chunker for a container
    demuxer (ffmpeg); partitioning, batch fan-out, and schema are the real
    pattern."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(1, len(payload) // frame_size)
                for fi in range(0, n_frames, stride):
                    chunk = payload[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.mapInPandas(_sample, FRAME_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(docs))


# ------------------------------------------------- feature extraction (stub)

EMBED_DIM = 8


def extract_features(media: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Decode → feature-extract seam: payload → fixed-dim float vector.

    The stub derives a deterministic vector from byte statistics; a real
    model (CLIP et al.) slots into the same mapInPandas shape — per-batch
    model invocation amortizes model load across the Arrow batch, which is
    the pattern that matters at 100 TB (never per-row inference)."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                [
                    float((sum(payload[i::dim]) % 1000) / 1000.0)
                    for i in range(dim)
                ]
                for payload in batch["payload"]
            ]
            yield pd.DataFrame({"doc_id": batch["doc_id"], "feature": feats})

    return media.mapInPandas(_feats, schema)


# DoubleType keeps the oracle compare bit-exact; the array-valued
# extract_features library call keeps FloatType, the realistic
# embedding dtype.
from pyspark.sql.types import DoubleType as _DoubleType  # noqa: E402

FEATURE_ROW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dim", LongType()),
        StructField("value", _DoubleType()),
    ]
)


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction as a registry query: the extract_features byte
    math exploded to (doc_id, dim, value) DOUBLE rows so the oracle can
    replay it bit-exactly ((Σ payload[i::dim]) % 1000 / 1000 is exact in
    both engines' doubles; the array<float> form stays the library seam).
    Batch-amortized mapInPandas, fan-out inside the Arrow batch."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, dims_, vals = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for i in range(EMBED_DIM):
                    ids.append(doc_id)
                    dims_.append(i)
                    vals.append((sum(payload[i::EMBED_DIM]) % 1000) / 1000.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dim": pd.Series(dims_, dtype="int64"),
                    "value": pd.Series(vals, dtype="float64"),
                }
            )

    return media.mapInPandas(_feats, FEATURE_ROW_SCHEMA)


# ------------------------------------------------- image near-dup (dHash)

# dHash grid: 49 downsampled "cells" → 48 adjacent-gradient bits, the
# classic difference-hash layout (Krawetz's dHash: resize to 9×8 grayscale,
# compare neighbors). The stub "luminance" for cell c is the byte-stripe
# sum Σ payload[c::49] — stride sampling, NOT contiguous chunks, so a
# small payload edit perturbs one cell (≤ 2 fingerprint bits) exactly like
# a small image edit perturbs a couple of gradient bits. A real decoder
# swaps the stripe sums for actual downsampled pixels in the same kernel.
IMG_CELLS = 49


def image_dhash(payload: bytes) -> int:
    """48-bit stub dHash: bit b = 1 iff cell[b] > cell[b+1]."""
    cells = [sum(payload[i::IMG_CELLS]) for i in range(IMG_CELLS)]
    h = 0
    for b in range(IMG_CELLS - 1):
        if cells[b] > cells[b + 1]:
            h |= 1 << b
    return h


DHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def image_hashes(media: DataFrame) -> DataFrame:
    """(doc_id, simhash) perceptual fingerprints, Arrow-batched."""

    def _hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "simhash": batch["payload"]
                    .map(image_dhash)
                    .astype("int64"),
                }
            )

    return media.mapInPandas(_hashes, DHASH_SCHEMA)


def mm_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs: dHash fingerprints (Arrow-batched
    mapInPandas decode seam) → Manku C(6,3) block-blocked candidates →
    exact Hamming ≤ 3 verify — the image-side analog of `dedup_simhash`,
    sharing its lossless candidate machinery
    (`operators.dedup.simhash_block_pairs`).

    The corpus has no duplicate media, so near-dup images are injected
    in-query (both engines): every 10th doc gets a copy with one byte
    appended — the stride-cell construction turns that into a ≤ 2-bit
    fingerprint perturbation, a faithful stand-in for recompressed /
    lightly-edited images. At 100 TB the plan is the simhash scale shape:
    one Python-kernel scan emits 8-byte fingerprints, 20 block keys per
    doc in a 2^24 keyspace, in-bucket join + O(1) verify; payloads never
    shuffle.
    """
    from ..operators.dedup import simhash_block_pairs
    from ..plans.cache import release_caches, tracked_cache

    release_caches()
    sims = tracked_cache(image_hashes(_image_media(spark, sf_dir)))
    return simhash_block_pairs(sims)


def _image_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) image stand-in frame with injected lightly-edited
    copies (every 10th doc, one byte appended) — shared by the pair scan
    and the dedup-corpus materialization."""
    from ..operators.dedup import ID_OFFSET

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edited = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit("!")).alias("text"),
    )
    return docs.unionByName(edited).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def _image_sims_ctes() -> str:
    """Shared oracle CTE chain media -> cells -> sims (dHash replay) —
    used by both the image near-dup pair oracle and the image-dedup
    corpus oracle so they replay identical fingerprints."""
    from ..operators.dedup import ID_OFFSET

    cells = f"""list_transform(range(0, {IMG_CELLS}), c ->
      COALESCE(list_sum(list_transform(
        range(CAST(c + 1 AS BIGINT), CAST(strlen(text) + 1 AS BIGINT),
              {IMG_CELLS}),
        p -> ord(substr(text, CAST(p AS INTEGER), 1)))), 0))"""
    return f"""media AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {ID_OFFSET} AS doc_id, text || '!' AS text
  FROM documents WHERE doc_id % 10 = 0
),
cells AS (SELECT doc_id, {cells} AS cs FROM media),
sims AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(range(0, {IMG_CELLS - 1}), b ->
           CASE WHEN cs[CAST(b + 1 AS INTEGER)] > cs[CAST(b + 2 AS INTEGER)]
                THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)), 0)
           AS simhash
  FROM cells
)"""


def _image_neardup_sql() -> str:
    from ..operators.dedup import HAMMING_MAX

    return f"""
WITH {_image_sims_ctes()}
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {HAMMING_MAX}
"""


def mm_image_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-DEDUP corpus: one representative (min-id survivor) per
    perceptual near-dup cluster, singletons kept — the artifact an image
    pipeline ships (`mm_image_neardup` emits the pair evidence; this is
    the decision). Clusters are connected components over the Hamming <= 3
    pair graph via the shared O(log n) star contraction
    (`operators.dedup.star_contraction_labels`); survivors semi-join back
    to the media frame, summarized as (n_bytes, payload md5) so the value
    oracle stays compact. At 100 TB: fingerprints are the only thing that
    ever shuffles; payloads are touched once by the scan and once by the
    survivor semi-join.
    """
    from ..operators.dedup import simhash_block_pairs, star_contraction_labels
    from ..plans.cache import release_caches, tracked_cache

    release_caches()
    media = _image_media(spark, sf_dir)
    sims = tracked_cache(image_hashes(media))
    pairs = simhash_block_pairs(sims)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = star_contraction_labels(edges).withColumnRenamed(
        "node", "doc_id"
    )
    # Survivor = cluster min (or singleton); the label frame lists exactly
    # the NON-root members, so one anti-join replaces the previous
    # left-join → coalesce → filter → semi-join chain (guide §2 —
    # fewer scans of the media frame).
    return media.join(labels.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def _image_dedup_corpus_sql() -> str:
    from ..operators.dedup import HAMMING_MAX

    return f"""
WITH RECURSIVE {_image_sims_ctes()},
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sims x JOIN sims y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= {HAMMING_MAX}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM media
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc_id
),
labels AS (
  SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT m.doc_id, CAST(strlen(m.text) AS BIGINT) AS n_bytes,
       md5(m.text) AS payload_md5
FROM media m JOIN labels l ON l.doc_id = m.doc_id
WHERE l.doc_id = l.cluster_id
"""


# -------------------------------------------- video near-dup (frame overlap)

FRAME_MATCH_MIN = 2  # videos pair when they share ≥ this many frame hashes
FRAME_DF_CAP = 50  # drop frame hashes shared by more docs (intro/outro cards)


def mm_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup by sampled-frame overlap: the standard video-dedup
    shape (sample frames → perceptual hash per frame → videos pairing on
    shared frame hashes). Re-encoded or trimmed copies keep most frame
    hashes, so the overlap count is the dedup signal; an intro/outro card
    shared by thousands of videos is dropped by the same
    document-frequency cap the winnowing pipeline uses (a hot frame hash
    would otherwise pair-expand |bucket|²).

    Plumbing: frame sampling fans out INSIDE the Arrow batch
    (frame_sample's chunker stub stands in for an ffmpeg demuxer), each
    frame chunk hashes to a 48-bit dHash (image_dhash — a real pipeline
    would decode the frame first), then df-capped bucket pair expansion on
    exact hash equality. Only (doc_id, frame hash) int64 rows shuffle;
    payloads never leave the scan. Trimmed copies (every 10th doc loses
    its tail frames) are injected in-query, both engines.
    """
    from ..plans.cache import release_caches

    release_caches()
    return _frame_overlap_pairs(_video_media(spark, sf_dir))


def _video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video lake: documents as stub payloads plus injected TRIMMED
    copies (every 10th doc keeps only the first half — shares the leading
    frames)."""
    from ..operators.dedup import ID_OFFSET

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    trimmed = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + ID_OFFSET).alias("doc_id"),
        F.substring(
            F.col("text"), 1, (F.length("text") / 2).cast("int")
        ).alias("text"),
    )
    return docs.unionByName(trimmed)


def _frame_overlap_pairs(media_text: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared_frames) — df-capped frame-hash overlap pairs;
    the shared back half of the video near-dup and dedup-corpus ops."""
    media = media_text.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def _frame_hashes(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(1, len(payload) // FRAME_SIZE)
                # near-dup hashes EVERY frame (keyframe-level dedup);
                # the strided sampler is the browse/preview path
                for fi in range(n_frames):
                    chunk = payload[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    hashes.append(image_dhash(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "fh": pd.Series(hashes, dtype="int64"),
                }
            )

    fps = media.mapInPandas(
        _frame_hashes,
        StructType(
            [StructField("doc_id", LongType()), StructField("fh", LongType())]
        ),
    ).dropDuplicates(["doc_id", "fh"])
    df_ok = (
        fps.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FRAME_DF_CAP)
        .select("fh")
    )
    kept = fps.join(df_ok, "fh")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_frames"))
        .filter(F.col("shared_frames") >= FRAME_MATCH_MIN)
    )


def _frame_pair_ctes() -> str:
    """Shared oracle CTE chain media → … → vpairs (df-capped frame-hash
    overlap pairs), replaying the stub frame/dHash byte math exactly."""
    from ..operators.dedup import ID_OFFSET

    # replay: frames = stride-sampled FRAME_SIZE chunks; per chunk the
    # image_dhash stride-cell gradient bits over chunk bytes
    cells = f"""list_transform(range(0, {IMG_CELLS}), c ->
      COALESCE(list_sum(list_transform(
        range(CAST(c + 1 AS BIGINT), CAST(strlen(chunk) + 1 AS BIGINT),
              {IMG_CELLS}),
        p -> ord(substr(chunk, CAST(p AS INTEGER), 1)))), 0))"""
    return f"""media AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {ID_OFFSET} AS doc_id,
         substr(text, 1, CAST(strlen(text) // 2 AS INTEGER)) AS text
  FROM documents WHERE doc_id % 10 = 0
),
frames AS (
  SELECT doc_id,
         substr(text, CAST(fi * {FRAME_SIZE} + 1 AS INTEGER), {FRAME_SIZE})
           AS chunk
  FROM media,
       unnest(range(0, GREATEST(1, strlen(text) // {FRAME_SIZE}))) AS t(fi)
),
cells AS (SELECT doc_id, {cells} AS cs FROM frames),
fps AS (
  SELECT DISTINCT doc_id,
         COALESCE(list_sum(list_transform(range(0, {IMG_CELLS - 1}), b ->
           CASE WHEN cs[CAST(b + 1 AS INTEGER)] > cs[CAST(b + 2 AS INTEGER)]
                THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)), 0)
           AS fh
  FROM cells
),
keep AS (SELECT fh FROM fps GROUP BY fh HAVING COUNT(*) <= {FRAME_DF_CAP}),
kept AS (SELECT fps.doc_id, fps.fh FROM fps JOIN keep USING (fh)),
vpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared_frames
  FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {FRAME_MATCH_MIN}
)"""


def _frame_neardup_sql() -> str:
    return f"""
WITH {_frame_pair_ctes()}
SELECT doc_a, doc_b, shared_frames FROM vpairs
"""


def mm_video_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video-DEDUP corpus: one representative (min-id survivor) per
    frame-overlap cluster, singletons kept — the decision step over
    `mm_frame_neardup`'s pair evidence, completing the modality symmetry
    (image, audio, and video each ship near-dup evidence AND a survivor
    corpus). Clusters are connected components over the shared-frame pair
    graph via the shared O(log n) star contraction; survivors semi-join
    back to the media frame as (n_bytes, payload md5). At 100 TB: only
    (doc_id, frame-hash) int64 rows and pair ids ever shuffle; payloads
    are touched once by the scan and once by the survivor semi-join.
    """
    from ..operators.dedup import star_contraction_labels
    from ..plans.cache import release_caches

    release_caches()
    media_text = _video_media(spark, sf_dir)
    pairs = _frame_overlap_pairs(media_text)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = star_contraction_labels(edges).withColumnRenamed(
        "node", "doc_id"
    )
    # Survivor = cluster min (or singleton); labels list exactly the
    # NON-root members, so one anti-join replaces the left-join →
    # coalesce → filter → semi-join chain (guide §2).
    return media_text.join(
        labels.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_bytes"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("payload_md5"),
    )


def _video_dedup_corpus_sql() -> str:
    return f"""
WITH RECURSIVE {_frame_pair_ctes()},
vedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM vpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM vpairs
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM media
  UNION
  SELECT e.dst, reach.r FROM reach JOIN vedges e ON e.src = reach.doc_id
),
labels AS (
  SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT m.doc_id, CAST(strlen(m.text) AS BIGINT) AS n_bytes,
       md5(m.text) AS payload_md5
FROM media m JOIN labels l ON l.doc_id = m.doc_id
WHERE l.doc_id = l.cluster_id
"""


# ----------------------------------------------------- scene-cut detection

SCENE_CUT_HAMMING = 20  # adjacent-frame dHash distance that counts as a cut


def mm_frame_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection per video: a scene cut is an adjacent-frame
    pair whose perceptual-hash Hamming distance exceeds a threshold — the
    classic hash-difference shot detector, used in a training pipeline to
    pick one keyframe per shot instead of near-identical consecutive
    frames. Emits per-video (n_frames, n_cuts, mean_adjacent_hamming).

    Plan shape is SEQUENTIAL-window, unlike the bucket joins of the
    near-dup family: one Arrow-batched pass emits (doc_id, frame_idx,
    dHash), a lag() window over the SAME doc partitioning compares
    neighbors JVM-side (bit_count(xor)), and one map-side-combinable agg
    folds per video. Only (doc_id, idx, int64) rows shuffle, once.
    """
    from ..plans.cache import release_caches

    release_caches()
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def _frame_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = max(1, len(payload) // FRAME_SIZE)
                for fi in range(n_frames):
                    chunk = payload[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    idxs.append(fi)
                    hashes.append(image_dhash(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "fh": pd.Series(hashes, dtype="int64"),
                }
            )

    frames = media.mapInPandas(
        _frame_rows,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("frame_idx", LongType()),
                StructField("fh", LongType()),
            ]
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    ham = F.bit_count(
        F.col("fh").bitwiseXOR(F.lag("fh", 1).over(w))
    ).cast("bigint")
    stepped = frames.select("doc_id", ham.alias("ham"))
    return (
        stepped.groupBy("doc_id")
        .agg(
            (F.count(F.lit(1))).cast("bigint").alias("n_frames"),
            F.sum(
                F.when(F.col("ham") > SCENE_CUT_HAMMING, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_cuts"),
            F.round(F.avg("ham"), 9).alias("mean_adjacent_hamming"),
        )
        .select("doc_id", "n_frames", "n_cuts", "mean_adjacent_hamming")
    )


def _scene_cuts_sql() -> str:
    cells = f"""list_transform(range(0, {IMG_CELLS}), c ->
      COALESCE(list_sum(list_transform(
        range(CAST(c + 1 AS BIGINT), CAST(strlen(chunk) + 1 AS BIGINT),
              {IMG_CELLS}),
        p -> ord(substr(chunk, CAST(p AS INTEGER), 1)))), 0))"""
    return f"""
WITH media AS (SELECT doc_id, text FROM documents),
frames AS (
  SELECT doc_id, fi AS frame_idx,
         substr(text, CAST(fi * {FRAME_SIZE} + 1 AS INTEGER), {FRAME_SIZE})
           AS chunk
  FROM media,
       unnest(range(0, GREATEST(1, strlen(text) // {FRAME_SIZE}))) AS t(fi)
),
cells AS (SELECT doc_id, frame_idx, {cells} AS cs FROM frames),
fps AS (
  SELECT doc_id, frame_idx,
         COALESCE(list_sum(list_transform(range(0, {IMG_CELLS - 1}), b ->
           CASE WHEN cs[CAST(b + 1 AS INTEGER)] > cs[CAST(b + 2 AS INTEGER)]
                THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)), 0)
           AS fh
  FROM cells
),
stepped AS (
  SELECT doc_id,
         bit_count(xor(fh, lag(fh) OVER
           (PARTITION BY doc_id ORDER BY frame_idx))) AS ham
  FROM fps
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN ham > {SCENE_CUT_HAMMING} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       round(AVG(ham), 9) AS mean_adjacent_hamming
FROM stepped
GROUP BY doc_id
"""


# ------------------------------------------------------ modality mix report


def mm_modality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level modality mix: per media format, document count, byte
    volume, and stub-decoded dimension stats — the coverage report a
    multimodal training-mix planner reads first (the media analog of
    `corpus_mix_report`). One decode pass (metadata only — the Arrow
    kernel emits 5 scalar columns per doc), one map-side-combinable agg;
    exact byte sums go through DECIMAL per the §6 float doctrine (here
    all-integer, so plain bigint sums are exact).
    """
    from ..plans.cache import release_caches

    release_caches()
    docs = load_table(spark, sf_dir, "documents")
    stats = decode_stats(attach_payload(docs))
    return (
        stats.groupBy("media_format")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("n_bytes").cast("bigint").alias("min_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
            F.min("width").cast("bigint").alias("min_width"),
            F.max("width").cast("bigint").alias("max_width"),
            F.min("height").cast("bigint").alias("min_height"),
            F.max("height").cast("bigint").alias("max_height"),
        )
        .orderBy("media_format")
    )


_MODALITY_SQL = f"""
WITH media AS (
  SELECT doc_id, strlen(text) AS n,
         (['jpeg', 'png', 'webp'])[(doc_id % {len(_FORMATS)}) + 1]
           AS media_format
  FROM documents
),
decoded AS (
  SELECT media_format, n AS n_bytes,
         64 + n % 640 AS width, 64 + (n * 7) % 480 AS height
  FROM media
)
SELECT media_format,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       CAST(MIN(width) AS BIGINT) AS min_width,
       CAST(MAX(width) AS BIGINT) AS max_width,
       CAST(MIN(height) AS BIGINT) AS min_height,
       CAST(MAX(height) AS BIGINT) AS max_height
FROM decoded
GROUP BY media_format
ORDER BY media_format
"""


QUERIES = {
    "mm_image_dedup_corpus": mm_image_dedup_corpus,
    "mm_decode_stats": mm_decode_stats,
    "mm_frame_sample": mm_frame_sample,
    "mm_feature_extract": mm_feature_extract,
    "mm_image_neardup": mm_image_neardup,
    "mm_frame_neardup": mm_frame_neardup,
    "mm_video_dedup_corpus": mm_video_dedup_corpus,
    "mm_frame_scene_cuts": mm_frame_scene_cuts,
    "mm_modality_report": mm_modality_report,
}

# The mapInPandas MECHANISM is not SQL-expressible, but the deterministic
# stub codecs are pure byte arithmetic — so the oracles replay the stub
# semantics in SQL and the driver gets full value checks (a real injected
# decoder would drop these keys back to rows-only). strlen() is DuckDB's
# BYTE length, matching len(text.encode("utf-8")).
_DECODE_SQL = f"""
WITH media AS (
  SELECT doc_id, strlen(text) AS n,
         (['jpeg', 'png', 'webp'])[(doc_id % {len(_FORMATS)}) + 1] AS media_format
  FROM documents
)
SELECT doc_id, n AS n_bytes,
       64 + n % 640 AS width,
       64 + (n * 7) % 480 AS height,
       media_format
FROM media
"""

_FRAME_SQL = f"""
WITH media AS (SELECT doc_id, strlen(text) AS n FROM documents),
frames AS (
  SELECT doc_id, fi AS frame_idx,
         LEAST({FRAME_SIZE}, n - fi * {FRAME_SIZE}) AS frame_n_bytes
  FROM media, unnest(range(0, GREATEST(1, n // {FRAME_SIZE}), {FRAME_STRIDE})) AS t(fi)
)
SELECT doc_id, frame_idx, frame_n_bytes FROM frames
"""

# The synthetic corpus is pure ASCII, so utf-8 byte values equal code
# points and ord(substr(...)) replays the python byte sum exactly;
# list_sum over an empty slice coalesces to 0 like python's sum([]).
_FEATURE_SQL = f"""
WITH media AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
dims AS (SELECT unnest(range(0, {EMBED_DIM})) AS dim)
SELECT m.doc_id, CAST(d.dim AS BIGINT) AS dim,
       (COALESCE(list_sum(list_transform(
            range(CAST(d.dim + 1 AS BIGINT), CAST(m.n + 1 AS BIGINT),
                  {EMBED_DIM}),
            p -> ord(substr(m.text, CAST(p AS INTEGER), 1)))), 0)
        % 1000) / 1000.0 AS value
FROM media m, dims d
"""

ORACLES: dict[str, str] = {
    "mm_image_dedup_corpus": _image_dedup_corpus_sql(),
    "mm_decode_stats": _DECODE_SQL,
    "mm_frame_sample": _FRAME_SQL,
    "mm_feature_extract": _FEATURE_SQL,
    "mm_image_neardup": _image_neardup_sql(),
    "mm_frame_neardup": _frame_neardup_sql(),
    "mm_video_dedup_corpus": _video_dedup_corpus_sql(),
    "mm_frame_scene_cuts": _scene_cuts_sql(),
    "mm_modality_report": _MODALITY_SQL,
}
