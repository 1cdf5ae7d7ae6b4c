"""Training-data pipeline governance: decontamination, split leakage,
corpus-mix reporting.

These extend the reference's data-quality charter (quality/analyzer.rs
scores *table* health) to the checks an LLM training pipeline runs on a
*corpus* before training: is the training set contaminated with benchmark
text, do held-out splits leak duplicated content, and what is the actual
language/source mixture being trained on. All three are
shuffle-disciplined single-pass plans that hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..functions.text import shingles_sql, tokens, tokens_sql
from ..survey.sampling import (
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
    _SPLIT_BUCKET,
)
from ..plans.cache import release_caches, tracked_cache as _tracked_cache
from .dedup import (
    _CORPUS_SQL,
    _bucket_pairs,
    _corpus,
    _shingle_rows,
    JACCARD_T,
    minhash_band_rows,
    minhash_bands_ctes,
)

# Benchmark membership: deterministic hash-5% of documents stands in for a
# held-out eval suite (a real pipeline joins its actual benchmark corpus).
BENCH_PCT = 5
# A corpus doc is contaminated when it covers ≥ this fraction of some
# benchmark doc's distinct n-grams (n-gram–overlap decontamination as in
# public LLM training reports; 3-gram here to match the corpus scale —
# production uses 8-13-gram windows the same way).
CONTAMINATION_MIN_FRAC = 0.5


def _bench_flag(doc_id: Column) -> Column:
    return portable_hash64(F.concat(F.lit("bench_"), doc_id.cast("string"))) % 100 < (
        F.lit(BENCH_PCT)
    )


_BENCH_FLAG_SQL = (
    portable_hash64_sql("'bench_' || CAST(doc_id AS VARCHAR)") + f" % 100 < {BENCH_PCT}"
)


def _doc_shingle_rows(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle) over plain documents — the codegen
    posexplode → lead → concat_ws construction (see dedup._shingle_rows;
    same shape, un-cloned corpus)."""
    toks = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead1, lead2 = F.lead("t", 1).over(w), F.lead("t", 2).over(w)
    return (
        toks.select(
            "doc_id",
            F.concat_ws(" ", F.col("t"), lead1, lead2).alias("shingle"),
            lead2.alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("doc_id", "shingle")
        .dropDuplicates(["doc_id", "shingle"])
    )


def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents that cover ≥ 50% of a
    benchmark document's distinct 3-grams.

    Plan: one shingle pass over the corpus (window shuffle on doc_id),
    split into benchmark/corpus sides by the deterministic hash flag, then
    an equi-join on the shingle STRING with the benchmark side broadcast —
    a real benchmark suite is a few 100k documents (~100 MB of shingle
    hashes), negligible next to a 100 TB corpus, so the corpus is never
    shuffled for the join; matches flow into a (corpus_doc, bench_doc)
    partial-aggregated count. Overlap fraction is measured against the
    benchmark doc's shingle count (containment, not Jaccard — a 1 GB
    training doc that swallowed a whole benchmark item must score 1.0, not
    be diluted by its own length).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = _doc_shingle_rows(docs)
    bench = sh.filter(_bench_flag(F.col("doc_id")))
    corpus = sh.filter(~_bench_flag(F.col("doc_id")))
    bench_sizes = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("bench_shingles"))
    pairs = (
        corpus.alias("c")
        .join(
            F.broadcast(bench.alias("b")),
            F.col("c.shingle") == F.col("b.shingle"),
        )
        .groupBy(
            F.col("c.doc_id").alias("corpus_doc_id"),
            F.col("b.doc_id").alias("bench_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        pairs.join(
            F.broadcast(bench_sizes).withColumnRenamed("doc_id", "bench_doc_id"),
            "bench_doc_id",
        )
        .withColumn(
            "contamination",
            F.round(F.col("overlap") / F.col("bench_shingles"), 6),
        )
        .filter(F.col("contamination") >= CONTAMINATION_MIN_FRAC)
        .select(
            "corpus_doc_id", "bench_doc_id", "overlap", "bench_shingles",
            "contamination",
        )
    )


DECONTAMINATION_SQL = f"""
WITH ds AS (
  SELECT doc_id, {shingles_sql(tokens_sql("text"))} AS sh FROM documents
),
dex AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM ds)
),
b AS (SELECT * FROM dex WHERE {_BENCH_FLAG_SQL}),
c AS (SELECT * FROM dex WHERE NOT ({_BENCH_FLAG_SQL})),
bsizes AS (SELECT doc_id, COUNT(*) AS bench_shingles FROM b GROUP BY doc_id),
pairs AS (
  SELECT c.doc_id AS corpus_doc_id, b.doc_id AS bench_doc_id,
         COUNT(*) AS overlap
  FROM c JOIN b USING (shingle)
  GROUP BY 1, 2
)
SELECT p.corpus_doc_id, p.bench_doc_id, p.overlap, s.bench_shingles,
       ROUND(p.overlap * 1.0 / s.bench_shingles, 6) AS contamination
FROM pairs p JOIN bsizes s ON s.doc_id = p.bench_doc_id
WHERE p.overlap * 1.0 / s.bench_shingles >= {CONTAMINATION_MIN_FRAC}
"""


def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out-split integrity: identical content appearing in more than
    one of train/val/test.

    The hash split (sample_hash_split) is keyed on doc_id, so two COPIES
    of one document can land in different splits — exactly the leak that
    silently inflates eval numbers. Runs on the dedup suite's cloned
    corpus (dedup.py _corpus). Plan: content-hash groupBy (ONE shuffle,
    map-side combinable), keep groups spanning > 1 split. `n_splits` is
    derived from the collected split set rather than `count_distinct` —
    a distinct aggregate would expand into Spark's two-shuffle
    distinct-agg plan for no extra information. Output one row per leaked
    content: how many copies, which splits, the survivor id.
    """
    corpus = _corpus(spark, sf_dir)
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        corpus.select(
            F.md5(F.col("text")).alias("content_hash"),
            "doc_id",
            split.alias("split"),
        )
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_set("split")).alias("_split_set"),
            F.min("doc_id").alias("survivor_id"),
        )
        .select(
            "content_hash",
            "n_copies",
            F.size("_split_set").cast("bigint").alias("n_splits"),
            F.concat_ws(",", "_split_set").alias("splits"),
            "survivor_id",
        )
        .filter(F.col("n_splits") > 1)
    )


def _split_expr(doc_id: Column) -> Column:
    bucket = portable_hash64(doc_id.cast("string")) % 100
    return (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_leakage_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate leakage across train/val/test: pairs of documents in
    DIFFERENT hash splits whose word-3-gram Jaccard ≥ τ — the contamination
    `split_leakage_report` (exact content only) cannot see. A near-copy of
    a training document sitting in test silently inflates eval exactly like
    an exact copy does; this is the check public LLM training reports run
    before trusting held-out numbers.

    Plan (MinHash-LSH candidates + exact verify, no all-pairs stage):
    shared band-signature rows (dedup.minhash_band_rows over the CACHED
    shingle frame — the shingle window runs once) → groupBy (band, hash)
    buckets → in-bucket pair expansion → keep pairs whose doc_ids hash into
    different splits (split is a pure function of doc_id — recomputed after
    expansion, never carried through the shuffle) → exact-Jaccard verify.
    The verify stage set-aggregates shingles ONLY for docs in surviving
    candidate pairs (semi-join on the pair ids — candidate-sized, not
    corpus-sized), then filters J ≥ τ. At 100 TB every stage is the
    minhash_lsh scale shape plus one candidate-bounded join.

    Reference: extends quality/uniqueness.rs row-duplicate detection to the
    corpus/split level (same charter as split_leakage_report).
    """
    release_caches()
    # RAW shingle rows (duplicates kept): MinHash minima are unaffected by
    # duplicate shingles, so the corpus-wide dropDuplicates shuffle is paid
    # only on the candidate-restricted verify side below (measured ~2 s of
    # the query at sf0.1 when done corpus-wide).
    shingles = _tracked_cache(_shingle_rows(spark, sf_dir))
    banded = minhash_band_rows(spark, sf_dir, shingles=shingles)
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # cached: consumed three times (both cand_ids legs + the verify
    # join) — uncached, the signature/bucket/pair pipeline above ran
    # once per consumer (r9; candidate pairs are a slim frame).
    pairs = _tracked_cache(
        buckets.select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_bands"))
        .withColumn("split_a", _split_expr(F.col("doc_a")))
        .withColumn("split_b", _split_expr(F.col("doc_b")))
        .filter(F.col("split_a") != F.col("split_b"))
    )
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # cached: attached twice (doc_a / doc_b verify sides).
    docsets = _tracked_cache(
        shingles.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .dropDuplicates(["doc_id", "shingle"])
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"), F.count(F.lit(1)).alias("n_sh"))
    )
    da = docsets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    db = docsets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                common.cast("double") / (F.col("n_a") + F.col("n_b") - common), 9
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "split_a", "doc_b", "split_b", "shared_bands", "jaccard")
    )


def _split_leakage_neardup_sql() -> str:
    def case(col: str) -> str:
        b = _SPLIT_BUCKET.replace("doc_id", col)
        return (
            f"CASE WHEN {b} < {SPLIT_TRAIN_PCT} THEN 'train' "
            f"WHEN {b} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val' "
            f"ELSE 'test' END"
        )

    return f"""
WITH corpus AS ({_CORPUS_SQL}),
{minhash_bands_ctes()},
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared_bands
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
cross_pairs AS (
  SELECT doc_a, doc_b, shared_bands,
         {case("doc_a")} AS split_a, {case("doc_b")} AS split_b
  FROM pairs
  WHERE {case("doc_a")} <> {case("doc_b")}
),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM ds),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM exploded a JOIN exploded b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT cp.doc_a, cp.split_a, cp.doc_b, cp.split_b, cp.shared_bands,
       round(CAST(c.common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.common), 9)
         AS jaccard
FROM cross_pairs cp
JOIN common c ON c.doc_a = cp.doc_a AND c.doc_b = cp.doc_b
JOIN sizes sa ON sa.doc_id = cp.doc_a
JOIN sizes sb ON sb.doc_id = cp.doc_b
WHERE round(CAST(c.common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.common), 9)
      >= {JACCARD_T}
"""


SPLIT_LEAKAGE_SQL = f"""
WITH corpus AS ({_CORPUS_SQL}),
assigned AS (
  SELECT md5(text) AS content_hash, doc_id,
         CASE WHEN {_SPLIT_BUCKET} < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {_SPLIT_BUCKET} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM corpus
)
SELECT content_hash, COUNT(*) AS n_copies,
       COUNT(DISTINCT split) AS n_splits,
       array_to_string(list_sort(list_distinct(list(split))), ',') AS splits,
       MIN(doc_id) AS survivor_id
FROM assigned
GROUP BY content_hash
HAVING COUNT(DISTINCT split) > 1
"""


def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix report: per (lang, source) document/token/char volumes
    and each cell's share of total tokens — the table a data-mixture plan
    (Pile/ROOTS-style weighting) is written against.

    One aggregation over a two-column projection; the share denominator is
    an unpartitioned window over the AGGREGATED frame (|langs|×|sources|
    rows — metadata-sized, not a data shuffle).
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source", "text")
    agg = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
    )


MIX_REPORT_SQL = f"""
WITH agg AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS n_tokens,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, n_tokens, n_chars,
       ROUND(n_tokens * 1.0 / SUM(n_tokens) OVER (), 6) AS token_share
FROM agg
"""


# Temperature for exponentiated (temperature) sampling of language shares:
# target share w_g ∝ T_g^(1/τ) — the mT5/XLM-R multilingual rebalancing
# rule (τ=2 → sqrt weighting: big languages damped, small ones boosted,
# but never upsampled past their data under the downsample-only planner).
MIX_PLAN_TAU = 2.0


def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture PLAN as an auditable query: per language, available
    tokens, temperature-sampled target share (τ=MIX_PLAN_TAU), the
    downsample-only keep rate (binding group pinned at 1.0 — same math as
    `plan_corpus_mix`), expected kept tokens, and the achieved share.

    Everything after the one groupBy(lang) token aggregate is window
    arithmetic over the |langs|-row metadata frame: w_g = T_g^(1/τ)/Σ,
    r_g = (w_g/T_g)/max(w/T), expected = floor(T_g·r_g). The resulting
    rates feed the same hash-Bernoulli filters as sample_weighted_mix.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("avail")
    )
    w = Window.partitionBy()
    weight = F.pow(F.col("avail").cast("double"), 1.0 / MIX_PLAN_TAU)
    planned = (
        avail.withColumn("weight", weight)
        .withColumn("target_share", F.col("weight") / F.sum("weight").over(w))
        .withColumn("ratio", F.col("target_share") / F.col("avail"))
        .withColumn("keep_rate", F.col("ratio") / F.max("ratio").over(w))
        .withColumn(
            "expected_tokens",
            F.floor(F.col("avail") * F.col("keep_rate")).cast("bigint"),
        )
        .withColumn(
            "achieved_share",
            F.col("expected_tokens")
            / F.sum("expected_tokens").over(w).cast("double"),
        )
    )
    return planned.select(
        "lang",
        F.col("avail").alias("available_tokens"),
        F.round("target_share", 9).alias("target_share"),
        F.round("keep_rate", 9).alias("keep_rate"),
        "expected_tokens",
        F.round("achieved_share", 6).alias("achieved_share"),
    )


MIX_PLAN_SQL = f"""
WITH avail AS (
  SELECT lang, CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS avail
  FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, avail,
         pow(CAST(avail AS DOUBLE), 1.0 / {MIX_PLAN_TAU}) AS weight
  FROM avail
),
shares AS (
  SELECT lang, avail, weight / SUM(weight) OVER () AS target_share
  FROM weighted
),
rates AS (
  SELECT lang, avail, target_share, ratio,
         ratio / MAX(ratio) OVER () AS keep_rate
  FROM (SELECT *, target_share / avail AS ratio FROM shares) t
),
expected AS (
  SELECT lang, avail, target_share, keep_rate,
         CAST(FLOOR(avail * keep_rate) AS BIGINT) AS expected_tokens
  FROM rates
)
SELECT lang, avail AS available_tokens,
       ROUND(target_share, 9) AS target_share,
       ROUND(keep_rate, 9) AS keep_rate,
       expected_tokens,
       ROUND(expected_tokens / CAST(SUM(expected_tokens) OVER () AS DOUBLE), 6)
         AS achieved_share
FROM expected
"""


# Token-budget planning under repetition caps (Muennighoff et al. 2023,
# "Scaling Data-Constrained Language Models": value decays past ~4 epochs):
# the UPSAMPLING complement to `corpus_mix_plan`'s downsample-only rule.
BUDGET_TOKENS_PER_AVAIL = 3.0  # budget = 3× the corpus (forces repetition)
BUDGET_MAX_EPOCHS = 4.0


def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token allocation for a fixed training budget: target
    tokens from the temperature-sampled share (τ=MIX_PLAN_TAU), actual
    epochs capped at BUDGET_MAX_EPOCHS (repeating data past ~4 epochs adds
    ~no value — the data-constrained scaling result), planned tokens,
    and the per-group shortfall the cap leaves unfilled. This is the table
    a 100 TB pretraining run plans its mixture against when the budget
    EXCEEDS the deduped corpus — `corpus_mix_plan` handles the opposite
    (abundant-data, downsample-only) regime.

    The budget is pinned to BUDGET_TOKENS_PER_AVAIL × total available
    tokens so the plan is deterministic at any SF and actually exercises
    the epoch cap. Everything after the one groupBy(lang) token aggregate
    is window arithmetic over the |langs|-row metadata frame.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("avail")
    )
    w = Window.partitionBy()
    weight = F.pow(F.col("avail").cast("double"), 1.0 / MIX_PLAN_TAU)
    budget = F.sum("avail").over(w).cast("double") * F.lit(
        BUDGET_TOKENS_PER_AVAIL
    )
    planned = (
        avail.withColumn("weight", weight)
        .withColumn("target_share", F.col("weight") / F.sum("weight").over(w))
        .withColumn("target_tokens", F.col("target_share") * budget)
        .withColumn(
            "epochs_uncapped", F.col("target_tokens") / F.col("avail")
        )
        .withColumn(
            "epochs",
            F.least(F.col("epochs_uncapped"), F.lit(BUDGET_MAX_EPOCHS)),
        )
        .withColumn(
            "planned_tokens",
            F.floor(F.col("avail") * F.col("epochs")).cast("bigint"),
        )
        .withColumn(
            # explicit FLOOR: DuckDB ROUNDS on double→bigint cast while
            # Spark truncates — floor both engines for exact parity
            "shortfall_tokens",
            F.floor(
                F.greatest(
                    F.lit(0.0),
                    F.col("target_tokens") - F.col("planned_tokens"),
                )
            ).cast("bigint"),
        )
    )
    return planned.select(
        "lang",
        F.col("avail").alias("available_tokens"),
        F.round("target_share", 9).alias("target_share"),
        F.floor("target_tokens").cast("bigint").alias("target_tokens"),
        F.round("epochs", 9).alias("epochs"),
        "planned_tokens",
        "shortfall_tokens",
    )


TOKEN_BUDGET_SQL = f"""
WITH avail AS (
  SELECT lang, CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS avail
  FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, avail,
         pow(CAST(avail AS DOUBLE), 1.0 / {MIX_PLAN_TAU}) AS weight,
         CAST(SUM(avail) OVER () AS DOUBLE) * {BUDGET_TOKENS_PER_AVAIL}
           AS budget
  FROM avail
),
shares AS (
  SELECT lang, avail, budget,
         weight / SUM(weight) OVER () AS target_share
  FROM weighted
),
capped AS (
  SELECT lang, avail, target_share,
         target_share * budget AS target_tokens,
         LEAST(target_share * budget / avail, {BUDGET_MAX_EPOCHS}) AS epochs
  FROM shares
)
SELECT lang, avail AS available_tokens,
       ROUND(target_share, 9) AS target_share,
       CAST(FLOOR(target_tokens) AS BIGINT) AS target_tokens,
       ROUND(epochs, 9) AS epochs,
       CAST(FLOOR(avail * epochs) AS BIGINT) AS planned_tokens,
       CAST(FLOOR(GREATEST(0.0, target_tokens - FLOOR(avail * epochs)))
            AS BIGINT) AS shortfall_tokens
FROM capped
"""


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: the composed decision pipeline an LLM data team
    runs before training, as ONE declarative plan —

    1. score: token count + composite quality per document (text_stats
       formula, same scan);
    2. quality gate: quality_score ≥ 0.8 and ≥ 20 tokens;
    3. benchmark exclusion: held-out eval docs never train;
    4. decontamination: drop corpus docs covering ≥ 50% of a benchmark
       doc's distinct 3-grams (reuses corpus_decontamination — broadcast
       benchmark side, corpus never shuffles for the join);
    5. exact dedup: one survivor (min doc_id) per normalized fingerprint;
    6. split assignment: deterministic hash 90/5/5.

    Stage order is the cheap-filter-first order: map-side gates (2,3)
    run inside the scan before any shuffle; the fingerprint groupBy sees
    only gate-surviving docs; the decontamination anti-join is against a
    broadcast list of contaminated ids (pairs output is benchmark-sized,
    bounded). Output: curated corpus with provenance (split, stats).
    """
    from ..functions.text import stopword_count
    from .textstats import PUNCT_RE, QUALITY_MIN, TOKENS_MIN

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    chars_d = F.nullif(n_chars, F.lit(0))
    tokens_d = F.nullif(n_tokens, F.lit(0))
    no_punct = F.regexp_replace(F.col("text"), PUNCT_RE, "")
    punct_ratio = (n_chars - F.length(no_punct)).cast("double") / chars_d
    sw_ratio = stopword_count(toks).cast("double") / tokens_d
    quality = (
        0.4 * F.least(F.lit(1.0), n_tokens.cast("double") / 100.0)
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * (1.0 - sw_ratio)
    )
    fingerprint = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), "\\s+", " "))))
    scored = docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(quality, 9).alias("quality_score"),
        fingerprint.alias("fingerprint"),
    )
    gated = scored.filter(
        (F.col("quality_score") >= QUALITY_MIN)
        & (F.col("n_tokens") >= TOKENS_MIN)
        & ~_bench_flag(F.col("doc_id"))
    )
    contaminated = (
        corpus_decontamination(spark, sf_dir)
        .select(F.col("corpus_doc_id").alias("doc_id"))
        .distinct()
    )
    clean = gated.join(F.broadcast(contaminated), "doc_id", "left_anti")
    survivors = clean.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id")
    )
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        clean.join(survivors.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", split.alias("split"), "n_tokens", "quality_score")
    )


def _curation_sql() -> str:
    from .textstats import QUALITY_MIN, TOKENS_MIN, _stats_sql

    return f"""
WITH stats AS ({_stats_sql()}),
fp AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents
),
gated AS (
  SELECT s.doc_id, s.n_tokens, s.quality_score, f.fingerprint
  FROM stats s JOIN fp f USING (doc_id)
  WHERE s.quality_score >= {QUALITY_MIN} AND s.n_tokens >= {TOKENS_MIN}
    AND NOT ({_BENCH_FLAG_SQL.replace("doc_id", "s.doc_id")})
),
contaminated AS (
  SELECT DISTINCT corpus_doc_id AS doc_id FROM ({DECONTAMINATION_SQL}) d
),
clean AS (
  SELECT g.* FROM gated g
  WHERE g.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
survivors AS (
  SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY fingerprint
)
SELECT c.doc_id,
       CASE WHEN {_SPLIT_BUCKET.replace("doc_id", "c.doc_id")} < {SPLIT_TRAIN_PCT}
              THEN 'train'
            WHEN {_SPLIT_BUCKET.replace("doc_id", "c.doc_id")}
                 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       c.n_tokens, c.quality_score
FROM clean c
WHERE c.doc_id IN (SELECT doc_id FROM survivors)
"""


def plan_corpus_mix(
    available_tokens: dict[str, int],
    target_shares: dict[str, float],
) -> dict[str, dict]:
    """Mixture planning: keep rates per group that realize ``target_shares``
    from ``available_tokens`` WITHOUT upsampling (downsample-only, the
    Pile/ROOTS-style weighting discipline) while retaining as much data as
    possible.

    Math: the binding group is the one with the highest target-to-available
    ratio — its keep rate is pinned to 1.0 and every other group scales
    down proportionally (r_g = c·w_g/T_g with c chosen so max r = 1).
    Driver-side arithmetic over the metadata-scale corpus_mix_report
    output; the resulting rates feed sample_weighted_mix-style
    hash-Bernoulli filters (scan-local, deterministic, growth-stable).
    Groups with targets but no available tokens raise — upsampling from
    nothing is not plannable."""
    groups = {g: s for g, s in target_shares.items() if s > 0}
    missing = [g for g in groups if not available_tokens.get(g)]
    if missing:
        raise ValueError(f"no available tokens for target group(s): {missing}")
    total_share = sum(groups.values())
    ratios = {g: (s / total_share) / available_tokens[g] for g, s in groups.items()}
    binding = max(ratios, key=lambda g: ratios[g])
    c = 1.0 / ratios[binding]
    plan = {}
    for g, s in groups.items():
        rate = min(1.0, c * ratios[g])
        kept = available_tokens[g] * rate
        plan[g] = {
            "keep_rate": round(rate, 9),
            "available_tokens": available_tokens[g],
            "expected_tokens": int(kept),
            "target_share": round(s / total_share, 9),
        }
    total_kept = sum(p["expected_tokens"] for p in plan.values())
    for p in plan.values():
        p["achieved_share"] = round(
            p["expected_tokens"] / total_kept, 6
        ) if total_kept else 0.0
    return plan


def materialize_curated_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    with_text: bool = True,
    codec: str = "zstd",
) -> dict[str, int]:
    """Sink side of the curation pipeline: write the curated corpus as a
    split-partitioned zstd parquet lake (`out_dir/split=train/...`).

    Scale choices: `partitionBy("split")` so a trainer's read of one split
    is partition-PRUNED at the directory level (never scans val/test);
    text re-attaches via one equi-join on doc_id (co-partitioned with the
    curation output's own shuffle); rows are repartitioned by split so
    each partition directory is written by tasks holding only that
    split's data — no 3× small-file fan-out per task. Returns per-split
    row counts read back from the written lake's footers (a write audit,
    metadata-only).
    """
    curated = corpus_curation(spark, sf_dir)
    if with_text:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        curated = curated.join(docs, "doc_id")
    (
        curated.repartition("split")
        .write.mode("overwrite")
        .option("compression", codec)
        .partitionBy("split")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    return {
        r["split"]: r["n"]
        for r in written.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }


# ------------------------------------------------------------- PII scanning

# Row-level PII detection — the row-content counterpart of the reference's
# *column-name* sensitive-data scan (`security.py detect_sensitive_columns`,
# reference `adapters/config/sampling.rs:110` sensitive_patterns): a corpus
# release gate needs to know which documents carry emails / SSNs / phone
# numbers / IP addresses, not just which columns are named like them.
#
# Patterns use explicit ASCII classes + `\b` word boundaries only — the
# subset with identical semantics in Java regex (Spark) and RE2 (DuckDB),
# so the oracle replays the scan exactly. The synthetic corpus is clean, so
# the PII is injected deterministically in-query in BOTH engines (same
# dirty-in-query discipline as survey/quality.py's dirtied orders view).
PII_EMAIL_RE = r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pii_dirty(doc_id: Column, text: Column) -> Column:
    """text ++ deterministic PII snippets keyed on doc_id (both engines)."""
    d = doc_id.cast("bigint")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.when(
        d % 7 == 0,
        F.concat(F.lit(" contact user"), s(d), F.lit("@example.com now")),
    ).otherwise("")
    ssn = F.when(
        d % 11 == 0, F.concat(F.lit(" id 123-45-"), s(d % 9000 + 1000))
    ).otherwise("")
    phone = F.when(
        d % 13 == 0,
        F.concat(F.lit(" tel 555-"), s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000)),
    ).otherwise("")
    ip = F.when(
        d % 17 == 0,
        F.concat(F.lit(" ip 10.0."), s(d % 256), F.lit("."), s(d % 254 + 1)),
    ).otherwise("")
    return F.concat(text, email, ssn, phone, ip)


_PII_DIRTY_SQL = """
text
  || CASE WHEN doc_id % 7 = 0
     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
     ELSE '' END
  || CASE WHEN doc_id % 11 = 0
     THEN ' id 123-45-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 13 = 0
     THEN ' tel 555-' || CAST(doc_id % 900 + 100 AS VARCHAR)
       || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 17 = 0
     THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
       || '.' || CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END
"""


def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts + a redaction fingerprint.

    Emits per-doc match counts for the four pattern families, the total,
    a 0/1 release-blocking flag, and ``redacted_fp`` — md5 of the text
    after all four families are replaced with typed tags, proving the
    redaction transform itself is engine-exact without shipping the text.

    Scale: pure map-side projection (regexp_count/regexp_replace are
    codegen'd JVM ops); no shuffle at all — linear in input splits, same
    envelope as text_stats.
    """
    docs = load_table(spark, sf_dir, "documents")
    dirty = _pii_dirty(F.col("doc_id"), F.col("text"))
    base = docs.select("doc_id", dirty.alias("t"))
    cnt = lambda re_: F.regexp_count(F.col("t"), F.lit(re_)).cast("bigint")  # noqa: E731
    redacted = F.col("t")
    for re_, tag in (
        (PII_EMAIL_RE, "[EMAIL]"),
        (PII_SSN_RE, "[SSN]"),
        (PII_PHONE_RE, "[PHONE]"),
        (PII_IPV4_RE, "[IP]"),
    ):
        redacted = F.regexp_replace(redacted, re_, tag)
    total = (
        cnt(PII_EMAIL_RE) + cnt(PII_SSN_RE) + cnt(PII_PHONE_RE) + cnt(PII_IPV4_RE)
    )
    return base.select(
        "doc_id",
        cnt(PII_EMAIL_RE).alias("email_count"),
        cnt(PII_SSN_RE).alias("ssn_count"),
        cnt(PII_PHONE_RE).alias("phone_count"),
        cnt(PII_IPV4_RE).alias("ipv4_count"),
        total.alias("pii_total"),
        (total > 0).cast("int").alias("flagged"),
        F.md5(redacted).alias("redacted_fp"),
    )


def _pii_scan_sql() -> str:
    c = lambda re_: (  # noqa: E731
        f"CAST(len(regexp_extract_all(t, '{re_}')) AS BIGINT)"
    )
    counts = " + ".join(
        c(r) for r in (PII_EMAIL_RE, PII_SSN_RE, PII_PHONE_RE, PII_IPV4_RE)
    )
    red = "t"
    for re_, tag in (
        (PII_EMAIL_RE, "[EMAIL]"),
        (PII_SSN_RE, "[SSN]"),
        (PII_PHONE_RE, "[PHONE]"),
        (PII_IPV4_RE, "[IP]"),
    ):
        red = f"regexp_replace({red}, '{re_}', '{tag}', 'g')"
    return f"""
SELECT
  doc_id,
  {c(PII_EMAIL_RE)} AS email_count,
  {c(PII_SSN_RE)} AS ssn_count,
  {c(PII_PHONE_RE)} AS phone_count,
  {c(PII_IPV4_RE)} AS ipv4_count,
  {counts} AS pii_total,
  CAST(({counts}) > 0 AS INT) AS flagged,
  md5({red}) AS redacted_fp
FROM (SELECT doc_id, {_PII_DIRTY_SQL} AS t FROM documents) d
"""




# --------------------------------------------------------- packing stats

PACK_CONTEXT_LENS = (128, 256, 512)


def corpus_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing efficiency table per candidate context length — the
    decision input for an LLM training run: one-doc-per-row wastes
    (L − len) tokens of every row as padding, while concatenation packing
    approaches the ⌈Σtokens/L⌉ lower bound. For each L this emits the doc
    count, token total, overlong-doc count (they truncate or split),
    padding-waste utilization of the naive layout, and the packed lower
    bound — the table that picks L and decides whether packing is worth
    its shuffle.

    ONE token-count scan feeds every L (the per-L arithmetic is a 1-row
    cross join fan-out over the aggregate, not a rescan); all math is
    integer/decimal-exact.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok")
    )
    rows = []
    agg = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        *[
            F.sum(F.when(F.col("n_tok") > L, 1).otherwise(0))
            .cast("bigint")
            .alias(f"over_{L}")
            for L in PACK_CONTEXT_LENS
        ],
        *[
            F.sum(F.least(F.col("n_tok"), F.lit(L)))
            .cast("bigint")
            .alias(f"kept_{L}")
            for L in PACK_CONTEXT_LENS
        ],
    )
    for L in PACK_CONTEXT_LENS:
        d = lambda c: F.col(c).cast("double")  # noqa: E731
        naive_util = d(f"kept_{L}") / (d("n_docs") * float(L))
        packed_rows = F.ceil(F.col("total_tokens").cast("double") / float(L)).cast(
            "bigint"
        )
        rows.append(
            agg.select(
                F.lit(L).cast("bigint").alias("context_len"),
                "n_docs",
                "total_tokens",
                F.col(f"over_{L}").alias("overlong_docs"),
                F.round(naive_util, 9).alias("naive_utilization"),
                packed_rows.alias("packed_rows_lower_bound"),
                F.round(
                    d("total_tokens")
                    / (packed_rows.cast("double") * float(L)),
                    9,
                ).alias("packed_utilization"),
            )
        )
    out = rows[0]
    for o in rows[1:]:
        out = out.unionByName(o)
    return out


def _packing_sql() -> str:
    parts = []
    for L in PACK_CONTEXT_LENS:
        parts.append(f"""
SELECT CAST({L} AS BIGINT) AS context_len, n_docs, total_tokens,
       over_{L} AS overlong_docs,
       ROUND(CAST(kept_{L} AS DOUBLE) / (CAST(n_docs AS DOUBLE) * {L}.0), 9)
         AS naive_utilization,
       CAST(CEIL(CAST(total_tokens AS DOUBLE) / {L}.0) AS BIGINT)
         AS packed_rows_lower_bound,
       ROUND(CAST(total_tokens AS DOUBLE)
             / (CAST(CEIL(CAST(total_tokens AS DOUBLE) / {L}.0) AS DOUBLE)
                * {L}.0), 9) AS packed_utilization
FROM agg""")
    sums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN n_tok > {L} THEN 1 ELSE 0 END) AS BIGINT) AS over_{L},\n"
        f"         CAST(SUM(LEAST(n_tok, {L})) AS BIGINT) AS kept_{L}"
        for L in PACK_CONTEXT_LENS
    )
    return f"""
WITH toks AS (
  SELECT CAST(len({tokens_sql("text")}) AS BIGINT) AS n_tok FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         {sums}
  FROM toks
)
{chr(10).join("UNION ALL" + p if i else p for i, p in enumerate(parts))}
"""

# ---------------------------------------------- semantic decontamination

# Benchmark membership for the EMBEDDING corpus (independent hash family
# from the text benchmark flag; applied to base ids only — injected
# near-dup clones can never be "benchmark" items). 10% keeps the detector
# non-vacuous at the 500-vector small-SF lakes (a real pipeline joins its
# actual eval-suite embeddings, which are fixed-size at any corpus scale).
SEM_BENCH_PCT = 10


def _sem_bench_pred() -> Column:
    from .dedup import ID_OFFSET

    return (
        portable_hash64(F.concat(F.lit("semb_"), F.col("vec_id").cast("string")))
        % 100
        < SEM_BENCH_PCT
    ) & (F.col("vec_id") < ID_OFFSET)


def corpus_decontamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination: corpus vectors whose embedding is
    near-identical (cosine ≥ COSINE_T) to a benchmark item's embedding —
    the paraphrase/translation/reformat contamination that n-gram overlap
    (`corpus_decontamination`) is blind to, run as standard practice in
    public LLM data reports alongside the string check. Emits one row per
    contaminated corpus vector: its closest benchmark item (deterministic
    argmax: cosine desc, bench id asc) and how many benchmark items it
    matched.

    Plan: ONE streaming assignment pass over the (cloned) corpus against
    the session's memoized IVF quantizer (`similarity.rank_cells` — slim
    (vec_id, cell_id) rows, embeddings never ride the match), split into
    benchmark/corpus sides by the deterministic flag; the benchmark side
    is a fixed-size eval suite at any corpus scale, so it BROADCASTS to
    the cell join and the corpus never shuffles. Only in-cell candidates
    get an exact Arrow-kernel cosine; the argmax/count window runs over
    matched pairs only (≈ |bench| · cell occupancy, metadata-scale).
    """
    from ..plans.cache import release_caches, tracked_cache
    from .dedup import COSINE_T, DEDUP_NPROBE, _vec_corpus
    from .similarity import rank_cells, trained_centroid_rows
    from ..functions.vectors import cosine_rounded_arrow_once

    release_caches()
    corpus = _vec_corpus(spark, sf_dir)
    cent_rows = trained_centroid_rows(spark, sf_dir)
    ranked = tracked_cache(
        rank_cells(corpus, cent_rows, DEDUP_NPROBE).select("vec_id", "cell_id")
    )
    bench = ranked.filter(_sem_bench_pred())
    cside = ranked.filter(~_sem_bench_pred())
    cand = (
        cside.alias("c")
        .join(F.broadcast(bench.alias("b")), F.col("c.cell_id") == F.col("b.cell_id"))
        .select(
            F.col("c.vec_id").alias("corpus_vec_id"),
            F.col("b.vec_id").alias("bench_vec_id"),
        )
        .distinct()
    )
    emb_c = corpus.select(
        F.col("vec_id").alias("corpus_vec_id"),
        F.col("embedding").alias("emb_c"),
    )
    emb_b = corpus.select(
        F.col("vec_id").alias("bench_vec_id"),
        F.col("embedding").alias("emb_b"),
    )
    cos = cosine_rounded_arrow_once(
        F.col("emb_c").cast("array<double>"), F.col("emb_b").cast("array<double>")
    )
    scored = (
        cand.join(emb_c, "corpus_vec_id")
        .join(F.broadcast(emb_b), "bench_vec_id")
        .select("corpus_vec_id", "bench_vec_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= COSINE_T)
    )
    w = Window.partitionBy("corpus_vec_id")
    return (
        scored.select(
            "corpus_vec_id",
            "bench_vec_id",
            "cos_sim",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_bench_matches"),
            F.row_number()
            .over(w.orderBy(F.desc("cos_sim"), F.asc("bench_vec_id")))
            .alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _sem_decontamination_sql() -> str:
    from .dedup import COSINE_T, DEDUP_NPROBE, ID_OFFSET, _VEC_CORPUS_SQL
    from .similarity import train_sql_ctes
    from ..functions.vectors import cosine_rounded_sql, cosine_sql

    train_ctes, cent = train_sql_ctes("embeddings")
    cos_assign = cosine_sql("c.c_emb", "e.embedding")
    cos = cosine_rounded_sql("c.embedding", "b.embedding")
    flag = (
        portable_hash64_sql("'semb_' || CAST(vec_id AS VARCHAR)")
        + f" % 100 < {SEM_BENCH_PCT} AND vec_id < {ID_OFFSET}"
    )
    return f"""
WITH corpus AS ({_VEC_CORPUS_SQL}),
{train_ctes},
ranked AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos_assign} DESC, c.cell_id ASC) AS rn
    FROM corpus e CROSS JOIN {cent} c
  ) t WHERE rn <= {DEDUP_NPROBE}
),
bench AS (SELECT * FROM ranked WHERE {flag}),
cside AS (SELECT * FROM ranked WHERE NOT ({flag})),
cand AS (
  SELECT DISTINCT c.vec_id AS corpus_vec_id, b.vec_id AS bench_vec_id,
         {cos} AS cos_sim
  FROM cside c JOIN bench b ON c.cell_id = b.cell_id
  WHERE {cos} >= {COSINE_T}
)
SELECT corpus_vec_id, bench_vec_id, cos_sim,
       CAST(n_bench_matches AS BIGINT) AS n_bench_matches
FROM (
  SELECT corpus_vec_id, bench_vec_id, cos_sim,
         COUNT(*) OVER (PARTITION BY corpus_vec_id) AS n_bench_matches,
         ROW_NUMBER() OVER (
           PARTITION BY corpus_vec_id
           ORDER BY cos_sim DESC, bench_vec_id ASC) AS rn
  FROM cand
) WHERE rn = 1
"""


QUERIES = {
    "corpus_packing_stats": corpus_packing_stats,
    "corpus_decontamination": corpus_decontamination,
    "corpus_decontamination_semantic": corpus_decontamination_semantic,
    "split_leakage_report": split_leakage_report,
    "split_leakage_neardup": split_leakage_neardup,
    "corpus_mix_report": corpus_mix_report,
    "corpus_mix_plan": corpus_mix_plan,
    "corpus_token_budget_plan": corpus_token_budget_plan,
    "corpus_curation": corpus_curation,
    "text_pii_scan": text_pii_scan,
}

ORACLES = {
    "corpus_decontamination_semantic": _sem_decontamination_sql(),
    "corpus_packing_stats": _packing_sql(),
    "text_pii_scan": _pii_scan_sql(),
    "corpus_curation": _curation_sql(),
    "corpus_decontamination": DECONTAMINATION_SQL,
    "split_leakage_report": SPLIT_LEAKAGE_SQL,
    "split_leakage_neardup": _split_leakage_neardup_sql(),
    "corpus_mix_report": MIX_REPORT_SQL,
    "corpus_mix_plan": MIX_PLAN_SQL,
    "corpus_token_budget_plan": TOKEN_BUDGET_SQL,
}
