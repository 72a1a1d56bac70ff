"""Product-analytics workload: funnel, cohort retention, transition
matrix, token entropy, count-min heavy hitters, near-dup triangles.

These are the event-log / corpus-diagnostics queries a training-data
pipeline team runs next to the curation ops (which documents loop, how
users traverse the product, which tokens dominate the vocabulary) —
each expressed as a declarative DataFrame plan with a DuckDB oracle.

Scale notes (the part that matters at 100 TB):
- The funnel is ONE exchange: three chained window aggregates all
  partitioned by user_id, so Catalyst plans a single hash exchange and
  reuses the sort. No self-joins, no per-stage passes over events.
- Cohort retention shuffles events by user_id once to find the first
  touch, then re-aggregates on (cohort, week) — both keys are low
  cardinality on the second shuffle, so partial (map-side) aggregation
  collapses it.
- The count-min sketch is the textbook mergeable sketch: the (depth,
  bucket) count table IS the sketch, built with one partial-aggregated
  shuffle of 4×|tokens| rows into depth×16³ cells; estimates are a
  broadcast join of the candidate set against those cells. Identical
  md5 bucketing on the DuckDB side makes the whole thing hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import REGISTRY, register, t


def md5_uniform(col) -> F.Column:
    """Deterministic md5-derived Uniform(0,1): first 8 hex chars of
    md5(col) as an integer, shifted to the bin midpoint, over 2^32 —
    the ONE definition of the hash-to-uniform idiom r24/r26/r74 (and
    their oracles) must share bit for bit; three hand-maintained
    copies could silently desynchronize on a width/offset change."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        + 0.5
    ) / F.lit(4294967296.0)


# --------------------------------------------------------------------
# r17: strict-order event funnel
# --------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS ts1
  FROM events GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS ts2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.ts >= t1.ts1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS ts3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.ts2
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT '1_signup' AS stage,
         CAST(count(ts1) AS BIGINT) AS users FROM t1
  UNION ALL
  SELECT '2_view', CAST(count(*) AS BIGINT) FROM t2
  UNION ALL
  SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM t3
) ORDER BY stage
"""


@register(
    "r17_event_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("analytics", "funnel", "window"),
)
def r17_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel signup → view → purchase: a user reaches
    stage k only via an event at-or-after their stage k-1 timestamp.

    The oracle spells it as three joins back to events; the Spark plan
    is three CHAINED window aggregates over the same partitioning
    (user_id), which Catalyst executes with ONE exchange + sort — each
    stage's threshold is a windowed min over rows filtered by the
    previous stage's windowed min. At 100 TB that is one shuffle of the
    events table instead of three join passes, and the final stage
    counts collapse map-side (3-row output)."""
    w = Window.partitionBy("user_id")
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = (
        e.withColumn(
            "ts1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        )
        .withColumn(
            "ts2",
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("ts") >= F.col("ts1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "ts3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("ts2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("ts1").alias("ts1"), F.min("ts2").alias("ts2"), F.min("ts3").alias("ts3")
    )
    counts = per_user.agg(
        F.count("ts1").alias("c1"),
        F.count("ts2").alias("c2"),
        F.count("ts3").alias("c3"),
    )
    return (
        counts.select(
            F.expr(
                "stack(3, '1_signup', c1, '2_view', c2, '3_purchase', c3)"
                " AS (stage, users)"
            )
        )
        .orderBy("stage")
    )


# --------------------------------------------------------------------
# r18: weekly cohort retention
# --------------------------------------------------------------------

_COHORT_ORACLE = """
WITH first_touch AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(floor(date_diff('day', CAST(f.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) / 7)
            AS BIGINT) AS week_no,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN first_touch f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "r18_cohort_retention",
    oracle=_COHORT_ORACLE,
    tags=("analytics", "cohort", "retention"),
)
def r18_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort × weeks-since-first-touch retention matrix.

    Plan: window min(ts) over user_id attaches the cohort without a
    join (one exchange on user_id, same trick as the funnel), then a
    (cohort_week, week_no) countDistinct — whose shuffle key is tiny,
    so AQE coalesces it to a handful of partitions. The classic
    formulation (groupBy + self-join on user_id) would shuffle events
    twice; this shuffles once."""
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohorted = e.withColumn(
        "cohort_week", F.date_trunc("week", F.min("ts").over(w))
    )
    return (
        cohorted.select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                           F.col("cohort_week").cast("date")) / 7
            ).alias("week_no"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_no")
    )


# --------------------------------------------------------------------
# r19: event transition matrix
# --------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n
FROM nxt WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
"""


@register(
    "r19_event_transitions",
    oracle=_TRANSITIONS_ORACLE,
    tags=("analytics", "markov", "window"),
)
def r19_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user (tie-broken by event_id so the order — and therefore the
    hash — is deterministic). One exchange for the lead() window; the
    5×5 transition agg collapses map-side."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .orderBy("src", "dst")
    )


# --------------------------------------------------------------------
# r21: token-entropy quality metric
# --------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH pw AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS token_entropy
FROM pw GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "r21_token_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "quality", "entropy"),
)
def r21_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    diversity signal that complements q53's repetition fractions
    (degenerate/looping text scores near 0, varied prose near ln(n)).

    Uses the identity H = ln(n) − (Σ c·ln c)/n so the whole thing is
    two hash aggregations on doc_id-prefixed keys (partial-agg
    friendly) with no per-probability division pass. Entirely JVM
    expressions; rounded to 6 so Spark/DuckDB libm ulp differences
    can't flip the hash."""
    pw = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
    )
    c = F.col("count")
    return (
        pw.groupBy("doc_id")
        .agg(
            F.sum(c).alias("n_tokens"),
            F.round(
                F.log(F.sum(c)) - F.sum(c * F.log(c)) / F.sum(c), 6
            ).alias("token_entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# r22: event-type co-occurrence (market-basket pairs)
# --------------------------------------------------------------------

_COOCCUR_ORACLE = """
WITH s AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_user_days
FROM s a JOIN s b
  ON a.user_id = b.user_id AND a.d = b.d AND a.event_type < b.event_type
GROUP BY type_a, type_b
ORDER BY type_a, type_b
"""


@register(
    "r22_event_cooccurrence",
    oracle=_COOCCUR_ORACLE,
    tags=("analytics", "market-basket", "pairs"),
)
def r22_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for each unordered pair of event
    types, how many (user, day) baskets contain both.

    The oracle spells the classic self-join; the Spark plan NEVER
    self-joins — it collects each basket's distinct types (≤5 here,
    bounded by the type vocabulary in general) and emits the pairs
    map-side with nested array HOFs, exactly the posting-list trick
    q33 uses for shingles. Shuffles: one distinct on (user, day, type),
    one basket groupBy on the same key prefix (co-partitioned), and
    the final tiny pair agg — each safe at any corpus size because no
    stage is quadratic in anything but the per-basket type count."""
    s = (
        t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"), "event_type")
        .distinct()
    )
    baskets = s.groupBy("user_id", "d").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(types, (x, i) ->
                  transform(slice(types, i + 2, size(types)),
                            y -> struct(x AS type_a, y AS type_b))))
                """
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------
# r23: EWMA as a deterministic ordered fold
# --------------------------------------------------------------------

EWMA_ALPHA = 0.2

_EWMA_ORACLE = f"""
WITH s AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS xs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(xs) AS BIGINT) AS n_events,
       round(list_reduce(xs,
             (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc), 6)
         AS ewma
FROM s ORDER BY user_id
"""


@register(
    "r23_ewma_fold",
    oracle=_EWMA_ORACLE,
    tags=("timeseries", "ewma", "hof"),
)
def r23_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user as an ordered
    aggregate fold — the recursive y_t = αx_t + (1−α)y_{t−1} that no
    window frame can express, done with the `aggregate` HOF over the
    user's time-sorted values (seeded from the first element, matching
    DuckDB's list_reduce).

    One exchange on user_id; per-user state is the event list —
    bounded by events-per-entity, the same bound any per-entity
    sequence op has (for unbounded streams the stateful streaming path
    q39 is the analog). The fold order is pinned by (ts, event_id)
    sort inside sort_array, so the float result is deterministic and
    both engines execute the identical IEEE chain — rounded to 6 for
    the hash."""
    g = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("xs")
        )
    )
    fold = F.aggregate(
        F.expr("slice(xs, 2, size(xs) - 1)"),
        F.element_at("xs", 1).getField("value").cast("double"),
        lambda acc, x: F.lit(EWMA_ALPHA) * x.getField("value")
        + F.lit(1 - EWMA_ALPHA) * acc,
    )
    return g.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        F.round(fold, 6).alias("ewma"),
    ).orderBy("user_id")


# --------------------------------------------------------------------
# r24: weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------

SAMPLE_K = 5

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         round(pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    + 0.5) / 4294967296.0,
                   1.0 / n_chars), 6) AS sample_key
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY sample_key DESC, doc_id) AS rn
  FROM keyed
)
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       sample_key, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= {SAMPLE_K}
ORDER BY lang, rn
"""


@register(
    "r24_weighted_sample",
    oracle=_WSAMPLE_ORACLE,
    tags=("curation", "sampling", "weighted"),
)
def r24_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement per language — the
    Efraimidis–Spirakis one-pass scheme (key = u^(1/w), take the top-k
    keys) with w = n_chars, i.e. quality/length-weighted subsampling,
    the selection step training-data mixes actually use.

    The uniform u is derived from md5(doc_id) (first 8 hex chars →
    32-bit int → (v+0.5)/2³²), so the 'random' draw is a pure column
    expression — a seeded, repartition-stable sample with a
    hash-checkable oracle, unlike rand()-based sampling which no oracle
    can reproduce. The RANKING orders by the key rounded to 6 (with a
    doc_id tie-break), not the raw double: JVM Math.pow and libm pow
    are each allowed ~1 ulp of slack, so ordering by the full-precision
    value would let a boundary-straddling pair rank differently across
    engines; after rounding, the engines agree whenever their pows
    agree to 5e-7 — a vastly weaker requirement. One ranking window per
    language (the same pruned-window shape as q67); at any scale the
    cost is a scan + one shuffle on lang, and WindowGroupLimit prunes
    to k rows per partition before the final filter."""
    u = md5_uniform(F.col("doc_id").cast("string"))
    keyed = t(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        F.round(F.pow(u, 1.0 / F.col("n_chars")), 6).alias("sample_key"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("sample_key"), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
        .select("lang", "doc_id", "n_chars", "sample_key", "rn")
        .orderBy("lang", "rn")
    )


# --------------------------------------------------------------------
# r25: bigram-LM perplexity-proxy quality scoring
# --------------------------------------------------------------------

_BIGRAM_SQL = (
    "CASE WHEN len(l) >= 2 THEN [l[i] || ' ' || l[i + 1] FOR i IN range(1, len(l))] "
    "ELSE [] END"
)

_LM_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bg AS (
  SELECT doc_id, unnest({_BIGRAM_SQL}) AS pair FROM w
),
pc AS (SELECT pair, count(*) AS c_pair FROM bg GROUP BY pair),
ctx AS (
  SELECT split_part(pair, ' ', 1) AS w1, sum(c_pair) AS c_ctx
  FROM pc GROUP BY w1
),
probs AS (
  SELECT pair, CAST(c_pair AS DOUBLE) / c_ctx AS p
  FROM pc JOIN ctx ON split_part(pc.pair, ' ', 1) = ctx.w1
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln(p)), 6) AS avg_neg_logp
FROM bg JOIN probs USING (pair)
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""


@register(
    "r25_bigram_lm_quality",
    oracle=_LM_ORACLE,
    tags=("text", "quality", "perplexity"),
)
def r25_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity-proxy scoring (the CCNet/KenLM-style
    quality filter): train a word-bigram MLE model on the corpus, then
    score every document by its average negative log-probability under
    it — boilerplate and fluent text score low, noise scores high.

    Plan: bigrams are built in-row with a sequence/transform HOF (the
    q53 trick — 2-grams never shuffle on their own), counted once for
    the model (c_pair) and once re-aggregated per context word (c_ctx,
    a re-agg of the COUNTS, never a second corpus pass). Scoring joins
    the exploded bigrams to the probability table on the pair string —
    a plain equi-join that stays shuffle-partitionable when the model
    outgrows a broadcast (AQE broadcasts it at this scale). The bigram
    explode runs twice (model build + scoring); at 100 TB you'd persist
    the bigram table — that's a storage choice, not a plan change.
    Docs with <2 tokens have no bigrams and drop out (same inner-join
    semantics both engines). Scoring the training corpus keeps every
    probability > 0, so no smoothing term is needed for the demo."""
    w = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    bg = w.select(
        "doc_id",
        F.explode(
            F.expr(
                """
                CASE WHEN size(l) >= 2
                     THEN transform(sequence(1, size(l) - 1),
                                    i -> concat(l[i - 1], ' ', l[i]))
                     ELSE CAST(array() AS array<string>) END
                """
            )
        ).alias("pair"),
    )
    pc = bg.groupBy("pair").agg(F.count("*").alias("c_pair"))
    ctx = pc.groupBy(
        F.substring_index("pair", " ", 1).alias("w1")
    ).agg(F.sum("c_pair").alias("c_ctx"))
    probs = pc.join(
        ctx, F.substring_index(pc.pair, " ", 1) == ctx.w1
    ).select("pair", (F.col("c_pair").cast("double") / F.col("c_ctx")).alias("p"))
    return (
        bg.join(probs, "pair")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log("p")), 6).alias("avg_neg_logp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# r26: temperature-rebalanced language mixture
# --------------------------------------------------------------------

MIX_ALPHA = 0.3
MIX_BUDGET = 200

_TEMPER_ORACLE = f"""
WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT sum(pow(n_docs, {MIX_ALPHA})) AS z FROM counts),
rates AS (
  SELECT lang, n_docs,
         round(least(1.0, pow(n_docs, {MIX_ALPHA}) / z * {MIX_BUDGET} / n_docs), 6)
           AS rate
  FROM counts, tot
)
SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs, r.rate,
       CAST(count(*) FILTER (WHERE
         (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
           / 4294967296.0 < r.rate) AS BIGINT) AS kept
FROM documents d JOIN rates r USING (lang)
GROUP BY r.lang, r.n_docs, r.rate
ORDER BY r.lang
"""


@register(
    "r26_temperature_mixture",
    oracle=_TEMPER_ORACLE,
    tags=("curation", "sampling", "mixture"),
)
def r26_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the XLM-R / mT5 α-scheme):
    target share ∝ n^α with α = 0.3 flattens the language distribution —
    head languages are downsampled hard, tail languages kept nearly
    whole — under a fixed document budget. Acceptance is the same
    md5-uniform gate as r24, so the subsample is seeded and
    repartition-stable, and the per-language rate is ROUNDED to 6
    before the u < rate comparison (both engines), keeping the
    keep/drop decision insensitive to pow() ulp differences.

    Plan shape mirrors q71: one tiny per-language count, a 1-row scalar
    normalizer (broadcast cross), rates broadcast back onto the corpus
    — the corpus itself never shuffles; the decision is a narrow map.
    Output is the per-language audit (n_docs, rate, kept); the kept
    rows themselves are the same filter without the final agg."""
    counts = (
        t(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n_docs"))
    )
    z = counts.agg(
        F.sum(F.pow("n_docs", MIX_ALPHA)).alias("z")
    )
    rates = counts.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.round(
            F.least(
                F.lit(1.0),
                F.pow("n_docs", MIX_ALPHA) / F.col("z") * MIX_BUDGET / F.col("n_docs"),
            ),
            6,
        ).alias("rate"),
    )
    u = md5_uniform(F.col("doc_id").cast("string"))
    d = t(spark, sf_dir, "documents").select("lang", "doc_id", u.alias("u"))
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "rate")
        .agg(F.count(F.when(F.col("u") < F.col("rate"), 1)).alias("kept"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# z05: count-min sketch heavy hitters
# --------------------------------------------------------------------

CMS_DEPTH = 4
CMS_BUCKET_HEX = 3  # 16^3 = 4096 buckets per row


def cms_probe_col(tok_col):
    """The (d, bucket) probe array for one token column — THE bucket
    derivation, used by the sketch build, the candidate probe, and the
    merge test alike so the three can never desynchronize."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{d}"), tok_col)), 1, CMS_BUCKET_HEX
                ).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ]
    )

_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY tok
),
cand AS (
  SELECT tok, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, tok LIMIT 25
),
depths AS (SELECT unnest(range(0, {CMS_DEPTH})) AS d),
sketch AS (
  SELECT d,
         substr(md5('cms' || CAST(d AS VARCHAR) || tok), 1, {CMS_BUCKET_HEX})
           AS bucket,
         CAST(count(*) AS BIGINT) AS bc
  FROM tok CROSS JOIN depths
  GROUP BY d, bucket
),
probes AS (
  SELECT c.tok, c.exact_cnt, d.d,
         substr(md5('cms' || CAST(d.d AS VARCHAR) || c.tok), 1,
                {CMS_BUCKET_HEX}) AS bucket
  FROM cand c CROSS JOIN depths d
)
SELECT p.tok, p.exact_cnt, min(s.bc) AS cms_est
FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
GROUP BY p.tok, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.tok
"""


@register(
    "z05_cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    tags=("sketch", "count-min", "heavy-hitters"),
)
def z05_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × 4096 md5 buckets) vs exact counts
    for the 25 heaviest vocabulary tokens.

    The (d, bucket) → count table IS the CMS: built with one
    partial-aggregated shuffle whose output is at most depth × 16³
    cells regardless of corpus size, and mergeable across corpus
    shards by cell-wise addition (the property that matters at
    100 TB — union the cell tables, sum, done; same contract as the
    HLL rollup in z01). Estimates are min-over-depth of the probed
    cells; CMS guarantees est ≥ exact, checked in tests/test_sketches.
    Buckets are hex substrings of md5 so DuckDB reproduces the sketch
    bit-for-bit — the whole pipeline hash-matches, not just the shape.
    The candidate probe is a broadcast join (25×4 rows) against the
    cells."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("tok"))

    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    cand = exact.orderBy(F.desc("exact_cnt"), "tok").limit(25)

    # long-form (d, bucket) cells: explode each token into its DEPTH
    # probes via an inline array — one pass, no cross join materialized
    probes = tok.select(F.explode(cms_probe_col(F.col("tok"))).alias("p")).select(
        "p.d", "p.bucket"
    )
    sketch = probes.groupBy("d", "bucket").agg(F.count("*").alias("bc"))

    cand_probes = cand.select(
        "tok", "exact_cnt", F.explode(cms_probe_col(F.col("tok"))).alias("p")
    ).select("tok", "exact_cnt", "p.d", "p.bucket")

    return (
        sketch.join(F.broadcast(cand_probes), ["d", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("bc").alias("cms_est"))
        .orderBy(F.desc("exact_cnt"), "tok")
    )


# --------------------------------------------------------------------
# z06: triangles in the near-dup candidate graph
# --------------------------------------------------------------------


def _z06_oracle() -> str:
    pairs = REGISTRY["q35_minhash_lsh_pairs"].oracle
    assert pairs is not None
    return f"""
    WITH pairs AS ({pairs})
    SELECT ab.doc_a, ab.doc_b, bc.doc_b AS doc_c
    FROM pairs ab
    JOIN pairs bc ON bc.doc_a = ab.doc_b
    JOIN pairs ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
    ORDER BY ab.doc_a, ab.doc_b, doc_c
    """


@register(
    "z06_neardup_triangles",
    oracle=_z06_oracle(),
    tags=("graph", "triangles", "dedup"),
)
def z06_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the MinHash-LSH candidate graph —
    the structure signal dedup audits use (a triangle-dense candidate
    graph means transitive near-dup clusters; sparse triangles mean
    LSH noise).

    Edges are oriented doc_a < doc_b, so each triangle a<b<c is
    emitted exactly once by the standard two-join enumeration (join on
    the shared middle vertex, then close the wedge). Both joins are
    equi-joins on vertex ids — partitionable at any scale; degree
    skew is bounded upstream by the LSH band structure (a hot band is
    capped by the same posting-list guards as q35). Reuses q35's
    spark plan verbatim so candidate semantics stay identical."""
    # materialize the edge list once: the triangle enumeration reads it
    # three times, and without the checkpoint each read would re-run the
    # whole LSH band join (observed: 16 join nodes in the plan vs 2
    # after). Edge lists are tiny relative to the corpus; on a cluster
    # a reliable checkpoint dir (or a temp table) plays the same role.
    pairs = REGISTRY["q35_minhash_lsh_pairs"].spark_fn(spark, sf_dir).localCheckpoint(
        eager=True
    )
    ab = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bc = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    ac = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    return (
        ab.join(bc, ab.b == bc.b2)
        .join(ac, (ab.a == ac.a3) & (bc.c == ac.c3))
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.col("c").alias("doc_c"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )


# --------------------------------------------------------------------
# r32: per-user lag-1 autocorrelation
# --------------------------------------------------------------------


@register(
    "r32_lag_autocorrelation",
    oracle="""
    WITH lagged AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    )
    SELECT user_id, count(*) AS n_pairs, round(corr(value, prev), 6) AS acf1
    FROM lagged WHERE prev IS NOT NULL GROUP BY user_id
    HAVING count(*) >= 10
    """,
    tags=("timeseries", "stats", "autocorrelation"),
)
def r32_lag_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values in time order —
    the serial-dependence diagnostic behind EEG band-power stationarity
    checks and metric drift alarms (white noise → acf1 ≈ 0).

    One window shuffle on user_id (lag), then corr() as a single-pass
    bivariate partial aggregate on the SAME partitioning — Catalyst
    reuses the exchange, so the whole query moves events once. The
    (ts, event_id) tie-break keeps lag() deterministic under duplicate
    timestamps (W-family discipline). Users with <10 lag pairs are
    dropped: sample correlation on a handful of points is noise, and
    the floor keeps round(…,6) clear of ulp-boundary flakes."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value", F.lag("value").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.corr("value", "prev"), 6).alias("acf1"),
        )
        .filter(F.col("n_pairs") >= 10)
    )


# --------------------------------------------------------------------
# r33: rolling 7-day p95 via RANGE frame + in-row interpolation
# --------------------------------------------------------------------


@register(
    "r33_rolling_p95",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             list(value) AS vals
      FROM events GROUP BY event_type, day
    ),
    rolled AS (
      SELECT event_type, day,
             flatten(list(vals) OVER (
                 PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)) AS wv
      FROM daily
    )
    SELECT event_type, day::VARCHAR AS day, round(quantile_cont(x, 0.95), 6) AS p95_7d
    FROM rolled, UNNEST(wv) AS u(x)
    GROUP BY event_type, day
    """,
    tags=("timeseries", "window", "percentile"),
)
def r33_rolling_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day p95 latency per event type by day — the rolling
    tail-percentile no engine exposes as a native window aggregate
    (percentile isn't frame-mergeable), composed from pieces that ARE:

    1. pre-aggregate values into per-(type, day) arrays — the only
       shuffle that touches raw events, and it shrinks the window input
       to |types|×|days| rows (r14's WAU trick);
    2. RANGE frame over datediff-encoded days gathers the trailing
       week's arrays (gap-correct: missing days contribute nothing,
       unlike a 7-ROW frame);
    3. flatten + sort_array + the k = (n-1)·p interpolation as pure
       in-row expressions — the percentile itself costs no shuffle and
       matches quantile_cont's math exactly (q10's parity argument).

    Window state is bounded by a week of one type's values; at 100 TB
    the same shape holds with the day arrays swapped for per-day
    digest partials."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date(F.date_trunc("day", "ts")))
        .groupBy("event_type", "day")
        .agg(F.collect_list("value").alias("vals"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff("day", F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    s = F.sort_array(F.flatten(F.collect_list("vals").over(w)))
    n = F.size(s)
    k = (n - F.lit(1)) * F.lit(0.95)
    kf = F.floor(k)
    lo = F.element_at(s, kf.cast("int") + 1)
    hi = F.element_at(s, F.least(kf.cast("int") + 2, n))
    p95 = lo + (k - kf) * (hi - lo)
    return daily.select(
        "event_type",
        # VARCHAR day both sides: date-typed columns normalize
        # differently between the two pandas bridges (r14 precedent)
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(p95, 6).alias("p95_7d"),
    )


# --------------------------------------------------------------------
# r34/r35: distribution-drift and independence audits
# --------------------------------------------------------------------


@register(
    "r34_ks_drift",
    oracle="""
    WITH tagged AS (
      SELECT lang, CAST(n_chars AS DOUBLE) AS v,
             -- TRY_CAST, matching Spark's try_cast: a source with no
             -- trailing digits extracts '' and a plain CAST throws
             CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS grp
      FROM documents
    ),
    counts AS (
      SELECT lang,
             count(*) FILTER (WHERE grp='A') AS na,
             count(*) FILTER (WHERE grp='B') AS nb
      FROM tagged GROUP BY lang
    ),
    cum AS (
      SELECT t.lang, t.v,
             count(*) FILTER (WHERE grp='A') OVER (
                PARTITION BY lang ORDER BY v
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             count(*) FILTER (WHERE grp='B') OVER (
                PARTITION BY lang ORDER BY v
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM tagged t
    )
    SELECT c.lang, max(cn.na) AS n_a, max(cn.nb) AS n_b,
           round(max(abs(CAST(ca AS DOUBLE)/cn.na - CAST(cb AS DOUBLE)/cn.nb)), 6)
               AS ks_stat
    FROM cum c JOIN counts cn ON c.lang = cn.lang
    GROUP BY c.lang
    """,
    tags=("stats", "drift", "ks-test"),
)
def r34_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per language between two
    source cohorts (even- vs odd-numbered sources) over the length
    distribution — the distribution-drift alarm a corpus pipeline runs
    when a new crawl/source batch lands (mean/std miss shape changes;
    KS is the standard nonparametric detector).

    Plan: tag is a narrow map; the two running counts ride ONE
    (lang, v)-ordered window exchange — Spark's default aggregate
    frame with ORDER BY is RANGE..CURRENT ROW, which includes ties
    (peers), exactly the ECDF's right-continuous step — and the final
    max is a 5-group agg on the same partitioning. ~two shuffles
    total, state bounded per language. try_cast keeps ANSI mode safe
    on a source name with no trailing digits."""
    d = t(spark, sf_dir, "documents")
    tagged = d.select(
        "lang",
        F.col("n_chars").cast("double").alias("v"),
        F.when(
            F.expr(r"try_cast(regexp_extract(source, '(\\d+)$', 1) AS INT)") % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("grp"),
    )
    w = Window.partitionBy("lang").orderBy("v")  # RANGE default: ties included
    wl = Window.partitionBy("lang")
    cum = tagged.select(
        "lang",
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).over(w).alias("ca"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).over(w).alias("cb"),
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).over(wl).alias("na"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).over(wl).alias("nb"),
    )
    return cum.groupBy("lang").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("na")
                    - F.col("cb").cast("double") / F.col("nb")
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "r35_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
      FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT sum(o) AS n FROM obs),
    rowt AS (SELECT lang, sum(o) AS rl FROM obs GROUP BY lang),
    colt AS (SELECT source, sum(o) AS cs FROM obs GROUP BY source)
    SELECT round(sum((o - rl*cs/n) * (o - rl*cs/n) / (rl*cs/n)), 6) AS chi2,
           CAST((count(DISTINCT obs.lang)-1) * (count(DISTINCT obs.source)-1)
                AS BIGINT) AS dof
    FROM obs JOIN rowt USING (lang) JOIN colt USING (source) CROSS JOIN tot
    """,
    tags=("stats", "bias", "chi2"),
)
def r35_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence statistic for the lang × source
    contingency table — the dataset-bias audit ("does language mix
    depend on the source?") that decides whether per-source language
    rebalancing (r26) is even needed.

    The corpus collapses to |lang|×|source| observed cells in ONE agg
    shuffle; marginals and the statistic are computed on that tiny
    relation with broadcast joins. (o−e)² is spelled as a product, not
    pow(), sidestepping cross-engine pow ulp drift (r24's lesson)."""
    d = t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("o")
    )
    tot = obs.agg(F.sum("o").alias("n"))
    rowt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    colt = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    e = F.col("rl") * F.col("cs") / F.col("n")
    cells = (
        obs.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
    )
    return cells.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias("chi2"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).alias("dof"),
    )


# --------------------------------------------------------------------
# r39: inter-arrival statistics (Poisson-ness diagnostic)
# --------------------------------------------------------------------


@register(
    "r39_interarrival_stats",
    oracle="""
    WITH ia AS (
      SELECT event_type,
             epoch(ts) - epoch(lag(ts) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap), 6) AS avg_gap_s,
           round(stddev_samp(gap) / avg(gap), 6) AS cv
    FROM ia WHERE gap IS NOT NULL AND gap > 0
    GROUP BY event_type
    """,
    tags=("timeseries", "stats", "interarrival"),
)
def r39_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type: mean gap and the
    coefficient of variation — the Poisson-process diagnostic (CV = 1
    for exponential arrivals; CV >> 1 means bursts, the signal that
    decides whether rate-based alerting thresholds are even valid).

    One lead/lag window exchange on event_type; the stats are partial
    aggregates on the same partitioning (r32's shape). Zero gaps
    (duplicate timestamps) are excluded from the fit, as is standard for
    continuous inter-arrival models."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ia = ev.select(
        "event_type",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    return ia.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("avg_gap_s"),
        F.round(F.stddev_samp("gap") / F.avg("gap"), 6).alias("cv"),
    )


# --------------------------------------------------------------------
# r63: churn survival life table (Kaplan-Meier risk sets)
# --------------------------------------------------------------------

#: users quiet for this many days before the corpus end are churned
#: (sized so the testdata's final-days activity cluster actually
#: censors: ~17 of 150 users churn at sf0.01); still-active users are
#: right-censored at their observed duration
_CHURN_GAP_DAYS = 1


@register(
    "r63_survival_life_table",
    oracle=f"""
    WITH bounds AS (SELECT max(ts) AS mx FROM events),
    u AS (
      SELECT user_id,
             CAST(floor(date_diff('second', min(ts), max(ts)) / 86400.0)
                  AS BIGINT) AS duration_days,
             max(ts) < (SELECT mx FROM bounds) - INTERVAL {_CHURN_GAP_DAYS} DAY
                 AS churned
      FROM events GROUP BY user_id
    ), ev AS (
      SELECT duration_days AS d,
             sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_events
      FROM u GROUP BY duration_days
    ), risk AS (
      SELECT ev.d, ev.n_events,
             (SELECT count(*) FROM u WHERE u.duration_days >= ev.d)
                 AS n_at_risk
      FROM ev
    )
    SELECT d AS duration_days,
           CAST(n_at_risk AS BIGINT)  AS n_at_risk,
           CAST(n_events AS BIGINT)   AS n_churned,
           round(n_events / n_at_risk, 6) AS hazard
    FROM risk
    WHERE n_events > 0
    """,
    tags=("analytics", "survival", "kaplan-meier", "churn"),
)
def r63_survival_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis of user lifetime (Kaplan-Meier risk sets):
    per observed churn duration, the at-risk count, churn count, and
    hazard — with right-censoring (users still active in the final
    day are censored at their observed duration, not counted as
    deaths; ignoring censoring is the classic churn-analysis bug that
    biases lifetimes short). The KM survival curve is the running
    product of (1 − hazard) over this table — pinned in tests; the
    oracle checks the life table itself.

    Plan: one (user) aggregation shuffle; the risk-set counts come
    from a cumulative window over the |distinct durations| relation
    (days-bounded), never a per-user rescan."""
    e = t(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("mx"))
    u = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(
                (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
                / 86400.0
            ).alias("duration_days"),
            (
                F.col("last_ts")
                < F.col("mx") - F.expr(f"INTERVAL {_CHURN_GAP_DAYS} DAYS")
            ).alias("churned"),
        )
    )
    per_d = u.groupBy("duration_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("n_events"),
        F.count(F.lit(1)).alias("n_here"),
    )
    # at risk at duration d = everyone whose duration >= d: cumulative
    # sum from the longest duration down, over the tiny durations table
    w = (
        Window.orderBy(F.desc("duration_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_d.withColumn("n_at_risk", F.sum("n_here").over(w))
    return (
        risk.filter(F.col("n_events") > 0)
        .select(
            "duration_days",
            "n_at_risk",
            F.col("n_events").alias("n_churned"),
            F.round(F.col("n_events") / F.col("n_at_risk"), 6).alias("hazard"),
        )
    )


@register(
    "r65_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    base AS (
      SELECT o_custkey AS custkey,
             date_diff('day', max(o_orderdate), (SELECT mxd FROM mx))
                 AS recency_days,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT custkey,
             ntile(5) OVER (ORDER BY recency_days ASC, custkey)  AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, custkey)    AS f_inv,
             ntile(5) OVER (ORDER BY monetary DESC, custkey)     AS m_inv,
             monetary
      FROM base
    ), seg AS (
      SELECT custkey, monetary,
             r_score, 6 - f_inv AS f_score, 6 - m_inv AS m_score,
             CASE
               WHEN r_score <= 2 AND 6 - f_inv >= 4 AND 6 - m_inv >= 4
                 THEN 'champions'
               WHEN r_score >= 4 AND 6 - f_inv <= 2 THEN 'at_risk'
               WHEN r_score <= 2 THEN 'recent'
               ELSE 'regular'
             END AS segment
      FROM scored
    )
    SELECT segment,
           CAST(count(*) AS BIGINT)         AS n_customers,
           round(avg(monetary), 4)          AS avg_monetary,
           round(avg(r_score), 4)           AS avg_r,
           round(avg(f_score), 4)           AS avg_f,
           round(avg(m_score), 4)           AS avg_m
    FROM seg
    GROUP BY segment
    """,
    tags=("analytics", "rfm", "segmentation", "window"),
)
def r65_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic CRM workload: quintile
    scores for recency/frequency/monetary (deterministic ntile ties
    broken by custkey; F/M ranked DESC then inverted so 5 = best) and
    rule-based segments, reported per segment. One customer
    aggregation shuffle + three window passes over the |customers|
    relation; at scale each ntile is one ordered exchange of the
    aggregate, never of the fact table."""
    o = t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.datediff(F.col("mxd"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    r_s = F.ntile(5).over(Window.orderBy(F.asc("recency_days"), F.asc("custkey")))
    f_i = F.ntile(5).over(Window.orderBy(F.desc("frequency"), F.asc("custkey")))
    m_i = F.ntile(5).over(Window.orderBy(F.desc("monetary"), F.asc("custkey")))
    scored = base.select(
        "custkey", "monetary",
        r_s.alias("r_score"),
        (6 - f_i).alias("f_score"),
        (6 - m_i).alias("m_score"),
    )
    segment = (
        F.when(
            (F.col("r_score") <= 2)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            "champions",
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "at_risk")
        .when(F.col("r_score") <= 2, "recent")
        .otherwise("regular")
    )
    return (
        scored.withColumn("segment", segment)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
            F.round(F.avg("r_score"), 4).alias("avg_r"),
            F.round(F.avg("f_score"), 4).alias("avg_f"),
            F.round(F.avg("m_score"), 4).alias("avg_m"),
        )
    )


@register(
    "r66_hierarchy_revenue_shares",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
               AS share_of_region,
           round(revenue / sum(revenue) OVER (), 6)
               AS share_of_total,
           CAST(rank() OVER (PARTITION BY region
                             ORDER BY revenue DESC, nation) AS BIGINT)
               AS rank_in_region
    FROM rev
    """,
    tags=("analytics", "window", "hierarchy", "share-of-total"),
)
def r66_hierarchy_revenue_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels (nation share of its
    region, share of world) plus within-region ranking — the standard
    BI drill-down readout. The fact table joins two broadcast dims and
    aggregates ONCE; both shares and the rank ride windows over the
    25-row aggregate, so the only corpus-sized work is the one
    revenue shuffle."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy("region").orderBy(F.desc("revenue"), F.asc("nation"))
    return rev.select(
        "region", "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_of_total"
        ),
        F.rank().over(w_rank).cast("long").alias("rank_in_region"),
    )


# --------------------------------------------------------------------
# r67: CUSUM changepoint detection per user series
# --------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1000000, 0) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS k,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM events
),
s AS (
  SELECT *,
         CAST(sum(v) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs,
         CAST(sum(v) OVER (PARTITION BY user_id) AS BIGINT) AS tot
  FROM d
),
x AS (
  SELECT user_id, k, ts, n, n * cs - k * tot AS ss
  FROM s
),
r AS (
  SELECT user_id, k, ts, n, ss,
         max(ss) OVER (PARTITION BY user_id) AS smax,
         min(ss) OVER (PARTITION BY user_id) AS smin,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(ss) DESC, k) AS rn
  FROM x
)
SELECT user_id,
       n AS n_events,
       round((smax - smin) / (n * 1000000.0), 6) AS cusum_range,
       CAST(k AS INTEGER) AS cp_index,
       ts AS cp_ts,
       round(abs(ss) / (n * 1000000.0), 6) AS cusum_stat
FROM r WHERE rn = 1 ORDER BY user_id
"""


@register(
    "r67_cusum_changepoint",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "changepoint", "window"),
)
def r67_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection per user series (Page 1954): the
    cumulative sum of deviations from the series mean, its range
    max(S)-min(S) as the shift statistic, and the argmax of |S| as the
    estimated changepoint location — the standard drift detector run
    over per-entity metric streams before retraining decisions.

    Plan shape: ONE exchange on user_id; the ordered prefix sum, the
    total, the extrema and the argmax ranking are all windows over the
    same partitioning, so Catalyst reuses a single sort. Per-user
    state is O(1) per row — no collected lists — so the plan survives
    arbitrarily long series, unlike fold-based r23 which bounds by
    events-per-entity.

    Cross-engine exactness: the whole statistic is computed in EXACT
    integer arithmetic — values scale to micro-units (one IEEE
    multiply + round, identical bits in any engine), and the centered
    prefix sum is expressed denominator-free as
    ss_k = n·cs_k − k·S_n  (= n·Σ_{i≤k}(v_i − mean) in micro-units),
    so extrema, the argmax and its tie-break rank on exact BIGINTs;
    floats only appear in ONE final division per output. Round 3's
    float formulation hit a round(·,6) boundary at sf0.1 where the
    engines' avg() disagreed by 1 ulp — this version is bit-stable at
    every SF by construction. Exactness envelope: n²·max|v|·10⁶ < 2⁶³
    per series (≈100k rows/user at |v|≤10³); longer series drop the
    scale factor."""
    e = t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.round(F.col("value") * 1000000, 0).cast("long")
    s = (
        e.select("user_id", "ts", "event_id", v.alias("v"))
        .withColumn("k", F.row_number().over(w_ord))
        .withColumn("n", F.count("*").over(w_user).cast("long"))
        .withColumn("cs", F.sum("v").over(w_cum))
        .withColumn("tot", F.sum("v").over(w_user))
        .withColumn(
            "ss", F.col("n") * F.col("cs") - F.col("k").cast("long") * F.col("tot")
        )
    )
    r = s.select(
        "user_id",
        "k",
        "ts",
        "n",
        "ss",
        F.max("ss").over(w_user).alias("smax"),
        F.min("ss").over(w_user).alias("smin"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.abs("ss").desc(), "k"))
        .alias("rn"),
    )
    denom = F.col("n") * F.lit(1000000.0)
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round((F.col("smax") - F.col("smin")) / denom, 6).alias(
                "cusum_range"
            ),
            F.col("k").alias("cp_index"),
            F.col("ts").alias("cp_ts"),
            F.round(F.abs("ss") / denom, 6).alias("cusum_stat"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# r68: Holt linear-trend smoothing + h-step forecast (struct fold)
# --------------------------------------------------------------------

HOLT_ALPHA = 0.3
HOLT_BETA = 0.1
HOLT_H = 3

# NB: a list_reduce-with-STRUCT-accumulator oracle would be the r23
# shape, but DuckDB 1.0 evaluates struct_pack lambda fields
# sequentially, mutating the accumulator in place — the b field sees
# the already-updated l (probed: (acc,e) -> struct(l := acc.l + e.l,
# b := acc.l + e.l) folds [1,2,3] to {l: 6, b: 9}, not {6, 6}) — so
# the two-state recursion is spelled as a recursive CTE instead: the
# per-step expressions are written token-for-token like the Spark
# fold, so both engines run the identical IEEE chain.
_HOLT_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT user_id, CAST(value AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
holt AS (
  SELECT user_id, k, n, x AS l, CAST(0.0 AS DOUBLE) AS b
  FROM base WHERE k = 1
  UNION ALL
  SELECT nx.user_id, nx.k, nx.n,
         {HOLT_ALPHA} * nx.x + {1 - HOLT_ALPHA} * (h.l + h.b) AS l,
         {HOLT_BETA} * (({HOLT_ALPHA} * nx.x
            + {1 - HOLT_ALPHA} * (h.l + h.b)) - h.l)
           + {1 - HOLT_BETA} * h.b AS b
  FROM holt h JOIN base nx ON nx.user_id = h.user_id AND nx.k = h.k + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(l + {HOLT_H} * b, 6) AS forecast_3
FROM holt WHERE k = n ORDER BY user_id
"""


@register(
    "r68_holt_forecast",
    oracle=_HOLT_ORACLE,
    tags=("timeseries", "forecast", "hof"),
)
def r68_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per user series (level +
    trend state) and the h-step-ahead forecast ŷ = l + h·b — the
    capacity-planning readout teams run over per-entity metrics. The
    recursion carries TWO coupled states, which no window frame can
    express; it rides the same ordered `aggregate` fold as r23 but
    with a STRUCT accumulator (l, b), seeded Holt-style from the first
    observation (l₁ = x₁, b₁ = 0).

    One exchange on user_id; the fold order is pinned by (ts,
    event_id) inside sort_array, and both engines execute the
    identical IEEE multiply-add chain (DuckDB folds the same
    struct_pack lambda), so the floats agree bitwise before the
    round-to-6. Per-user state is the collected series — bounded by
    events-per-entity, same as every fold query; the O(1)-per-row
    streaming analog is the q84 transformWithState path."""
    g = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("xs")
        )
    )
    a, b_ = F.lit(HOLT_ALPHA), F.lit(HOLT_BETA)

    def step(acc, x):
        lnew = a * x.getField("value") + (1 - a) * (
            acc.getField("l") + acc.getField("b")
        )
        bnew = b_ * (lnew - acc.getField("l")) + (1 - b_) * acc.getField("b")
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    init = F.struct(
        F.element_at("xs", 1).getField("value").cast("double").alias("l"),
        F.lit(0.0).alias("b"),
    )
    fold = F.aggregate(F.expr("slice(xs, 2, size(xs) - 1)"), init, step)
    return g.select(
        "user_id",
        F.size("xs").cast("long").alias("n_events"),
        F.round(fold.getField("l"), 6).alias("level"),
        F.round(fold.getField("b"), 6).alias("trend"),
        F.round(fold.getField("l") + HOLT_H * fold.getField("b"), 6).alias(
            "forecast_3"
        ),
    ).orderBy("user_id")


# --------------------------------------------------------------------
# r72: order-fulfillment latency SLA percentiles by priority
# --------------------------------------------------------------------

_LATENCY_ORACLE = """
WITH ship AS (
  SELECT l_orderkey,
         min(l_shipdate) AS first_ship,
         max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
lat AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, s.first_ship) AS days_to_first,
         date_diff('day', o.o_orderdate, s.last_ship)  AS days_to_full
  FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(days_to_first), 4) AS avg_days_to_first,
       round(quantile_cont(days_to_full, 0.5), 4)  AS p50_days_to_full,
       round(quantile_cont(days_to_full, 0.95), 4) AS p95_days_to_full,
       CAST(max(days_to_full) AS BIGINT) AS worst_days
FROM lat GROUP BY priority ORDER BY priority
"""


@register(
    "r72_fulfillment_latency",
    oracle=_LATENCY_ORACLE,
    tags=("analytics", "latency", "sla"),
)
def r72_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency SLA readout: days from order date to
    first and to final shipment, with p50/p95 per priority class — the
    cross-table lifecycle-latency report an ops team pages on (and the
    shape of any event-pair latency: request→response, ingest→serve).

    Plan: lineitem pre-aggregates to one (orderkey, first, last) row
    BEFORE the join — the q02 lesson: the join moves |orders| rows,
    never |lineitem| — then one 5-group aggregate carries the exact
    interpolated percentiles (q10's percentile↔quantile_cont
    convention). Two corpus-sized exchanges total, both unavoidable
    (the per-order agg and the order join's own key exchange)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    lat = o.join(ship, o.o_orderkey == ship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("first_ship", "o_orderdate").alias("days_to_first"),
        F.datediff("last_ship", "o_orderdate").alias("days_to_full"),
    )
    ps = F.expr("percentile(days_to_full, array(0.5, 0.95))")
    return (
        lat.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.avg("days_to_first"), 4).alias("avg_days_to_first"),
            ps.alias("_ps"),
            F.max("days_to_full").cast("long").alias("worst_days"),
        )
        .select(
            "priority",
            "n_orders",
            "avg_days_to_first",
            F.round(F.col("_ps")[0], 4).alias("p50_days_to_full"),
            F.round(F.col("_ps")[1], 4).alias("p95_days_to_full"),
            "worst_days",
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------
# r73: calendar seasonality profile (hour × weekday chi-square)
# --------------------------------------------------------------------

_SEASONALITY_ORACLE = """
WITH cells AS (
  -- DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7 — align
  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hod,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT sum(n) AS total, count(*) AS n_cells FROM cells
)
SELECT dow, hod, CAST(n AS BIGINT) AS n,
       round(n * 1.0 / total, 6) AS share,
       round((n - total * 1.0 / n_cells) * (n - total * 1.0 / n_cells)
             / (total * 1.0 / n_cells), 6) AS chi2_term
FROM cells, tot ORDER BY dow, hod
"""


@register(
    "r73_calendar_seasonality",
    oracle=_SEASONALITY_ORACLE,
    tags=("analytics", "seasonality", "calendar"),
)
def r73_calendar_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week load profile with per-cell chi-square
    deviation from uniform — the seasonality fingerprint that sizes
    batch windows, autoscaling schedules and anomaly baselines (a cell
    with a big chi² term is a rush hour; a flat profile means the
    uniform-rate assumption is safe).

    One corpus pass into a ≤168-cell aggregate; totals ride a window
    over the cell table (the r69 pattern — the observed-cell count
    n_cells, not a literal 168, so empty cells are handled the way the
    oracle's FROM-aggregate handles them). Everything after the one
    partial-aggregated shuffle is O(168)."""
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    total = F.sum("n").over(w)
    n_cells = F.count("*").over(w)
    expected = total * 1.0 / n_cells
    return cells.select(
        "dow",
        "hod",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * 1.0 / total, 6).alias("share"),
        F.round(
            (F.col("n") - expected) * (F.col("n") - expected) / expected, 6
        ).alias("chi2_term"),
    ).orderBy("dow", "hod")


# --------------------------------------------------------------------
# r74: differential-privacy release — seeded-Laplace noisy counts
# --------------------------------------------------------------------

DP_EPSILON = 1.0

_DP_ORACLE = f"""
WITH g AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY event_type
),
u AS (
  SELECT event_type, n,
         (('0x' || substr(md5(event_type), 1, 8))::UBIGINT + 0.5)
           / 4294967296.0 AS u
  FROM g
)
SELECT event_type,
       round(n + (-1.0 / {DP_EPSILON})
                 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)),
             6) AS noisy_n
FROM u ORDER BY event_type
"""


@register(
    "r74_dp_noisy_counts",
    oracle=_DP_ORACLE,
    tags=("privacy", "dp", "laplace"),
)
def r74_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible noisy-release SHAPE for count queries — NOT a
    differential-privacy mechanism. Per-type event counts plus a
    Laplace(Δ/ε)-shaped perturbation (Δ=1 for counting, ε=1), the
    noisy-histogram release pattern: a deterministic uniform u from
    md5(key) via the r24 idiom, mapped through the Laplace inverse CDF
    −b·sign(u−½)·ln(1−2|u−½|). Because the perturbation is a PUBLIC
    deterministic function of the group key, exact counts are
    recoverable and NO ε-DP guarantee holds; even a secret-keyed PRF
    would not make it DP — true DP requires fresh randomness drawn
    independently per release. The determinism here is deliberate: it
    makes the release hash-checkable across engines, which is what
    this query exists to verify (the plan shape and inverse-CDF
    arithmetic a real DP release would use). Only ``noisy_n`` is
    emitted; exact n never leaves this query's scope.

    Plan: one partial-aggregated corpus shuffle into |event_type|
    rows; the perturbation is an in-row expression over the aggregate.
    100 TB-safe trivially."""
    g = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    u = md5_uniform(F.col("event_type"))
    b = 1.0 / DP_EPSILON
    noise = (
        F.lit(-b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return g.select(
        "event_type",
        F.round(F.col("n") + noise, 6).alias("noisy_n"),
    ).orderBy("event_type")


# --------------------------------------------------------------------
# r78: first-touch attribution (conversion by acquisition channel)
# --------------------------------------------------------------------

_ATTRIB_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(struct_pack(ts := ts, event_id := event_id,
                         event_type := event_type)).event_type AS channel,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
         coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0)
           AS purchase_value
  FROM events GROUP BY user_id
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       round(sum(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS conversion_rate,
       round(sum(purchase_value), 4) AS attributed_value
FROM per_user GROUP BY channel ORDER BY channel
"""


@register(
    "r78_first_touch_attribution",
    oracle=_ATTRIB_ORACLE,
    tags=("analytics", "attribution", "window"),
)
def r78_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every user's lifetime purchase value is
    credited to the channel (event type) of their FIRST interaction —
    the acquisition-channel ROI table (last-touch is the same plan with
    the window reversed; the r17 funnel gives the path in between).

    Plan: ONE pass, NO join, NO window — the first touch is
    min(struct(ts, event_id, event_type)) (struct ordering is
    lexicographic in both engines, and event_id makes the order
    total), folded into the same partial-aggregated user_id groupBy
    that computes the conversion stats; the channel rollup then
    aggregates |users| rows on a ~|channels|-cardinality key. Two
    exchanges, both aggregation's own — the window+self-join
    formulation costs two corpus exchanges plus a join and reads
    events twice."""
    e = t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    conv = e.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type"))
        .getField("event_type")
        .alias("channel"),
        F.sum(is_p.cast("int")).alias("n_purchases"),
        F.coalesce(
            F.sum(F.when(is_p, F.col("value"))), F.lit(0.0)
        ).alias("purchase_value"),
    )
    converted = (F.col("n_purchases") > 0).cast("int")
    return (
        conv.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(converted).cast("long").alias("n_converted"),
            F.round(F.sum(converted) * 1.0 / F.count("*"), 6).alias(
                "conversion_rate"
            ),
            F.round(F.sum("purchase_value"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------
# r79: time-to-convert percentiles by acquisition channel
# --------------------------------------------------------------------

_TTC_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(struct_pack(ts := ts, event_id := event_id,
                         event_type := event_type)).event_type AS channel,
         min(ts) AS first_ts,
         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase_ts
  FROM events GROUP BY user_id
),
conv AS (
  SELECT channel,
         date_diff('second', first_ts, first_purchase_ts) / 3600.0 AS hours
  FROM per_user WHERE first_purchase_ts IS NOT NULL
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_converters,
       round(quantile_cont(hours, 0.5), 6)  AS p50_hours,
       round(quantile_cont(hours, 0.95), 6) AS p95_hours,
       round(max(hours), 6) AS max_hours
FROM conv GROUP BY channel ORDER BY channel
"""


@register(
    "r79_time_to_convert",
    oracle=_TTC_ORACLE,
    tags=("analytics", "attribution", "latency"),
)
def r79_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert by acquisition channel: hours from a user's
    first-ever touch to their first purchase, p50/p95 per first-touch
    channel — the behavioral-latency companion to r78's conversion
    rates (two channels can convert equally often yet one takes 10×
    longer; budget follows the fast one).

    Same single-pass shape as r78: first touch, first timestamp and
    first purchase timestamp all fold into ONE user_id groupBy (the
    purchase min is a conditional aggregate, no second scan); the
    channel rollup carries the exact interpolated percentiles (q10
    convention). Seconds-resolution datediff ÷ 3600 keeps the hour
    arithmetic exact-integer before one float divide, so both engines
    hash-match."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type"))
        .getField("event_type")
        .alias("channel"),
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase_ts"),
    )
    conv = per_user.filter(F.col("first_purchase_ts").isNotNull()).select(
        "channel",
        (
            (
                F.unix_timestamp("first_purchase_ts")
                - F.unix_timestamp("first_ts")
            )
            / 3600.0
        ).alias("hours"),
    )
    ps = F.expr("percentile(hours, array(0.5, 0.95))")
    return (
        conv.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_converters"),
            ps.alias("_ps"),
            F.round(F.max("hours"), 6).alias("max_hours"),
        )
        .select(
            "channel",
            "n_converters",
            F.round(F.col("_ps")[0], 6).alias("p50_hours"),
            F.round(F.col("_ps")[1], 6).alias("p95_hours"),
            "max_hours",
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------
# r80: linear multi-touch attribution (fractional credit)
# --------------------------------------------------------------------

_LINEAR_ATTRIB_ORACLE = """
WITH pu AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'purchase') AS fp_ts,
         coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0)
           AS purchase_value
  FROM events GROUP BY user_id
),
touches AS (
  SELECT DISTINCT e.user_id, e.event_type AS channel
  FROM events e JOIN pu ON e.user_id = pu.user_id
  WHERE pu.fp_ts IS NOT NULL AND e.ts <= pu.fp_ts
),
credit AS (
  SELECT t.user_id, t.channel,
         pu.purchase_value
           / count(*) OVER (PARTITION BY t.user_id) AS credited
  FROM touches t JOIN pu ON t.user_id = pu.user_id
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credited_users,
       round(sum(credited), 4) AS attributed_value
FROM credit GROUP BY channel ORDER BY channel
"""


@register(
    "r80_linear_attribution",
    oracle=_LINEAR_ATTRIB_ORACLE,
    tags=("analytics", "attribution", "multi-touch"),
)
def r80_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each converter's lifetime
    purchase value is split EQUALLY across every distinct channel they
    touched up to (and including) their first purchase — the fractional
    -credit model teams A/B against r78's winner-takes-all first-touch
    (channels that assist but rarely initiate only show up here).

    Plan: per-user purchase stats (one user_id groupBy), joined BACK
    to events on the same key (co-located with the aggregate's output
    partitioning at scale; AQE broadcasts the aggregated side when
    small), then the distinct touch set AND its count fold into one
    collect_set per user — bounded by |channels|, so the "collected
    state" hazard doesn't apply — followed by an in-row explode and a
    ~|channels|-key rollup. Nothing corpus-sized moves twice."""
    e = t(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pu = e.groupBy("user_id").agg(
        F.min(F.when(is_p, F.col("ts"))).alias("fp_ts"),
        F.coalesce(
            F.sum(F.when(is_p, F.col("value"))), F.lit(0.0)
        ).alias("purchase_value"),
    )
    # distinct channels + their count fold into ONE user agg via
    # collect_set (bounded by |channels|) — a separate distinct would
    # exchange on (user, channel) and the count window would exchange
    # AGAIN on user; this keeps every post-join stage on the user key
    per_user = (
        e.join(pu, "user_id")
        .filter(F.col("fp_ts").isNotNull() & (F.col("ts") <= F.col("fp_ts")))
        .groupBy("user_id")
        .agg(
            F.collect_set("event_type").alias("channels"),
            F.first("purchase_value").alias("purchase_value"),
        )
    )
    credit = per_user.select(
        F.explode("channels").alias("channel"),
        (F.col("purchase_value") / F.size("channels")).alias("credited"),
    )
    return (
        credit.groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_credited_users"),
            F.round(F.sum("credited"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )
