"""Extension queries: text analysis, dedup, similarity search, OLAP
aggregates/windows, sessionization — the training-data-pipeline surface
beyond the reference's two operators, each with a DuckDB oracle where
SQL-expressible (non-expressible ops get rows-only entries and pytest
statistical validation instead).

Determinism notes (driver hashes values):
* per-row arithmetic (text scores, cosine) is IEEE-exact cross-engine —
  verified bit-identical, no rounding needed;
* ordering-sensitive aggregates (SUM of non-integral doubles) are
  rounded to fixed decimals in BOTH engines;
* every rank/row_number has a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_sampler_spark.functions import text as TX
from parquet_sampler_spark.functions.vectors import (
    normalized_cte_sql,
    unit_dot_sql,
)
from parquet_sampler_spark.operators.dedup import (
    exact_dedup,
    jaccard_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from parquet_sampler_spark.operators.similarity import (
    cosine_range,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_LTZ microseconds
    regardless of how the parquet file carries it. Generations of the
    driver testdata have used TIMESTAMP(NANOS) (readable only as long
    via the legacy nanosAsLong conf) and TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ); dispatching on the read dtype keeps every events
    query working across both. With the session timezone pinned to UTC
    the NTZ→LTZ cast is a pure reinterpretation (identical wall-clock
    values), so DuckDB's ``epoch_us(ts)`` sees the same instants."""
    dt = dict(df.dtypes)[col]
    if dt == "bigint":  # TIMESTAMP(NANOS) read as long: truncate to us
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table with its timestamp normalized to
    TIMESTAMP_LTZ micros (see :func:`_normalize_ts`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp bucketing (date_trunc, to_date, window) on TIMESTAMP_LTZ
    # follows the session timezone — pin UTC so results match the
    # UTC-naive DuckDB oracle even under a driver session with another TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _normalize_ts(e)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def _q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.token_count_bpe("text").alias("n_tokens_bpe"),
        TX.stopword_ratio("text").alias("stop_ratio"),
        TX.language_id("text").alias("lang_pred"),
        TX.quality_score("text").alias("quality"),
    )


def _sql_text_stats():
    return (
        f"SELECT doc_id, {TX.token_count_sql('text')} AS n_tokens, "
        f"{TX.token_count_bpe_sql('text')} AS n_tokens_bpe, "
        f"{TX.stopword_ratio_sql('text')} AS stop_ratio, "
        f"{TX.language_id_sql('text')} AS lang_pred, "
        f"{TX.quality_score_sql('text')} AS quality FROM documents"
    )


def _q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


def _sql_doc_fingerprint():
    return (
        f"SELECT doc_id, {TX.fingerprint_sql('text')} AS fp FROM documents"
    )


def _q_text_clean(spark, sf_dir):
    """Normalization + PII redaction over documents. PII is synthesized
    deterministically INSIDE the query (the corpus itself contains
    none), identically on both engines — so the oracle proves the
    redaction regexes actually fire and agree across Java regex / RE2."""
    d = _t(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" Contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com  from 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" or 555-123-4567."),
    )
    return d.select(
        "doc_id",
        TX.redact_pii(TX.normalize_text(synth)).alias("clean"),
    )


def _sql_text_clean():
    synth = (
        "text || ' Contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com  from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) || "
        "' or 555-123-4567.'"
    )
    return (
        f"SELECT doc_id, "
        f"{TX.redact_pii_sql(TX.normalize_text_sql(synth))} AS clean "
        f"FROM documents"
    )


def _q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment by portable integer hash
    thresholds — any row's split is recomputable from its key alone, on
    any engine (the leak-free regeneration property)."""
    from parquet_sampler_spark.operators.sample import assign_splits

    d = _t(spark, sf_dir, "documents")
    return assign_splits(d, ["doc_id"], seed=13).select("doc_id", "split")


def _sql_dataset_split():
    from parquet_sampler_spark.operators.sample import assign_splits_sql

    return (
        f"SELECT doc_id, {assign_splits_sql(['doc_id'], 13)} AS split "
        f"FROM documents"
    )


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-document repetition signals: duplicate
    bigram/trigram fractions per doc (degenerate-loop detector)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.repetition_score("text", 2).alias("rep2"),
        TX.repetition_score("text", 3).alias("rep3"),
    )


def _sql_repetition_stats():
    return (
        f"SELECT doc_id, {TX.repetition_score_sql('text', 2)} AS rep2, "
        f"{TX.repetition_score_sql('text', 3)} AS rep3 FROM documents"
    )


_QUOTA_CAP = 10
_QUOTA_SEED = 7


def _q_source_quota(spark, sf_dir):
    """Per-source document quota (the RefinedWeb/C4-style per-domain
    cap): keep at most ``_QUOTA_CAP`` docs per source, chosen by the
    seeded portable hash — so the kept set is a uniform within-source
    sample, reproducible from each row's key alone on any engine.

    Plan: one shuffle on ``source`` + a per-key row_number window.
    100 TB note: a heavy domain makes its window partition a per-key
    sort; for billion-doc domains, prefilter with the closed-form hash
    threshold first (operators/sample.py's prefilter math: keep rows
    with ``pr < c·cap/n_domain·M`` before the exact window) so the sort
    input is ~cap rows per domain, then apply the same window. The
    selection is identical because the hash ordering is global."""
    from parquet_sampler_spark.functions.hashing import lehmer_hash

    d = _t(spark, sf_dir, "documents")
    pr = lehmer_hash(["doc_id"], seed=_QUOTA_SEED)
    w = Window.partitionBy("source").orderBy(pr.asc(), F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _QUOTA_CAP)
        .select("doc_id", "source", "rn")
    )


def _sql_source_quota():
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql

    pr = lehmer_hash_sql(["doc_id"], _QUOTA_SEED)
    return f"""
SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {pr} ASC, doc_id) AS rn
  FROM documents
) WHERE rn <= {_QUOTA_CAP}
"""


_BUCKETED_CACHE: dict = {}


def _q_bucketed_join(spark, sf_dir):
    """Co-bucketed storage join: orders and customer written ONCE per
    session as catalog tables bucketed by custkey (the shuffle moves to
    write time), then joined and rolled up per market segment. At this
    sf the optimizer may still broadcast the small side; at 100 TB —
    where neither fact broadcasts — the same code plans a SortMergeJoin
    with ZERO Exchange on either side because both reads are already
    co-partitioned by the catalog bucket spec. That exchange-free
    property is pinned (broadcast disabled) in tests/test_bucketing.py;
    this row puts the bucketed-storage path itself on the correctness
    surface. Money stays in integer cents (exact under any partial-agg
    order); the oracle is the plain join+rollup SQL — bucketing never
    changes results, only exchanges."""
    import os

    from parquet_sampler_spark.sources.bucketing import (
        cobucketed_join,
        write_bucketed,
    )

    import hashlib

    # tag derives from the FULL normalized path, matching the cache
    # key (ADVICE r06): two sf_dirs sharing a basename in one session
    # must map to distinct catalog tables, or the second build would
    # rmtree and repopulate the first entry's warehouse dirs while its
    # cached reader still points at them. Basename kept for
    # readability; the path hash carries the uniqueness.
    norm = os.path.abspath(os.path.normpath(sf_dir))
    tag = "{}_{}".format(
        os.path.basename(norm).replace(".", "_"),
        hashlib.sha1(norm.encode()).hexdigest()[:8],
    )
    names = (f"psx_orders_b_{tag}", f"psx_cust_b_{tag}")
    key = (spark.sparkContext.applicationId, norm)
    if key not in _BUCKETED_CACHE:
        import shutil
        from urllib.parse import urlparse

        # the warehouse DIRECTORY outlives the session catalog: a table
        # written by an earlier session is gone from this catalog but
        # its location remains, and saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS — drop both the entry and the dir
        warehouse = urlparse(
            spark.conf.get("spark.sql.warehouse.dir")
        ).path
        for name in names:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            loc = os.path.join(warehouse, name.lower())
            if os.path.isdir(loc):
                shutil.rmtree(loc)
        o = _t(spark, sf_dir, "orders").withColumnRenamed(
            "o_custkey", "c_custkey"
        )
        c = _t(spark, sf_dir, "customer")
        write_bucketed(
            o, names[0], ["c_custkey"], num_buckets=8,
            sort_cols=["c_custkey"],
        )
        write_bucketed(
            c, names[1], ["c_custkey"], num_buckets=8,
            sort_cols=["c_custkey"],
        )
        _BUCKETED_CACHE[key] = names
    lt, rt = _BUCKETED_CACHE[key]
    j = cobucketed_join(spark, lt, rt, "c_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("revenue_cents"),
    )


_SQL_BUCKETED_JOIN = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


_HLL_EPS = 0.05


def _q_hll_rollup(spark, sf_dir):
    """Mergeable-sketch re-aggregation as a query: per-(day, type) HLL
    sketches of user_id built in one pass, then UNIONED per event_type
    — distinct users at the coarser level computed from the sketch
    layer, not by rescanning events. This is THE 100 TB distinct-count
    architecture: the per-day sketches are a precomputed cube; any
    rollup (weekly, per-type, global) is a cheap `hll_union_agg` over
    kilobyte sketches, where `countDistinct` would need a full shuffle
    of raw user_ids per query. Oracle pattern as approx_distinct: the
    merged estimate is engine-specific, so the output carries the
    exact per-type distinct plus a `within_bound` boolean (|est−exact|
    /exact < 0.05 vs the default sketch's ~1.6% rsd; deterministic —
    Spark's sketch hashing has no RNG), which the SQL oracle asserts
    TRUE. The union==global-sketch equivalence itself is pinned in
    tests/test_sketches.py.

    Triage note (ADVICE r06): the estimate is deterministic PER
    CARDINALITY, so this row is a pinned determinism check, not a
    statistical one. If it turns red right after a data-gen change,
    the likely cause is a per-type cardinality whose sketch error
    lands outside the 5% envelope (a >3-sigma draw vs the ~1.6% rsd
    sketch) — re-tune ``_HLL_EPS``; a red WITHOUT a data change is a
    real regression."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("__est") - F.col("exact_users"))
            / F.col("exact_users")
            < _HLL_EPS
        ).alias("within_bound"),
    )


_SQL_HLL_ROLLUP = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


_QR_CAP = 512
_QR_EPS = 0.01


def _q_quantile_rollup(spark, sf_dir):
    """Mergeable-quantile re-aggregation as a query — the percentile
    analog of hll_rollup: per-(day, event_type) rank-grid summaries of
    ``value`` built in one pass (operators/sketches.quantile_summaries,
    cap 512, deterministic — no RNG), then MERGED per event_type and
    read out as p50/p90 (merged_quantiles) — quantiles at the coarser
    level computed from the kilobyte summary layer, not by rescanning
    events. This is THE 100 TB percentile architecture: exact
    percentiles are not mergeable (they need the full sorted data per
    regroup), these summaries are, associatively.

    Oracle pattern as approx_distinct/hll_rollup: the merged estimate
    is a weighted order statistic of the summary layer, so the output
    carries the EXACT per-type p50/p90 (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, proven bit-exact by the percentiles row)
    plus within-bound booleans computed in RANK space Spark-side —
    the exact rank of each estimate must sit within ``eps`` (1%) of
    the target probability; the summary guarantees ≤ 1/(2·cap) ≈ 0.1%
    per contributing day, so 1% is a 10× envelope — which the SQL
    oracle asserts TRUE. Deterministic end-to-end; a red after a
    data-gen change means re-tune ``_QR_EPS``, not a regression."""
    from parquet_sampler_spark.operators.sketches import (
        merged_quantiles,
        quantile_summaries,
    )

    e = _events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("__day"), "value"
    )
    summ = quantile_summaries(
        e, ["event_type"], ["__day"], "value", cap=_QR_CAP
    )
    est = merged_quantiles(summ, ["event_type"], [0.5, 0.9])
    return _quantile_envelope(spark, sf_dir, est)


def _quantile_envelope(spark, sf_dir, est):
    """Shared read-out for summary-estimated per-type p50/p90: join
    the estimates back onto events, compute each estimate's exact rank
    window, emit the EXACT percentiles plus within-``_QR_EPS``
    booleans the SQL oracle asserts TRUE (the envelope pattern of
    approx_distinct/hll_rollup). Used by quantile_rollup (batch
    summaries) and streaming_quantiles (the same summaries maintained
    online) — one check, two build paths."""
    e = _events(spark, sf_dir).select("event_type", "value")
    checked = (
        e.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(F.col("value") < F.col("q50"), 1)
                  .otherwise(0)).alias("__lt50"),
            F.sum(F.when(F.col("value") <= F.col("q50"), 1)
                  .otherwise(0)).alias("__le50"),
            F.sum(F.when(F.col("value") < F.col("q90"), 1)
                  .otherwise(0)).alias("__lt90"),
            F.sum(F.when(F.col("value") <= F.col("q90"), 1)
                  .otherwise(0)).alias("__le90"),
        )
    )
    exact = _events(spark, sf_dir).groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("exact_p50"),
        F.percentile("value", 0.9).alias("exact_p90"),
    )

    def within(lt, le, p):
        return (
            (F.col(lt) / F.col("__n") - _QR_EPS <= p)
            & (p <= F.col(le) / F.col("__n") + _QR_EPS)
        )

    return exact.join(checked, "event_type").select(
        "event_type", "exact_p50", "exact_p90",
        within("__lt50", "__le50", 0.5).alias("within_p50"),
        within("__lt90", "__le90", 0.9).alias("within_p90"),
    )


_SQL_QUANTILE_ROLLUP = """
SELECT event_type,
       quantile_cont(value, 0.5) AS exact_p50,
       quantile_cont(value, 0.9) AS exact_p90,
       TRUE AS within_p50,
       TRUE AS within_p90
FROM events
GROUP BY event_type
"""


_HH_K = 30


def _q_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters over the corpus token stream: every term in
    strictly more than 1/30 of all tokens, with exact counts — the
    frequent-items primitive (stopword discovery, hot-key detection)
    via the candidates-then-verify plan in
    :func:`operators.sketches.heavy_hitters`. The sketch phase bounds
    work (≤ k-1 candidates per partition); the verify phase makes the
    output exact, which is why a plain-SQL HAVING oracle applies —
    unlike HLL/GK whose raw estimates need error-envelope oracles. The
    threshold compare stays in BIGINT (``count*k > n``), engine-exact."""
    from parquet_sampler_spark.operators.sketches import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " ")
        ).alias("term")
    ).filter(F.col("term") != "")
    return heavy_hitters(toks, "term", _HH_K)


_SQL_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(string_split(trim(lower(text)), ' ')) AS term
  FROM documents
),
t2 AS (SELECT term FROM toks WHERE term <> '')
SELECT term, count(*) AS cnt FROM t2 GROUP BY term
HAVING count(*) * {_HH_K} > (SELECT count(*) FROM t2)
"""


def _q_streaming_heavy_hitters(spark, sf_dir):
    """Heavy hitters maintained ONLINE (r08) — third member of the
    sketch-as-streaming-state family (reservoir, quantiles, now
    frequency): the documents token stream replays as a two-file
    split, each micro-batch folds into a k-1-counter Misra-Gries
    summary through the crash-atomic snapshot sink (kilobytes of
    state forever), and the read-out verifies the streamed CANDIDATES
    exactly against the corpus — the MG merge's superset guarantee
    makes the result EQUAL to the batch operator's, so the oracle is
    the same plain HAVING SQL. The candidates-then-verify split is
    the point: the stream pays O(k) state per batch; exactness is
    restored by one bounded verify at read time."""
    import os

    import pyarrow.parquet as pq

    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.frequency import (
        heavy_hitters_from_stream,
        streaming_heavy_hitters,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_hh_{tag}")
    src_dir = os.path.join(d, "src")
    sum_path = os.path.join(d, "hh_summary.parquet")
    _stage_split_stream(
        sf_dir, "documents", src_dir,
        columns=["doc_id", "text"], prefix="docs",
    )
    import shutil

    # additive state: a stale snapshot from an aborted run must not
    # double-count this drain (same contract as streaming_quantiles)
    if os.path.exists(sum_path):
        shutil.rmtree(sum_path)

    def toks_of(df):
        return df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), " ")
            ).alias("term")
        ).filter(F.col("term") != "")

    with _stream_shuffle(spark):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(src_dir)
        )
        q = (
            streaming_heavy_hitters(
                toks_of(stream), "term", _HH_K, sum_path
            )
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    corpus_toks = toks_of(_t(spark, sf_dir, "documents"))
    return heavy_hitters_from_stream(
        spark, sum_path, corpus_toks, "term", _HH_K
    )


def _q_streaming_late_watermark(spark, sf_dir):
    """Watermark DISCARD semantics pinned against a batch oracle that
    replicates the drop rule (r8 VERDICT #8): the events table is
    replayed OUT OF ORDER as three micro-batches (file b = event_id
    mod 3 — each batch spans nearly the whole month, so after batch 0
    the 2-hour watermark sits near the stream's end and most of
    batches 1-2 arrive late), through a watermarked 1-hour tumbling
    count in APPEND mode. The streaming contract this hashes:

    - the watermark APPLIED to batch i's rows = floor-to-ms(max event
      time over batches ≤ i−2) − 2h (Spark tracks event-time stats in
      ms; a batch's stats are folded in when the NEXT batch is
      constructed, so the filter lags the data by one batch —
      measured here, and matching the "eviction lags the watermark by
      one batch" note pinned in tests/test_streaming.py); batches 0
      and 1 see the epoch-zero initial watermark,
    - a row is DROPPED iff its window end ≤ that watermark
      (WatermarkSupport's eviction expression — windows are
      half-open, so end ≤ wm means the window left the state store),
    - a window is EMITTED (append mode) iff its end ≤ the final
      watermark; later windows stay open and never reach the sink
      (availableNow's trailing no-data batch flushes the rest).

    The oracle replays the identical rule in SQL: per-batch running
    max → per-batch watermark → accept filter → final-watermark
    emission filter — integer microsecond arithmetic end to end, so
    the row is hash-exact, not envelope-checked. A green row proves
    dropped-late-event semantics (not just happy-path windowing)
    agree between the streaming engine and the declarative spec."""
    import os

    import pyarrow.parquet as pq

    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_late_{tag}")
    src_dir = os.path.join(d, "src")
    os.makedirs(src_dir, exist_ok=True)
    t = None
    for b in range(3):
        dst = os.path.join(src_dir, f"mod{b}.parquet")
        if not os.path.exists(dst):
            if t is None:
                t = pq.read_table(
                    f"{sf_dir}/events.parquet",
                    columns=["event_id", "ts"],
                )
            import pyarrow as pa

            mask = t["event_id"].to_numpy() % 3 == b
            part = t.filter(pa.array(mask))
            tmp = dst + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, dst)
        os.utime(dst, (1_000_000 * (b + 1),) * 2)

    with _stream_shuffle(spark):
        src = read_event_stream(spark, src_dir)
        agg = (
            src.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "n_events",
            )
        )
        name = f"psx_stream_late_{next(_STREAM_SEQ)}"
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name)


# the streaming drop rule, replayed declaratively: the watermark
# applied to batch b = ms-floored running max over batches <= b-2,
# minus 2h (stats fold in one batch late — see the query docstring);
# accept iff window end > that watermark; emit iff window end <= the
# final watermark.
# NOTE: the one-batch lag and ms flooring are Spark-internal scheduling
# details MEASURED ON pyspark 4.1.2 — a Spark upgrade that changes
# watermark-propagation timing will break this hash gate even though
# both engines are individually correct. The canary is
# tests/test_streaming.py::test_watermark_filter_lags_one_batch: if it
# fails after an upgrade, re-measure the lag and update the
# "2 PRECEDING" frame below to match.
_SQL_STREAMING_LATE_WATERMARK = """
WITH e AS (
  SELECT epoch_us(ts) AS ts_us, event_id % 3 AS b FROM events
),
bm AS (SELECT b, max(ts_us) AS mx FROM e GROUP BY b),
wm AS (
  SELECT b,
         (max(mx) OVER (ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 2 PRECEDING) // 1000 - 7200000) * 1000
           AS wm_us
  FROM bm
),
fwm AS (SELECT (max(mx) // 1000 - 7200000) * 1000 AS final_wm FROM bm),
acc AS (
  SELECT (e.ts_us // 3600000000) * 3600000000 AS win_start_us
  FROM e JOIN wm USING (b)
  WHERE wm.wm_us IS NULL
     OR (e.ts_us // 3600000000 + 1) * 3600000000 > wm.wm_us
)
SELECT win_start_us, CAST(count(*) AS BIGINT) AS n_events
FROM acc, fwm
WHERE win_start_us + 3600000000 <= fwm.final_wm
GROUP BY win_start_us
"""


def _q_bigram_novelty(spark, sf_dir):
    """N-gram language-model commonality score per document: the mean
    corpus document-frequency of a doc's distinct bigrams — high means
    the doc is made of phrases everyone uses (boilerplate), low means
    novel phrasing. The count-based stand-in for an LM perplexity
    filter that stays integer-exact (a real logprob would put libm
    floats in the hash-compared output; the single final division of
    two exact BIGINTs is IEEE-identical across engines).

    Plan: explode distinct bigrams → per-gram df via a whole-partition
    COUNT window → one (doc_id) aggregate. The window shape beats the
    equivalent groupBy(gram)+self-join 2× at sf0.1 (one tokenize pass
    and two shuffles instead of two passes and three), and is the same
    single hash-exchange on gram at any scale. 100 TB note: a hot
    stop-phrase gram lands its whole group in ONE window task (AQE
    skew-splitting covers joins, not window partitions), so for
    web-scale corpora the real mitigations are capping gram df like the
    dedup shingle path, or replacing the window with a salted two-phase
    (gram, salt)→gram aggregate joined back to the exploded relation.

    WHICH TO PICK (r12 verdict ask): this window form is ~1.7× FASTER
    at bench scale (one tokenize pass, two shuffles) and is the right
    choice while no single gram's document list outgrows one task —
    corpora that are deduped/boilerplate-scrubbed upstream, or df
    heads in the ~10⁵-docs range. Pick ``bigram_novelty_salted`` when
    the corpus has an unbounded stop-phrase head (raw web crawl,
    un-scrubbed boilerplate): its hot-gram cost is ≤ #partitions rows
    instead of the whole group in one window task. Same output, same
    oracle — the choice is purely a skew bet."""
    d = _t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.explode(
            TX.word_ngrams(F.lower(F.col("text")), 2, distinct=True)
        ).alias("gram"),
    )
    df_win = Window.partitionBy("gram")
    return (
        g.withColumn("df", F.count(F.lit(1)).over(df_win))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_grams",
            "sum_df",
            (F.col("sum_df").cast("double") / F.col("n_grams"))
            .alias("commonality"),
        )
    )


def _sql_bigram_novelty():
    grams = TX.word_ngrams_sql("lower(text)", 2, distinct=True)
    return f"""
WITH g AS (
  SELECT doc_id, unnest({grams}) AS gram FROM documents
),
df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(df) AS BIGINT) AS sum_df,
       CAST(CAST(sum(df) AS BIGINT) AS DOUBLE) / count(*) AS commonality
FROM g JOIN df USING (gram)
GROUP BY doc_id
"""


def _q_bigram_novelty_salted(spark, sf_dir):
    """The hot-gram skew-safe sibling of bigram_novelty (r11, VERDICT
    r10 #3): same statistic, but the per-gram document frequency comes
    from a two-phase AGGREGATE instead of a whole-partition window. A
    hash aggregate partial-combines map-side — each input partition
    emits at most one (gram, partial_count) row, which IS the salted
    (gram, salt) → gram two-phase with salt = input partition — so a
    hot stop-phrase gram costs the final agg ≤ #partitions rows,
    where the window form materializes its ENTIRE group in one task
    (AQE skew-splitting covers joins, not window partitions). The df
    table (bigram-vocabulary-sized) then broadcast-joins back onto the
    exploded stream — the stream never shuffles on gram at all, so the
    hot gram also can't skew the probe side. At web scale where the
    bigram vocabulary outgrows broadcast, drop the hint and AQE's
    skew-join handles the shuffle-join probe. Plan-audited: no Window
    operator anywhere; output pinned equal to bigram_novelty (shared
    oracle + pytest).

    WHICH TO PICK (r12 verdict ask): this form pays ~1.7× at bench
    scale (3.99 s vs 2.3 s at sf0.1 — the extra aggregate+join only
    pays for itself under hot-gram skew) and is the right default for
    RAW WEB-CRAWL corpora, where some stop-phrase bigram is shared by
    an unbounded fraction of documents. On deduped/scrubbed corpora
    whose gram df head is bounded, ``bigram_novelty``'s window form is
    strictly faster. Same output either way — pick by corpus shape,
    exactly like ``winnow_pairs``'s cap note."""
    d = _t(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.explode(
            TX.word_ngrams(F.lower(F.col("text")), 2, distinct=True)
        ).alias("gram"),
    )
    dfreq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        g.join(F.broadcast(dfreq), "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("df").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_grams",
            "sum_df",
            (F.col("sum_df").cast("double") / F.col("n_grams"))
            .alias("commonality"),
        )
    )


# decontamination demo split: docs below the cut play the "benchmark"
# set, the rest are the training corpus
_BENCH_CUT = 20
_DECON_T = 0.5


def _q_contamination_pairs(spark, sf_dir):
    """Cross-corpus (bipartite) n-gram overlap: training docs vs the
    benchmark slice — the decontamination primitive."""
    from parquet_sampler_spark.operators.dedup import (
        cross_ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return cross_ngram_jaccard_pairs(
        d.filter(F.col("doc_id") >= _BENCH_CUT),
        d.filter(F.col("doc_id") < _BENCH_CUT),
        "doc_id", "text", n=2, threshold=_DECON_T,
    )


def _q_decontaminated(spark, sf_dir):
    """Training corpus with benchmark-overlapping docs removed."""
    from parquet_sampler_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") >= _BENCH_CUT),
        d.filter(F.col("doc_id") < _BENCH_CUT),
        "doc_id", "text", n=2, threshold=_DECON_T,
    )


def _bigram_shingles_sql(src_filter: str, id_alias: str) -> str:
    return (
        f"SELECT doc_id AS {id_alias}, "
        f"unnest({TX.word_ngrams_sql('text', 2, distinct=True)}) AS shingle "
        f"FROM documents WHERE {src_filter}"
    )


_SQL_CONTAM_CTES = f"""
sha AS ({_bigram_shingles_sql(f'doc_id >= {_BENCH_CUT}', 'id_a')}),
shb AS ({_bigram_shingles_sql(f'doc_id < {_BENCH_CUT}', 'id_b')}),
sza AS (SELECT id_a, count(*) AS size_a FROM sha GROUP BY id_a),
szb AS (SELECT id_b, count(*) AS size_b FROM shb GROUP BY id_b),
cpairs AS (
  SELECT id_a, id_b,
         CAST(common AS DOUBLE) /
         CAST(size_a + size_b - common AS DOUBLE) AS jaccard
  FROM (
    SELECT id_a, id_b, count(*) AS common
    FROM sha JOIN shb USING (shingle) GROUP BY id_a, id_b
  ) c JOIN sza USING (id_a) JOIN szb USING (id_b)
)
"""

_SQL_CONTAMINATION_PAIRS = (
    "WITH " + _SQL_CONTAM_CTES
    + f"SELECT id_a, id_b, jaccard FROM cpairs WHERE jaccard >= {_DECON_T}"
)

_SQL_DECONTAMINATED = (
    "WITH " + _SQL_CONTAM_CTES
    + f"SELECT d.* FROM documents d WHERE d.doc_id >= {_BENCH_CUT} "
      f"AND NOT EXISTS (SELECT 1 FROM cpairs p WHERE p.id_a = d.doc_id "
      f"AND p.jaccard >= {_DECON_T})"
)


def _q_corpus_pipeline(spark, sf_dir):
    """The flagship training-data journey as ONE composed plan:
    normalize → language + quality filter → exact dedup on the
    normalized text (min-id keeper) → deterministic split assignment.
    Every stage is the library operator, chained — and the whole
    composition is value-checked against a CTE-for-stage DuckDB twin.
    Plan shape: one shuffle (the dedup window); everything else is
    per-row map work fused into the scan."""
    from parquet_sampler_spark.operators.dedup import exact_dedup
    from parquet_sampler_spark.operators.sample import assign_splits

    d = _t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        TX.normalize_text("text").alias("text_norm"),
        TX.quality_score("text").alias("quality"),
        TX.language_id("text").alias("lang_pred"),
    )
    kept = staged.filter(
        (F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)
    )
    deduped = exact_dedup(kept, ["text_norm"], "doc_id")
    return assign_splits(deduped, ["doc_id"], seed=17).select(
        "doc_id", "quality", "split"
    )


def _sql_corpus_pipeline():
    from parquet_sampler_spark.operators.sample import assign_splits_sql

    return f"""
WITH staged AS (
  SELECT doc_id,
         {TX.normalize_text_sql('text')} AS text_norm,
         {TX.quality_score_sql('text')} AS quality,
         {TX.language_id_sql('text')} AS lang_pred
  FROM documents
),
kept AS (
  SELECT * FROM staged WHERE lang_pred = 'en' AND quality >= 0.5
),
deduped AS (
  SELECT k.* FROM kept k
  WHERE k.doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text_norm)
)
SELECT doc_id, quality, {assign_splits_sql(['doc_id'], 17)} AS split
FROM deduped
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id")


_SQL_DEDUP_EXACT = """
SELECT d.* FROM documents d
WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
"""

_JACCARD_N = 2
_JACCARD_T = 0.5

# DuckDB bigram-shingle relation (distinct per doc) — built from the
# same shared gram-SQL helper as every other shingle fragment, mirrors
# dedup._word_ngrams(text, 2)
_SQL_SHINGLES2 = f"""
shingles AS (
  SELECT doc_id, unnest({TX.word_ngrams_sql('text', 2, distinct=True)})
         AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS set_size FROM shingles GROUP BY doc_id),
jpairs AS (
  SELECT id_a, id_b,
         CAST(common AS DOUBLE) /
         CAST(sa.set_size + sb.set_size - common AS DOUBLE) AS jaccard
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
"""


# jaccard_pairs feeds both the pairs query and the dedup query; persist
# one copy per (session, sf_dir) — mirrors the sample cache in queries.py.
# Keyed on applicationId, not id(spark): Python reuses id() after GC, so
# a new session at the same address must not inherit stale cached plans.
_PAIRS_CACHE = {}


def _jaccard_pairs_cached(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = ngram_jaccard_pairs(
            _t(spark, sf_dir, "documents"), "doc_id", "text",
            n=_JACCARD_N, threshold=_JACCARD_T,
        ).persist()
    return _PAIRS_CACHE[key]


def _q_jaccard_pairs(spark, sf_dir):
    return _jaccard_pairs_cached(spark, sf_dir)


def _dup_graph_cached(spark, sf_dir):
    """Shared near-duplicate pair graph for the graph-analytics queries
    (dup_clusters, cluster_dedup, pagerank_dups) and minhash_pairs:
    MinHash banded-LSH candidates with exact-Jaccard verification.
    Precision is structurally exact (every candidate re-verified);
    recall follows the banding s-curve, so equality with the exact
    inverted-index join is an EMPIRICAL property of the corpus's pair
    spectrum, not a theorem: it holds here because the qualifying pairs
    are planted near-dups (j ≈ 0.8+, per-pair miss < 2% at 8 bands × 4
    rows) with no marginal pairs near the 0.5 threshold — pinned by
    minhash_pairs' value-hash oracle, which IS the exact-pairs SQL,
    green at every tested sf before and after this rewiring. A corpus
    dense in barely-qualifying pairs (j ≈ 0.5-0.6) would lose a
    fraction of them; that is the accepted LSH trade at 100 TB, and the
    exact join stays registered (jaccard_pairs) as the
    guaranteed-exact surface. The win: O(docs × bands) build instead of
    O(Σ_shingle df²) — measured at the local sf1 amplification (50k
    docs), 3.1 s vs 168 s, whose 0.1→1 step is flagged super-linear
    (α 1.84) because this corpus's uniformly-hot vocabulary makes every
    shingle's join group quadratic.

    Triage escape hatch (ADVICE r06): setting ``PSX_EXACT_PAIR_GRAPH=1``
    in the environment swaps every consumer of this graph back onto the
    exact inverted-index join WITHOUT code edits — if a downstream row
    (dup_clusters / cluster_dedup / pagerank_dups / minhash_pairs /
    jaccard_dedup) goes red on a new corpus, re-running with the flag
    distinguishes "LSH recall lost a marginal pair" (flag turns it
    green) from a real operator bug (stays red)."""
    import os

    exact = os.environ.get("PSX_EXACT_PAIR_GRAPH", "") not in ("", "0")
    if exact:
        return _jaccard_pairs_cached(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "lsh")
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = minhash_lsh_pairs(
            _t(spark, sf_dir, "documents"), "doc_id", "text",
            n=_JACCARD_N, threshold=_JACCARD_T, num_hashes=32, bands=8,
        ).persist()
    return _PAIRS_CACHE[key]


_SQL_JACCARD_PAIRS = (
    f"WITH {_SQL_SHINGLES2} SELECT id_a, id_b, jaccard FROM jpairs "
    f"WHERE jaccard >= {_JACCARD_T}"
)


# Document-frequency cap for the capped Jaccard surface. Sized like
# _SIMHASH_BAND_CAP: an ABSOLUTE per-shingle bound, so the join work
# per shingle is O(cap²) regardless of corpus size — the mitigation
# for the measured alpha-1.84 sf0.1→sf1 super-linearity of the exact
# join (SCALING.md: Σdf² candidate growth). 42 BINDS at sf0.01 (df
# runs 1..46 there), so the capped semantics — under-estimated
# jaccard over an exact union denominator — are exercised and
# value-hash-proven on the driver's correctness surface, not just at
# scale. On THIS corpus's uniformly-hot vocabulary df grows linearly
# with doc count, so at sf0.1+ every shingle is over-cap and the row
# returns 0 pairs: the documented recall trade of an absolute df cap
# on a corpus whose duplicate evidence is globally hot (same shape as
# simhash_pairs_capped's hot-bucket cap). Zipfian real corpora keep
# their rare-shingle evidence under the cap; here the exact surface
# (jaccard_pairs) and the LSH surface (minhash_pairs) carry recall.
_JACCARD_DF_CAP = 42


def _q_jaccard_pairs_capped(spark, sf_dir):
    """The scale form of jaccard_pairs: hot-shingle-capped exact join
    (``max_shingle_df`` — shingles over the df cap are dropped from
    the SELF-JOIN ONLY; set sizes, hence the Jaccard denominator, stay
    exact, so emitted values are under-estimates and precision is
    exact). The cap is deterministic, so the oracle replicates it with
    one GROUP BY ... HAVING over the shingle relation — this row
    value-hash-proves the capped plan's exact semantics (recall loss
    included), not just its speed, mirroring simhash_pairs_capped."""
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=_JACCARD_N, threshold=_JACCARD_T,
        max_shingle_df=_JACCARD_DF_CAP,
    )


# capped twin of _SQL_SHINGLES2: the df cap filters the self-join's
# input relation only; sizes still come from the FULL shingle relation
# so the union denominator matches the operator's exact-denominator
# contract
_SQL_SHINGLES2_CAPPED = f"""
shingles AS (
  SELECT doc_id, unnest({TX.word_ngrams_sql('text', 2, distinct=True)})
         AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS set_size FROM shingles GROUP BY doc_id),
rare AS (
  SELECT shingle FROM shingles
  GROUP BY shingle HAVING count(*) <= {_JACCARD_DF_CAP}
),
jsh AS (SELECT s.* FROM shingles s JOIN rare USING (shingle)),
jpairs AS (
  SELECT id_a, id_b,
         CAST(common AS DOUBLE) /
         CAST(sa.set_size + sb.set_size - common AS DOUBLE) AS jaccard
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM jsh a JOIN jsh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
"""

_SQL_JACCARD_PAIRS_CAPPED = (
    f"WITH {_SQL_SHINGLES2_CAPPED} SELECT id_a, id_b, jaccard FROM jpairs "
    f"WHERE jaccard >= {_JACCARD_T}"
)


def _q_jaccard_dedup(spark, sf_dir):
    """Greedy keep-first near-dup filter. Rewired (r07) onto the
    shared LSH pair graph (`_dup_graph_cached`) — the registered scale
    path, O(docs × bands) instead of the exact join's Σdf² — while the
    ORACLE stays the exact-pairs SQL: on this corpus the LSH candidate
    set is output-identical to the exact join (pinned every round by
    minhash_pairs' value-hash row, whose oracle IS the exact-pairs
    SQL), so a hash-green here proves the rewiring lost nothing.
    ``PSX_EXACT_PAIR_GRAPH=1`` swaps back to the exact join for
    triage; jaccard_pairs remains the guaranteed-exact surface."""
    d = _t(spark, sf_dir, "documents")
    losers = _dup_graph_cached(spark, sf_dir) \
        .select(F.col("id_b").alias("doc_id")).distinct()
    return d.join(losers, "doc_id", "left_anti")


_SQL_JACCARD_DEDUP = (
    f"WITH {_SQL_SHINGLES2} SELECT d.* FROM documents d WHERE NOT EXISTS "
    f"(SELECT 1 FROM jpairs p WHERE p.id_b = d.doc_id "
    f"AND p.jaccard >= {_JACCARD_T})"
)


_CONTAIN_T = 0.8


def _q_containment_pairs(spark, sf_dir):
    """Broder containment join (r12): the ASYMMETRIC near-dup
    statistic — max(|A∩B|/|A|, |A∩B|/|B|) over 2-gram shingle sets —
    catching a short doc quoted wholesale inside a long one, which
    resemblance (Jaccard) structurally misses because the union is
    dominated by the long doc. Registered in the scale-safe capped
    form (same df cap and contract as jaccard_pairs_capped: over-cap
    shingles leave the self-join only, denominators exact, so values
    are under-estimates — recall-approximate, precision-exact). On
    this corpus the qualifying pairs are the planted near-dups (no
    natural quoting), but the emitted per-direction containments are
    value-hash checked, and the asymmetric case (cont_a ≈ 1, tiny
    jaccard) is pinned by a planted-subsumption pytest."""
    from parquet_sampler_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=_JACCARD_N, threshold=_CONTAIN_T,
        max_shingle_df=_JACCARD_DF_CAP,
    )


# same shingles/sizes/rare/jsh skeleton as _SQL_SHINGLES2_CAPPED, but
# the pair statistic is per-direction containment instead of jaccard
_SQL_CONTAINMENT_PAIRS = f"""
WITH shingles AS (
  SELECT doc_id, unnest({TX.word_ngrams_sql('text', 2, distinct=True)})
         AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS set_size FROM shingles GROUP BY doc_id),
rare AS (
  SELECT shingle FROM shingles
  GROUP BY shingle HAVING count(*) <= {_JACCARD_DF_CAP}
),
jsh AS (SELECT s.* FROM shingles s JOIN rare USING (shingle)),
cpairs AS (
  SELECT id_a, id_b,
         CAST(common AS DOUBLE) / CAST(sa.set_size AS DOUBLE) AS cont_a,
         CAST(common AS DOUBLE) / CAST(sb.set_size AS DOUBLE) AS cont_b
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM jsh a JOIN jsh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, cont_a, cont_b,
       greatest(cont_a, cont_b) AS containment
FROM cpairs WHERE greatest(cont_a, cont_b) >= {_CONTAIN_T}
"""


def _q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidates, exact-Jaccard verified.

    Oracle: the exact threshold-pairs SQL. Precision-exactness is
    structural (every candidate is verified by exact Jaccard before
    emission), so emitted ⊆ exact always; recall at 8 bands × 4 rows
    on this corpus's planted near-dups (jaccard ≈ 0.8+, per-pair miss
    probability (1-j^4)^8 < 2%) is deterministically 1 — verified
    emitted == exact at sf0.01 AND sf0.1, seeded signatures, no RNG —
    which upgrades the r1-r3 rows-only check to a full value-hash row.
    The statistical recall floor stays pinned in tests/test_dedup.py."""
    return _dup_graph_cached(spark, sf_dir)


def _q_minhash_incremental(spark, sf_dir):
    """Incremental (batch-vs-index) near-dup: every 10th document
    (doc_id % 10 = 0) plays the NEW crawl batch; the rest is the
    standing corpus whose banded MinHash index the batch probes
    (operators/dedup.py minhash_probe_pairs — the production shape
    where admitting a batch costs Θ(batch), never Θ(corpus)). Same
    n=2 shingles / 32×8 banding / threshold as minhash_pairs, so the
    recall argument carries over verbatim: the cross-split subset of
    the self-join's candidates is exactly this row's candidate set,
    and that row is value-hash-equal to the exact pairs SQL at gate
    sf. Oracle: the exact threshold-pairs SQL restricted to pairs
    straddling the split, oriented (corpus_id, batch_id)."""
    from parquet_sampler_spark.operators.dedup import minhash_probe_pairs

    docs = _t(spark, sf_dir, "documents")
    is_batch = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    # corpus projected EXACTLY like _incremental_split's (r14
    # optimization round): the persisted standing state (banded index
    # + corpus shingles) is deduped by plan semantics, and an
    # un-projected corpus here forked a second, semantically-distinct
    # copy of both relations that curation_incremental then rebuilt
    # per bench pass (sameSemantics=False purely from the projection)
    return minhash_probe_pairs(
        docs.filter(~is_batch).select("doc_id", "text"),
        docs.filter(is_batch),
        "doc_id", "text",
        n=_JACCARD_N, threshold=_JACCARD_T, num_hashes=32, bands=8,
    ).select(
        F.col("id_a").alias("corpus_id"),
        F.col("id_b").alias("batch_id"),
        "jaccard",
    )


def _incremental_split(spark, sf_dir):
    """The shared corpus/batch split of the incremental-ingest rows:
    every 10th doc is the NEW batch, and every 30th batch doc carries
    its corpus neighbor's text VERBATIM (doc_id+1 is always
    corpus-side) — the deterministic re-crawl planting the exact gate
    needs, replayed identically in every oracle."""
    docs = _t(spark, sf_dir, "documents")
    is_batch = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    corpus = docs.filter(~is_batch).select("doc_id", "text")
    donor = corpus.select(
        F.col("doc_id").alias("__did"), F.col("text").alias("__dtext")
    )
    batch = (
        docs.filter(is_batch)
        .join(donor, F.col("doc_id") + 1 == F.col("__did"), "left")
        .select(
            "doc_id",
            F.when(
                (F.pmod(F.col("doc_id"), F.lit(30)) == 0)
                & F.col("__dtext").isNotNull(),
                F.col("__dtext"),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    return corpus, batch


def _q_dedup_exact_incremental(spark, sf_dir):
    """The cheapest gate in the incremental-ingest stack (r12): which
    batch docs are VERBATIM copies of standing-corpus text? The corpus
    collapses to a persisted (md5, min id) index — bounded by distinct
    content — and the join ships 128-bit fingerprints, never the text
    (operators/dedup.exact_dup_probe). Same split as the near-dup
    probes. Oracle: DuckDB's md5 over the identical concat — the
    fingerprint pipeline is replicated end-to-end, not approximated."""
    from parquet_sampler_spark.operators.dedup import exact_dup_probe

    corpus, batch = _incremental_split(spark, sf_dir)
    return exact_dup_probe(
        corpus, batch, "doc_id", ["text"],
    ).select(F.col("doc_id").alias("batch_id"), "dup_of")


_SQL_DEDUP_EXACT_INCREMENTAL = """
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
batch AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 30 = 0 AND d.text IS NOT NULL
              THEN d.text ELSE b.text END AS text
  FROM documents b LEFT JOIN corpus d ON d.doc_id = b.doc_id + 1
  WHERE b.doc_id % 10 = 0
),
cidx AS (
  SELECT md5(concat_ws(chr(31), coalesce('v' || text, 'n'))) AS fp, MIN(doc_id) AS dup_of
  FROM corpus GROUP BY 1
)
SELECT b.doc_id AS batch_id, cidx.dup_of
FROM batch b JOIN cidx ON md5(concat_ws(chr(31), coalesce('v' || b.text, 'n'))) = cidx.fp
"""


def _q_curation_incremental(spark, sf_dir):
    """The incremental-ingest journey END TO END as one plan (r12, the
    session's capstone composite, mirroring curation_pipeline's
    precedent): a new crawl batch passes (1) the exact verbatim gate
    (md5 index probe — the planted re-crawls die here), (2) the
    near-dup admission decision (MinHash index probe + batch-internal
    senior rule), and (3) CCNet-style rarity scoring against the
    CORPUS-fitted unigram model (cross-corpus mode: unseen tokens take
    the OOV rarity), emitting each admitted doc's quality record with
    its keep verdict. Every stage is standing-state-shaped: the md5
    and MinHash indexes and the rarity model are all corpus artifacts
    a deployment persists; per-batch cost is the probes + scoring.
    The oracle replays all three stages in SQL — exact fingerprints,
    exact threshold pairs with the admission predicate, exact-integer
    rarity with OOV coalesce."""
    from parquet_sampler_spark.operators.dedup import (
        exact_dup_probe,
        minhash_admit_batch,
    )
    from parquet_sampler_spark.operators.quality import unigram_rarity

    corpus, batch = _incremental_split(spark, sf_dir)
    losers_e = exact_dup_probe(
        corpus, batch, "doc_id", ["text"]
    ).select("doc_id")
    survivors = batch.join(losers_e, "doc_id", "left_anti")
    admitted = minhash_admit_batch(
        corpus, survivors, "doc_id", "text",
        n=_JACCARD_N, threshold=_JACCARD_T, num_hashes=32, bands=8,
    )
    return unigram_rarity(
        admitted, "doc_id", "text",
        scale=_RARITY_SCALE, keep_below=_RARITY_KEEP_BELOW,
        fit_df=corpus,
    )


def _sql_curation_incremental() -> str:
    grams = TX.word_ngrams_sql("text", 2, distinct=True)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
),
bdocs AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 30 = 0 AND d.text IS NOT NULL
              THEN d.text ELSE b.text END AS text
  FROM documents b LEFT JOIN corpus d ON d.doc_id = b.doc_id + 1
  WHERE b.doc_id % 10 = 0
),
cidx AS (
  SELECT DISTINCT md5(concat_ws(chr(31), coalesce('v' || text, 'n'))) AS fp FROM corpus
),
surv AS (
  SELECT s.doc_id, s.text FROM bdocs s
  WHERE md5(concat_ws(chr(31), coalesce('v' || s.text, 'n'))) NOT IN (SELECT fp FROM cidx)
),
uni AS (
  SELECT doc_id, text FROM corpus
  UNION ALL SELECT doc_id, text FROM surv
),
shingles AS (
  SELECT doc_id, unnest({grams}) AS shingle FROM uni
),
sizes AS (SELECT doc_id, count(*) AS set_size FROM shingles GROUP BY doc_id),
jp AS (
  SELECT id_a, id_b,
         CAST(common AS DOUBLE) /
         CAST(sa.set_size + sb.set_size - common AS DOUBLE) AS jaccard
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
),
adm AS (
  SELECT s.doc_id, s.text FROM surv s
  WHERE NOT EXISTS (
    SELECT 1 FROM jp
    WHERE jaccard >= {_JACCARD_T}
      AND (id_b = s.doc_id
           OR (id_a = s.doc_id AND id_b % 10 <> 0))
  )
),
rtoks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM corpus WHERE text IS NOT NULL AND length(trim(text)) > 0
),
rvocab AS (SELECT tok, count(*) AS cnt FROM rtoks GROUP BY tok),
rtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM rvocab),
rrar AS (
  SELECT tok, CAST((SELECT total FROM rtot) // cnt AS BIGINT) AS rarity
  FROM rvocab
),
htoks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM adm WHERE text IS NOT NULL AND length(trim(text)) > 0
),
hscore AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(coalesce(rrar.rarity,
                           (SELECT total FROM rtot) // 1)) AS BIGINT)
           AS sum_rarity
  FROM htoks LEFT JOIN rrar USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_rarity,
       CAST(({_RARITY_SCALE} * sum_rarity) // n_tokens AS BIGINT)
         AS mean_rarity_scaled,
       ({_RARITY_SCALE} * sum_rarity) // n_tokens
         <= {_RARITY_KEEP_BELOW} AS kept
FROM hscore
"""


def _q_minhash_admit(spark, sf_dir):
    """The full incremental-ingest decision (the other half of
    minhash_incremental): which batch documents get APPENDED to the
    standing corpus? A batch doc is rejected iff it near-duplicates
    the corpus or a senior (smaller-id) batch doc; survivors return
    as full rows. Greedy min-id keeper rule (repo-wide). Oracle: the
    exact pairs SQL — a batch doc d is a loser iff some qualifying
    pair has id_b = d (senior partner of either side), or id_a = d
    with a corpus partner (corpus ids above d's)."""
    from parquet_sampler_spark.operators.dedup import minhash_admit_batch

    docs = _t(spark, sf_dir, "documents")
    is_batch = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    # corpus projection matches _incremental_split / minhash_incremental
    # so all three ingest rows probe ONE persisted standing index (see
    # _q_minhash_incremental's note); the batch keeps full rows — the
    # admitted survivors return every column
    return minhash_admit_batch(
        docs.filter(~is_batch).select("doc_id", "text"),
        docs.filter(is_batch),
        "doc_id", "text",
        n=_JACCARD_N, threshold=_JACCARD_T, num_hashes=32, bands=8,
    )


_SQL_MINHASH_ADMIT = f"""
WITH {_SQL_SHINGLES2}
SELECT d.* FROM documents d
WHERE d.doc_id % 10 = 0
  AND NOT EXISTS (
    SELECT 1 FROM jpairs j
    WHERE j.jaccard >= {_JACCARD_T}
      AND (j.id_b = d.doc_id
           OR (j.id_a = d.doc_id AND j.id_b % 10 <> 0))
  )
"""


_SQL_MINHASH_INCREMENTAL = f"""
WITH {_SQL_SHINGLES2}
SELECT CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS corpus_id,
       CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS batch_id,
       jaccard
FROM jpairs
WHERE jaccard >= {_JACCARD_T}
  AND ((id_a % 10 = 0) <> (id_b % 10 = 0))
"""


def _q_simhash_pairs(spark, sf_dir):
    """SimHash Hamming-distance near-dup pairs, full value-hash oracle.
    max_hamming=1: this corpus's token sets are so self-similar that
    distance ≤3 admits ~1M pairs at sf0.1 — ≤1 keeps the result a
    near-dup list rather than a similarity matrix.

    Tokens are hashed with the portable 31-bit mixed rolling hash
    (LCG-diffused — raw rolling hashes of short tokens have dead high
    bits) instead of xxhash64, so DuckDB recomputes the ENTIRE pipeline
    from raw text — token hash, per-bit votes, sign signature, band
    blocking, Hamming verify (_sql_simhash_pairs). All-integer
    arithmetic: the emitted hamming values are exact in both engines,
    upgrading the r1-r3 rows-only check. The xxhash64 default remains
    the operator's scale path (one hash op/token vs one multiply-add
    per CHARACTER here); the numpy==JVM kernel equivalence stays in
    tests."""
    from parquet_sampler_spark.functions.hashing import mixed_string_hash

    return simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        bits=32, bands=4, max_hamming=1,
        hash_fn=mixed_string_hash,
    )


_SIMHASH_BAND_CAP = 48


def _q_simhash_pairs_capped(spark, sf_dir):
    """The scale form of simhash_pairs: hot-bucket-capped banding
    (``max_band_df`` — SCALING.md's fix for the measured sf1
    super-linearity: 8-bit chunks ⇒ bucket growth linear in corpus
    size ⇒ blocking join quadratic). The cap is deterministic, so the
    oracle replicates it with one GROUP BY ... HAVING over the banded
    relation — this row value-hash-proves the capped plan's exact
    semantics (recall loss included), not just its speed."""
    from parquet_sampler_spark.functions.hashing import mixed_string_hash

    return simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        bits=32, bands=4, max_hamming=1,
        hash_fn=mixed_string_hash, max_band_df=_SIMHASH_BAND_CAP,
    )


def _sql_simhash_pairs(max_band_df: int | None = None) -> str:
    """DuckDB twin of _q_simhash_pairs (31-bit mixed token hash; bit 31
    of every signature is 0 — votes there are all -1). With
    ``max_band_df``, also the twin of _q_simhash_pairs_capped: the cap
    filters the banded relation before the blocking join, exactly as
    the operator does."""
    from parquet_sampler_spark.functions.hashing import mixed_string_hash_sql

    tok_hash = mixed_string_hash_sql("tok")
    if max_band_df is None:
        cap_cte = ""
        cand_src = "banded"
    else:
        cap_cte = f"""
cool AS (
  SELECT band, chunk FROM banded
  GROUP BY band, chunk HAVING count(*) <= {max_band_df}
),
banded_c AS (
  SELECT banded.* FROM banded JOIN cool USING (band, chunk)
),"""
        cand_src = "banded_c"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
  FROM documents
),
th AS (SELECT doc_id, {tok_hash} AS h FROM toks),
votes AS (
  SELECT doc_id, r.b AS bit,
         sum(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN range(0, 32) r(b)
  GROUP BY doc_id, r.b
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit
                       ELSE 0 END) AS BIGINT) AS fp
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, fp, r.b AS band, (fp >> (r.b * 8)) & 255 AS chunk
  FROM sig CROSS JOIN range(0, 4) r(b)
),{cap_cte}
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.fp AS fp_a, b.fp AS fp_b
  FROM {cand_src} a JOIN {cand_src} b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 1
"""


_NEARDUP_T = 0.4        # loose/exploratory threshold → exact block plan
_NEARDUP_HI = 0.92      # near-identical threshold → sub-quadratic LSH plan
_NEARDUP_DUP_MOD = 7    # every 7th vector gets a scaled twin (see below)
_NEARDUP_DUP_OFF = 100_000


def _q_embedding_neardup(spark, sf_dir):
    """Near-IDENTICAL embedding dedup via the sub-quadratic plan:
    ``method="auto"`` resolves to sign-bit LSH banding + exact verify at
    threshold ≥ 0.9 — the registered plan IS the 100 TB one (no block
    GEMM grid; candidate cost is bucket collisions, not n²).

    The synthetic embeddings table is near-dup-free (max pairwise cosine
    ≈ 0.51 at every sf), so the near-identical regime is exercised by
    augmenting it with scaled twins of every ``_NEARDUP_DUP_MOD``-th
    vector: doubling is IEEE-exact (×2 and the final ÷nrm round to the
    same quotients), so a twin's unit vector is BIT-IDENTICAL to the
    original's in both engines — its sign-bit signature matches in every
    LSH table and recall for the qualifying pairs is exactly 1, not
    probabilistically ≈1. Output: one (i, i+offset) pair per twin with
    cos_sim = the unit self-dot, oracle-checked by value hash; all
    cross pairs sit below 0.52 and can never leak past the 0.92 verify.
    """
    emb = _t(spark, sf_dir, "embeddings")
    twins = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 0
    ).select(
        (F.col("vec_id") + _NEARDUP_DUP_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(twins)
    return embedding_neardup_pairs(
        aug, "vec_id", "embedding", threshold=_NEARDUP_HI, method="auto",
    )


def _sql_embedding_neardup():
    cos = unit_dot_sql("a.v", "b.v")
    # ×2.0 in DOUBLE then back to REAL is exact (power-of-two scale,
    # result in float range) — the twin of the Spark-side transform
    aug = (
        f"aug AS (SELECT vec_id, embedding FROM embeddings "
        f"UNION ALL "
        f"SELECT vec_id + {_NEARDUP_DUP_OFF}, "
        f"list_transform(embedding, x -> "
        f"CAST(CAST(x AS DOUBLE) * 2.0 AS REAL)) "
        f"FROM embeddings WHERE vec_id % {_NEARDUP_DUP_MOD} = 0)"
    )
    return (
        f"WITH {aug}, {normalized_cte_sql(table='aug')} "
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim "
        f"FROM normed a JOIN normed b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= {_NEARDUP_HI}"
    )


def _q_embedding_neardup_incremental(spark, sf_dir):
    """Incremental embedding near-dup (the SemDeDup ingest gate, r12):
    the scaled twins play the NEW batch and the raw embeddings table
    the standing corpus whose persisted sign-bit bucket index the
    batch probes (operators/similarity.embedding_neardup_incremental)
    — the embedding-space twin of minhash_incremental. A twin's unit
    vector is BIT-IDENTICAL to its original's (×2 is IEEE-exact), so
    its signature matches in every LSH table and recall for the
    qualifying pairs is exactly 1; all cross pairs sit below 0.52 and
    can never leak past the 0.92 verify. Oracle: the exact cosine
    cross-join between corpus and batch at the same threshold."""
    from parquet_sampler_spark.operators.similarity import (
        embedding_neardup_incremental,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 0
    ).select(
        (F.col("vec_id") + _NEARDUP_DUP_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    return embedding_neardup_incremental(
        emb, twins, "vec_id", "embedding", threshold=_NEARDUP_HI,
    )


def _sql_embedding_neardup_incremental():
    from parquet_sampler_spark.functions.vectors import dot_sql

    def ncte(prefix: str, table: str) -> str:
        d = dot_sql("embedding", "embedding")
        return (
            f"{prefix}nrm AS (SELECT vec_id, sqrt({d}) AS nrm "
            f"FROM {table}), "
            f"{prefix}ed AS (SELECT e.vec_id, "
            f"list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nrm)"
            f" AS v FROM {table} e JOIN {prefix}nrm n USING (vec_id) "
            f"WHERE n.nrm > 0)"
        )

    tw = (
        f"tw AS (SELECT vec_id + {_NEARDUP_DUP_OFF} AS vec_id, "
        f"list_transform(embedding, x -> "
        f"CAST(CAST(x AS DOUBLE) * 2.0 AS REAL)) AS embedding "
        f"FROM embeddings WHERE vec_id % {_NEARDUP_DUP_MOD} = 0)"
    )
    cos = unit_dot_sql("a.v", "b.v")
    return (
        f"WITH {tw}, {ncte('c', 'embeddings')}, {ncte('t', 'tw')} "
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim "
        f"FROM ced a CROSS JOIN ted b "
        f"WHERE {cos} >= {_NEARDUP_HI}"
    )


_EMBIVF_MODEL_CACHE: dict = {}
_EMBIVF_NLIST, _EMBIVF_NPROBE = 16, 2


def _q_embedding_neardup_incremental_ivf(spark, sf_dir):
    """IVF-routed form of the SemDeDup ingest gate (r13, VERDICT r12
    #5): same twins-as-batch construction, but the standing index is
    the coarse-quantizer cell assignment over the corpus's UNIT
    vectors instead of sign-bit buckets — the scale path once the
    corpus outgrows comfortable ``lsh_bits`` widths (buckets grow by
    ADDING CELLS, nlist ∝ corpus, not by widening signatures). A
    twin's unit vector is bit-identical to its original's (×2 is
    IEEE-exact), so flat routing finds every qualifying pair at any
    nprobe ≥ 1 (probe list starts at the argmin cell = the twin's
    assigned cell) and recall for the oracle's qualifying set is
    exactly 1; all cross pairs sit below 0.52 and can never leak past
    the 0.92 exact verify. Oracle: shared verbatim with
    embedding_neardup_incremental — the exact cosine cross-join."""
    from parquet_sampler_spark.operators.similarity import (
        embedding_neardup_incremental_ivf,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 0
    ).select(
        (F.col("vec_id") + _NEARDUP_DUP_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    return embedding_neardup_incremental_ivf(
        emb, twins, "vec_id", "embedding", threshold=_NEARDUP_HI,
        nlist=_EMBIVF_NLIST, nprobe=_EMBIVF_NPROBE,
        model_cache=_EMBIVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _EMBIVF_NLIST),
    )


def _q_embedding_neardup_incremental_ivf_sized(spark, sf_dir):
    """The IVF ingest gate at the SIZED operating point (r14): nlist
    derived from the parquet footer count by the same
    ``_ann_sized_nlist`` rule as ann_ivf_sized (one cell per 32 corpus
    rows, floor 16; training sketch capped at 2^18 rows) — the
    settings ``tools/decade3_embgate_sized.py`` measures are now a
    registered, copyable row. Recall for the oracle's qualifying set
    stays exactly 1 at ANY nlist: a scaled twin's unit vector is
    bit-identical to its original's, so both land in the same argmin
    cell and flat routing finds the pair at nprobe ≥ 1 — the same
    argument the fixed-nlist row pins, independent of cell count.
    Oracle: shared verbatim with embedding_neardup_incremental."""
    from parquet_sampler_spark.operators.similarity import (
        embedding_neardup_incremental_ivf,
    )
    from parquet_sampler_spark.sources.io import metadata_row_count

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 0
    ).select(
        (F.col("vec_id") + _NEARDUP_DUP_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    n = metadata_row_count(f"{sf_dir}/embeddings.parquet")
    nlist = _ann_sized_nlist(n)
    return embedding_neardup_incremental_ivf(
        emb, twins, "vec_id", "embedding", threshold=_NEARDUP_HI,
        nlist=nlist, nprobe=_EMBIVF_NPROBE,
        train_per_cell=_ann_sized_tpc(nlist),
        model_cache=_EMBIVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   "sized", nlist),
    )


def _q_embedding_admit(spark, sf_dir):
    """The embedding ingest DECISION (r13): which batch vectors get
    APPENDED to the standing corpus? Batch = the scaled twins (every
    7th vector ×2 — rejected: their unit vectors equal their
    originals') ∪ REVERSED copies of the vec_id%7==3 vectors (novel
    directions on this corpus — admitted; reversal is element
    reordering, so the admitted rows' float bits replay exactly in
    SQL). Exact verification makes every emitted rejection real
    (precision 1 on both engines); full admit/reject parity
    additionally rests on the gate's recall contract (unit-twin
    re-ingests are found bit-for-bit) plus this fixture's property
    that every cross cosine sits far below the threshold — a
    qualifying pair the routing missed would be admitted here but
    rejected by the oracle. Greedy min-id keeper rule (repo-wide).

    Output is EXPLODED to scalar ``(vec_id, idx, component)`` rows
    (r14, VERDICT r13 #1): the driver's canonicalizer sorts rows in
    pandas and requires hashable (scalar) cells — the same contract
    ``_q_multimodal_features`` documents — and the r13 registered
    form returning the raw ``array<float>`` column was the round's
    one driver-red row. The "float bits replay exactly" property
    survives the explode unchanged (posexplode reorders nothing)."""
    from parquet_sampler_spark.operators.similarity import (
        embedding_admit_batch,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 0
    ).select(
        (F.col("vec_id") + _NEARDUP_DUP_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(2.0)).cast("float")
        ).alias("embedding"),
    )
    rev = emb.filter(
        F.col("vec_id") % _NEARDUP_DUP_MOD == 3
    ).select(
        (F.col("vec_id") + 2 * _NEARDUP_DUP_OFF).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    admitted = embedding_admit_batch(
        emb, twins.unionByName(rev), "vec_id", "embedding",
        threshold=_NEARDUP_HI,
    )
    return admitted.select(
        "vec_id", F.posexplode("embedding").alias("idx", "component")
    )


def _sql_embedding_admit():
    from parquet_sampler_spark.functions.vectors import dot_sql

    def ncte(prefix: str, table: str) -> str:
        d = dot_sql("embedding", "embedding")
        return (
            f"{prefix}nrm AS (SELECT vec_id, sqrt({d}) AS nrm "
            f"FROM {table}), "
            f"{prefix}ed AS (SELECT e.vec_id, "
            f"list_transform(e.embedding, x -> CAST(x AS DOUBLE) / n.nrm)"
            f" AS v FROM {table} e JOIN {prefix}nrm n USING (vec_id) "
            f"WHERE n.nrm > 0)"
        )

    tw = (
        f"tw AS (SELECT vec_id + {_NEARDUP_DUP_OFF} AS vec_id, "
        f"list_transform(embedding, x -> "
        f"CAST(CAST(x AS DOUBLE) * 2.0 AS REAL)) AS embedding "
        f"FROM embeddings WHERE vec_id % {_NEARDUP_DUP_MOD} = 0)"
    )
    rv = (
        f"rv AS (SELECT vec_id + {2 * _NEARDUP_DUP_OFF} AS vec_id, "
        f"list_reverse(embedding) AS embedding "
        f"FROM embeddings WHERE vec_id % {_NEARDUP_DUP_MOD} = 3)"
    )
    cos = unit_dot_sql("a.v", "x.v")
    return (
        f"WITH {tw}, {rv}, "
        f"bat AS (SELECT * FROM tw UNION ALL SELECT * FROM rv), "
        f"{ncte('c', 'embeddings')}, {ncte('b', 'bat')}, "
        f"adm AS (SELECT b.vec_id, b.embedding FROM bat b "
        f"WHERE NOT EXISTS (SELECT 1 FROM ced a, bed x "
        f"  WHERE x.vec_id = b.vec_id AND {cos} >= {_NEARDUP_HI}) "
        f"AND NOT EXISTS (SELECT 1 FROM bed a, bed x "
        f"  WHERE x.vec_id = b.vec_id AND a.vec_id < x.vec_id "
        f"  AND {cos} >= {_NEARDUP_HI})) "
        # exploded to scalar (vec_id, idx, component) rows — the driver
        # canonicalizer contract (see _q_embedding_admit); embedding[i]
        # is 1-based in DuckDB, idx is posexplode's 0-based position
        f"SELECT vec_id, u.i - 1 AS idx, embedding[u.i] AS component "
        f"FROM adm, unnest(range(1, len(embedding) + 1)) AS u(i)"
    )


def _q_embedding_neardup_block(spark, sf_dir):
    """Loose-threshold (exploratory) near-dup sweep via the EXACT
    block-GEMM plan. Below ~0.9 the pair angle is wide enough that any
    blocking scheme either misses pairs or degenerates to all-pairs, so
    the n²·dim FLOPs are inherent to the semantics — this plan spends
    them at BLAS rate over a bounded block-pair grid (see
    operators/similarity.embedding_neardup_pairs). Non-empty at every
    sf (the data's cosine mass sits in [0.4, 0.52])."""
    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=_NEARDUP_T,
    )


def _sql_embedding_neardup_block():
    cos = unit_dot_sql("a.v", "b.v")
    return (
        f"WITH {normalized_cte_sql()} "
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim "
        f"FROM normed a JOIN normed b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= {_NEARDUP_T}"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_ANN_K = 10
_ANN_NQ = 5  # query set: vec_id < 5
_ANN_RANGE_T = 0.3  # radius: all neighbors at cosine >= 0.3


def _q_ann_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K,
    )


def _q_ann_range(spark, sf_dir):
    """Exact radius search (r12): all corpus vectors at cosine >=
    threshold from each query — the fixed-similarity complement of
    ann_topk's fixed-count contract. Plan: the nq-row query set
    broadcasts, the corpus streams through ONE scan with the dot
    product and threshold fused — no shuffle, no window; the 100 TB
    shape while the query set is broadcast-sized (a corpus-sized
    query set is embedding_neardup's LSH-bucketed join instead)."""
    e = _t(spark, sf_dir, "embeddings")
    return cosine_range(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        threshold=_ANN_RANGE_T,
    )


def _sql_ann_range():
    cos = unit_dot_sql("q.v", "c.v")
    return f"""
WITH {normalized_cte_sql()}
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score
FROM normed q JOIN normed c ON q.vec_id != c.vec_id
WHERE q.vec_id < {_ANN_NQ} AND {cos} >= {_ANN_RANGE_T}
"""


def _sql_ann_topk():
    cos = unit_dot_sql("q.v", "c.v")
    return f"""
WITH {normalized_cte_sql()}
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {cos} DESC, c.vec_id) AS rank
  FROM normed q JOIN normed c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {_ANN_NQ}
) WHERE rank <= {_ANN_K}
"""


# fitted IVF coarse quantizers, keyed (applicationId, sf_dir, params) —
# the index is built once per corpus and shared by every ann_ivf call
# (cleared via queries.clear_caches)
_IVF_MODEL_CACHE: dict = {}


_IVF_NLIST, _IVF_NPROBE, _IVF_SEED = 16, 8, 42


def _q_ann_ivf(spark, sf_dir):
    """IVF (KMeans coarse quantizer) approximate top-k, full value-hash
    oracle since r5: the quantizer is data-fitted but DETERMINISTIC —
    portable Lehmer sketch selection + seeded numpy Lloyd — so the
    oracle builder (_sql_ann_ivf) re-trains the identical centroids from
    the raw parquet and embeds them as integer literals, replicating
    assign→probe→rerank entirely in DuckDB. Cell distances are
    integer-quantized (similarity._IVF_QSCALE) to be bit-exact across
    engines; recall vs brute force stays pinned in
    tests/test_similarity.py."""
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE, seed=_IVF_SEED,
        model_cache=_IVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _IVF_NLIST, _IVF_SEED),
    )


_JL_DIM = 16
_JL_SHORTLIST = 40
_JL_SEED = 4242
_JL_EMB_DIM = 64


def _q_ann_jl(spark, sf_dir):
    """Johnson-Lindenstrauss projected top-k (r12): project to 16 dims
    with seeded Gaussian planes, shortlist 40 per query by PROJECTED
    cosine, exact full-dim rerank to top-10 — the dense pre-filter
    (4× fewer multiplies per candidate) and the third candidate
    family beside bucketed LSH (signs only) and IVF (data-fitted
    cells): JL keeps projected geometry, so recall degrades smoothly
    with proj_dim instead of cliffing at bucket boundaries. Every
    stage is the shared left-to-right double fold — shortlist
    membership and final ranks replay value-for-value in DuckDB."""
    from parquet_sampler_spark.operators.similarity import jl_topk

    e = _t(spark, sf_dir, "embeddings")
    return jl_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, proj_dim=_JL_DIM, shortlist=_JL_SHORTLIST,
        seed=_JL_SEED, dim=_JL_EMB_DIM,
    )


def _sql_ann_jl() -> str:
    from parquet_sampler_spark.functions.vectors import (
        dot_sql,
        norm2_sql,
    )
    from parquet_sampler_spark.operators.similarity import _hyperplanes

    rows = []
    for pid, w in enumerate(_hyperplanes(_JL_EMB_DIM, _JL_DIM, _JL_SEED)):
        wlist = "[" + ", ".join(repr(float(x)) for x in w) + "]"
        rows.append(f"({pid}, {wlist}::DOUBLE[])")
    values = ",\n".join(rows)
    cosp = unit_dot_sql("q.v", "c.v")
    cos = unit_dot_sql("qn.v", "cn.v")
    return f"""
WITH {normalized_cte_sql()},
planes(pid, w) AS (VALUES
{values}
),
pv AS (
  SELECT e.vec_id, p.pid,
         {dot_sql("e.embedding", "p.w")} AS pv
  FROM embeddings e CROSS JOIN planes p
),
prj AS (
  SELECT vec_id, list(pv ORDER BY pid) AS jp FROM pv GROUP BY vec_id
),
pn AS (
  SELECT vec_id, list_transform(jp, x -> x / {norm2_sql("jp")}) AS v
  FROM prj WHERE {norm2_sql("jp")} > 0
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {cosp} DESC, c.vec_id) AS rn
    FROM pn q JOIN pn c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {_ANN_NQ}
  ) WHERE rn <= {_JL_SHORTLIST}
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT s.query_id, s.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY {cos} DESC, s.neighbor_id) AS rank
  FROM short s JOIN normed qn ON qn.vec_id = s.query_id
               JOIN normed cn ON cn.vec_id = s.neighbor_id
) WHERE rank <= {_ANN_K}
"""


_CORESET_M = 5


def _q_ivf_coreset(spark, sf_dir):
    """Cluster-balanced coreset (r12, Sorscher et al. 2022): the 5
    most prototypical vectors (smallest int64 quantized squared
    distance to the own-cell centroid, ties by id) of every IVF cell —
    per-cell selection keeps every density mode represented, the
    balance a global top-k destroys. Shares ann_ivf's fitted
    quantizer via the model cache (the index trains ONCE per corpus
    across the ANN family); assignment + distance is one Arrow map
    pass; per-cell top-m compiles to WindowGroupLimit. No join."""
    from parquet_sampler_spark.operators.similarity import ivf_coreset

    e = _t(spark, sf_dir, "embeddings")
    return ivf_coreset(
        e, "vec_id", "embedding",
        m=_CORESET_M, nlist=_IVF_NLIST, seed=_IVF_SEED,
        model_cache=_IVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _IVF_NLIST, _IVF_SEED),
    )


_CORESET_SQL_CACHE: dict[str, str] = {}


def _sql_ivf_coreset() -> str:
    """DuckDB twin of _q_ivf_coreset: identical centroid literals to
    _sql_ann_ivf (same sketch + seeded Lloyd re-run on the raw
    parquet), assignment as argmin over int64 squared distances, d
    carried through, per-cell row_number <= m."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivf_train_centroids_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _CORESET_SQL_CACHE:
        return _CORESET_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    cents = ivf_train_centroids_numpy(
        ids, vecs, nlist=_IVF_NLIST, seed=_IVF_SEED
    )
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    rows = ",\n".join(
        f"({j}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
        for j, c in enumerate(ci)
    )
    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    sql = f"""
WITH cents(cell, cv) AS (VALUES
{rows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
dist AS (
  SELECT vi.vec_id, cents.cell, {sqdist} AS d
  FROM vi CROSS JOIN cents
),
assign AS (
  SELECT vec_id, cell, d FROM (
    SELECT vec_id, cell, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist) WHERE rn = 1
)
SELECT vec_id, CAST(cell AS INTEGER) AS cell, CAST(d AS BIGINT) AS d,
       CAST(rank AS BIGINT) AS rank FROM (
  SELECT vec_id, cell, d,
         row_number() OVER (PARTITION BY cell ORDER BY d, vec_id)
           AS rank
  FROM assign
) WHERE rank <= {_CORESET_M}
"""
    _CORESET_SQL_CACHE[sf_dir] = sql
    return sql


# built oracle strings keyed by sf_dir: training the quantizer twice
# per queries()/oracle_sql() pair would be wasted work
_IVF_SQL_CACHE: dict[str, str] = {}


def _ivf_flat_oracle_sql(cents_int, nprobe: int) -> str:
    """Flat-IVF oracle template shared by _sql_ann_ivf and the sized
    sibling: centroid integer literals -> assignment / probe by int64
    squared distance -> exact cosine rerank."""
    rows = ",\n".join(
        f"({j}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
        for j, c in enumerate(cents_int)
    )
    from parquet_sampler_spark.operators.similarity import _IVF_QSCALE

    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    cos = unit_dot_sql("q.v", "c.v")
    return f"""
WITH {normalized_cte_sql()},
cents(cell, cv) AS (VALUES
{rows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
dist AS (
  SELECT vi.vec_id, cents.cell, {sqdist} AS d
  FROM vi CROSS JOIN cents
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist) WHERE rn = 1
),
probe AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist WHERE vec_id < {_ANN_NQ}) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id != p.vec_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""


def _sql_ann_ivf() -> str:
    """DuckDB twin of _q_ann_ivf. The centroids depend on the corpus,
    so the oracle is built for the sf dir the driver compares at
    (sf0.01; override with $SPARK_GRAFT_ORACLE_SF_DIR —
    tools/check_oracle.py sets it to its sf_dir): the builder re-runs
    the operator's exact sketch + Lloyd fit via
    ivf_train_centroids_numpy on the raw parquet and inlines the
    floor-quantized integer centroids. Assignment and probing compare
    int64 squared distances (exact in both engines); the rerank is the
    same normalized left-to-right dot as ann_topk/ann_lsh."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivf_train_centroids_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _IVF_SQL_CACHE:
        return _IVF_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    cents = ivf_train_centroids_numpy(
        ids, vecs, nlist=_IVF_NLIST, seed=_IVF_SEED
    )
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    sql = _ivf_flat_oracle_sql(ci, _IVF_NPROBE)
    _IVF_SQL_CACHE[sf_dir] = sql
    return sql


_PQ_M, _PQ_NCODES, _PQ_RERANK, _PQ_SEED = 16, 16, 100, 42
_PQ_MODEL_CACHE: dict = {}
_PQ_SQL_CACHE: dict = {}


def _q_ann_pq(spark, sf_dir):
    """Product-quantization approximate top-k (similarity.pq_topk) —
    the memory-bound ANN architecture: 16 codes × 4 bits per vector
    (32× smaller than the raw float32s), per-query integer
    lookup-table scan over the codes, exact cosine rerank of the top
    100. Full value-hash oracle: codebook training is the shared
    sketch + per-subspace seeded Lloyd (pq_train_codebooks_numpy, the
    oracle builder re-runs it on the raw parquet and inlines integer
    codebook literals), assignment and every ADC distance are exact
    int64 arithmetic in both engines, and the rerank is the shared
    left-to-right normalized dot. Recall at these params measured 0.96
    at sf0.01 / pinned ≥0.8 in tests; the isotropic testdata is PQ's
    worst case (no subspace structure to exploit) — clustered real
    embeddings do better."""
    from parquet_sampler_spark.operators.similarity import pq_topk

    e = _t(spark, sf_dir, "embeddings")
    return pq_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, m_sub=_PQ_M, ncodes=_PQ_NCODES, rerank=_PQ_RERANK,
        seed=_PQ_SEED, model_cache=_PQ_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _PQ_M, _PQ_NCODES, _PQ_SEED),
    )


def _sql_ann_pq() -> str:
    """DuckDB twin of _q_ann_pq, built like _sql_ann_ivf: the codebooks
    depend on the corpus, so the builder re-runs the operator's exact
    sketch + per-subspace Lloyd fit via pq_train_codebooks_numpy on
    the raw parquet for $SPARK_GRAFT_ORACLE_SF_DIR and inlines the
    floor-quantized integer codebooks as VALUES literals. Code
    assignment, the per-query LUT, and the ADC fold all compare int64
    values (exact in both engines, ties to the lowest code / neighbor
    id); the rerank is the shared normalized left-to-right dot."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        pq_train_codebooks_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _PQ_SQL_CACHE:
        return _PQ_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    cbs = pq_train_codebooks_numpy(
        ids, vecs, m_sub=_PQ_M, ncodes=_PQ_NCODES, seed=_PQ_SEED
    )
    cbq = np.floor(cbs * _IVF_QSCALE).astype(np.int64)
    dsub = cbq.shape[2]
    rows = ",\n".join(
        f"({mi}, {j}, [{', '.join(str(int(x)) for x in cbq[mi, j])}]"
        f"::BIGINT[])"
        for mi in range(cbq.shape[0])
        for j in range(cbq.shape[1])
    )
    # per-(vector, subspace, code) int64 squared distance over the
    # subvector slice v[m*dsub+1 .. (m+1)*dsub]
    sqd = (f"list_sum(list_transform(range(1, {dsub} + 1), "
           f"j -> (v[cb.m * {dsub} + j] - cv[j]) "
           f"* (v[cb.m * {dsub} + j] - cv[j])))")
    cos = unit_dot_sql("q.v", "c.v")
    sql = f"""
WITH {normalized_cte_sql()},
cb(m, code, cv) AS (VALUES
{rows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
sub AS (
  SELECT vi.vec_id, cb.m, cb.code, {sqd} AS d
  FROM vi CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d, code) AS rn
    FROM sub) WHERE rn = 1
),
adc AS (
  SELECT s.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(s.d) AS approx
  FROM codes c JOIN sub s ON s.m = c.m AND s.code = c.code
  WHERE s.vec_id < {_ANN_NQ} AND s.vec_id != c.vec_id
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx, neighbor_id) AS rn
    FROM adc) WHERE rn <= {_PQ_RERANK}
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""
    _PQ_SQL_CACHE[sf_dir] = sql
    return sql


_IVFPQ_MODEL_CACHE: dict = {}
_IVFPQ_SQL_CACHE: dict = {}


def _q_ann_ivfpq(spark, sf_dir):
    """IVF+PQ approximate top-k (similarity.ivfpq_topk) — the
    production large-corpus ANN composition: the IVF coarse quantizer
    bounds each query to ~nprobe/nlist of the corpus, PQ asymmetric
    distances rank those members from 8-byte codes, the exact cosine
    rerank repairs the top 100. One bounded sketch trains both models.
    Full value-hash oracle assembled from the ann_ivf and ann_pq
    fragments (integer centroid + codebook literals, exact int64
    distances end-to-end, shared normalized-dot rerank). Recall at
    these params ≈ the IVF candidate ceiling (0.8 at sf0.01 on the
    isotropic worst-case corpus; nprobe buys it back on clustered
    data)."""
    from parquet_sampler_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=_IVF_NLIST, nprobe=8, m_sub=_PQ_M,
        ncodes=_PQ_NCODES, rerank=_PQ_RERANK, seed=_PQ_SEED,
        model_cache=_IVFPQ_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir),
    )


def _sql_ann_ivfpq() -> str:
    """DuckDB twin of _q_ann_ivfpq: the ann_ivf assign/probe CTEs and
    the ann_pq codes/LUT CTEs composed — candidates are probed-cell
    members, ranked by summed int64 subspace distances, reranked by
    the shared normalized dot. Both trainers re-run on the raw parquet
    for $SPARK_GRAFT_ORACLE_SF_DIR exactly as the operator's one
    sketch does."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivf_train_centroids_numpy,
        pq_train_codebooks_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _IVFPQ_SQL_CACHE:
        return _IVFPQ_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    cents = ivf_train_centroids_numpy(
        ids, vecs, nlist=_IVF_NLIST, seed=_PQ_SEED
    )
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    cbs = pq_train_codebooks_numpy(
        ids, vecs, m_sub=_PQ_M, ncodes=_PQ_NCODES, seed=_PQ_SEED
    )
    cbq = np.floor(cbs * _IVF_QSCALE).astype(np.int64)
    dsub = cbq.shape[2]
    cent_rows = ",\n".join(
        f"({j}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
        for j, c in enumerate(ci)
    )
    cb_rows = ",\n".join(
        f"({mi}, {j}, [{', '.join(str(int(x)) for x in cbq[mi, j])}]"
        f"::BIGINT[])"
        for mi in range(cbq.shape[0])
        for j in range(cbq.shape[1])
    )
    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    sqd = (f"list_sum(list_transform(range(1, {dsub} + 1), "
           f"j -> (v[cb.m * {dsub} + j] - pv[j]) "
           f"* (v[cb.m * {dsub} + j] - pv[j])))")
    cos = unit_dot_sql("q.v", "c.v")
    sql = f"""
WITH {normalized_cte_sql()},
cents(cell, cv) AS (VALUES
{cent_rows}
),
cb(m, code, pv) AS (VALUES
{cb_rows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
dist AS (
  SELECT vi.vec_id, cents.cell, {sqdist} AS d
  FROM vi CROSS JOIN cents
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist) WHERE rn = 1
),
probe AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist WHERE vec_id < {_ANN_NQ}) WHERE rn <= 8
),
sub AS (
  SELECT vi.vec_id, cb.m, cb.code, {sqd} AS d
  FROM vi CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d, code) AS rn
    FROM sub) WHERE rn = 1
),
adc AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         sum(s.d) AS approx
  FROM probe p
  JOIN assign a ON a.cell = p.cell
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN sub s ON s.vec_id = p.vec_id AND s.m = c.m AND s.code = c.code
  WHERE a.vec_id != p.vec_id
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx, neighbor_id) AS rn
    FROM adc) WHERE rn <= {_PQ_RERANK}
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""
    _IVFPQ_SQL_CACHE[sf_dir] = sql
    return sql


_IVFPQR_SQL_CACHE: dict = {}


def _q_ann_ivfpq_residual(spark, sf_dir):
    """IVF+PQ with RESIDUAL (FAISS IVFADC) codes — the production ANN
    shape promoted to the correctness surface (r10, VERDICT r9 #1):
    codes quantize ``v − centroid[cell(v)]`` and each query builds one
    LUT per probed cell from ``q − centroid[cell]``. The r9 clustered-
    recall study measured raw codes collapsing to 0.154 recall@10 on
    hot clusters with residual encoding recovering 0.986 at byte-wide
    codebooks (tools/ann_recall_sf1.py --clustered, pytest-pinned in
    tests/test_similarity.py) — this row value-hash-verifies the
    residual pipeline itself: residuals subtract QUANTIZED vectors
    from QUANTIZED centroids (exact int64), codebooks train on the
    same integer grid via the shared numpy trainer (ivfpq_train_numpy,
    re-run by the oracle builder on the raw parquet), and ADC/rerank
    keep the parents' tie contracts. Same demonstration-size params as
    ann_ivfpq, so the two rows differ ONLY in the coding target."""
    from parquet_sampler_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=_IVF_NLIST, nprobe=8, m_sub=_PQ_M,
        ncodes=_PQ_NCODES, rerank=_PQ_RERANK, seed=_PQ_SEED,
        residual=True,
        model_cache=_IVFPQ_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir),
    )


def _sql_ann_ivfpq_residual(ncodes: int = _PQ_NCODES) -> str:
    """DuckDB twin of _q_ann_ivfpq_residual: the ann_ivfpq CTEs with
    the coding target switched to residuals — corpus rows code
    ``v − cv[assigned cell]`` against residual-trained codebook
    literals, and the per-query LUT becomes CELL-SPECIFIC (``qsub``:
    distances from ``q − cv[probed cell]``), joined on (query, cell,
    m, code). All integer arithmetic (quantized grid), so the ADC sums
    are exact in both engines. ``ncodes`` parameterizes the builder
    for the 8-bit production-width row (ann_ivfpq_residual8)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivfpq_train_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    ck = (sf_dir, ncodes)
    if ck in _IVFPQR_SQL_CACHE:
        return _IVFPQR_SQL_CACHE[ck]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    supers, cents, owner, cbs = ivfpq_train_numpy(
        ids, vecs, nlist=_IVF_NLIST, m_sub=_PQ_M, ncodes=ncodes,
        seed=_PQ_SEED, residual=True,
    )
    assert supers is None, "demonstration nlist is below the two-level cut"
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    cbq = np.floor(cbs * _IVF_QSCALE).astype(np.int64)
    dsub = cbq.shape[2]
    cent_rows = ",\n".join(
        f"({j}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
        for j, c in enumerate(ci)
    )
    cb_rows = ",\n".join(
        f"({mi}, {j}, [{', '.join(str(int(x)) for x in cbq[mi, j])}]"
        f"::BIGINT[])"
        for mi in range(cbq.shape[0])
        for j in range(cbq.shape[1])
    )
    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    res = ("list_transform(range(1, len(vi.v) + 1), "
           "j -> vi.v[j] - cents.cv[j])")
    sqd_r = (f"list_sum(list_transform(range(1, {dsub} + 1), "
             f"j -> (r.rv[cb.m * {dsub} + j] - pv[j]) "
             f"* (r.rv[cb.m * {dsub} + j] - pv[j])))")
    sqd_q = (f"list_sum(list_transform(range(1, {dsub} + 1), "
             f"j -> (q.rv[cb.m * {dsub} + j] - pv[j]) "
             f"* (q.rv[cb.m * {dsub} + j] - pv[j])))")
    cos = unit_dot_sql("q.v", "c.v")
    sql = f"""
WITH {normalized_cte_sql()},
cents(cell, cv) AS (VALUES
{cent_rows}
),
cb(m, code, pv) AS (VALUES
{cb_rows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
dist AS (
  SELECT vi.vec_id, cents.cell, {sqdist} AS d
  FROM vi CROSS JOIN cents
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist) WHERE rn = 1
),
probe AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM dist WHERE vec_id < {_ANN_NQ}) WHERE rn <= 8
),
rvec AS (
  SELECT vi.vec_id, a.cell, {res} AS rv
  FROM vi JOIN assign a ON a.vec_id = vi.vec_id
          JOIN cents ON cents.cell = a.cell
),
sub AS (
  SELECT r.vec_id, cb.m, cb.code, {sqd_r} AS d
  FROM rvec r CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d, code) AS rn
    FROM sub) WHERE rn = 1
),
qres AS (
  SELECT p.vec_id, p.cell, {res} AS rv
  FROM probe p JOIN vi ON vi.vec_id = p.vec_id
               JOIN cents ON cents.cell = p.cell
),
qsub AS (
  SELECT q.vec_id, q.cell, cb.m, cb.code, {sqd_q} AS d
  FROM qres q CROSS JOIN cb
),
adc AS (
  SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         sum(s.d) AS approx
  FROM probe p
  JOIN assign a ON a.cell = p.cell
  JOIN codes c ON c.vec_id = a.vec_id
  JOIN qsub s ON s.vec_id = p.vec_id AND s.cell = p.cell
             AND s.m = c.m AND s.code = c.code
  WHERE a.vec_id != p.vec_id
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx, neighbor_id) AS rn
    FROM adc) WHERE rn <= {_PQ_RERANK}
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""
    _IVFPQR_SQL_CACHE[ck] = sql
    return sql


def _q_ann_ivfpq_residual8(spark, sf_dir):
    """The FULL production ANN shape (r10): residual (IVFADC) coding
    at BYTE-wide codebooks (ncodes=256, the FAISS-standard
    byte-per-subspace width) — the exact configuration the clustered
    study named as the production rule (recall@10 0.986 where raw
    4-bit collapses to 0.154; pinned by the standing pytest gate).
    Identical pipeline to ann_ivfpq_residual, one knob wider; the
    parameterized oracle builder inlines the 16×256 integer codebook
    literals."""
    from parquet_sampler_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=_IVF_NLIST, nprobe=8, m_sub=_PQ_M,
        ncodes=256, rerank=_PQ_RERANK, seed=_PQ_SEED,
        residual=True,
        model_cache=_IVFPQ_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir, 256),
    )


# hierarchical-probe IVF: nlist ABOVE the two-level threshold, so both
# assignment and probing route super -> sub (VERDICT r9 #2)
_IVF_HIER_NLIST, _IVF_HIER_NPROBE, _IVF_HIER_NSUP = 128, 16, 4
_IVF_HIER_SQL_CACHE: dict[str, str] = {}


def _q_ann_ivf_hier(spark, sf_dir):
    """IVF top-k at nlist = 128 — ABOVE the two-level threshold, so
    the quantizer is the two-level fit and BOTH passes route
    hierarchically (r10, VERDICT r9 #2): corpus assignment goes
    nearest-super -> that super's subs (similarity._route_assign),
    and each query probes its 4 nearest supers then takes the 16
    nearest of THEIR subs (similarity._route_probe) — k1 +
    4·(nlist/k1) ≈ 55 integer distances per query instead of 128,
    the routing that keeps probe cost flat under the module's
    nlist ∝ corpus rule. The oracle replays the exact pick order as
    chained argmin CTEs over super/sub integer literals (the
    semantic_dedup builder's pattern, extended to the probe side)."""
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=_IVF_HIER_NLIST, nprobe=_IVF_HIER_NPROBE,
        seed=_IVF_SEED, nprobe_super=_IVF_HIER_NSUP,
        model_cache=_IVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _IVF_HIER_NLIST, _IVF_SEED),
    )


def _sql_ann_ivf_hier() -> str:
    """DuckDB twin of _q_ann_ivf_hier: super/sub centroid literals
    from the shared hierarchy trainer; assignment = nearest super
    (ties lowest s) then argmin over its subs (ties lowest cell);
    probing = top-4 supers per query then the 16 nearest of their
    subs — ORDER BY d, cell replays numpy's stable sort over
    ascending cell ids exactly."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivf_train_hierarchy_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _IVF_HIER_SQL_CACHE:
        return _IVF_HIER_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    supers, cents, owner = ivf_train_hierarchy_numpy(
        ids, vecs, nlist=_IVF_HIER_NLIST, seed=_IVF_SEED
    )
    if supers is None:  # corpus smaller than the two-level cut
        raise ValueError(
            f"ann_ivf_hier needs a corpus large enough for "
            f"nlist > 64 two-level routing; {sf_dir} fit flat"
        )
    si = np.floor(supers * _IVF_QSCALE).astype(np.int64)
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    sql = _ivf_hier_oracle_sql(
        si, ci, owner, _IVF_HIER_NPROBE, _IVF_HIER_NSUP
    )
    _IVF_HIER_SQL_CACHE[sf_dir] = sql
    return sql


def _ivf_hier_oracle_sql(si, ci, owner, nprobe: int, nsup: int) -> str:
    """Two-level-IVF oracle template shared by _sql_ann_ivf_hier and
    the sized sibling (when its corpus-derived nlist crosses the
    two-level threshold): super/sub centroid integer literals ->
    nearest-super assignment -> per-super sub argmin -> top-``nsup``
    supers per query -> the ``nprobe`` nearest of THEIR subs -> exact
    cosine rerank. ORDER BY d, cell replays numpy's stable sort over
    ascending cell ids exactly."""
    from parquet_sampler_spark.operators.similarity import _IVF_QSCALE

    def _vec_lit(c) -> str:
        return "[" + ", ".join(str(int(x)) for x in c) + "]::BIGINT[]"

    srows = ",\n".join(f"({j}, {_vec_lit(s)})" for j, s in enumerate(si))
    crows = ",\n".join(
        f"({j}, {int(owner[j])}, {_vec_lit(c)})" for j, c in enumerate(ci)
    )
    sdist = ("list_sum(list_transform(range(1, len(v) + 1), "
             "j -> (v[j] - sv[j]) * (v[j] - sv[j])))")
    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    cos = unit_dot_sql("q.v", "c.v")
    return f"""
WITH {normalized_cte_sql()},
supers(s, sv) AS (VALUES
{srows}
),
cents(cell, own, cv) AS (VALUES
{crows}
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM embeddings
),
sdistt AS (
  SELECT vi.vec_id, supers.s, {sdist} AS d
  FROM vi CROSS JOIN supers
),
sassign AS (
  SELECT vec_id, s FROM (
    SELECT vec_id, s,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, s) AS rn
    FROM sdistt) WHERE rn = 1
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vi.vec_id, cents.cell,
           row_number() OVER (PARTITION BY vi.vec_id
                              ORDER BY {sqdist}, cell) AS rn
    FROM vi JOIN sassign USING (vec_id)
            JOIN cents ON cents.own = sassign.s) WHERE rn = 1
),
squery AS (
  SELECT vec_id, s FROM (
    SELECT vec_id, s,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, s) AS rn
    FROM sdistt WHERE vec_id < {_ANN_NQ})
  WHERE rn <= {nsup}
),
probe AS (
  SELECT vec_id, cell FROM (
    SELECT vi.vec_id, cents.cell,
           row_number() OVER (PARTITION BY vi.vec_id
                              ORDER BY {sqdist}, cell) AS rn
    FROM vi JOIN squery ON squery.vec_id = vi.vec_id
            JOIN cents ON cents.own = squery.s)
  WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id != p.vec_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""


_ANN_SIZED_POP = 32        # target mean cell population (corpus / nlist)
_ANN_SIZED_NPROBE = 8
# bounded TOTAL training sketch (FAISS's max_points_per_centroid
# subsampling convention): at nlist ∝ corpus a fixed per-cell sketch
# would collect train_per_cell × nlist ∝ corpus rows to the driver —
# unbounded. Cap the whole sketch instead; per-cell sketch shrinks as
# the corpus grows (256 down to a floor of 4), which is exactly how
# FAISS trains million-cell quantizers.
_ANN_SIZED_SKETCH_CAP = 1 << 18
_ANN_SIZED_SQL_CACHE: dict[str, str] = {}


def _ann_sized_tpc(nlist: int) -> int:
    return max(4, min(256, _ANN_SIZED_SKETCH_CAP // nlist))


def _ann_sized_nlist(n: int) -> int:
    """The scale-true IVF operating point's derivation (r14, VERDICT
    r13 "What's missing #1"), shared VERBATIM by the Spark row and the
    oracle builder: nlist grows with the corpus (one cell per
    ``_ANN_SIZED_POP`` rows, floor 16) so the probed fraction
    ``nprobe/nlist`` shrinks as the corpus grows and rerank candidates
    per query stay ~``nprobe × _ANN_SIZED_POP`` — constant — instead
    of the fixed-nlist registered rows' corpus-proportional rerank
    volume (their measured decade-3 α 1.69-1.88, SCALING.md r13)."""
    return max(16, n // _ANN_SIZED_POP)


def _q_ann_ivf_sized(spark, sf_dir):
    """IVF top-k at the SIZED operating point — the registry row that
    carries the 100 TB ANN shape (r14): ``nlist`` is derived
    deterministically from the corpus row count (footer-only
    metadata read, no scan job) via :func:`_ann_sized_nlist`, so a
    user copying this row gets settings that keep candidates/query
    constant at any corpus size. Past ``_TWO_LEVEL_NLIST`` cells the
    quantizer fit and both passes route hierarchically (ivf_topk's
    built-in two-level path) — probe cost stays ~sqrt(nlist) per
    query. The oracle builder replays the SAME derivation from the
    same parquet footer count, re-trains the identical quantizer, and
    emits the flat or two-level template to match — hash-green at any
    sf without pinning nlist."""
    from parquet_sampler_spark.sources.io import metadata_row_count

    e = _t(spark, sf_dir, "embeddings")
    n = metadata_row_count(f"{sf_dir}/embeddings.parquet")
    nlist = _ann_sized_nlist(n)
    return ivf_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, nlist=nlist, nprobe=_ANN_SIZED_NPROBE,
        seed=_IVF_SEED, nprobe_super=_IVF_HIER_NSUP,
        train_per_cell=_ann_sized_tpc(nlist),
        model_cache=_IVF_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   nlist, _IVF_SEED),
    )


def _sql_ann_ivf_sized() -> str:
    """DuckDB twin of _q_ann_ivf_sized: derives nlist from the SAME
    corpus count (len of the parquet ids — identical to the footer
    row count), re-trains the shared hierarchy trainer, and emits the
    flat template below the two-level threshold or the hierarchical
    one above it — the derivation itself is what this row pins."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import (
        _IVF_QSCALE,
        ivf_train_hierarchy_numpy,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _ANN_SIZED_SQL_CACHE:
        return _ANN_SIZED_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    nlist = _ann_sized_nlist(len(ids))
    supers, cents, owner = ivf_train_hierarchy_numpy(
        ids, vecs, nlist=nlist, seed=_IVF_SEED,
        train_per_cell=_ann_sized_tpc(nlist),
    )
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)
    if supers is None:
        sql = _ivf_flat_oracle_sql(ci, _ANN_SIZED_NPROBE)
    else:
        si = np.floor(supers * _IVF_QSCALE).astype(np.int64)
        sql = _ivf_hier_oracle_sql(
            si, ci, owner, _ANN_SIZED_NPROBE, _IVF_HIER_NSUP
        )
    _ANN_SIZED_SQL_CACHE[sf_dir] = sql
    return sql


_ANN_LSH_BITS, _ANN_LSH_TABLES, _ANN_LSH_DIM, _ANN_LSH_SEED = 4, 16, 64, 42


def _q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k, full value-hash oracle: the
    hyperplanes are seed-generated constants independent of the data,
    so the oracle embeds the identical plane weights as SQL literals
    and replicates the ENTIRE pipeline — sign-bit bucketing, per-table
    candidate union, exact cosine rerank, tie-broken row_number — in
    DuckDB (see _sql_ann_lsh). Bucket signs are float64 dot signs;
    numpy's GEMM and DuckDB's list_sum may differ by ~1e-13 ulps, which
    flips a sign only for a dot that close to zero — none exist in this
    corpus (verified sf0.01 + sf0.1; deterministic, seeded). Recall vs
    brute force stays pinned in tests/test_similarity.py."""
    e = _t(spark, sf_dir, "embeddings")
    return lsh_topk(
        e, e.filter(F.col("vec_id") < _ANN_NQ), "vec_id", "embedding",
        k=_ANN_K, bits=_ANN_LSH_BITS, tables=_ANN_LSH_TABLES,
        dim=_ANN_LSH_DIM, seed=_ANN_LSH_SEED,
    )


def _sql_ann_lsh() -> str:
    """DuckDB twin of _q_ann_lsh: hyperplanes from the same seeded
    generator, embedded as literals (repr round-trips float64 exactly)."""
    from parquet_sampler_spark.operators.similarity import _hyperplanes

    rows = []
    for t in range(_ANN_LSH_TABLES):
        for b, w in enumerate(
            _hyperplanes(_ANN_LSH_DIM, _ANN_LSH_BITS,
                         _ANN_LSH_SEED + 1000 * t)
        ):
            wlist = "[" + ", ".join(repr(float(x)) for x in w) + "]"
            rows.append(f"({t}, {b}, {wlist}::DOUBLE[])")
    values = ",\n".join(rows)
    # raw-vector dot against the plane — only its SIGN is consumed
    pdot = ("list_sum(list_transform(range(1, len(p.w) + 1), "
            "j -> CAST(e.embedding[j] AS DOUBLE) * p.w[j]))")
    cos = unit_dot_sql("q.v", "c.v")
    return f"""
WITH {normalized_cte_sql()},
planes(tbl, bit, w) AS (VALUES
{values}
),
sigs AS (
  SELECT e.vec_id, p.tbl,
         CAST(sum(CASE WHEN {pdot} > 0
                       THEN 1 << p.bit ELSE 0 END) AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
),
cand AS (
  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
  FROM sigs qs JOIN sigs cs ON qs.tbl = cs.tbl AND qs.sig = cs.sig
  WHERE qs.vec_id < {_ANN_NQ} AND qs.vec_id != cs.vec_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS score,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY {cos} DESC, cand.neighbor_id) AS rank
  FROM cand JOIN normed q ON q.vec_id = cand.query_id
            JOIN normed c ON c.vec_id = cand.neighbor_id
) WHERE rank <= {_ANN_K}
"""


# ---------------------------------------------------------------------------
# OLAP: aggregation, window, time-window, sessionization
# ---------------------------------------------------------------------------

def _q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary. Money sums rounded to 2 decimals
    in both engines (double addition isn't associative; partial-agg
    order differs)."""
    li = _t(spark, sf_dir, "lineitem")
    # money/percent columns are fixed-point: sum exact integer cents /
    # ten-thousandths (order-independent — double sums can straddle a
    # rounding boundary when partial-agg order differs across engines)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    disc_c = F.round(F.col("l_discount") * 100).cast("bigint")
    disc_e4 = price_c * (100 - disc_c)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(disc_e4) / 10000.0).alias("sum_disc_price"),
            (F.sum(disc_c) / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
         AS sum_base_price,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS sum_disc_price,
       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def _q_topk_orders(spark, sf_dir):
    """Top-3 orders by totalprice per priority class — windowed top-k
    with total-order tie-break."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


_SQL_TOPK_ORDERS = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
"""


def _q_events_hourly(spark, sf_dir):
    """Tumbling 1-hour event rollup (batch analog of the streaming
    windowed agg in streaming/). ``value`` is quantized to e4
    fixed-point BEFORE summing — integer sums are order-independent, so
    the result is exact under any partial-agg order in any engine
    (round-after-sum can straddle a rounding boundary; the repo's exact
    fixed-point policy, commit 09d09c6)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            _value_e4_sum().alias("sum_value"),
        )
    )


def _value_e4_sum():
    """Order-independent sum of `value`: quantize each value to integer
    ten-thousandths, sum exactly in bigint, scale back."""
    return (
        F.sum(F.round(F.col("value") * 10000).cast("bigint")) / 10000.0
    )


_VALUE_E4_SUM_SQL = (
    "sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0"
)

_SQL_EVENTS_HOURLY = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, {_VALUE_E4_SUM_SQL} AS sum_value
FROM events GROUP BY 1, 2
"""

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _q_sessionize(spark, sf_dir):
    """Sessionization: per-user session count with a 30-minute
    inactivity gap — lag + cumulative-gap pattern, integer-exact."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        e.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


_SQL_SESSIONIZE = f"""
SELECT user_id,
       CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
              > {_SESSION_GAP_US}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
) GROUP BY user_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_stats": _q_text_stats,
        "text_clean": _q_text_clean,
        "dataset_split": _q_dataset_split,
        "corpus_pipeline": _q_corpus_pipeline,
        "repetition_stats": _q_repetition_stats,
        "contamination_pairs": _q_contamination_pairs,
        "decontaminated": _q_decontaminated,
        "doc_fingerprint": _q_doc_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "jaccard_pairs": _q_jaccard_pairs,
        "jaccard_pairs_capped": _q_jaccard_pairs_capped,
        "containment_pairs": _q_containment_pairs,
        "jaccard_dedup": _q_jaccard_dedup,
        "minhash_pairs": _q_minhash_pairs,
        "minhash_incremental": _q_minhash_incremental,
        "minhash_admit": _q_minhash_admit,
        "dedup_exact_incremental": _q_dedup_exact_incremental,
        "curation_incremental": _q_curation_incremental,
        "minhash_pairs_weighted": _q_minhash_pairs_weighted,
        "minhash_pairs_weighted_win": _q_minhash_pairs_weighted_win,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_incremental": _q_embedding_neardup_incremental,
        "embedding_neardup_incremental_ivf":
            _q_embedding_neardup_incremental_ivf,
        "embedding_neardup_incremental_ivf_sized":
            _q_embedding_neardup_incremental_ivf_sized,
        "embedding_admit": _q_embedding_admit,
        "embedding_neardup_block": _q_embedding_neardup_block,
        "ann_topk": _q_ann_topk,
        "ann_range": _q_ann_range,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ann_jl": _q_ann_jl,
        "ivf_coreset": _q_ivf_coreset,
        "ann_pq": _q_ann_pq,
        "ann_ivfpq": _q_ann_ivfpq,
        "ann_ivfpq_residual": _q_ann_ivfpq_residual,
        "ann_ivfpq_residual8": _q_ann_ivfpq_residual8,
        "ann_ivf_hier": _q_ann_ivf_hier,
        "ann_ivf_sized": _q_ann_ivf_sized,
        "pricing_summary": _q_pricing_summary,
        "topk_orders": _q_topk_orders,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
        **EXTRA_QUERIES,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frames": _q_multimodal_frames,
        "multimodal_resize": _q_multimodal_resize,
        "dup_clusters": _q_dup_clusters,
        "cluster_dedup": _q_cluster_dedup,
        "cluster_dedup_best": _q_cluster_dedup_best,
        "events_multi_rollup": _q_events_multi_rollup,
        "streaming_hourly": _q_streaming_hourly,
        "streaming_sample": _q_streaming_sample,
        "streaming_sessionize": _q_streaming_sessionize,
        "streaming_sessionize_native": _q_streaming_sessionize_native,
        "streaming_dedup": _q_streaming_dedup,
        "streaming_attribution": _q_streaming_attribution,
        "streaming_reservoir": _q_streaming_reservoir,
        "source_quota": _q_source_quota,
        "bigram_novelty": _q_bigram_novelty,
        "bigram_novelty_salted": _q_bigram_novelty_salted,
        "heavy_hitters": _q_heavy_hitters,
        "hll_rollup": _q_hll_rollup,
        "quantile_rollup": _q_quantile_rollup,
        "bucketed_join": _q_bucketed_join,
        "simhash_pairs_capped": _q_simhash_pairs_capped,
        "sample_weighted": _q_sample_weighted,
        "range_join_events": _q_range_join_events,
        "top_terms": _q_top_terms,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "funnel": _q_funnel,
        "sequence_pack": _q_sequence_pack,
        "corpus_mixture": _q_corpus_mixture,
        "vocab_topk": _q_vocab_topk,
        "cube_pricing": _q_cube_pricing,
        "salted_agg_events": _q_salted_agg_events,
        "salted_join_orders": _q_salted_join_orders,
        "zorder_scan": _q_zorder_scan,
        "dq_checks": _q_dq_checks,
        "dq_quarantine": _q_dq_quarantine,
        "aqp_revenue": _q_aqp_revenue,
        "split_leakage": _q_split_leakage,
        "streaming_reservoir_grouped": _q_streaming_reservoir_grouped,
        "streaming_quantiles": _q_streaming_quantiles,
        "schema_evolution": _q_schema_evolution,
        "streaming_heavy_hitters": _q_streaming_heavy_hitters,
        "streaming_late_watermark": _q_streaming_late_watermark,
        "compaction_scan": _q_compaction_scan,
        "winsorize_values": _q_winsorize_values,
        "gap_fill_events": _q_gap_fill_events,
        "rolling_window_events": _q_rolling_window_events,
        "value_histogram": _q_value_histogram,
        "pagerank_dups": _q_pagerank_dups,
        "dup_triangles": _q_dup_triangles,
        "udtf_chunk_windows": _q_udtf_chunk_windows,
        "normalize_values": _q_normalize_values,
        "hourly_deltas": _q_hourly_deltas,
        "twap_events": _q_twap_events,
        "mixture_drift": _q_mixture_drift,
        "table_checksum": _q_table_checksum,
        "scd2_history": _q_scd2_history,
        "dpp_scan": _q_dpp_scan,
        "manifest_prune": _q_manifest_prune,
        "ngram_dup_spans": _q_ngram_dup_spans,
        "winnow_pairs": _q_winnow_pairs,
        "winnow_pairs_capped": _q_winnow_pairs_capped,
        "winnow_pairs_censused": _q_winnow_pairs_censused,
        "decontaminate_spans": _q_decontaminate_spans,
        "decontaminate_scrub": _q_decontaminate_scrub,
        "bloom_decontaminate": _q_bloom_decontaminate,
        "streaming_enrich": _q_streaming_enrich,
        "pack_sequences": _q_pack_sequences,
        "mixture_resample": _q_mixture_resample,
        "semantic_dedup": _q_semantic_dedup,
        "asof_nearest": _q_asof_nearest,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "quality_rarity": _q_quality_rarity,
        "quality_rarity_inline": _q_quality_rarity_inline,
        "quality_rarity_holdout": _q_quality_rarity_holdout,
        "quality_rarity_bigram": _q_quality_rarity_bigram,
        "quality_rarity_bigram_inline": _q_quality_rarity_bigram_inline,
        "quality_rarity_trigram": _q_quality_rarity_trigram,
        "quality_rarity_trigram_inline": _q_quality_rarity_trigram_inline,
        "tfidf_topk": _q_tfidf_topk,
        "quality_gopher": _q_quality_gopher,
        "bm25_topk": _q_bm25_topk,
        "ngram_diversity": _q_ngram_diversity,
        "dsir_select": _q_dsir_select,
        "ccnet_buckets": _q_ccnet_buckets,
        "cooccurrence_topk": _q_cooccurrence_topk,
        "pack_sequences_bpe": _q_pack_sequences_bpe,
        "curation_pipeline": _q_curation_pipeline,
        "curation_pipeline_bpe": _q_curation_pipeline_bpe,
        "bpe_encode_holdout": _q_bpe_encode_holdout,
        "bpe_roundtrip": _q_bpe_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    # every queries_ext entry now carries an exact oracle: ann_ivf
    # (deterministic re-trained centroid literals) and
    # multimodal_resize (closed-form BMP byte stream + in-SQL crc32)
    # joined in r5.
    out = {
        "minhash_pairs": _SQL_JACCARD_PAIRS,
        "minhash_incremental": _SQL_MINHASH_INCREMENTAL,
        "minhash_admit": _SQL_MINHASH_ADMIT,
        "dedup_exact_incremental": _SQL_DEDUP_EXACT_INCREMENTAL,
        "curation_incremental": _sql_curation_incremental(),
        "minhash_pairs_weighted": _sql_minhash_pairs_weighted(),
        "minhash_pairs_weighted_win": _sql_minhash_pairs_weighted(),
        "multimodal_frames": _SQL_MULTIMODAL_FRAMES,
        "ann_lsh": _sql_ann_lsh(),
        "multimodal_resize": _sql_multimodal_resize(),
        "simhash_pairs": _sql_simhash_pairs(),
        "multimodal_features": _sql_multimodal_features(),
        "text_stats": _sql_text_stats(),
        "text_clean": _sql_text_clean(),
        "dataset_split": _sql_dataset_split(),
        "corpus_pipeline": _sql_corpus_pipeline(),
        "repetition_stats": _sql_repetition_stats(),
        "contamination_pairs": _SQL_CONTAMINATION_PAIRS,
        "decontaminated": _SQL_DECONTAMINATED,
        "doc_fingerprint": _sql_doc_fingerprint(),
        "dedup_exact": _SQL_DEDUP_EXACT,
        "jaccard_pairs": _SQL_JACCARD_PAIRS,
        "jaccard_pairs_capped": _SQL_JACCARD_PAIRS_CAPPED,
        "containment_pairs": _SQL_CONTAINMENT_PAIRS,
        "jaccard_dedup": _SQL_JACCARD_DEDUP,
        "embedding_neardup": _sql_embedding_neardup(),
        "embedding_neardup_incremental":
            _sql_embedding_neardup_incremental(),
        # the IVF-routed gate reproduces the sign-bit gate's exact
        # output on this corpus (recall 1 for the planted twins, exact
        # verify) — the oracle is shared verbatim
        "embedding_neardup_incremental_ivf":
            _sql_embedding_neardup_incremental(),
        # ... and the sized form keeps recall 1 for the qualifying set
        # at any nlist (unit twins share the argmin cell), so it shares
        # the same exact-cosine oracle too
        "embedding_neardup_incremental_ivf_sized":
            _sql_embedding_neardup_incremental(),
        "embedding_admit": _sql_embedding_admit(),
        "embedding_neardup_block": _sql_embedding_neardup_block(),
        "ann_topk": _sql_ann_topk(),
        "ann_range": _sql_ann_range(),
        "pricing_summary": _SQL_PRICING,
        "topk_orders": _SQL_TOPK_ORDERS,
        "events_hourly": _SQL_EVENTS_HOURLY,
        "sessionize": _SQL_SESSIONIZE,
        "sample_stratified": _sql_sample_stratified(),
        "asof_attribution": _SQL_ASOF,
        "asof_nearest": _SQL_ASOF_NEAREST,
        "bpe_merges": _sql_bpe_merges(),
        "bpe_encode": _sql_bpe_encode(),
        "anti_join_orders": _sql_anti_join_orders(),
        "rollup_pricing": _SQL_ROLLUP,
        "revenue_per_nation": _SQL_REVENUE,
        "dup_clusters": _SQL_DUP_CLUSTERS,
        "cluster_dedup": _SQL_CLUSTER_DEDUP,
        "cluster_dedup_best": _SQL_CLUSTER_DEDUP_BEST,
        "events_multi_rollup": _SQL_EVENTS_MULTI_ROLLUP,
        "streaming_hourly": _SQL_EVENTS_HOURLY,
        "streaming_sample": _sql_streaming_sample(),
        "streaming_sessionize": _SQL_STREAMING_SESSIONIZE,
        "streaming_sessionize_native": _SQL_STREAMING_SESSIONIZE,
        "streaming_dedup": _SQL_STREAMING_DEDUP,
        "streaming_attribution": _SQL_STREAMING_ATTRIBUTION,
        "streaming_reservoir": _sql_streaming_reservoir(),
        "source_quota": _sql_source_quota(),
        "bigram_novelty": _sql_bigram_novelty(),
        "bigram_novelty_salted": _sql_bigram_novelty(),
        "heavy_hitters": _SQL_HEAVY_HITTERS,
        "hll_rollup": _SQL_HLL_ROLLUP,
        "quantile_rollup": _SQL_QUANTILE_ROLLUP,
        "bucketed_join": _SQL_BUCKETED_JOIN,
        "simhash_pairs_capped": _sql_simhash_pairs(
            max_band_df=_SIMHASH_BAND_CAP
        ),
        "sample_weighted": _sql_sample_weighted(),
        "range_join_events": _SQL_RANGE_JOIN_EVENTS,
        "top_terms": _SQL_TOP_TERMS,
        "edit_distance_pairs": _SQL_EDIT_DISTANCE_PAIRS,
        "funnel": _SQL_FUNNEL,
        "sequence_pack": _sql_sequence_pack(),
        "corpus_mixture": _sql_corpus_mixture(),
        "vocab_topk": _SQL_VOCAB_TOPK,
        "cube_pricing": _SQL_CUBE_PRICING,
        "salted_agg_events": _SQL_SALTED_AGG_EVENTS,
        "salted_join_orders": _SQL_SALTED_JOIN_ORDERS,
        "zorder_scan": _SQL_ZORDER_SCAN,
        "dq_checks": _SQL_DQ_CHECKS,
        "dq_quarantine": _SQL_DQ_QUARANTINE,
        "aqp_revenue": _sql_aqp_revenue(),
        "split_leakage": _sql_split_leakage(),
        "streaming_reservoir_grouped": _sql_streaming_reservoir_grouped(),
        "streaming_quantiles": _SQL_QUANTILE_ROLLUP,
        "schema_evolution": _SQL_SCHEMA_EVOLUTION,
        "streaming_heavy_hitters": _SQL_HEAVY_HITTERS,
        "streaming_late_watermark": _SQL_STREAMING_LATE_WATERMARK,
        "compaction_scan": _SQL_COMPACTION_SCAN,
        "winsorize_values": _SQL_WINSORIZE_VALUES,
        "gap_fill_events": _SQL_GAP_FILL_EVENTS,
        "rolling_window_events": _SQL_ROLLING_WINDOW_EVENTS,
        "value_histogram": _SQL_VALUE_HISTOGRAM,
        "pagerank_dups": _sql_pagerank_dups(),
        "dup_triangles": _sql_dup_triangles(),
        "udtf_chunk_windows": _SQL_UDTF_CHUNK_WINDOWS,
        "normalize_values": _SQL_NORMALIZE_VALUES,
        "hourly_deltas": _SQL_HOURLY_DELTAS,
        "twap_events": _SQL_TWAP_EVENTS,
        "mixture_drift": _sql_mixture_drift(),
        "table_checksum": _sql_table_checksum(),
        "scd2_history": _SQL_SCD2_HISTORY,
        "dpp_scan": _sql_dpp_scan(),
        "manifest_prune": _SQL_MANIFEST_PRUNE,
        "ngram_dup_spans": _sql_ngram_dup_spans(),
        "winnow_pairs": _sql_winnow_pairs(),
        "winnow_pairs_capped": _sql_winnow_pairs(cap=_WINNOW_CAP),
        "winnow_pairs_censused": _sql_winnow_pairs(census=True),
        "decontaminate_spans": _sql_decontaminate_spans(),
        "decontaminate_scrub": _sql_decontaminate_scrub(),
        "bloom_decontaminate": _sql_bloom_decontaminate(),
        "streaming_enrich": _SQL_STREAMING_ENRICH,
        "pack_sequences": _sql_pack_sequences(),
        "mixture_resample": _sql_mixture_resample(),
        "semantic_dedup": _sql_semantic_dedup(),
        "quality_rarity": _sql_quality_rarity(),
        "quality_rarity_inline": _sql_quality_rarity(),
        "quality_rarity_holdout": _sql_quality_rarity_holdout(),
        "quality_rarity_bigram": _sql_quality_rarity_bigram(),
        "quality_rarity_bigram_inline": _sql_quality_rarity_bigram(),
        "quality_rarity_trigram": _sql_quality_rarity_trigram(),
        "quality_rarity_trigram_inline": _sql_quality_rarity_trigram(),
        "tfidf_topk": _sql_tfidf_topk(),
        "quality_gopher": _sql_quality_gopher(),
        "bm25_topk": _sql_bm25_topk(),
        "ngram_diversity": _sql_ngram_diversity(),
        "dsir_select": _sql_dsir_select(),
        "ccnet_buckets": _sql_ccnet_buckets(),
        "cooccurrence_topk": _sql_cooccurrence_topk(),
        "pack_sequences_bpe": _sql_pack_sequences_bpe(),
        "curation_pipeline": _sql_curation_pipeline(),
        "curation_pipeline_bpe": _sql_curation_pipeline_bpe(),
        "bpe_encode_holdout": _sql_bpe_encode_holdout(),
        "bpe_roundtrip": _sql_bpe_roundtrip(),
        "ann_jl": _sql_ann_jl(),
    }
    # ann_ivf's oracle is trained from the comparison sf dir's parquet;
    # if that dir is absent (unusual environment), degrade the one
    # query to a rows-only check instead of breaking the whole oracle
    # contract (queries() consults oracle_sql() for capture ordering)
    # ann_pq / ann_ivfpq share ann_ivf's degrade contract (trained
    # oracle — an unreadable embeddings file must not take down every
    # oracle)
    for name, builder in (
        ("ann_pq", _sql_ann_pq), ("ann_ivfpq", _sql_ann_ivfpq),
        ("ann_ivfpq_residual", _sql_ann_ivfpq_residual),
        ("ann_ivfpq_residual8",
         lambda: _sql_ann_ivfpq_residual(ncodes=256)),
        ("ann_ivf_hier", _sql_ann_ivf_hier),
        ("ann_ivf_sized", _sql_ann_ivf_sized),
        ("ivf_coreset", _sql_ivf_coreset),
    ):
        try:
            out[name] = builder()
        except Exception as ex:  # noqa: BLE001 — same as ann_ivf
            import sys

            print(
                f"warning: {name} oracle unavailable ({ex!r}); "
                "degrading to rows-only",
                file=sys.stderr,
            )
    try:
        out["ann_ivf"] = _sql_ann_ivf()
    except Exception as ex:  # noqa: BLE001 — pyarrow raises
        # ArrowInvalid/KeyError (not just OSError) on a corrupt or
        # schema-drifted embeddings file; one unreadable file must
        # degrade ann_ivf to rows-only, not take down every oracle
        import sys

        print(
            f"warning: ann_ivf oracle unavailable ({ex!r}); "
            "degrading to rows-only",
            file=sys.stderr,
        )
    return out

# ---------------------------------------------------------------------------
# OLAP round 2: stratified sample, as-of join, anti-join, rollup, multi-join
# ---------------------------------------------------------------------------

_STRAT_RATIO = 0.01


def _q_sample_stratified(spark, sf_dir):
    """Exact per-stratum sampling of orders by priority class — group
    proportions preserved exactly (operators/sample.py)."""
    from parquet_sampler_spark.operators.sample import sample_stratified

    return sample_stratified(
        _t(spark, sf_dir, "orders"), _STRAT_RATIO,
        strata_cols=["o_orderpriority"], seed=7, key_cols=["o_orderkey"],
    )


def _sql_sample_stratified():
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql

    pr = lehmer_hash_sql(["o_orderkey"], 7)
    return f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY {pr}, o_orderkey) AS psx_rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS psx_n
  FROM orders
) WHERE psx_rn <= CAST(floor(psx_n * {_STRAT_RATIO}) AS BIGINT)
"""


def _q_asof_attribution(spark, sf_dir):
    """Attribute each purchase to the user's most recent click at or
    before it (as-of join, operators/asof.py). Timestamps are compared
    and emitted as epoch microseconds so both engines operate on the
    identical truncated clock."""
    from parquet_sampler_spark.operators.asof import asof_join

    e = _events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id").alias("click_event_id")
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts_us", "ts_us",
        ["click_event_id"], how="inner",
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("asof_ts_us").alias("click_ts_us"),
        F.col("asof_click_event_id").alias("click_event_id"),
    )


_SQL_ASOF = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS click_event_id
           FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_us,
       c.ts_us AS click_ts_us, c.click_event_id
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""


def _q_anti_join_orders(spark, sf_dir):
    """Left anti-join: orders with NO sampled lineitem — the complement
    of the reference's semi-join reduction (same operator, how flag)."""
    from parquet_sampler_spark.operators.semijoin import semi_join_reduce
    from parquet_sampler_spark.queries import lineitem_sample

    s = lineitem_sample(spark, sf_dir)
    return semi_join_reduce(
        _t(spark, sf_dir, "orders"), "o_orderkey", s, "l_orderkey",
        how="left_anti",
    )


def _sql_anti_join_orders():
    from parquet_sampler_spark.queries import _sample_cte

    return (
        f"WITH {_sample_cte()} SELECT o.* FROM orders o WHERE NOT EXISTS "
        "(SELECT 1 FROM lineitem_sample s WHERE s.l_orderkey = o.o_orderkey)"
    )


def _q_rollup_pricing(spark, sf_dir):
    """ROLLUP aggregation: subtotals per returnflag and grand total.
    gid disambiguates NULL-as-subtotal from NULL data; like
    cube_pricing it is assembled from single-column grouping() flags
    on both engines (multi-arg GROUPING bit packing is
    version-sensitive in DuckDB)."""
    li = _t(spark, sf_dir, "lineitem")
    gid = (
        F.grouping("l_returnflag").cast("bigint") * 2
        + F.grouping("l_linestatus").cast("bigint")
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            # must be computed inside the grouping aggregate
            gid.alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "sum_qty", "n_rows", "gid")
    )


_SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows,
       CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
            AS BIGINT) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _q_revenue_per_nation(spark, sf_dir):
    """Multi-join aggregate: lineitem⋈orders⋈customer⋈nation revenue
    rollup. Only the genuine dimension (nation, 25 rows at any sf) gets
    a broadcast hint; orders/customer scale with the fact table, so
    their join strategy is left to AQE — at bench sf it still picks
    broadcast from runtime sizes, at 100 TB it shuffles instead of
    blowing the driver."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            (F.sum(rev_e4) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SQL_REVENUE = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
           (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


EXTRA_QUERIES = {
    "sample_stratified": _q_sample_stratified,
    "asof_attribution": _q_asof_attribution,
    "anti_join_orders": _q_anti_join_orders,
    "rollup_pricing": _q_rollup_pricing,
    "revenue_per_nation": _q_revenue_per_nation,
}

def _q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing as a query: deterministic synthetic media
    (seeded — no external files; image rows are REAL encoded BMPs) →
    mapInPandas feature extraction with actual pixel decode for images
    (``deterministic_fake=False``; audio/video keep the byte-derived
    fake — no a/v codec in this environment). Full value-hash oracle:
    payload bytes/pixels are closed-form in (seed, media_id, position)
    and every feature is an exact integer sum + fixed float64
    expression, so _sql_multimodal_features recomputes all of it from
    the generating formulas. Schema/batch/pixel contracts stay pinned
    in tests/test_multimodal.py.

    The ``feature array<float>`` column is exploded to scalar
    ``(feat_idx, feat_value)`` rows — the driver's canonicalizer sorts
    rows and requires hashable (scalar) cells, and an exploded long-form
    output is also the joinable shape downstream consumers want."""
    from parquet_sampler_spark.multimodal.media import (
        extract_features,
        synthetic_media,
    )

    feats = extract_features(
        synthetic_media(spark, n=64), deterministic_fake=False
    )
    return feats.select(
        "media_id", "kind", "n_bytes",
        F.posexplode("feature").alias("feat_idx", "feat_value"),
    )

def _sql_multimodal_features() -> str:
    """DuckDB twin of _q_multimodal_features: synthetic_media payloads
    are closed-form in (seed=7, media_id, position), and
    _pixel_features/_decode_fake are exact integer sums followed by a
    fixed float64 expression — so the oracle recomputes every feature
    from the generating formulas, no binary decode needed. BMP
    encode→decode is lossless (pure uint8 codec), making the pixel
    formula and the decoded array identical."""
    h, w, n = 48, 64, 48 * 64
    mean_den = repr(255.0 * n)              # per-channel mean
    all_den = repr(255.0 * 3 * n)           # global mean
    e2_den = repr(65025.0 * 3 * n)          # global E[x²], 65025 = 255²
    qn = (h // 2) * (w // 2)
    q_den = repr(765.0 * qn)                # quadrant luminance mean
    img_f = (
        f"CASE r.k "
        f"WHEN 0 THEN CAST(sr / {mean_den} AS REAL) "
        f"WHEN 1 THEN CAST(sg / {mean_den} AS REAL) "
        f"WHEN 2 THEN CAST(sb / {mean_den} AS REAL) "
        f"WHEN 3 THEN CAST(least(sqrt(greatest("
        f"s2 / {e2_den} - ((sr + sg + sb) / {all_den}) * "
        f"((sr + sg + sb) / {all_den}), 0.0)) * 2.0, 1.0) AS REAL) "
        f"WHEN 4 THEN CAST(q0 / {q_den} AS REAL) "
        f"WHEN 5 THEN CAST(q1 / {q_den} AS REAL) "
        f"WHEN 6 THEN CAST(q2 / {q_den} AS REAL) "
        f"WHEN 7 THEN CAST(q3 / {q_den} AS REAL) END"
    )
    # BMP size: 54-byte header + h rows of 4-byte-padded BGR
    bmp_bytes = 54 + h * (((w * 3) + 3) // 4 * 4)
    return f"""
WITH m AS (
  SELECT CAST(i AS BIGINT) AS media_id, i,
         CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind
  FROM range(0, 64) t(i)
),
imgpx AS (
  SELECT m.i, x.x AS x, y.y AS y,
         (x.x * 7 + y.y * 13 + (7 + m.i) * 31) % 256 AS r,
         (x.x * 3 + y.y * 5 + (7 + m.i) * 17) % 256 AS g,
         (x.x * 11 + y.y * 2 + (7 + m.i) * 23) % 256 AS b
  FROM m CROSS JOIN range({w}) x(x) CROSS JOIN range({h}) y(y)
  WHERE m.i % 3 = 0
),
imgs AS (
  SELECT i, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb,
         sum(r*r + g*g + b*b) AS s2,
         sum(CASE WHEN y < {h//2} AND x < {w//2} THEN r+g+b ELSE 0 END) AS q0,
         sum(CASE WHEN y < {h//2} AND x >= {w//2} THEN r+g+b ELSE 0 END) AS q1,
         sum(CASE WHEN y >= {h//2} AND x < {w//2} THEN r+g+b ELSE 0 END) AS q2,
         sum(CASE WHEN y >= {h//2} AND x >= {w//2} THEN r+g+b ELSE 0 END) AS q3
  FROM imgpx GROUP BY i
),
av AS (SELECT i, 64 + i AS len FROM m WHERE i % 3 <> 0),
avchunks AS (
  -- np.array_split(arr, 8): first len%8 chunks get len//8+1 elements
  SELECT av.i, r.k AS k,
         CASE WHEN r.k < len % 8 THEN len // 8 + 1
              ELSE len // 8 END AS sz,
         CASE WHEN r.k < len % 8 THEN r.k * (len // 8 + 1)
              ELSE (len % 8) * (len // 8 + 1)
                   + (r.k - len % 8) * (len // 8) END AS st
  FROM av CROSS JOIN range(8) r(k)
),
avf AS (
  -- payload byte j of media i: (7*97 + i*31 + j*7) % 256
  SELECT c.i, c.k,
         CAST((sum((679 + c.i * 31 + j.j * 7) % 256) % 997) / 997.0
              AS REAL) AS v
  FROM avchunks c CROSS JOIN range(0, 200) j(j)
  WHERE j.j >= c.st AND j.j < c.st + c.sz
  GROUP BY c.i, c.k
)
SELECT m.media_id, m.kind,
       CAST(CASE WHEN m.i % 3 = 0 THEN {bmp_bytes}
                 ELSE 64 + m.i END AS BIGINT) AS n_bytes,
       CAST(r.k AS INTEGER) AS feat_idx,
       CASE WHEN m.i % 3 = 0 THEN {img_f}
            ELSE (SELECT v FROM avf WHERE avf.i = m.i AND avf.k = r.k)
       END AS feat_value
FROM m CROSS JOIN range(8) r(k)
LEFT JOIN imgs ON imgs.i = m.i
"""


def _q_multimodal_frames(spark, sf_dir):
    """Video frame-sampling plan (media.frame_sample): one row per
    sampled frame timestamp, non-video rows pass through with a NULL
    frame. The output is pure metadata arithmetic (no binary column),
    and synthetic_media's metadata is closed-form in media_id — so the
    oracle recomputes the media table and the frame grid entirely in
    SQL: a full value-hash row, not rows-only."""
    from parquet_sampler_spark.multimodal.media import (
        frame_sample,
        synthetic_media,
    )

    return frame_sample(synthetic_media(spark, n=64), every_ms=1000)


# synthetic_media metadata (media.py): kind cycles image/audio/video by
# media_id % 3; only video rows carry duration_ms = 5000. Spark's
# sequence(0, d, step) is end-INCLUSIVE; DuckDB range() is exclusive,
# hence duration_ms + 1.
_SQL_MULTIMODAL_FRAMES = """
WITH media AS (
  SELECT CAST(i AS BIGINT) AS media_id,
         CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CASE WHEN i % 3 = 2 THEN CAST(5000 AS BIGINT) END AS duration_ms
  FROM range(0, 64) t(i)
)
SELECT media_id, kind,
       unnest(CASE WHEN kind = 'video' AND duration_ms IS NOT NULL
                   THEN range(0, duration_ms + 1, 1000)
                   ELSE [CAST(NULL AS BIGINT)] END) AS frame_ts
FROM media
"""


def _q_multimodal_resize(spark, sf_dir):
    """Image resize over Arrow batches (media.resize_images) on the
    REAL pixel path: BMP decode → box-average resample → BMP re-encode
    (``deterministic_fake=False``). Surfaced as scalar columns (byte
    length + crc32 of the resized payload — the canonicalizer needs
    hashable cells, and the checksum pins the resampled bytes).
    Full value-hash oracle since r5: _sql_multimodal_resize rebuilds
    the exact BMP byte stream from the closed-form pixel formulas and
    computes the same IEEE crc32 in SQL. A known checkerboard
    downsample stays value-checked in tests/test_multimodal.py."""
    from parquet_sampler_spark.multimodal.media import (
        resize_images,
        synthetic_media,
    )

    r = resize_images(
        synthetic_media(spark, n=64), 16, 8, deterministic_fake=False
    )
    return r.select(
        "media_id", "kind", "width", "height",
        F.length("payload").alias("n_bytes"),
        F.crc32("payload").alias("payload_crc"),
    )


def _sql_multimodal_resize() -> str:
    """DuckDB twin of _q_multimodal_resize — full value-hash oracle
    since r5. Everything is closed-form integer arithmetic: source
    pixels are modular-linear in (seed, media_id, x, y); the box
    resample (48×64 → 8×16, exact 6×4 boxes) is a round-half-up
    integer mean; the re-encoded payload is the constant 54-byte BMP
    header plus bottom-up BGR rows (stride 48 = no padding); and
    crc32 (the same IEEE polynomial as Spark's F.crc32 /
    java.util.zip.CRC32) runs as a list_reduce over the byte list with
    the 256-entry table inlined. Audio/video rows pass through: their
    payload bytes are closed-form in (seed, media_id, j)."""
    import struct

    tw, th, sw, sh = 16, 8, 64, 48
    bw, bh = sw // tw, sh // th            # exact 4×6 boxes
    stride = (tw * 3 + 3) & ~3             # 48 — no row padding
    img_size = stride * th
    n_img_bytes = 54 + img_size
    header = struct.pack("<2sIHHI", b"BM", n_img_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, tw, th, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    hdr_list = "[" + ", ".join(
        f"CAST({b} AS BIGINT)" for b in header + info
    ) + "]"
    tab = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tab.append(c)
    crc_tab = "[" + ", ".join(
        f"CAST({x} AS BIGINT)" for x in tab
    ) + "]"

    def crc_of(byte_list: str) -> str:
        return (
            f"xor(list_reduce("
            f"list_prepend(CAST(4294967295 AS BIGINT), {byte_list}), "
            f"(acc, b) -> xor(acc >> 8, tab[(xor(acc, b) & 255) + 1])), "
            f"CAST(4294967295 AS BIGINT))"
        )

    return f"""
WITH t AS (SELECT {crc_tab} AS tab),
m AS (
  SELECT CAST(i AS BIGINT) AS media_id, i,
         CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind
  FROM range(0, 64) t(i)
),
rs AS (
  -- box-average resample straight from the pixel formula: boxes align
  -- exactly (ty = y // {bh}, tx = x // {bw}), round half up
  SELECT i, ty, tx,
         (sum(pr) + {bw * bh // 2}) // {bw * bh} AS r,
         (sum(pg) + {bw * bh // 2}) // {bw * bh} AS g,
         (sum(pb) + {bw * bh // 2}) // {bw * bh} AS b
  FROM (
    SELECT m.i, y.y // {bh} AS ty, x.x // {bw} AS tx,
           (x.x * 7 + y.y * 13 + (7 + m.i) * 31) % 256 AS pr,
           (x.x * 3 + y.y * 5 + (7 + m.i) * 17) % 256 AS pg,
           (x.x * 11 + y.y * 2 + (7 + m.i) * 23) % 256 AS pb
    FROM m CROSS JOIN range({sw}) x(x) CROSS JOIN range({sh}) y(y)
    WHERE m.i % 3 = 0
  ) GROUP BY i, ty, tx
),
body AS (
  -- serialize: bottom-up rows (storage row yy = {th - 1} - ty), BGR
  SELECT i, list(CAST(v AS BIGINT)
                 ORDER BY ({th - 1} - ty) * {tw * 3} + tx * 3 + c) AS bl
  FROM (
    SELECT i, ty, tx, c.c AS c,
           CASE c.c WHEN 0 THEN b WHEN 1 THEN g ELSE r END AS v
    FROM rs CROSS JOIN range(3) c(c)
  ) GROUP BY i
),
imgcrc AS (
  SELECT i, {crc_of(f"list_concat({hdr_list}, bl)")} AS crc
  FROM body, t
),
avcrc AS (
  SELECT i, {crc_of(
      "list_transform(range(0, 64 + i), "
      "j -> (679 + i * 31 + j * 7) % 256)")} AS crc
  FROM m, t WHERE i % 3 <> 0
)
SELECT m.media_id, m.kind,
       CAST(CASE WHEN m.i % 3 = 0 THEN {tw} END AS INTEGER) AS width,
       CAST(CASE WHEN m.i % 3 = 0 THEN {th} END AS INTEGER) AS height,
       CAST(CASE WHEN m.i % 3 = 0 THEN {n_img_bytes}
                 ELSE 64 + m.i END AS INTEGER) AS n_bytes,
       CAST(CASE WHEN m.i % 3 = 0 THEN ic.crc ELSE ac.crc END
            AS BIGINT) AS payload_crc
FROM m LEFT JOIN imgcrc ic ON ic.i = m.i
       LEFT JOIN avcrc ac ON ac.i = m.i
"""


def _env_checkpoint() -> dict:
    """Registered-query-level fault-tolerance toggle (VERDICT r06 task
    6) for the iterative graph queries (dup_clusters, cluster_dedup,
    pagerank_dups): set ``PSX_CHECKPOINT_DIR`` to an HDFS/object-store
    path and their lineage truncation switches from
    ``localCheckpoint()`` (fast, dies with the executor) to reliable
    ``checkpoint()`` into that dir — the 100 TB default — with no code
    edits. ``PSX_CHECKPOINT_INTERVAL`` (default 5) tunes how many
    label-prop rounds run between truncations; the near-dup graph here
    converges in fewer than 5 rounds, so exercising the reliable path
    on this corpus means lowering the interval too (what the pytest
    does)."""
    import os

    kw: dict = {}
    d = os.environ.get("PSX_CHECKPOINT_DIR")
    if d:
        kw["checkpoint_dir"] = d
    iv = os.environ.get("PSX_CHECKPOINT_INTERVAL")
    if iv:
        kw["checkpoint_interval"] = int(iv)
    return kw


def _q_dup_clusters(spark, sf_dir):
    """Connected-components duplicate clustering: every doc labeled
    with the min id of its component. Built on the LSH-verified pair
    graph (see :func:`_dup_graph_cached` — identical pairs, linear
    build; the exact join goes super-linear at the sf1 step).
    ``PSX_CHECKPOINT_DIR`` routes lineage truncation to reliable
    storage (see :func:`_env_checkpoint`)."""
    from parquet_sampler_spark.operators.dedup import duplicate_clusters

    d = _t(spark, sf_dir, "documents")
    return duplicate_clusters(
        d, _dup_graph_cached(spark, sf_dir), "doc_id",
        **_env_checkpoint(),
    ).select("doc_id", "cluster")


# min-label propagation unrolled 4 rounds — the duplicate graph's max
# component diameter is ≤ 3 at every sf (verified), so 4 rounds is past
# the fixpoint the Spark loop converges to.
_SQL_CC_CTES = (
    _SQL_SHINGLES2 + """,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM jpairs WHERE jaccard >= 0.5
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jpairs WHERE jaccard >= 0.5
),
l0 AS (SELECT doc_id, doc_id AS cluster FROM documents),
l1 AS (SELECT d.doc_id,
              least(d.cluster, coalesce(m.ml, d.cluster)) AS cluster
       FROM l0 d LEFT JOIN (
         SELECT e.src, min(l.cluster) AS ml FROM edges e
         JOIN l0 l ON l.doc_id = e.dst GROUP BY e.src) m
       ON m.src = d.doc_id),
l2 AS (SELECT d.doc_id,
              least(d.cluster, coalesce(m.ml, d.cluster)) AS cluster
       FROM l1 d LEFT JOIN (
         SELECT e.src, min(l.cluster) AS ml FROM edges e
         JOIN l1 l ON l.doc_id = e.dst GROUP BY e.src) m
       ON m.src = d.doc_id),
l3 AS (SELECT d.doc_id,
              least(d.cluster, coalesce(m.ml, d.cluster)) AS cluster
       FROM l2 d LEFT JOIN (
         SELECT e.src, min(l.cluster) AS ml FROM edges e
         JOIN l2 l ON l.doc_id = e.dst GROUP BY e.src) m
       ON m.src = d.doc_id),
l4 AS (SELECT d.doc_id,
              least(d.cluster, coalesce(m.ml, d.cluster)) AS cluster
       FROM l3 d LEFT JOIN (
         SELECT e.src, min(l.cluster) AS ml FROM edges e
         JOIN l3 l ON l.doc_id = e.dst GROUP BY e.src) m
       ON m.src = d.doc_id)
""")

_SQL_DUP_CLUSTERS = "WITH " + _SQL_CC_CTES + "SELECT doc_id, cluster FROM l4"

# transitive-closure dedup: keep exactly the min-id representative of
# every duplicate component
_SQL_CLUSTER_DEDUP = (
    "WITH " + _SQL_CC_CTES
    + "SELECT d.* FROM documents d JOIN l4 "
      "ON l4.doc_id = d.doc_id AND l4.cluster = d.doc_id"
)


_SQL_CLUSTER_DEDUP_BEST = (
    "WITH " + _SQL_CC_CTES
    + f""",
q AS (SELECT doc_id, {TX.quality_score_sql('text')} AS quality
      FROM documents),
r AS (
  SELECT l4.doc_id, row_number() OVER (
           PARTITION BY l4.cluster
           ORDER BY q.quality DESC, l4.doc_id
         ) AS rn
  FROM l4 JOIN q ON q.doc_id = l4.doc_id
)
SELECT d.doc_id, q2.quality
FROM documents d
JOIN r ON r.doc_id = d.doc_id AND r.rn = 1
JOIN q q2 ON q2.doc_id = d.doc_id
"""
)


def _q_cluster_dedup_best(spark, sf_dir):
    """Best-copy dedup (r10): of every duplicate cluster keep the
    HIGHEST-quality document (composite quality score; ties -> min
    doc_id) instead of cluster_dedup's accidental min-id — the keeper
    policy a production pipeline wants. Same duplicate graph and
    label propagation; one extra id-sized join + a per-cluster
    WindowGroupLimit argmax."""
    from parquet_sampler_spark.operators.dedup import cluster_dedup_best

    d = _t(spark, sf_dir, "documents").withColumn(
        "quality", TX.quality_score("text")
    )
    return cluster_dedup_best(
        d, _dup_graph_cached(spark, sf_dir), "doc_id", "quality",
        **_env_checkpoint(),
    ).select("doc_id", "quality")


def _q_cluster_dedup(spark, sf_dir):
    """Connected-components dedup: one survivor (the min-id
    representative) per duplicate cluster — the transitive-closure
    analog of the greedy jaccard_dedup (for a chain a—b—c it keeps only
    a; greedy keeps a AND c)."""
    from parquet_sampler_spark.operators.dedup import cluster_dedup

    d = _t(spark, sf_dir, "documents")
    return cluster_dedup(
        d, _dup_graph_cached(spark, sf_dir), "doc_id",
        **_env_checkpoint(),
    )


# ---------------------------------------------------------------------------
# Streaming with a batch oracle
# ---------------------------------------------------------------------------

_STREAM_SEQ = iter(range(1_000_000))


@contextmanager
def _stream_shuffle(spark, n: int | None = None):
    """Scope a lower ``spark.sql.shuffle.partitions`` around a streaming
    drain. Stateful streaming cost here is dominated by per-partition
    state stores (a stream-stream join maintains four per partition;
    measured at sf0.1: 32 partitions -> 10.3 s, 8 -> 3.2 s for the
    attribution join, with identical output — partitioning never
    changes results). Local drains want few, fat state partitions; on a
    real cluster size this to the executor count instead
    (``SPARK_GRAFT_STREAM_SHUFFLE`` overrides). The conf is restored on
    exit so batch queries keep the session's shuffle width; it binds at
    stream START, so the whole build+drain sits inside the scope."""
    import os

    if n is None:
        n = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _stream_sample_staging(spark, sf_dir) -> str:
    """Stage orders as two chunk files for the streaming-sample
    replay (idempotent per session tmp dir). Split out so the scale
    harnesses can charge the staging WRITE — data-volume bound — to a
    setup row and time the stream drain itself."""
    import glob
    import os
    import shutil

    from parquet_sampler_spark.queries import session_tmp_dir

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_sample_{tag}")
    data = os.path.join(d, "data")
    if not os.path.isdir(data):
        # Stage BOTH chunks into a temp dir and rename it into place
        # once complete: `data` existing is the done marker, so a
        # failure between the two chunk writes must not leave a
        # half-staged directory a later call would accept (r12
        # ADVICE — the drain would then cover one chunk and mismatch
        # its oracle). os.rename is atomic within the tmp filesystem.
        pend = data + ".staging"
        if os.path.isdir(pend):
            shutil.rmtree(pend)
        os.makedirs(pend)
        o = _t(spark, sf_dir, "orders")
        for k in (0, 1):
            stage = os.path.join(d, f"stage{k}")
            (
                o.filter(F.pmod(F.col("o_orderkey"), F.lit(2)) == k)
                .coalesce(1).write.mode("overwrite").parquet(stage)
            )
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(pend, f"chunk{k}.parquet"))
            shutil.rmtree(stage)
        os.rename(pend, data)
    return data


def _q_streaming_sample(spark, sf_dir):
    """Stream/batch parity for the incremental sampler (r12): the
    hash-threshold predicate is STATELESS — a row's membership depends
    only on its own key — so the SAME operator call that samples a
    table samples an unbounded stream with zero state and no
    watermark. Orders is replayed as a file stream in two chunk files
    (``maxFilesPerTrigger=1`` forces two microbatches — genuinely
    incremental delivery), ``sample_threshold`` filters the stream,
    and the drained output must equal the batch row's relation
    EXACTLY: the oracle is sample_threshold's SQL verbatim. This is
    the property the threshold form exists for — the exact-count
    sampler re-ranks globally and CANNOT stream."""
    from parquet_sampler_spark.operators.sample import sample_threshold
    from parquet_sampler_spark.queries import _OP_RATIO, _OP_SEED

    data = _stream_sample_staging(spark, sf_dir)
    schema = _t(spark, sf_dir, "orders").schema
    with _stream_shuffle(spark):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        sampled = sample_threshold(
            src, _OP_RATIO, key_cols=["o_orderkey"], seed=_OP_SEED
        )
        name = f"psx_stream_sample_{next(_STREAM_SEQ)}"
        q = (
            sampled.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name)


def _sql_streaming_sample() -> str:
    from parquet_sampler_spark.queries import _sql_sample_threshold

    return _sql_sample_threshold()


def _q_streaming_dedup(spark, sf_dir):
    """Bounded-state streaming deduplication
    (``dropDuplicatesWithinWatermark``) with a batch oracle: the events
    file is replayed as TWO stream files (every event delivered twice —
    the retry/replay duplication this operator exists for), and the
    deduplicated stream must reduce back to EXACTLY the batch relation
    (oracle: plain SELECT over events — event_id is unique there).

    Unlike ``dropDuplicates`` on a stream (state grows forever), state
    here expires once the watermark passes a key's event time + delay —
    the production shape for a long-running feed. For the parity check
    the delay is set past the replayed span (31 days > the 30-day file)
    so no key can expire mid-drain: the output is then deterministic
    under ANY microbatch split of the two files, which is what makes an
    exact value-hash oracle possible. The bounded-state behavior itself
    (short delay, late duplicate NOT dropped) is pinned in
    tests/test_streaming.py."""
    import os
    import shutil

    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.sampling import (
        read_event_stream,
        streaming_dedup,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_dedup_{tag}")
    for copy in ("a", "b"):
        dst = os.path.join(d, f"events_{copy}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(f"{sf_dir}/events.parquet", dst)
    with _stream_shuffle(spark):
        src = read_event_stream(spark, d)
        deduped = streaming_dedup(src, ["event_id"], "ts", "31 days")
        name = f"psx_stream_dedup_{next(_STREAM_SEQ)}"
        q = (
            deduped.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id", "event_type", "value",
    )


_SQL_STREAMING_DEDUP = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
FROM events
"""


def _q_streaming_attribution(spark, sf_dir):
    """Watermarked STREAM-STREAM interval join (purchases x clicks from
    the same user within a 1-hour lookback), value-checked against the
    batch interval-join SQL over the same file — the third
    streaming/batch parity row (aggregation = streaming_hourly, custom
    state = streaming_sessionize, this = two-sided join state).

    Determinism of the value hash: the events file is delivered as ONE
    microbatch (single file, maxFilesPerTrigger=1), so every match is
    intra-batch, and the inner stream-stream join emits matches eagerly
    in append mode; the 62-day watermark (past the file's ~30-day span)
    additionally guarantees no join-state eviction under ANY microbatch
    split, so the drained output equals the batch join exactly. The
    bounded-state behavior itself (state dropped past the watermark) is
    what makes the same plan runnable on an unbounded feed."""
    from parquet_sampler_spark.streaming.joins import (
        stream_stream_attribution,
    )
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    with _stream_shuffle(spark):
        src = read_event_stream(spark, f"{sf_dir}/events.parquet")
        joined = stream_stream_attribution(
            src.filter(F.col("event_type") == "purchase"),
            src.filter(F.col("event_type") == "click"),
            lookback="1 hour",
            watermark="62 days",
        )
        name = f"psx_stream_attr_{next(_STREAM_SEQ)}"
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("p_ts_us"),
        "click_id",
        F.unix_micros("c_ts").alias("c_ts_us"),
    )


_RESERVOIR_K = 50
_RESERVOIR_SEED = 42


def _stage_split_stream(sf_dir, table, src_dir, columns=None, prefix=None):
    """Stage ``table`` as TWO parquet halves under ``src_dir`` — the
    shared fixture for every streaming row that needs a multi-batch
    replay. Per-file write-then-rename: a run interrupted mid-staging
    must not leave a partial file a later call silently reuses
    (dir-level existence checks have exactly that failure mode)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(src_dir, exist_ok=True)
    prefix = prefix or table
    t = None
    for name, lo, hi in ((f"{prefix}_a", 0.0, 0.5),
                         (f"{prefix}_b", 0.5, 1.0)):
        dst = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if t is None:
            t = pq.read_table(
                f"{sf_dir}/{table}.parquet", columns=columns
            )
        start = int(t.num_rows * lo)
        stop = int(t.num_rows * hi)
        tmp = dst + ".tmp"
        pq.write_table(t.slice(start, stop - start), tmp)
        os.replace(tmp, dst)


def _q_streaming_reservoir(spark, sf_dir):
    """The online exact-k reservoir sampler (foreachBatch maintaining
    "k smallest Lehmer-hash rows seen so far" as a parquet reservoir)
    drained over the events file split into TWO stream files — two
    microbatches, so the cross-batch reservoir merge is exercised, not
    just a single-batch top-k. The invariant makes the value hash
    batch-split-independent: after consuming everything, the reservoir
    EQUALS the batch hash-top-k regardless of how files were batched or
    ordered — that is exactly what the oracle SQL computes. This is the
    streaming/batch parity row for the reference's own headline
    operator (sample.rs exact-count sampling), online."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.joins import (
        read_reservoir,
        streaming_exact_sample,
    )
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_res_{tag}")
    src_dir = os.path.join(d, "src")
    res_path = os.path.join(d, "reservoir.parquet")
    _stage_split_stream(sf_dir, "events", src_dir)
    # fresh reservoir per call: re-drains are idempotent by the
    # invariant, but a reservoir left by an aborted earlier run must
    # not leak into this one's hash
    if os.path.exists(res_path):
        shutil.rmtree(res_path)
    with _stream_shuffle(spark):
        src = read_event_stream(spark, src_dir)
        writer = streaming_exact_sample(
            src, _RESERVOIR_K, res_path, ["event_id"],
            seed=_RESERVOIR_SEED,
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    return read_reservoir(spark, res_path).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value",
    )


def _sql_streaming_reservoir():
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql

    pr = lehmer_hash_sql(["event_id"], _RESERVOIR_SEED)
    return f"""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (ORDER BY {pr}, event_id) AS rn FROM events
) WHERE rn <= {_RESERVOIR_K}
"""


def _q_streaming_quantiles(spark, sf_dir):
    """Per-type p50/p90 maintained ONLINE (r08): the quantile_rollup
    summary architecture run as streaming state — each micro-batch of
    the two-file event stream builds its own partition-local
    summaries, merges them into the stored per-event_type summaries
    with the SAME associative weighted-grid reduce the batch path
    uses, and commits through the crash-atomic snapshot sink
    (streaming/quantiles.py). After the drain, quantiles read from
    the kilobyte summary state must land inside the same 1% rank
    envelope as the batch build — the SQL oracle asserts exactly
    that, plus the exact percentiles. This closes the mergeability
    claim end-to-end: the summaries ARE incremental-refresh state,
    not just a batch rollup trick."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.sketches import merged_quantiles
    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.quantiles import (
        read_quantile_summaries,
        streaming_quantile_summaries,
    )
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_q_{tag}")
    src_dir = os.path.join(d, "src")
    sum_path = os.path.join(d, "summaries.parquet")
    _stage_split_stream(sf_dir, "events", src_dir)
    # additive state: a stale snapshot from an aborted run must not
    # double-weight this drain (summaries are NOT dedup-idempotent,
    # unlike the keyed reservoir — see streaming/quantiles.py)
    if os.path.exists(sum_path):
        shutil.rmtree(sum_path)
    with _stream_shuffle(spark):
        src = read_event_stream(spark, src_dir)
        q = (
            streaming_quantile_summaries(
                src, ["event_type"], "value", sum_path, cap=_QR_CAP
            )
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    summ = read_quantile_summaries(spark, sum_path)
    est = merged_quantiles(summ, ["event_type"], [0.5, 0.9])
    return _quantile_envelope(spark, sf_dir, est)


_GROUPED_RES_K = 10


def _q_streaming_reservoir_grouped(spark, sf_dir):
    """Per-STRATUM online reservoir (r08): k exemplars per event_type
    maintained across micro-batches (streaming/joins.
    streaming_grouped_sample) — the stratified form of
    streaming_reservoir, where one global reservoir would drown rare
    strata at 100 TB stream rates. Same two-file split source (the
    cross-batch merge is exercised), same invariant: after draining,
    each group's reservoir EQUALS the batch per-group hash top-k —
    which is exactly the oracle's row_number() PARTITION BY. Per-batch
    merge cost is O(batch + groups·k) via WindowGroupLimit, never a
    global sort."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.streaming.joins import (
        read_reservoir,
        streaming_grouped_sample,
    )
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"stream_gres_{tag}")
    src_dir = os.path.join(d, "src")
    res_path = os.path.join(d, "reservoir_grouped.parquet")
    _stage_split_stream(sf_dir, "events", src_dir)
    if os.path.exists(res_path):
        shutil.rmtree(res_path)
    with _stream_shuffle(spark):
        src = read_event_stream(spark, src_dir)
        writer = streaming_grouped_sample(
            src, _GROUPED_RES_K, res_path,
            group_cols=["event_type"], key_cols=["event_id"],
            seed=_RESERVOIR_SEED,
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    return read_reservoir(spark, res_path).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value",
    )


def _sql_streaming_reservoir_grouped():
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql

    pr = lehmer_hash_sql(["event_id"], _RESERVOIR_SEED)
    return f"""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY {pr}, event_id) AS rn
  FROM events
) WHERE rn <= {_GROUPED_RES_K}
"""


# interval-free comparison (epoch-µs arithmetic): `ts - INTERVAL` in a
# comparison is the documented version-sensitive construct behind the
# r4 tpch_q12 driver red (ORACLE_PORTABILITY.md row 1) — the 1-hour
# lookback is exactly 3_600_000_000 µs on both engines
_SQL_STREAMING_ATTRIBUTION = """
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       epoch_us(p.ts) AS p_ts_us,
       c.event_id AS click_id, epoch_us(c.ts) AS c_ts_us
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) <= epoch_us(p.ts)
 AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
"""


def _q_streaming_hourly(spark, sf_dir):
    """The hourly rollup executed through Structured Streaming: the
    events parquet replayed as a file-source stream, windowed streaming
    aggregation, availableNow trigger drained into a memory sink, the
    sink table returned. The oracle is the BATCH events_hourly SQL over
    the same files — a green row proves the engine's streaming and batch
    execution modes agree on identical input (the exactly-once replay /
    idempotence properties are pinned separately in
    tests/test_streaming.py)."""
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # read_event_stream streams the single file via its parent dir + a
    # pathGlobFilter (the file source only lists directories) and
    # applies the same nanos→micros ts handling as the batch reader
    with _stream_shuffle(spark):
        src = read_event_stream(spark, f"{sf_dir}/events.parquet")
        agg = (
            src.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                _value_e4_sum().alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("hour"), "event_type",
                "n_events", "sum_value",
            )
        )
        name = f"psx_stream_hourly_{next(_STREAM_SEQ)}"
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name)

def _q_streaming_sessionize(spark, sf_dir):
    """The STATEFUL sessionizer (applyInPandasWithState, event-time
    timeout) run over the events parquet replayed as a file stream,
    value-checked against the batch gaps-and-islands SQL. A sentinel
    event one gap + watermark-delay past the last real event is
    appended as a second stream file: it advances the watermark past
    every real session's ``last_event + gap``, so the GAP RULE itself
    (not stream end or wall clock) closes every real session before
    the availableNow drain finishes — at which point the emitted
    session set is exactly the batch sessionization. The sentinel
    user's own (still-open) session is excluded from the output.

    A green row proves the custom stateful operator — state fold,
    watermark-driven timeout close, cross-batch merge — agrees with
    batch SQL on identical input, the same streaming/batch parity the
    ``streaming_hourly`` row establishes for windowed aggregation."""
    from parquet_sampler_spark.streaming.stateful import sessionize_stream

    with _stream_shuffle(spark):
        stream = _sentinel_sessionize_stream(spark, sf_dir)
        sessions = sessionize_stream(
            stream, gap_minutes=30, event_time_timeout=True
        )
        name = f"psx_stream_sessions_{next(_STREAM_SEQ)}"
        q = (
            sessions.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


def _sentinel_sessionize_stream(spark, sf_dir):
    """Shared source for the two streaming sessionizers: the events
    parquet replayed as a watermarked file stream plus a SENTINEL
    event one gap + watermark-delay + margin past the last real event,
    staged as a second (younger-mtime) file so it lands in a later
    micro-batch — advancing the watermark past every real session's
    ``last_event + gap`` and letting the GAP RULE itself close them
    before the availableNow drain finishes."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = f"{sf_dir}/events.parquet"

    # sentinel timestamp: past max(ts) + gap + watermark delay + margin.
    # Emit it in the SAME timestamp unit as the source file (the driver
    # testdata has shipped both nanos and micros) so the stream schema
    # matches across the two files.
    ts_col = pq.read_table(events_path, columns=["ts"])["ts"]
    ts_type = ts_col.type  # pa.timestamp(unit)
    per_us = {"s": 1 / 1_000_000, "ms": 1 / 1_000, "us": 1, "ns": 1_000}[
        ts_type.unit
    ]
    max_val = pc.max(ts_col).value  # int in the column's own unit
    delay_us = 60 * 1_000_000  # withWatermark("ts", "1 minute")
    margin_us = 120 * 1_000_000
    sentinel = max_val + int(
        (_SESSION_GAP_US + delay_us + margin_us) * per_us
    )

    from parquet_sampler_spark.queries import session_tmp_dir

    src = session_tmp_dir(
        spark, f"stream_sess_{next(_STREAM_SEQ)}"
    )
    os.symlink(events_path, os.path.join(src, "a.parquet"))
    pq.write_table(
        pa.table({
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([sentinel], ts_type),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array([None], pa.string()),
            "value": pa.array([None], pa.float64()),
            "props": pa.array([None], pa.string()),
        }),
        os.path.join(src, "b_sentinel.parquet"),
    )
    # the file source processes files oldest-first: the sentinel (mtime
    # = now) lands in a later micro-batch than the testdata file, so
    # batch 1 carries every real event while the watermark is still at
    # its floor (nothing late-dropped), and the sentinel batch then
    # advances the watermark, firing every real session's timeout.
    os.utime(os.path.join(src, "b_sentinel.parquet"))
    return read_event_stream(spark, src).withWatermark("ts", "1 minute")


def _q_streaming_sessionize_native(spark, sf_dir):
    """JVM-NATIVE streaming sessionization (VERDICT r06 task 3):
    Spark's built-in ``session_window`` aggregation — public API since
    3.2 — computes per-user gap sessions entirely inside the JVM state
    store: no ``applyInPandasWithState``, no per-event Python state
    fold, no Arrow state round-trips. Same sentinel source and the
    SAME batch gaps-and-islands oracle as ``streaming_sessionize``
    (which stays registered as the arbitrary-state capability
    surface). Session bounds are emitted as min/max EVENT time, not
    the window bounds (window end = last_event + gap, which the batch
    oracle doesn't speak).

    Boundary-semantics note (PINNED, r08): ``session_window``'s gap
    extension is INCLUSIVE — an event exactly ``gap`` after its
    predecessor still merges (measured, not assumed:
    ``test_sessionize_exact_gap_tie_semantics`` injects the tie pair
    and both engines emit the same merged session). That is the same
    rule as the stateful fold / batch oracle's strict ``> gap`` split,
    so the green row is a semantics match on ANY corpus, ties
    included — the r07 hypothesis that half-open windows would split
    ties was wrong for pyspark 4.x."""
    with _stream_shuffle(spark):
        stream = _sentinel_sessionize_stream(spark, sf_dir)
        sessions = (
            stream.groupBy(
                F.session_window("ts", "30 minutes"), "user_id"
            )
            .agg(
                F.min("ts").alias("__smin"),
                F.max("ts").alias("__smax"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "user_id",
                F.unix_micros("__smin").alias("session_start_us"),
                F.unix_micros("__smax").alias("session_end_us"),
                "n_events",
            )
        )
        name = f"psx_stream_sessions_nat_{next(_STREAM_SEQ)}"
        q = (
            sessions.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") >= 0)


_SQL_STREAMING_SESSIONIZE = f"""
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events
FROM (
  SELECT user_id, ts_us,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS sess_id
  FROM (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id)
                > {_SESSION_GAP_US}
                OR lag(ts) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
) GROUP BY user_id, sess_id
"""


def _q_events_multi_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: one pass producing BOTH
    hourly and daily rollups via GROUPING SETS (the multi-granularity
    time-series pattern); gid disambiguates the granularity level."""
    e = _events(spark, sf_dir)
    e.select(
        F.date_trunc("hour", "ts").alias("hr"),
        F.date_trunc("day", "ts").alias("dy"),
        "event_type", "value",
    ).createOrReplaceTempView("psx_events_buckets")
    # e4-quantized value sum: order-independent (see _q_events_hourly).
    # NB: `10000.0D` — Spark SQL parses a bare `10000.0` literal as
    # DECIMAL, which would flip the division to decimal arithmetic
    # (the DataFrame twin and the DuckDB oracle both divide doubles)
    return spark.sql("""
        SELECT hr, dy, event_type,
               count(*) AS n,
               sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0D
                 AS sum_value,
               CAST(grouping(hr) * 2 + grouping(dy) AS INT) AS gid
        FROM psx_events_buckets
        GROUP BY GROUPING SETS ((hr, event_type), (dy, event_type))
    """)


_SQL_EVENTS_MULTI_ROLLUP = f"""
SELECT hr, dy, event_type, count(*) AS n,
       {_VALUE_E4_SUM_SQL} AS sum_value,
       CAST(grouping(hr) * 2 + grouping(dy) AS INT) AS gid
FROM (SELECT date_trunc('hour', ts) AS hr,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS dy,
             event_type, value FROM events)
GROUP BY GROUPING SETS ((hr, event_type), (dy, event_type))
"""



# ---------------------------------------------------------------------------
# Round 3: weighted sampling, interval (range) join
# ---------------------------------------------------------------------------

_WS_K, _WS_SEED = 200, 11


def _q_sample_weighted(spark, sf_dir):
    """Exact-k weighted document sample, inclusion odds proportional to
    n_chars (operators/sample.py weighted_sample — A-ES ranks from the
    portable Lehmer hash, TakeOrderedAndProject top-k). The DuckDB
    oracle recomputes the identical selection."""
    from parquet_sampler_spark.operators.sample import weighted_sample

    d = _t(spark, sf_dir, "documents")
    return weighted_sample(
        d, _WS_K, "n_chars", ["doc_id"], seed=_WS_SEED
    )


def _sql_sample_weighted():
    from parquet_sampler_spark.operators.sample import (
        weighted_sample_rank_sql,
    )

    rank, where = weighted_sample_rank_sql(
        "n_chars", ["doc_id"], seed=_WS_SEED
    )
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE {where}
ORDER BY {rank} DESC, doc_id
LIMIT {_WS_K}
"""


def _q_range_join_events(spark, sf_dir):
    """Interval containment join (operators/rangejoin.py, bucket
    strategy): the 50 highest-value events each open a 30-minute
    window; count and sum every event falling inside each window. The
    bucket equi-join shuffles on an integer time bin — no cartesian
    product, no broadcast requirement on the interval side."""
    from parquet_sampler_spark.operators.rangejoin import interval_join

    e = _events(spark, sf_dir)
    iv = (
        e.orderBy(F.col("value").desc(), "event_id").limit(50)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        )
    )
    joined = interval_join(
        e.select("event_id", "ts", "value"), iv,
        "ts", "w_start", "w_end",
        method="bucket", bucket_seconds=1800,
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_in_window"),
        _value_e4_sum().alias("sum_value"),
    )


_SQL_RANGE_JOIN_EVENTS = """
WITH iv AS (
  -- ts + INTERVAL pinned as safe (oracle audit r5): the interval is
  -- ADDED to a same-type naive timestamp to produce a value (exact
  -- 1.8e9 us on both engines) - no cross-type comparison coercion,
  -- which is where DuckDB versions drift (see tpch_q12).
  SELECT event_id AS window_id, ts AS w_start,
         ts + INTERVAL 30 MINUTE AS w_end
  FROM events ORDER BY value DESC, event_id LIMIT 50
)
SELECT window_id, count(*) AS n_in_window,
       sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
GROUP BY window_id
"""


def _q_top_terms(spark, sf_dir):
    """Per-document top terms by (tf DESC, df ASC, term) — the
    inverted-index aggregation underlying TF-IDF, kept fully integer
    (tf and df are exact counts; an ln-based idf would put a libm
    double straight into the hash-compared output). Plan: explode →
    (doc, term) count → term-level df agg → join back → per-doc ranked
    window. All three shuffles are key-partitioned; no collect."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term")
    )
    return (
        tf.join(df_, "term")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tf", "df", "rn")
    )


_SQL_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(lower(text)), ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, rn
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term)
           AS rn
  FROM tf JOIN df USING (term)
)
WHERE rn <= 5
"""


_EDIT_BLOCK_CAP = 64
_EDIT_MAX_DIST = 4
_EDIT_PREFIX = 60


def _q_edit_distance_pairs(spark, sf_dir):
    """Edit-distance near-duplicate pairs over blocked candidates:
    documents sharing (lang, first token, length bucket) are compared
    on a 60-char prefix with Levenshtein <= 4. Blocking bounds the
    quadratic term to within-block pairs; blocks larger than
    _EDIT_BLOCK_CAP (stop-phrase openers) are skipped outright —
    a recall-only cap, mirrored exactly by the oracle, same policy as
    the shingle df cap in operators/dedup.py. Distance itself runs
    JVM-side (no UDF)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.trim(F.lower(F.col("text"))).alias("__t"),
        (F.col("n_chars") / 16).cast("bigint").alias("__lb"),
    ).select(
        "doc_id", "lang", "__lb",
        F.substring_index("__t", " ", 1).alias("__tok1"),
        F.substring("__t", 1, _EDIT_PREFIX).alias("__pfx"),
    )
    counts = d.groupBy("lang", "__tok1", "__lb").agg(
        F.count(F.lit(1)).alias("__bn")
    ).filter(F.col("__bn") <= _EDIT_BLOCK_CAP)
    blocked = d.join(counts, ["lang", "__tok1", "__lb"])
    a = blocked.select(
        "lang", "__tok1", "__lb",
        F.col("doc_id").alias("a"), F.col("__pfx").alias("__pa"),
    )
    b = blocked.select(
        "lang", "__tok1", "__lb",
        F.col("doc_id").alias("b"), F.col("__pfx").alias("__pb"),
    )
    return (
        a.join(b, ["lang", "__tok1", "__lb"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("dist", F.levenshtein("__pa", "__pb"))
        .filter(F.col("dist") <= _EDIT_MAX_DIST)
        .select("a", "b", "dist")
    )


_SQL_EDIT_DISTANCE_PAIRS = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(floor(n_chars / 16) AS BIGINT) AS lb,
         string_split(trim(lower(text)), ' ')[1] AS tok1,
         substr(trim(lower(text)), 1, {_EDIT_PREFIX}) AS pfx
  FROM documents
),
blocks AS (
  SELECT lang, tok1, lb, count(*) AS bn
  FROM d GROUP BY lang, tok1, lb
  HAVING count(*) <= {_EDIT_BLOCK_CAP}
),
blocked AS (
  SELECT d.* FROM d JOIN blocks USING (lang, tok1, lb)
)
SELECT x.doc_id AS a, y.doc_id AS b,
       levenshtein(x.pfx, y.pfx) AS dist
FROM blocked x JOIN blocked y
  ON x.lang = y.lang AND x.tok1 = y.tok1 AND x.lb = y.lb
 AND x.doc_id < y.doc_id
WHERE levenshtein(x.pfx, y.pfx) <= {_EDIT_MAX_DIST}
"""


def _q_funnel(spark, sf_dir):
    """Ordered-step funnel (view -> click -> purchase): each stage is
    the per-user min event time AFTER the previous stage's time — the
    sequencing makes this a chained dependency, not a single-pass
    conditional agg. All three stages shuffle on user_id (the same
    key), and each stage's input is already the previous stage's
    (small) survivor set. Output: one row of stage conversion counts."""
    e = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        )
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
        )
    )


_SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
"""


# ---------------------------------------------------------------------------
# Training-data assembly: sequence packing + mixture resampling
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512   # tokens per training sequence
_PACK_SHARD = 200    # doc_ids per packing shard (bounds each window)


def _q_sequence_pack(spark, sf_dir):
    """Training-sequence packing: assign each document to a
    fixed-token-budget training sequence by greedy contiguous fill —
    a doc goes to the sequence its running-start offset falls in.

    100 TB shape: packing is LOCAL to a (lang, doc_id-shard) window, so
    the cumulative sum never becomes a global single-partition sort —
    shards pack independently and in parallel (how production pipelines
    shard packing); the budget boundary is deterministic from the data,
    so both engines assign identical sequences."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", TX.token_count("text").alias("n_tok"),
    ).withColumn(
        "shard",
        F.floor(F.col("doc_id") / _PACK_SHARD).cast("bigint"),
    )
    w = (
        Window.partitionBy("lang", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn("__cum", F.sum("n_tok").over(w)).select(
        "doc_id", "lang", "n_tok", "shard",
        F.floor(
            (F.col("__cum") - F.col("n_tok")).cast("double") / _PACK_BUDGET
        ).cast("bigint").alias("seq_idx"),
    )


def _sql_sequence_pack() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang, {TX.token_count_sql('text')} AS n_tok,
         CAST(floor(doc_id / {_PACK_SHARD}.0) AS BIGINT) AS shard
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tok, shard,
         sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM d
)
SELECT doc_id, lang, n_tok, shard,
       CAST(floor(CAST(cum - n_tok AS DOUBLE) / {_PACK_BUDGET})
            AS BIGINT) AS seq_idx
FROM c
"""


# per-language keep rates (mixture reweighting); integer thresholds on
# the portable hash make the comparison exact in both engines
_MIX_SEED = 29
_MIX_RATES = {"en": 1.0, "zh": 0.8, "es": 0.6, "de": 0.4, "fr": 0.2}
_MIX_DEFAULT = 0.1


def _q_corpus_mixture(spark, sf_dir):
    """Mixture resampling: downweight per-language corpus shares with
    deterministic Bernoulli-by-hash keeps (the data-mixture step of a
    training pipeline, e.g. upweighting English while thinning others).

    100 TB shape: a stateless per-row filter on a seeded integer hash —
    pushes to the scan, shuffles nothing, and any row's keep decision
    is recomputable from its key alone (auditable sampling, same
    property as dataset_split)."""
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        lehmer_hash,
    )

    d = _t(spark, sf_dir, "documents")
    thr = F.lit(int(_MIX_DEFAULT * MODULUS))
    for lang, rate in _MIX_RATES.items():
        thr = F.when(
            F.col("lang") == lang, F.lit(int(rate * MODULUS))
        ).otherwise(thr)
    return d.filter(
        lehmer_hash(["doc_id"], _MIX_SEED) < thr
    ).select("doc_id", "lang", "source")


def _sql_corpus_mixture() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        lehmer_hash_sql,
    )

    whens = " ".join(
        f"WHEN '{lang}' THEN {int(rate * MODULUS)}"
        for lang, rate in _MIX_RATES.items()
    )
    return (
        f"SELECT doc_id, lang, source FROM documents "
        f"WHERE {lehmer_hash_sql(['doc_id'], _MIX_SEED)} < "
        f"CASE lang {whens} ELSE {int(_MIX_DEFAULT * MODULUS)} END"
    )


_VOCAB_K = 500


def _q_vocab_topk(spark, sf_dir):
    """Corpus-global vocabulary build: the K most frequent tokens with
    total and document frequencies — the counting pass behind a BPE /
    WordPiece vocab trainer. Same tokenization as top_terms.

    100 TB shape: explode → one key-partitioned (term) aggregate with
    map-side partial combine, then a TakeOrderedAndProject top-K merge
    (per-partition K-heaps; no global sort, no collect). Deterministic
    tie-break (count DESC, term) keeps both engines' K-th boundary
    identical."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        counts.orderBy(F.col("n_total").desc(), F.col("term"))
        .limit(_VOCAB_K)
    )


_SQL_VOCAB_TOPK = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS term
  FROM documents
)
SELECT term, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM toks WHERE term <> ''
GROUP BY term
ORDER BY n_total DESC, term
LIMIT {_VOCAB_K}
"""


def _q_cube_pricing(spark, sf_dir):
    """CUBE aggregation: all four grouping levels of
    (returnflag, linestatus) in one pass — subtotals per flag, per
    status, per pair, and the grand total, disambiguated by
    grouping_id (a data NULL vs a subtotal NULL). Exact integer
    quantities; completes the rollup/cube family next to
    rollup_pricing."""
    li = _t(spark, sf_dir, "lineitem")
    # gid is built from SINGLE-column grouping() flags on both engines:
    # multi-arg GROUPING(a, b) bit order has drifted between DuckDB
    # versions (r4 driver red vs local green), so neither side relies
    # on an engine's composite bit packing. flag = MSB, status = LSB.
    gid = (
        F.grouping("l_returnflag").cast("bigint") * 2
        + F.grouping("l_linestatus").cast("bigint")
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gid"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


_SQL_CUBE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
            AS BIGINT) AS gid,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def _q_salted_agg_events(spark, sf_dir):
    """Hot-key-safe aggregation as a query: per-event-type totals via
    plans/skew.salted_agg — phase 1 on (key, salt16), phase 2 merge.
    Identical result to a plain groupBy (the oracle IS the plain GROUP
    BY); exact-cents integer sums keep the two-phase summation order
    irrelevant. The pattern for when one key dominates a 100 TB shuffle
    and map-side partial aggregation alone can't bound the reducer."""
    from parquet_sampler_spark.plans.skew import salted_agg

    e = _events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    out = salted_agg(e, ["event_type"], sum_cols=["value_c"],
                     count_alias="n")
    return out.select(
        "event_type",
        (F.col("sum_value_c") / 100.0).alias("total_value"),
        "n",
    )


_SQL_SALTED_AGG_EVENTS = """
SELECT event_type,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       count(*) AS n
FROM events
GROUP BY event_type
"""


def _q_salted_join_orders(spark, sf_dir):
    """Hot-key-safe fact⋈dim JOIN as a query (r07, the join twin of
    salted_agg_events): plans/skew.salted_join gives every orders row
    a content-deterministic salt in [0, 16) and explodes the customer
    side 16×, so the join runs on (custkey, salt) and no single
    reducer ever sees a hot key's full probe set — the explicit remedy
    when one customer dominates a 100 TB shuffle beyond what AQE's
    skew-split handles. Result is identical to the plain join (each
    fact row matches exactly its salt replica), so the oracle IS the
    plain join+rollup SQL; exact-cents sums make the reduce order
    irrelevant."""
    from parquet_sampler_spark.plans.skew import salted_join

    o = _t(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = salted_join(o, c, "c_custkey")
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("revenue_cents"),
    )


_SQL_SALTED_JOIN_ORDERS = """
SELECT c_nationkey, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def _q_dq_checks(spark, sf_dir):
    """Data-quality gate as a query (r07) — the validation suite a
    100 TB ingest pipeline runs before publishing a snapshot: primary-
    key uniqueness, foreign-key referential integrity (anti-join
    violation counts — each FK check is one broadcast/shuffled anti
    join, never a row-by-row lookup), domain constraints, and null
    fractions, emitted as one (check, violations, passed) relation.
    All checks are plain relational algebra, so the oracle is the same
    UNION ALL of counts in SQL; `passed` stays a strict equality on
    exact BIGINT counts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    e = _events(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")

    def row(name, violations_df):
        return violations_df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("violations"),
        )

    checks = [
        # PK uniqueness: any custkey appearing twice
        row("customer_pk_unique",
            c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("__n"))
             .filter(F.col("__n") > 1)),
        # FK integrity: orders → customer, lineitem → orders
        row("orders_custkey_fk",
            o.join(c.select(F.col("c_custkey").alias("o_custkey")),
                   "o_custkey", "left_anti")),
        row("lineitem_orderkey_fk",
            li.join(o.select(F.col("o_orderkey").alias("l_orderkey")),
                    "l_orderkey", "left_anti")),
        # domain constraints
        row("orders_price_positive",
            o.filter(~(F.col("o_totalprice") > 0))),
        row("events_value_not_null",
            e.filter(F.col("value").isNull())),
        row("documents_text_nonempty",
            d.filter(F.length(F.trim(F.col("text"))) == 0)),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out.select(
        "check_name", "violations",
        (F.col("violations") == 0).alias("passed")
    )


_SQL_DQ_CHECKS = """
SELECT check_name, violations, violations = 0 AS passed FROM (
  SELECT 'customer_pk_unique' AS check_name, count(*) AS violations
  FROM (SELECT c_custkey FROM customer
        GROUP BY c_custkey HAVING count(*) > 1)
  UNION ALL
  SELECT 'orders_custkey_fk', count(*) FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'lineitem_orderkey_fk', count(*) FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'orders_price_positive', count(*) FROM orders
  WHERE NOT (o_totalprice > 0)
  UNION ALL
  SELECT 'events_value_not_null', count(*) FROM events
  WHERE value IS NULL
  UNION ALL
  SELECT 'documents_text_nonempty', count(*) FROM documents
  WHERE length(trim(text)) = 0
)
"""


def _q_dq_quarantine(spark, sf_dir):
    """Violating-ROW extraction for the DQ gate (VERDICT r07 #5):
    `dq_checks` emits counts; a real ingest gate also quarantines the
    offending rows for triage/replay. The registered corpus is clean
    (every dq_checks row passes), so the query injects a DETERMINISTIC
    corrupt batch derived from orders itself — every 97th orderkey
    re-keyed outside the PK range with a negated custkey (dangling FK)
    and negated totalprice (domain breach) — exactly replicated in the
    SQL oracle, making the green row prove non-trivial extraction, not
    an empty set.

    Scale shape: ONE scan of the dirty relation, ONE broadcastable
    left join against the deduped dim keys, then every check's verdict
    lands in a reasons array that `explode` fans out — clean rows
    (empty array) vanish without a filter pass, and adding a check is
    one more array element, not another scan. A row violating k
    checks yields k quarantine rows, keyed by reason."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    bad = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        (-F.col("o_custkey")).alias("o_custkey"),
        "o_orderstatus",
        (-F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    dirty = o.unionByName(bad)
    dim = c.select(
        F.col("c_custkey").alias("o_custkey")
    ).distinct().withColumn("__fk_ok", F.lit(1))
    reasons = F.array_compact(
        F.array(
            F.when(
                F.col("__fk_ok").isNull(), F.lit("orders_custkey_fk")
            ),
            F.when(
                ~(F.col("o_totalprice") > 0),
                F.lit("orders_price_positive"),
            ),
        )
    )
    return (
        dirty.join(F.broadcast(dim), "o_custkey", "left")
        .withColumn("reason", F.explode(reasons))
        .select("reason", "o_orderkey", "o_custkey", "o_totalprice")
    )


_SQL_DQ_QUARANTINE = """
WITH dirty AS (
  SELECT * FROM orders
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey,
         -o_custkey AS o_custkey,
         o_orderstatus,
         -o_totalprice AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT 'orders_custkey_fk' AS reason, o_orderkey, o_custkey, o_totalprice
FROM dirty o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_price_positive', o_orderkey, o_custkey, o_totalprice
FROM dirty
WHERE NOT (o_totalprice > 0)
"""


def _q_split_leakage(spark, sf_dir):
    """Train/val/test LEAKAGE audit (r08): the hash split
    (`dataset_split`) assigns by doc_id, so two docs with IDENTICAL
    text can land in different splits — exactly the eval contamination
    a training pipeline must detect before shipping a corpus. Emits
    one row: cross-split duplicate-pair counts per split pair plus the
    number of distinct leaked texts.

    Scale shape: NO self-join. One shuffle groups by text, per-group
    split counts come from conditional sums, and cross-split pairs are
    the product c_a·c_b summed over groups — Σg² work only within
    duplicate groups, never n². (At 100 TB key the shuffle by a
    128-bit text fingerprint instead of the raw text; the raw column
    is kept here so the oracle compares on exact equality.)

    The sf0.01 gate corpus has ZERO exact-dup texts, so (as with
    dq_quarantine) a DETERMINISTIC re-crawl batch is injected — every
    41st doc duplicated verbatim under a shifted doc_id, exactly
    replicated in the oracle — making the green row prove real
    cross-split pair counting, not an empty sum: the copy's new id
    hashes to an independent split, so ~⅓ of the copies leak."""
    from parquet_sampler_spark.operators.sample import assign_splits

    d0 = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # offset 10^9 sits far above any generated doc_id at every scale
    # slice (make_sf10.py's DOC_STRIDE is exactly 10^6, so a 10^6
    # offset would ALIAS the injected dup onto a real copy-1 doc at
    # sf10 and the cross-split property would silently test nothing —
    # r8 ADVICE)
    recrawl = d0.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"), "text"
    )
    d = d0.unionByName(recrawl)
    s = assign_splits(d, ["doc_id"], seed=13)

    def cnt(name):
        return F.sum(
            F.when(F.col("split") == name, 1).otherwise(0)
        )

    g = s.groupBy("text").agg(
        cnt("train").alias("__tr"),
        cnt("val").alias("__va"),
        cnt("test").alias("__te"),
    )
    return g.agg(
        F.coalesce(F.sum(F.col("__tr") * F.col("__va")), F.lit(0))
        .alias("train_val_pairs"),
        F.coalesce(F.sum(F.col("__tr") * F.col("__te")), F.lit(0))
        .alias("train_test_pairs"),
        F.coalesce(F.sum(F.col("__va") * F.col("__te")), F.lit(0))
        .alias("val_test_pairs"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("__tr") > 0).cast("int")
                    + (F.col("__va") > 0).cast("int")
                    + (F.col("__te") > 0).cast("int")
                    > 1,
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("leaked_texts"),
    )


def _sql_split_leakage() -> str:
    from parquet_sampler_spark.operators.sample import assign_splits_sql

    split = assign_splits_sql(["doc_id"], 13)
    return f"""
WITH dirty AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text
  FROM documents WHERE doc_id % 41 = 0
),
s AS (
  SELECT doc_id, text, {split} AS split FROM dirty
),
g AS (
  SELECT text,
         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
         sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
  FROM s GROUP BY text
)
SELECT CAST(COALESCE(sum(tr * va), 0) AS BIGINT) AS train_val_pairs,
       CAST(COALESCE(sum(tr * te), 0) AS BIGINT) AS train_test_pairs,
       CAST(COALESCE(sum(va * te), 0) AS BIGINT) AS val_test_pairs,
       CAST(COALESCE(sum(CASE WHEN (CASE WHEN tr > 0 THEN 1 ELSE 0 END
                             + CASE WHEN va > 0 THEN 1 ELSE 0 END
                             + CASE WHEN te > 0 THEN 1 ELSE 0 END) > 1
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS leaked_texts
FROM g
"""


def _q_winsorize_values(spark, sf_dir):
    """Per-group outlier clipping (winsorization, r08): every event's
    value clipped to its event_type's [p1, p99] — the standard
    pre-training cleanup for heavy-tailed numeric features, as a
    registered row. Exact percentiles via Spark `percentile` (==
    DuckDB `quantile_cont`, bit-exact per the percentiles row), ONE
    aggregation producing a per-type bounds table that broadcasts back
    onto the fact — two scans total, no window over the raw rows (a
    percentile window would sort every partition of the fact).
    NULL values are excluded up front (they'd otherwise be clipped to
    p1 by least/greatest null-skipping in BOTH engines — a silent
    imputation nobody asked for)."""
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    bounds = e.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("__lo"),
        F.percentile("value", 0.99).alias("__hi"),
    )
    return e.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.least(
            F.greatest(F.col("value"), F.col("__lo")), F.col("__hi")
        ).alias("value_winsorized"),
    )


_SQL_WINSORIZE_VALUES = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       least(greatest(value, lo), hi) AS value_winsorized
FROM events e JOIN b ON e.event_type = b.event_type
WHERE value IS NOT NULL
"""


def _q_schema_evolution(spark, sf_dir):
    """Schema-on-read evolution (r08): a table whose files were
    written under TWO schema versions — v1 before a column existed,
    v2 after — read back as ONE relation with ``mergeSchema``, the
    missing column null-filled for v1 rows. This is how a 100 TB
    table actually accretes columns: no rewrite of old files, the
    reader reconciles footers (Spark reconciles per-file schemas;
    column pruning and pushdown still apply per file). Fixture: even
    custkeys written WITHOUT c_acctbal (v1), odd custkeys WITH it
    (v2), both derived from the customer table; the oracle is the
    same UNION with a typed NULL. Files staged once per (session,
    sf_dir) with write-then-rename, like the stream fixtures."""
    import os

    import pyarrow.parquet as pq

    from parquet_sampler_spark.queries import session_tmp_dir

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = session_tmp_dir(spark, f"schema_evo_{tag}")
    t = None
    for name, cols, pred in (
        ("v1", ["c_custkey", "c_name"], 0),
        ("v2", ["c_custkey", "c_name", "c_acctbal"], 1),
    ):
        dst = os.path.join(d, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if t is None:
            t = pq.read_table(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_name", "c_acctbal"],
            )
        import pyarrow.compute as pc

        mask = pc.equal(pc.bit_wise_and(t["c_custkey"], 1), pred)
        tmp = dst + ".tmp"
        pq.write_table(t.filter(mask).select(cols), tmp)
        os.replace(tmp, dst)
    return (
        spark.read.option("mergeSchema", "true").parquet(d)
        .select("c_custkey", "c_name", "c_acctbal")
    )


_SQL_SCHEMA_EVOLUTION = """
SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, c_name, c_acctbal
FROM customer WHERE c_custkey % 2 = 1
"""


_AQP_SEED = 77
_AQP_PCT = 5  # 5% hash-threshold sample


def _q_aqp_revenue(spark, sf_dir):
    """Approximate query processing from the reference's own sampling
    primitive (r08): revenue per order priority ESTIMATED from a 5%
    deterministic Lehmer hash-threshold sample of lineitem, scaled by
    the exact inverse ratio (×20), reported beside the exact answer.
    This is WHY a sampler exists in an analytics stack — a 100 TB
    aggregate answered from a 5 TB scan — surfaced as a registered row
    with the estimate/truth pair so the sampling error itself is on
    the correctness surface.

    Fully deterministic (no envelope oracle needed): the sample is a
    pure hash predicate both engines evaluate identically, and both
    revenues are exact-cents BIGINT sums divided once at the end, so
    the DuckDB oracle replicates estimate AND truth bit-for-bit.
    LEFT join from the exact side with COALESCE(0): a priority class
    the sample misses must surface as est 0, not vanish.

    Scale shape: the estimate side joins only the sampled 5% against
    orders (broadcast-sized after sampling at any sf where orders ≫
    sample); the exact side is one plain agg join. At 100 TB the
    exact side is the thing you're AVOIDING — run the estimate alone
    and keep truth for audit slices."""
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        lehmer_hash,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    rev_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    thresh = MODULUS * _AQP_PCT // 100
    samp = li.filter(
        lehmer_hash(["l_orderkey", "l_linenumber"], _AQP_SEED)
        < F.lit(thresh)
    )
    est = (
        samp.join(o, samp["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            (
                F.sum(rev_e4) * (100 // _AQP_PCT) / 10000.0
            ).alias("est_revenue")
        )
    )
    exact = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg((F.sum(rev_e4) / 10000.0).alias("exact_revenue"))
    )
    return exact.join(est, "o_orderpriority", "left").select(
        "o_orderpriority",
        F.coalesce("est_revenue", F.lit(0.0)).alias("est_revenue"),
        "exact_revenue",
    )


def _sql_aqp_revenue() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        lehmer_hash_sql,
    )

    pr = lehmer_hash_sql(["l_orderkey", "l_linenumber"], _AQP_SEED)
    thresh = MODULUS * _AQP_PCT // 100
    scale = 100 // _AQP_PCT
    return f"""
WITH rev AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) *
         (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
  FROM lineitem
),
est AS (
  SELECT o_orderpriority,
         sum(rev_e4) * {scale} / 10000.0 AS est_revenue
  FROM rev JOIN orders ON l_orderkey = o_orderkey
  WHERE ({pr}) < {thresh}
  GROUP BY o_orderpriority
),
exact AS (
  SELECT o_orderpriority, sum(rev_e4) / 10000.0 AS exact_revenue
  FROM rev JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderpriority
)
SELECT exact.o_orderpriority,
       COALESCE(est_revenue, 0.0) AS est_revenue,
       exact_revenue
FROM exact LEFT JOIN est USING (o_orderpriority)
"""


_ZORDER_CACHE: dict = {}


def _q_zorder_scan(spark, sf_dir):
    """OPTIMIZE ZORDER BY on the correctness surface (r07): events
    written ONCE per (session, sf_dir) z-order-clustered on
    (user_id, value) — plans/layout.cluster_by_zorder interleaves the
    two columns' scaled bit planes into a Morton key, range-partitions
    into 16 files — then scanned back with a 2-D box predicate.
    Layout maintenance changes BYTES, never rows, so the oracle is the
    same box filter on the RAW table: a hash-green row proves the
    rewrite is lossless end-to-end (values, timestamps, nulls). The
    scale property — a box on EITHER clustered column overlaps few
    files' min/max ranges, so a 100 TB scan reads ∝ selectivity —
    is pinned separately by the footer-overlap test in
    tests/test_scale_smoke.py; the plan audit pins that both box
    conjuncts reach the parquet reader as PushedFilters."""
    import hashlib
    import os

    from parquet_sampler_spark.plans.layout import cluster_by_zorder
    from parquet_sampler_spark.queries import session_tmp_dir
    from parquet_sampler_spark.sources.io import write_parquet

    norm = os.path.abspath(os.path.normpath(sf_dir))
    key = (spark.sparkContext.applicationId, norm)
    # re-validate the cached dir: clear_caches() rmtree's the session
    # tmp roots, so a cache hit must re-check the bytes are still there
    if key not in _ZORDER_CACHE or not os.path.isdir(_ZORDER_CACHE[key]):
        tag = hashlib.sha1(norm.encode()).hexdigest()[:8]
        out = os.path.join(
            session_tmp_dir(spark, "zorder_events"), tag
        )
        write_parquet(
            cluster_by_zorder(
                _events(spark, sf_dir), ["user_id", "value"],
                num_files=16,
            ),
            out,
        )
        _ZORDER_CACHE[key] = out
    z = spark.read.parquet(_ZORDER_CACHE[key])
    return z.filter(
        (F.col("user_id") <= 50)
        & (F.col("value") >= 100.0) & (F.col("value") <= 200.0)
    )


_SQL_ZORDER_SCAN = """
SELECT * FROM events
WHERE user_id <= 50 AND value >= 100.0 AND value <= 200.0
"""


_COMPACT_CACHE: dict = {}
_COMPACT_SMALL_FILES = 64
_COMPACT_TARGET_FILES = 4


def _q_compaction_scan(spark, sf_dir):
    """OPTIMIZE-style small-file compaction (r08) — the OTHER half of
    table maintenance beside z-order clustering: a table that
    accreted 64 tiny files (per-microbatch streaming sinks and
    per-partition CDC writes do exactly this) is rewritten into 4
    target-size files with ONE `repartitionByRange(user_id,
    event_id)` pass — which also leaves each output file
    range-clustered on user_id, so footer min/max skipping works on
    the compacted layout for free. At 100 TB the small-file problem
    is a real throughput cliff: open/footer overhead per file, tiny
    row groups defeating columnar IO, and NameNode/listing pressure —
    compaction restores scan bandwidth without touching row content.
    Layout maintenance changes BYTES, never rows, so the oracle is
    the raw table: a hash-green full read of the compacted layout
    proves losslessness end-to-end. File-count and clustering
    properties are pinned by pytest (test_scale_smoke)."""
    return spark.read.parquet(_compacted_events_path(spark, sf_dir))


def _compacted_events_path(spark, sf_dir) -> str:
    """Write (once per session, sf_dir) the 64-shard degraded events
    fixture and its 4-file range-clustered compaction; return the
    compacted path. Shared by compaction_scan and manifest_prune."""
    import hashlib
    import os

    from parquet_sampler_spark.queries import session_tmp_dir

    norm = os.path.abspath(os.path.normpath(sf_dir))
    key = (spark.sparkContext.applicationId, norm)
    if key not in _COMPACT_CACHE or not os.path.isdir(_COMPACT_CACHE[key]):
        tag = hashlib.sha1(norm.encode()).hexdigest()[:8]
        base = os.path.join(session_tmp_dir(spark, "compact_events"), tag)
        small = os.path.join(base, "small")
        compacted = os.path.join(base, "compacted")
        # the degraded fixture: 64 round-robin shards of events
        _events(spark, sf_dir).repartition(_COMPACT_SMALL_FILES) \
            .write.mode("overwrite").parquet(small)
        (
            spark.read.parquet(small)
            .repartitionByRange(
                _COMPACT_TARGET_FILES, "user_id", "event_id"
            )
            .write.mode("overwrite").parquet(compacted)
        )
        _COMPACT_CACHE[key] = compacted
    return _COMPACT_CACHE[key]


_SQL_COMPACTION_SCAN = """
SELECT * FROM events
"""


def _q_gap_fill_events(spark, sf_dir):
    """Time-series regularization: resample per-type event values onto
    a dense hourly grid with last-observation-carried-forward — the
    missing member of the rollup/sessionize family (feature pipelines
    need gapless series). Grid = distinct types × full hour range (one
    broadcast 1-row bounds agg); LOCF = last(ignorenulls) over an
    unbounded-preceding window per type. ``is_gap`` marks synthesized
    rows. Hour count is bounded by the time span, not the event count —
    the grid explode stays tiny at any data scale, and the window
    partitions by type."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(_value_e4_sum().alias("sum_value"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("__lo"),
        F.date_trunc("hour", F.max("ts")).alias("__hi"),
    )
    grid = (
        hourly.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("__lo", "__hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type", "hour",
            F.last("sum_value", ignorenulls=True).over(w)
            .alias("value_filled"),
            F.col("sum_value").isNull().alias("is_gap"),
        )
    )


_SQL_GAP_FILL_EVENTS = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         {_VALUE_E4_SUM_SQL} AS sum_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events
),
grid AS (
  -- generate_series pinned as safe (oracle audit r5): endpoints are
  -- both hour-aligned (date_trunc), the step divides the span exactly,
  -- and DuckDB's generate_series is documented inclusive-of-stop
  -- (range() is the exclusive variant) - matching Spark's inclusive
  -- F.sequence. No boundary row can appear/disappear across versions.
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
              AS hour FROM bounds) g
)
SELECT grid.event_type, grid.hour,
       last_value(h.sum_value IGNORE NULLS)
         OVER (PARTITION BY grid.event_type ORDER BY grid.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS value_filled,
       h.sum_value IS NULL AS is_gap
FROM grid LEFT JOIN hourly h
  ON h.event_type = grid.event_type AND h.hour = grid.hour
"""


_ROLL_US = 3 * 3600 * 1_000_000  # trailing 3-hour window, microseconds


def _q_rolling_window_events(spark, sf_dir):
    """Time-interval rolling aggregate: per event, the trailing-3-hour
    event count and exact value sum within its type — a RANGE frame
    over event-time microseconds (the window family's time-based frame,
    complementing window_suite's ROWS frames). RANGE includes peer rows
    at equal timestamps identically in both engines; integer e4 sums
    keep the frame sum exact.

    Scale shape (r4 verdict fix): a plain
    ``Window.partitionBy(event_type)`` caps parallelism at #types (~5)
    — at 100 TB one type's entire history is one task's sort. Instead
    the window partitions by (type, 3h-aligned time bucket): because
    the frame length equals the bucket width, a row's frame can only
    reach its own bucket and the previous one, so each row is also
    UNIONED into its successor bucket tagged carry-only — frames are
    complete within every (type, bucket) partition, carry rows are
    dropped from the output, and parallelism grows with the time span
    (#types × #buckets) instead of #types. Cost: one duplicated pass of
    the rows through one narrow shuffle. Identical answer (the oracle
    is the flat single-window formulation)."""
    e = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    val_c = F.round(F.col("value") * 10000).cast("bigint")
    base = e.select(
        "event_id", "event_type", us.alias("__us"),
        val_c.alias("__vc"),
    )
    out = bucketed_trailing_range(
        base, "event_type", "__us", "__vc", _ROLL_US
    )
    return out.select(
        "event_id", "event_type",
        F.col("__n").alias("n_3h"),
        (F.col("__sum") / 10000.0).alias("sum_3h"),
    )


def bucketed_trailing_range(
    df, part_col: str, us_col: str, val_col: str, window_us: int
):
    """Trailing ``[t - window_us, t]`` RANGE count/sum per row,
    partition-parallel in TIME: the window partitions by (part_col,
    window_us-aligned bucket) rather than part_col alone. Since the
    frame length equals the bucket width, a frame only reaches the
    row's bucket and its predecessor — each row is therefore also
    unioned into its successor bucket as a carry-only copy, making
    every frame complete within one (part, bucket) partition; carry
    rows are dropped from the output. Adds ``__n`` / ``__sum``.

    One duplicated row pass + one narrow shuffle buys parallelism
    proportional to #parts × #buckets instead of #parts — the
    difference between 5 giant sorted tasks and thousands of bounded
    ones at 100 TB.

    Negative timestamps are fine: pmod is non-negative, so the
    subtract-then-divide floors toward -inf and bucket ids stay
    aligned across zero."""
    if window_us <= 0:
        raise ValueError(f"window_us must be positive, got {window_us}")
    # pure integer floor division — F.floor(col / lit) goes through
    # DOUBLE and silently misbuckets once |us| exceeds 2^53 (fine for
    # epoch-µs until ~2255, wrong for nanosecond or synthetic domains);
    # (x - pmod(x, w)) / w is exact over the full int64 range
    x = F.col(us_col)
    bkt = ((x - F.pmod(x, F.lit(window_us))) / window_us).cast("bigint")
    native = df.select(
        "*", bkt.alias("__bkt"), F.lit(False).alias("__carry")
    )
    carry = df.select(
        "*", (bkt + 1).alias("__bkt"), F.lit(True).alias("__carry")
    )
    w = (
        Window.partitionBy(part_col, "__bkt")
        .orderBy(us_col)
        .rangeBetween(-window_us, 0)
    )
    return (
        native.unionByName(carry)
        .select(
            "*",
            F.count(F.lit(1)).over(w).alias("__n"),
            F.sum(val_col).over(w).alias("__sum"),
        )
        .filter(~F.col("__carry"))
        .drop("__carry", "__bkt")
    )


_SQL_ROLLING_WINDOW_EVENTS = f"""
SELECT event_id, event_type,
       count(*) OVER w AS n_3h,
       sum(CAST(round(value * 10000) AS BIGINT)) OVER w / 10000.0
         AS sum_3h
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN {_ROLL_US} PRECEDING AND CURRENT ROW)
"""


_HIST_BINS = 20


def _q_value_histogram(spark, sf_dir):
    """Equal-width histogram of event values in 20 bins — the profiling
    primitive behind data-quality dashboards. All-integer binning:
    values are e4 fixed-point, bounds come from one broadcast 1-row
    aggregate, and the bin index is an exact integer expression
    ((v - lo) * bins) / (hi - lo + 1) — so the bin boundaries cannot
    drift between engines. One scan + one tiny aggregate."""
    e = _events(spark, sf_dir)
    v = e.select(
        F.round(F.col("value") * 10000).cast("bigint").alias("__vc")
    )
    bounds = v.agg(
        F.min("__vc").alias("__lo"), F.max("__vc").alias("__hi")
    )
    binned = v.crossJoin(F.broadcast(bounds)).select(
        F.floor(
            ((F.col("__vc") - F.col("__lo")) * _HIST_BINS).cast("double")
            / (F.col("__hi") - F.col("__lo") + 1).cast("double")
        ).cast("int").alias("bin"),
        "__vc", "__lo", "__hi",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__vc").alias("min_vc"),
        F.max("__vc").alias("max_vc"),
    )


_SQL_VALUE_HISTOGRAM = f"""
WITH v AS (
  SELECT CAST(round(value * 10000) AS BIGINT) AS vc FROM events
),
bounds AS (SELECT min(vc) AS lo, max(vc) AS hi FROM v)
SELECT CAST(floor(CAST((vc - lo) * {_HIST_BINS} AS DOUBLE)
                  / CAST(hi - lo + 1 AS DOUBLE)) AS INTEGER) AS bin,
       count(*) AS n, min(vc) AS min_vc, max(vc) AS max_vc
FROM v CROSS JOIN bounds
GROUP BY 1
"""


_PR_ITERS, _PR_DAMP, _PR_SCALE = 5, 85, 10**9


def _q_dup_triangles(spark, sf_dir):
    """Per-document triangle counts over the duplicate graph (r12) —
    the cliquishness signal: true re-crawl groups are near-CLIQUES
    (every copy pairs with every other), template drift forms CHAINS
    (zero triangles). Connected components treat both identically;
    this row separates them. Third graph algorithm beside CC and
    PageRank, on the same shared LSH-verified pair graph; oracle =
    the exact-pairs SQL with the identical a<b<c oriented two-join
    enumeration."""
    from parquet_sampler_spark.operators.graph import triangle_counts

    d = _t(spark, sf_dir, "documents")
    return triangle_counts(d, _dup_graph_cached(spark, sf_dir), "doc_id")


def _sql_dup_triangles() -> str:
    return ("WITH " + _SQL_SHINGLES2 + f""",
jp AS MATERIALIZED (
  SELECT id_a, id_b FROM jpairs WHERE jaccard >= {_JACCARD_T}
),
tri AS (
  SELECT ab.id_a AS a, ab.id_b AS b, bc.id_b AS c
  FROM jp ab
  JOIN jp bc ON bc.id_a = ab.id_b
  JOIN jp ac ON ac.id_a = ab.id_a AND ac.id_b = bc.id_b
),
credit AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS v FROM tri
    UNION ALL SELECT b AS v FROM tri
    UNION ALL SELECT c AS v FROM tri
  ) GROUP BY v
)
SELECT d.doc_id, CAST(coalesce(credit.t, 0) AS BIGINT) AS triangles
FROM documents d LEFT JOIN credit ON credit.v = d.doc_id
""")


def _q_pagerank_dups(spark, sf_dir):
    """PageRank over the duplicate-similarity graph (jaccard >= 0.5
    pairs, symmetrized) — centrality of each document in its duplicate
    cluster, the second iterative graph algorithm beside connected
    components. Integer fixed-point throughout (operators/graph.py), so
    the oracle unrolls the same 5 iterations in SQL and matches scores
    bit-for-bit. Dangling docs (no near-dups) rank at base + leak."""
    from parquet_sampler_spark.operators.graph import pagerank

    pairs = _dup_graph_cached(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(
        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
    ))
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    # pagerank truncates every iteration (no interval knob), so only
    # the reliable-dir half of the env toggle applies
    ckpt = _env_checkpoint().get("checkpoint_dir")
    return pagerank(
        edges, num_iterations=_PR_ITERS, damping_pct=_PR_DAMP,
        scale=_PR_SCALE, nodes=d, checkpoint_dir=ckpt,
    ).select(F.col("id").alias("doc_id"), "pr")


def _sql_pagerank_dups() -> str:
    # MATERIALIZED everywhere multiply-referenced (r08): DuckDB may
    # INLINE a CTE per reference, and each iteration references
    # p{k} twice — without the hint the quadratic jpairs join
    # re-expands up to 2^iters times, which at sf0.1 fills the entire
    # disk with spill before dying (observed; Spark side runs in
    # seconds). Pure evaluation hint — results are identical.
    base = (100 - _PR_DAMP) * _PR_SCALE // 100
    ctes = [
        f"p0 AS MATERIALIZED (SELECT doc_id, "
        f"CAST({_PR_SCALE} AS BIGINT) AS pr FROM documents)"
    ]
    for k in range(_PR_ITERS):
        ctes.append(f"""
p{k + 1} AS MATERIALIZED (
  SELECT n.doc_id,
         CAST({base} + ({_PR_DAMP} * coalesce(s.s, 0)) // 100
              AS BIGINT) AS pr
  FROM p{k} n LEFT JOIN (
    SELECT e.dst, sum(p.pr // d.d) AS s
    FROM edges e
    JOIN p{k} p ON p.doc_id = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s ON s.dst = n.doc_id
)""")
    return (
        "WITH " + _SQL_SHINGLES2 + """,
jp AS MATERIALIZED (
  SELECT id_a, id_b FROM jpairs WHERE jaccard >= 0.5
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM jp
),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
""" + ",".join(ctes)
        + f" SELECT doc_id, pr FROM p{_PR_ITERS}"
    )


_CHUNK_W, _CHUNK_STRIDE = 120, 100


def _q_udtf_chunk_windows(spark, sf_dir):
    """Overlapping context-window chunking (the LLM-training text
    chunker: 120-char windows every 100 chars) implemented as a Python
    UDTF in a LATERAL join — covering the third user-function surface
    (UDF: pandas kernels, UDAF: grouped quantiles, UDTF: here). The
    same windows are expressible JVM-side with substr over a sequence;
    this query deliberately routes through the UDTF API so the surface
    is exercised and oracle-checked. Chunk starts: range(0, max(n, 1),
    stride) — an empty text yields one empty chunk."""
    from pyspark.sql.functions import udtf

    w, stride = _CHUNK_W, _CHUNK_STRIDE

    @udtf(returnType="chunk_idx: int, chunk: string")
    class ChunkText:
        def eval(self, text: str):
            t = text or ""
            for st in range(0, max(len(t), 1), stride):
                yield st // stride, t[st:st + w]

    spark.udtf.register("psx_chunk_text", ChunkText)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM documents d, LATERAL psx_chunk_text(d.text) c"
    )


_SQL_UDTF_CHUNK_WINDOWS = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
-- chunk-index bound derived from the data (r4 ADVICE: a fixed 1000 cap
-- would silently diverge on 100k+ char documents); scalar list range()
-- because the range() TABLE function cannot take subquery arguments
b AS (SELECT greatest(coalesce(max(n), 1), 1) // {_CHUNK_STRIDE} + 1
      AS hi FROM d),
r AS (SELECT unnest(range(0, hi)) AS i FROM b)
SELECT doc_id, CAST(r.i AS INT) AS chunk_idx,
       substr(text, r.i * {_CHUNK_STRIDE} + 1, {_CHUNK_W}) AS chunk
FROM d CROSS JOIN r
WHERE r.i * {_CHUNK_STRIDE} < greatest(n, 1)
"""


def _q_normalize_values(spark, sf_dir):
    """Per-group min-max feature scaling: each event's value normalized
    to [0, 1] within its event type — the feature-engineering step
    before model input. One grouped bounds aggregate broadcast back
    (never a per-row window over the full partition); the scaled value
    is a single double division of exact e4 integers, so both engines
    compute the identical float64."""
    e = _events(spark, sf_dir)
    v = e.select(
        "event_id", "event_type",
        F.round(F.col("value") * 10000).cast("bigint").alias("__vc"),
    )
    bounds = v.groupBy("event_type").agg(
        F.min("__vc").alias("__lo"), F.max("__vc").alias("__hi")
    )
    return (
        v.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id", "event_type",
            F.when(
                F.col("__hi") == F.col("__lo"), F.lit(0.0)
            ).otherwise(
                (F.col("__vc") - F.col("__lo")).cast("double")
                / (F.col("__hi") - F.col("__lo")).cast("double")
            ).alias("value_scaled"),
        )
    )


_SQL_NORMALIZE_VALUES = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 10000) AS BIGINT) AS vc
  FROM events
),
b AS (SELECT event_type, min(vc) AS lo, max(vc) AS hi
      FROM v GROUP BY event_type)
SELECT event_id, v.event_type,
       CASE WHEN hi = lo THEN 0.0
            ELSE CAST(vc - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
       END AS value_scaled
FROM v JOIN b ON v.event_type = b.event_type
"""


def _q_hourly_deltas(spark, sf_dir):
    """Hour-over-hour deltas and percent change per event type — the
    lag-based derivative series every monitoring dashboard computes.
    Counts are exact integers; pct_change is one double division of
    integers (identical float64 both engines); the first hour of each
    type has NULL delta/pct."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hour")
    prev = F.lag("n").over(w)
    return hourly.select(
        "hour", "event_type", "n",
        (F.col("n") - prev).alias("delta"),
        F.when(prev.isNull() | (prev == 0), F.lit(None).cast("double"))
        .otherwise(
            (F.col("n") - prev).cast("double") / prev.cast("double")
        ).alias("pct_change"),
    )


_SQL_HOURLY_DELTAS = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n,
       n - lag(n) OVER w AS delta,
       CASE WHEN lag(n) OVER w IS NULL OR lag(n) OVER w = 0 THEN NULL
            ELSE CAST(n - lag(n) OVER w AS DOUBLE)
                 / CAST(lag(n) OVER w AS DOUBLE)
       END AS pct_change
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour)
"""


# ---------------------------------------------------------------------------
# Round 9 additions: time-weighted average, distribution drift,
# distributed table fingerprint, SCD2 dimension history
# ---------------------------------------------------------------------------

def _q_twap_events(spark, sf_dir):
    """Time-WEIGHTED average value per user — the time-series mean where
    each observation holds until the next one (TWAP / last-observation-
    carried-forward), not the row-count mean a plain avg() gives.

    Shape: one window pass partitioned by user (lead ts over (ts,
    event_id) — total order, tie-broken), then one groupBy(user) — a
    single shuffle on user_id, all JVM expressions. At 100 TB the
    window state per user is one row (lead), and the aggregate is
    map-side partial.

    Determinism contract (driver hashes values): durations are exact
    integer milliseconds (microsecond diff, integer DIV 1000 — Spark
    ``DIV`` and DuckDB ``//`` agree on non-negative ints); values are
    exact cents; the sums are BIGINT (value_e2 <= 49_102 at any sf and
    per-user total duration < 2^40 ms keeps the dot product < 2^62);
    the only float op is one identical division chain at the end.
    """
    e = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("value_e2"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id", "value_e2",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
        .alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    seg = seg.withColumn("dur_ms", F.expr("dur_us DIV 1000"))
    agg = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur_ms").alias("total_ms"),
        F.sum(F.col("value_e2") * F.col("dur_ms")).alias("__num"),
    ).filter(F.col("total_ms") > 0)
    return agg.select(
        "user_id", "n_segments", "total_ms",
        (F.col("__num").cast("double")
         / F.col("total_ms").cast("double") / F.lit(100.0)).alias("twap"),
    )


_SQL_TWAP_EVENTS = """
WITH seg AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS value_e2,
         (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000 AS dur_ms
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(dur_ms) AS BIGINT) AS total_ms,
       CAST(CAST(sum(value_e2 * dur_ms) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(dur_ms) AS BIGINT) AS DOUBLE) / 100.0 AS twap
FROM seg
WHERE dur_ms IS NOT NULL
GROUP BY user_id
HAVING sum(dur_ms) > 0
"""


# The corpus language set is closed (driver generator emits exactly
# these five); the drift expression pivots it to FIXED columns so the
# chi-square sum is a single fixed-order double expression — no
# float-aggregation-order ambiguity (see module docstring).
_DRIFT_LANGS = ("de", "en", "es", "fr", "zh")


def _q_mixture_drift(spark, sf_dir):
    """Per-source language-mixture drift vs the whole corpus — the
    chi-square statistic every corpus-monitoring job computes to catch
    a crawl source whose composition shifted (new locale, spam influx)
    before it poisons the training mix.

    Shape: one groupBy(source) with per-language conditional counts
    (map-side partial, 20 output rows), one 1-row corpus-totals
    aggregate broadcast back (the only crossJoin — a broadcast of a
    single row). All integer arithmetic until the final per-term
    divisions, written in one fixed-order expression per source.

    chi2 = sum_l (c_l - E_l)^2 / E_l with E_l = t_s * g_l / T, computed
    as d_l^2 / (T * t_s * g_l) with d_l = T*c_l - t_s*g_l exact BIGINT
    (|d_l| < 2^35 at sf10 — squares taken in float64 AFTER the exact
    integer difference).
    """
    docs = _t(spark, sf_dir, "documents").select("source", "lang")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("t_s"),
        *[F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
          .cast("bigint").alias(f"c_{l}") for l in _DRIFT_LANGS],
    )
    corpus = docs.groupBy().agg(
        F.count(F.lit(1)).alias("T"),
        *[F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
          .cast("bigint").alias(f"g_{l}") for l in _DRIFT_LANGS],
    )
    j = per_src.crossJoin(F.broadcast(corpus))
    terms = []
    for l in _DRIFT_LANGS:
        d = F.col("T") * F.col(f"c_{l}") - F.col("t_s") * F.col(f"g_{l}")
        # a corpus missing this language entirely (g_l = 0 forces
        # c_l = 0 too) contributes nothing — without the guard the
        # term is 0.0/0.0 = NaN and poisons every source's chi2
        terms.append(
            F.when(
                F.col(f"g_{l}") > 0,
                (d.cast("double") * d.cast("double"))
                / (F.col("T").cast("double") * F.col("t_s").cast("double")
                   * F.col(f"g_{l}").cast("double")),
            ).otherwise(F.lit(0.0))
        )
    chi2 = terms[0]
    for t in terms[1:]:
        chi2 = chi2 + t
    return j.select(
        "source", F.col("t_s").alias("n_docs"), chi2.alias("chi2"),
    )


def _sql_mixture_drift() -> str:
    c_cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE lang = '{l}') AS BIGINT) AS c_{l}"
        for l in _DRIFT_LANGS
    )
    g_cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE lang = '{l}') AS BIGINT) AS g_{l}"
        for l in _DRIFT_LANGS
    )
    terms = " + ".join(
        f"(CASE WHEN g_{l} > 0 THEN "
        f"(CAST(T * c_{l} - t_s * g_{l} AS DOUBLE)"
        f" * CAST(T * c_{l} - t_s * g_{l} AS DOUBLE))"
        f" / (CAST(T AS DOUBLE) * CAST(t_s AS DOUBLE)"
        f" * CAST(g_{l} AS DOUBLE)) ELSE 0.0 END)"
        for l in _DRIFT_LANGS
    )
    return f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS t_s, {c_cols}
  FROM documents GROUP BY source
),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS T, {g_cols} FROM documents
)
SELECT source, t_s AS n_docs, {terms} AS chi2
FROM per_src CROSS JOIN corpus
"""


def _q_table_checksum(spark, sf_dir):
    """Distributed table fingerprint: an order-independent per-bucket
    checksum of lineitem, the anti-entropy primitive for verifying two
    replicas / a migration / a CDC pipeline moved every row without
    shipping the data. Two tables match iff all bucket rows match;
    a mismatch localizes the repair to one bucket (1/16 of the keys).

    Shape: one scan, all-JVM row hashing (portable Lehmer fold of the
    integer key+measure columns + the mixed string hash of the flag
    pair), one map-side-partial groupBy on a 16-value bucket key. No
    data movement beyond 16 rows per partition — at 100 TB this is the
    cheapest possible full-table integrity pass.

    Determinism: the row hash is the repo's portable integer Lehmer
    arithmetic (functions/hashing.py — identical expression in the
    oracle); BIT_XOR is order-independent and width-preserving, and the
    additive component sums 20-bit residues (< 2^62 for up to ~4e12
    rows) so duplicate-pair swaps that XOR would miss still move it.
    """
    from parquet_sampler_spark.operators.integrity import table_fingerprint

    li = _t(spark, sf_dir, "lineitem")
    return table_fingerprint(
        li,
        int_cols=[
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_partkey"),
            F.round(F.col("l_quantity") * 100).cast("bigint"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint"),
        ],
        str_col=F.concat(F.col("l_returnflag"), F.col("l_linestatus")),
        bucket_col="l_orderkey",
        buckets=16,
        seed=7,
    )


def _sql_table_checksum() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        lehmer_hash_sql,
        mixed_string_hash_sql,
    )

    h1 = lehmer_hash_sql(
        [
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "CAST(round(l_quantity * 100) AS BIGINT)",
            "CAST(round(l_extendedprice * 100) AS BIGINT)",
        ],
        seed=7,
    )
    h2 = mixed_string_hash_sql("flagpair")
    return f"""
WITH f AS (
  SELECT l_orderkey % 16 AS bucket,
         l_orderkey, l_linenumber, l_partkey, l_quantity,
         l_extendedprice,
         l_returnflag || l_linestatus AS flagpair
  FROM lineitem
),
hashed AS (
  SELECT bucket, (({h1}) * 131 + ({h2})) % {MODULUS} AS h FROM f
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_hash,
       CAST(sum(h % 1048576) AS BIGINT) AS sum_hash
FROM hashed GROUP BY bucket
"""


def _q_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension type-2 history build: the base
    customer snapshot (epoch 0) plus two deterministic CDC change
    batches (epoch 1 = the shared merge batch: every 100th re-priced
    +1000, every 250th tombstoned, 3 inserts; epoch 2: every 150th
    re-priced +2000, every 450th tombstoned) folded into versioned
    rows with [valid_from, valid_to) epochs and an is_current flag —
    the standard warehouse dimension-history pattern.

    Shape: union of three keyed snapshots, ONE window pass per key
    (lead(epoch) closes each version; a tombstone closes its
    predecessor and emits nothing — so a key deleted at epoch 1 and
    re-inserted at epoch 2 correctly re-opens). Single shuffle on the
    dimension key; per-key window state is one row. Change volume, not
    base volume, drives the cost of an incremental re-run at scale —
    the batches are ~1% of the base here by construction.

    Determinism: epochs are exact ints; the only float op is one IEEE
    addition per changed row (acctbal + literal), identical both
    engines; no float aggregation anywhere.
    """
    from parquet_sampler_spark.queries_olap import _merge_batch

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit(0).alias("epoch"), F.lit(False).alias("is_deleted"),
    )
    b1 = _merge_batch(spark, sf_dir).select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit(1).alias("epoch"), "is_deleted",
    )
    c = _t(spark, sf_dir, "customer")
    b2 = c.filter(F.col("c_custkey") % 150 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 2000.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(2).alias("epoch"),
        (F.col("c_custkey") % 450 == 0).alias("is_deleted"),
    )
    versions = base.unionByName(b1).unionByName(b2)
    w = Window.partitionBy("c_custkey").orderBy("epoch")
    hist = versions.select(
        "c_custkey", "c_acctbal", "c_mktsegment", "is_deleted",
        F.col("epoch").alias("valid_from"),
        F.lead("epoch").over(w).alias("valid_to"),
    ).filter(~F.col("is_deleted"))
    return hist.select(
        "c_custkey", "c_acctbal", "c_mktsegment", "valid_from",
        "valid_to", F.col("valid_to").isNull().alias("is_current"),
    )


_SQL_SCD2_HISTORY = """
WITH versions AS (
  SELECT c_custkey, c_acctbal, c_mktsegment, 0 AS epoch,
         false AS is_deleted
  FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal + 1000.0, c_mktsegment, 1,
         (c_custkey % 250 = 0)
  FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT * FROM (VALUES
    (10000001, 0.0, 'BUILDING', 1, false),
    (10000002, 0.0, 'BUILDING', 1, false),
    (10000003, 0.0, 'BUILDING', 1, false))
    v(c_custkey, c_acctbal, c_mktsegment, epoch, is_deleted)
  UNION ALL
  SELECT c_custkey, c_acctbal + 2000.0, c_mktsegment, 2,
         (c_custkey % 450 = 0)
  FROM customer WHERE c_custkey % 150 = 0
),
hist AS (
  SELECT c_custkey, c_acctbal, c_mktsegment, is_deleted,
         epoch AS valid_from,
         lead(epoch) OVER (PARTITION BY c_custkey ORDER BY epoch)
           AS valid_to
  FROM versions
)
SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM hist WHERE NOT is_deleted
"""


# written-once-per-session partitioned orders tree for dpp_scan (same
# per-(session, sf_dir) pattern as queries_olap's _MERGE_CACHE)
_DPP_CACHE: dict = {}

_DPP_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def _q_dpp_scan(spark, sf_dir):
    """Dynamic partition pruning on a Hive-partitioned fact: orders
    written once per session partitioned by o_orderpriority, then
    joined to a dimension whose relevant priority is only knowable at
    RUNTIME (region filtered by name, priority derived from the key) —
    Catalyst cannot constant-fold the partition predicate, so the scan
    must be pruned by the broadcast-reused subquery DPP injects.

    This is THE mechanism that makes fact⋈dim on a date/tenant-
    partitioned 100 TB table read only the matching directories: the
    plan audit pins ``dynamicpruningexpression`` inside the fact
    scan's PartitionFilters (a static filter would be constant-folded;
    no filter at all would scan all five directories).

    Oracle: the identical case-mapped join/rollup on the RAW orders
    table — partitioning changes bytes read, never rows. Exact-cents
    totalprice sum.
    """
    import hashlib
    import os

    from parquet_sampler_spark.queries import session_tmp_dir

    # normalized + sha1-suffixed like _ZORDER_CACHE: without the
    # per-sf_dir path tag a second scale factor in the same session
    # would overwrite the first's tree while its cache entry still
    # passed the isdir guard — returning wrong-sf data
    norm = os.path.abspath(os.path.normpath(sf_dir))
    key = (spark.sparkContext.applicationId, norm)
    # isdir guard: clear_caches() wipes the session tmp roots, so a
    # cached path may dangle (same self-heal as _ZORDER_CACHE)
    if key not in _DPP_CACHE or not os.path.isdir(_DPP_CACHE[key]):
        tag = hashlib.sha1(norm.encode()).hexdigest()[:8]
        out = f"{session_tmp_dir(spark, 'dpp')}/{tag}/orders"
        _t(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(out)
        _DPP_CACHE[key] = out
    fact = spark.read.parquet(_DPP_CACHE[key])

    dim = _t(spark, sf_dir, "region").select(
        F.element_at(
            F.array(*[F.lit(p) for p in _DPP_PRIORITIES]),
            F.col("r_regionkey").cast("int") + 1,
        ).alias("priority"),
        "r_name",
    ).filter(F.col("r_name") == "ASIA")

    joined = fact.join(
        F.broadcast(dim), fact["o_orderpriority"] == dim["priority"]
    )
    return joined.groupBy("o_orderpriority", "r_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
         / 100.0).alias("total_price"),
    )


def _sql_dpp_scan() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{p}'" for i, p in enumerate(_DPP_PRIORITIES)
    )
    return f"""
WITH dim AS (
  SELECT CASE r_regionkey {cases} END AS priority, r_name
  FROM region WHERE r_name = 'ASIA'
)
SELECT o_orderpriority, r_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS total_price
FROM orders JOIN dim ON o_orderpriority = priority
GROUP BY o_orderpriority, r_name
"""


_MANIFEST_LO, _MANIFEST_HI = 10, 40


def _q_manifest_prune(spark, sf_dir):
    """Manifest-level file skipping (Iceberg/Delta's data-skipping
    step on plain parquet): the range-clustered compacted events
    layout is scan-PLANNED driver-side — pyarrow footer min/max on
    user_id prune the FILE LIST before Spark opens a single file —
    then the survivors are read with the predicate re-applied
    (footer ranges are necessary, not sufficient) and rolled up.

    Beside row-group pushdown (which runs AFTER a task opens a file),
    this is the piece that matters at 10^6-file scale: listing,
    scheduling, and footer reads collapse into one O(files) metadata
    pass, and the executors only ever see surviving files. The pytest
    pins that the plan actually dropped files (kept < total on the
    4-file clustered layout) and that results equal the unpruned
    read. Oracle = the same filter + rollup on the raw events table —
    planning changes bytes read, never rows.
    """
    from parquet_sampler_spark.sources.io import plan_files_by_stats

    path = _compacted_events_path(spark, sf_dir)
    kept, _total = plan_files_by_stats(
        path, "user_id", _MANIFEST_LO, _MANIFEST_HI
    )
    if not kept:  # conservative planner kept nothing => empty result
        return spark.createDataFrame(
            [], "event_type string, n_events bigint, total_value double"
        )
    df = spark.read.parquet(*kept).filter(
        (F.col("user_id") >= _MANIFEST_LO)
        & (F.col("user_id") <= _MANIFEST_HI)
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0)
        .alias("total_value"),
    )


_SQL_MANIFEST_PRUNE = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS total_value
FROM events
WHERE user_id >= {_MANIFEST_LO} AND user_id <= {_MANIFEST_HI}
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Cross-document repeated-n-gram spans (substring dedup, r09)
# ---------------------------------------------------------------------------

_DUP_SPAN_N = 8
_DUP_SPAN_MIN_DF = 2


def _q_ngram_dup_spans(spark, sf_dir):
    """Span-level cross-document duplicated text (r09): the maximal
    token spans covered by sliding 8-token windows that occur in >= 2
    distinct documents — the substring-dedup signal of Lee et al. 2022
    (doc- and pair-level dedup miss boilerplate shared across
    otherwise-distinct pages; these spans are what a substring pass
    cuts). One count-distinct hash aggregation over 31-bit gram hashes
    (the partial phase dedups on (gram, doc) per partition — a
    boilerplate gram ships rows ∝ its document frequency, never ∝ its
    occurrence count), one semi-join flagging duplicated windows, one
    gaps-and-islands window per document. NO self-join: unlike the
    pair-dedup family there is no quadratic hot-shingle df² term, so
    no df cap is needed."""
    from parquet_sampler_spark.operators.dedup import ngram_dup_spans

    d = _t(spark, sf_dir, "documents")
    return ngram_dup_spans(
        d, "doc_id", "text", n=_DUP_SPAN_N, min_df=_DUP_SPAN_MIN_DF
    )


def _sql_ngram_dup_spans() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        mixed_string_hash_sql,
    )

    n, min_df = _DUP_SPAN_N, _DUP_SPAN_MIN_DF
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
),
th AS (
  SELECT doc_id,
         list_transform(t, x -> {mixed_string_hash_sql('x')}) AS h
  FROM toks
),
w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         list_reduce(list_prepend(CAST(0 AS BIGINT), h[i:i+{n - 1}]),
                     (acc, x) -> (acc * 31 + x) % {MODULUS}) AS gh
  FROM th, unnest(range(1, len(h) - {n} + 2)) AS u(i)
),
dg AS (
  SELECT gh FROM w GROUP BY gh HAVING count(DISTINCT doc_id) >= {min_df}
),
dw AS (SELECT doc_id, pos FROM w WHERE gh IN (SELECT gh FROM dg)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {n} THEN 1 ELSE 0 END AS brk
  FROM dw
),
isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {n} - 1 AS span_end,
       max(pos) + {n} - min(pos) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_windows
FROM isl2 GROUP BY doc_id, island
"""


_CONTAM_SPAN_N = 4


def _q_decontaminate_spans(spark, sf_dir):
    """Cross-corpus SPAN-level decontamination (r12): per training
    document (doc_id >= bench cut), the maximal token spans covered by
    sliding 4-token windows whose text occurs anywhere in the
    benchmark slice — the n-gram overlap scrub of GPT-3 App. C /
    PaLM, localized to the exact tokens to cut (doc-level
    `decontaminated` throws the whole page away for one quoted line).
    The benchmark gram-hash set is Θ(benchmark tokens) — bounded by
    the BENCHMARK — deduplicated and BROADCAST into a semi-join
    against the training window stream, so the corpus side never
    shuffles for flagging; spans merge with one per-doc window pass
    (shared gaps-and-islands with ngram_dup_spans)."""
    from parquet_sampler_spark.operators.dedup import contaminated_spans

    d = _t(spark, sf_dir, "documents")
    return contaminated_spans(
        d.filter(F.col("doc_id") >= _BENCH_CUT),
        d.filter(F.col("doc_id") < _BENCH_CUT),
        "doc_id", "text", n=_CONTAM_SPAN_N,
    )


def _sql_decontaminate_spans() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        mixed_string_hash_sql,
    )

    n = _CONTAM_SPAN_N
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
),
th AS (
  SELECT doc_id,
         list_transform(t, x -> {mixed_string_hash_sql('x')}) AS h
  FROM toks
),
w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         list_reduce(list_prepend(CAST(0 AS BIGINT), h[i:i+{n - 1}]),
                     (acc, x) -> (acc * 31 + x) % {MODULUS}) AS gh
  FROM th, unnest(range(1, len(h) - {n} + 2)) AS u(i)
),
bg AS (SELECT DISTINCT gh FROM w WHERE doc_id < {_BENCH_CUT}),
dw AS (
  SELECT doc_id, pos FROM w
  WHERE doc_id >= {_BENCH_CUT} AND gh IN (SELECT gh FROM bg)
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {n} THEN 1 ELSE 0 END AS brk
  FROM dw
),
isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {n} - 1 AS span_end,
       max(pos) + {n} - min(pos) AS span_tokens,
       CAST(count(*) AS BIGINT) AS n_contam_windows
FROM isl2 GROUP BY doc_id, island
"""


def _q_decontaminate_scrub(spark, sf_dir):
    """The write side of decontaminate_spans (r12): the training
    corpus with every contaminated span CUT OUT — token counts
    before/after plus the scrubbed text, reassembled in original
    order inside ONE aggregation (array_sort(collect_list(struct(pos,
    tok)))) — no window, no second shuffle. Covered positions are
    Θ(contaminated tokens) and anti-join the token stream."""
    from parquet_sampler_spark.operators.dedup import (
        scrub_contaminated_spans,
    )

    d = _t(spark, sf_dir, "documents")
    return scrub_contaminated_spans(
        d.filter(F.col("doc_id") >= _BENCH_CUT),
        d.filter(F.col("doc_id") < _BENCH_CUT),
        "doc_id", "text", n=_CONTAM_SPAN_N,
    )


def _sql_decontaminate_scrub() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        mixed_string_hash_sql,
    )

    n = _CONTAM_SPAN_N
    return f"""
WITH toksrc AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
  WHERE doc_id >= {_BENCH_CUT}
        AND text IS NOT NULL AND length(trim(text)) > 0
),
th AS (
  SELECT doc_id,
         list_transform(t, x -> {mixed_string_hash_sql('x')}) AS h
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t
        FROM documents
        WHERE text IS NOT NULL AND length(trim(text)) > 0)
),
w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         list_reduce(list_prepend(CAST(0 AS BIGINT), h[i:i+{n - 1}]),
                     (acc, x) -> (acc * 31 + x) % {MODULUS}) AS gh
  FROM th, unnest(range(1, len(h) - {n} + 2)) AS u(i)
),
bg AS (SELECT DISTINCT gh FROM w WHERE doc_id < {_BENCH_CUT}),
dw AS (
  SELECT doc_id, pos FROM w
  WHERE doc_id >= {_BENCH_CUT} AND gh IN (SELECT gh FROM bg)
),
covered AS (
  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
  FROM dw, unnest(range(pos, pos + {n})) AS r(p)
),
toks AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i] AS tok
  FROM toksrc, unnest(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT k.doc_id, k.pos, k.tok FROM toks k
  WHERE NOT EXISTS (SELECT 1 FROM covered c
                    WHERE c.doc_id = k.doc_id AND c.pos = k.pos)
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(coalesce(any_value(kc.n_kept), 0) AS BIGINT) AS n_kept,
       coalesce(any_value(kc.s), '') AS scrubbed_text
FROM toks t
LEFT JOIN (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS s
  FROM kept GROUP BY doc_id
) kc ON kc.doc_id = t.doc_id
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Bloom-prefilter decontamination (r09)
# ---------------------------------------------------------------------------

# injection offset far above any generated doc_id at any slice
# (make_sf10 DOC_STRIDE is 10^6 — see the split_leakage aliasing fix)
_BLOOM_INJECT_EVERY = 7
_BLOOM_ID_OFFSET = 1_000_000_000


def _q_bloom_decontaminate(spark, sf_dir):
    """Exact-duplicate decontamination through a Bloom prefilter (r09):
    bit-identical output to the plain fingerprint anti-join (which IS
    the oracle — the salted_agg precedent: same contract, scale plan),
    but the corpus-side work is a scan + 4 integer bit-probes against
    kilobytes of broadcast state; only the candidate sliver is
    exact-verified, and the corpus itself never shuffles. The gate
    corpus has no cross-cut exact duplicates, so a deterministic
    re-crawl batch is injected (every 7th benchmark doc re-ingested
    under a shifted id — the dq_quarantine pattern), replicated in the
    oracle: green proves real removal, not a no-op."""
    from parquet_sampler_spark.operators.dedup import bloom_decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < _BENCH_CUT)
    injected = bench.filter(
        F.col("doc_id") % _BLOOM_INJECT_EVERY == 0
    ).select(
        (F.col("doc_id") + _BLOOM_ID_OFFSET).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    training = d.filter(F.col("doc_id") >= _BENCH_CUT).unionByName(injected)
    return bloom_decontaminate(training, bench, "doc_id", "text")


def _sql_bloom_decontaminate() -> str:
    from parquet_sampler_spark.functions.text import fingerprint_sql

    return f"""
WITH bench AS (SELECT * FROM documents WHERE doc_id < {_BENCH_CUT}),
training AS (
  SELECT * FROM documents WHERE doc_id >= {_BENCH_CUT}
  UNION ALL
  SELECT doc_id + {_BLOOM_ID_OFFSET} AS doc_id, text, lang, source, n_chars
  FROM bench WHERE doc_id % {_BLOOM_INJECT_EVERY} = 0
),
bfp AS (SELECT DISTINCT {fingerprint_sql('text')} AS fp FROM bench
        WHERE text IS NOT NULL)
SELECT t.* FROM training t
WHERE t.text IS NULL
   OR {fingerprint_sql('t.text')} NOT IN (SELECT fp FROM bfp)
"""


# ---------------------------------------------------------------------------
# Stream-static enrichment join (r09)
# ---------------------------------------------------------------------------


def _q_streaming_enrich(spark, sf_dir):
    """STREAM-STATIC enrichment join (r09), the one streaming join
    shape the family didn't cover (streaming_attribution is
    stream-STREAM): the events parquet replayed as a file-source
    stream, inner-joined per micro-batch against the STATIC customer
    dimension, rolled up per market segment in complete mode — the
    enrich-then-aggregate pattern of every 100 TB event pipeline
    (facts stream in, dims are tables). Spark re-plans the static side
    each micro-batch, so a dim swap is picked up without restarting
    the query; no watermark is needed because the static side never
    grows stale state. Oracle = the identical BATCH join + rollup —
    the same stream/batch parity contract as streaming_hourly.
    Exact-cents e4 quantization keeps the sum order-independent."""
    from parquet_sampler_spark.streaming.sampling import read_event_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dim = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    with _stream_shuffle(spark):
        src = read_event_stream(spark, f"{sf_dir}/events.parquet")
        joined = src.join(
            dim, src["user_id"] == dim["c_custkey"], "inner"
        )
        agg = (
            joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                _value_e4_sum().alias("sum_value"),
            )
        )
        name = f"psx_stream_enrich_{next(_STREAM_SEQ)}"
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
    return spark.table(name)


_SQL_STREAMING_ENRICH = f"""
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       {_VALUE_E4_SUM_SQL} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# Training-sequence packing (concat-then-chunk, r09)
# ---------------------------------------------------------------------------

_PACK_CAP = 2048
_PACK_SHARDS = 8


def _q_pack_sequences(spark, sf_dir):
    """GPT-style training-sequence packing (r09): every document's
    place under concat-then-chunk — the corpus hash-sharded, each
    shard's documents concatenated in doc_id order into one token
    stream, the stream sliced into back-to-back 2048-token training
    sequences, documents straddling a boundary split across
    consecutive sequences. Output = per-doc (seq_first, seq_last,
    n_seqs, seq_offset). ONE cumulative-sum window per hash-balanced
    shard, all-JVM integer arithmetic — packing is sequential within a
    stream by definition; sharding is how pipelines bound that, and
    n_shards scales with the corpus."""
    from parquet_sampler_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d, "doc_id", "text", cap=_PACK_CAP, n_shards=_PACK_SHARDS
    )


def _sql_pack_sequences() -> str:
    from parquet_sampler_spark.functions.text import token_count_sql

    cap, ns = _PACK_CAP, _PACK_SHARDS
    # shard uses NON-NEGATIVE remainder on both sides: the operator's
    # F.pmod and this ((x % n) + n) % n agree for negative ids too
    # (DuckDB's bare % keeps the sign), so oracle parity doesn't depend
    # on the gate corpus's non-negative doc_ids
    return f"""
WITH base AS (
  SELECT doc_id, ((doc_id % {ns}) + {ns}) % {ns} AS shard,
         {token_count_sql('text')} AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_end
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens) // {cap} AS seq_first,
       (cum_end - 1) // {cap} AS seq_last,
       (cum_end - n_tokens) % {cap} AS seq_offset,
       (cum_end - 1) // {cap} - (cum_end - n_tokens) // {cap} + 1 AS n_seqs
FROM c
"""


# ---------------------------------------------------------------------------
# Domain-mixture resampling (r09)
# ---------------------------------------------------------------------------

# skewed literal target mixture over the 20 gate sources (w = k%5 + 1)
_MIX_WEIGHTS = {f"src{k}": k % 5 + 1 for k in range(20)}
_MIX_SEED = 29


def _q_mixture_resample(spark, sf_dir):
    """Domain-mixture resampling (r09): deterministic hash-downsample
    per source so the kept corpus's expected token mixture matches a
    literal target (DoReMi-style data mixing, no upsampling — the
    scarcest-relative-to-weight source is kept whole). Thresholds are
    exact big-int arithmetic from ONE bounded per-source token agg;
    the corpus is filtered in place via a broadcast threshold join and
    never shuffles; any row's keep/drop is recomputable from its id
    alone."""
    from parquet_sampler_spark.operators.sample import mixture_resample

    d = _t(spark, sf_dir, "documents")
    return mixture_resample(
        d, "doc_id", "text", "source", _MIX_WEIGHTS, seed=_MIX_SEED
    )


def _mix_ctes(from_rel: str) -> str:
    """The mixture-resample threshold CTE chain over ``from_rel``
    (exact big-int thresholds; binding source = min tok/wt, ties to
    the smallest name) — shared by the standalone mixture_resample
    oracle and the curation_pipeline composite. Ends at ``thr``; the
    caller writes the kept-rows select."""
    from parquet_sampler_spark.functions.hashing import MODULUS
    from parquet_sampler_spark.functions.text import token_count_sql

    values = ", ".join(
        f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""w(source, wt) AS (VALUES {values}),
mtok AS (
  SELECT d.source, CAST(sum({token_count_sql('d.text')}) AS BIGINT) AS tok
  FROM {from_rel} d JOIN w USING (source)
  GROUP BY d.source
),
tw AS (
  SELECT t.source, t.tok, w.wt FROM mtok t JOIN w USING (source)
  WHERE t.tok > 0
),
m AS (
  SELECT a.source, a.tok, a.wt FROM tw a
  WHERE NOT EXISTS (
    SELECT 1 FROM tw b
    WHERE CAST(b.tok AS HUGEINT) * a.wt < CAST(a.tok AS HUGEINT) * b.wt
       OR (CAST(b.tok AS HUGEINT) * a.wt = CAST(a.tok AS HUGEINT) * b.wt
           AND b.source < a.source)
  )
),
thr AS (
  SELECT tw.source,
         CAST((CAST({MODULUS} AS HUGEINT) * m.tok * tw.wt)
              // (CAST(m.wt AS HUGEINT) * tw.tok) AS BIGINT) AS thr
  FROM tw, m
)"""


def _sql_mixture_resample() -> str:
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql
    from parquet_sampler_spark.functions.text import token_count_sql

    h = lehmer_hash_sql(["doc_id"], _MIX_SEED)
    return ("WITH " + _mix_ctes("documents") + f"""
SELECT d.doc_id, d.source, {token_count_sql('d.text')} AS n_tokens
FROM documents d JOIN thr ON d.source = thr.source
WHERE {h} < thr.thr
""")


# ---------------------------------------------------------------------------
# SemDeDup semantic deduplication (r09)
# ---------------------------------------------------------------------------

_SEM_NLIST_DIV = 256     # nlist = max(16, corpus_rows // 256): cells stay
_SEM_TAU = 0.92          # ~constant size as the corpus grows
_SEM_SEED = 42
_SEM_INJECT_EVERY = 5
_SEM_ID_OFFSET = 1_000_000_000
_SEM_MODEL_CACHE: dict = {}
_SEM_SQL_CACHE: dict[str, str] = {}


def _sem_nlist(sf_dir: str) -> int:
    from parquet_sampler_spark.sources.io import metadata_row_count

    n = metadata_row_count(f"{sf_dir}/embeddings.parquet")
    return max(16, n // _SEM_NLIST_DIV)


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup semantic deduplication (Abbas et al. 2023, r09): KMeans
    cells bound the pairwise-cosine sweep (only within-cell pairs are
    compared; of any pair with cosine >= 0.92 the higher id drops —
    min-id keeper). nlist grows with the corpus (metadata row count //
    256) so cells stay ~constant size — the quadratic term is O(n) at
    any scale; the price is the paper's cross-cell miss class. The gate
    corpus has no semantic dups, so a deterministic re-crawl batch is
    injected (every 5th vector re-ingested bit-identical under a
    shifted id — same cell and cosine exactly 1.0 by construction);
    the oracle replicates injection, training (shared numpy
    sketch+Lloyd via integer centroid literals), integer-quantized cell
    assignment, and the engine-exact left-to-right unit dot."""
    from parquet_sampler_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    injected = e.filter(F.col("vec_id") % _SEM_INJECT_EVERY == 0).select(
        (F.col("vec_id") + _SEM_ID_OFFSET).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(injected)
    return semantic_dedup(
        corpus, "vec_id", "embedding",
        nlist=_sem_nlist(sf_dir), tau=_SEM_TAU, seed=_SEM_SEED,
        model_cache=_SEM_MODEL_CACHE,
        cache_key=(spark.sparkContext.applicationId, sf_dir,
                   _SEM_NLIST_DIV, _SEM_SEED),
    )


def _sql_semantic_dedup() -> str:
    """DuckDB twin of _q_semantic_dedup, built like _sql_ann_ivf: the
    injected corpus is reassembled from the raw parquet, the identical
    centroids are re-trained in shared numpy and inlined as integer
    literals, and assignment/pairing/dropping replay in exact integer
    (cells) and IEEE-exact (cosines) arithmetic."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import _IVF_QSCALE

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if sf_dir in _SEM_SQL_CACHE:
        return _SEM_SQL_CACHE[sf_dir]
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mask = ids % _SEM_INJECT_EVERY == 0
    all_ids = np.concatenate([ids, ids[mask] + _SEM_ID_OFFSET])
    all_vecs = np.concatenate([vecs, vecs[mask]])
    nlist = max(16, len(ids) // _SEM_NLIST_DIV)
    from parquet_sampler_spark.operators.similarity import (
        _fit_coarse_hierarchy,
        ivf_train_sketch_numpy,
    )

    X = ivf_train_sketch_numpy(all_ids, all_vecs, nlist, _SEM_SEED)
    supers, cents, owner = _fit_coarse_hierarchy(X, nlist, _SEM_SEED, 20)
    ci = np.floor(cents * _IVF_QSCALE).astype(np.int64)

    def _vec_lit(c) -> str:
        return "[" + ", ".join(str(int(x)) for x in c) + "]::BIGINT[]"

    sqdist = ("list_sum(list_transform(range(1, len(v) + 1), "
              "j -> (v[j] - cv[j]) * (v[j] - cv[j])))")
    if supers is None:
        rows = ",\n".join(
            f"({j}, {_vec_lit(c)})" for j, c in enumerate(ci)
        )
        assign_ctes = f"""cents(cell, cv) AS (VALUES
{rows}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vi.vec_id, cents.cell,
           row_number() OVER (PARTITION BY vi.vec_id
                              ORDER BY {sqdist}, cell) AS rn
    FROM vi CROSS JOIN cents) WHERE rn = 1
)"""
    else:
        # hierarchical assignment above the two-level threshold:
        # nearest super-cell first (sv literals), then argmin over
        # ONLY that super's sub-centroids — the exact pick order the
        # operator's cell_of replays (ties: lowest s, lowest cell)
        si = np.floor(supers * _IVF_QSCALE).astype(np.int64)
        srows = ",\n".join(
            f"({j}, {_vec_lit(s)})" for j, s in enumerate(si)
        )
        crows = ",\n".join(
            f"({j}, {int(owner[j])}, {_vec_lit(c)})"
            for j, c in enumerate(ci)
        )
        sdist = ("list_sum(list_transform(range(1, len(v) + 1), "
                 "j -> (v[j] - sv[j]) * (v[j] - sv[j])))")
        assign_ctes = f"""supers(s, sv) AS (VALUES
{srows}
),
cents(cell, own, cv) AS (VALUES
{crows}
),
sassign AS (
  SELECT vec_id, s FROM (
    SELECT vi.vec_id, supers.s,
           row_number() OVER (PARTITION BY vi.vec_id
                              ORDER BY {sdist}, s) AS rn
    FROM vi CROSS JOIN supers) WHERE rn = 1
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vi.vec_id, cents.cell,
           row_number() OVER (PARTITION BY vi.vec_id
                              ORDER BY {sqdist}, cell) AS rn
    FROM vi JOIN sassign USING (vec_id)
            JOIN cents ON cents.own = sassign.s) WHERE rn = 1
)"""
    cos = unit_dot_sql("a.v", "b.v")
    sql = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_SEM_ID_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % {_SEM_INJECT_EVERY} = 0
),
vi AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {_IVF_QSCALE})
                       AS BIGINT)) AS v
  FROM corpus
),
{assign_ctes},
{normalized_cte_sql('corpus')},
members AS (
  SELECT a.vec_id, a.cell, n.v
  FROM assign a JOIN normed n USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM members a JOIN members b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {cos} >= {_SEM_TAU}
)
SELECT a.vec_id, a.cell FROM assign a
WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
"""
    _SEM_SQL_CACHE[sf_dir] = sql
    return sql


# ---------------------------------------------------------------------------
# Nearest-direction as-of attribution with tolerance (r09)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_TOL_US = 1_800_000_000  # 30 minutes in epoch micros


def _q_asof_nearest(spark, sf_dir):
    """Attribution by the NEAREST click within +/-30 minutes (r09):
    asof_join's full merge_asof surface — direction='nearest' picks
    whichever of the latest-preceding / earliest-following click is
    closer (equal distances break to the backward row), and the
    tolerance voids matches farther than 30 minutes. Same union-merge
    plan as the backward row (ONE shuffle per key; the forward carry
    is a second sort over the same exchange, never a pair join);
    the oracle replays the pick with an all-candidates window over
    the identical distance/side/struct tie chain."""
    from parquet_sampler_spark.operators.asof import asof_join

    e = _events(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id").alias("click_event_id")
    )
    out = asof_join(
        purchases, clicks, ["user_id"], "ts_us", "ts_us",
        ["click_event_id"], how="inner", direction="nearest",
        tolerance=_ASOF_NEAREST_TOL_US,
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("asof_ts_us").alias("click_ts_us"),
        F.col("asof_click_event_id").alias("click_event_id"),
    )


_SQL_ASOF_NEAREST = f"""
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
           WHERE event_type = 'purchase'),
     c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS click_event_id
           FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.event_id, p.user_id, p.ts_us, c.ts_us AS cts, c.click_event_id,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY
             CASE WHEN c.ts_us <= p.ts_us THEN p.ts_us - c.ts_us
                  ELSE c.ts_us - p.ts_us END,
             CASE WHEN c.ts_us <= p.ts_us THEN 0 ELSE 1 END,
             CASE WHEN c.ts_us <= p.ts_us THEN -c.click_event_id
                  ELSE c.click_event_id END
         ) AS rn
  FROM p JOIN c USING (user_id)
  WHERE (CASE WHEN c.ts_us <= p.ts_us THEN p.ts_us - c.ts_us
              ELSE c.ts_us - p.ts_us END) <= {_ASOF_NEAREST_TOL_US}
)
SELECT event_id, user_id, ts_us, cts AS click_ts_us, click_event_id
FROM cand WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# BPE merge rounds — tokenizer vocabulary induction (r09)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 4

# session-scoped merge tables: the trainer is deterministic given
# (corpus, rounds), so the four BPE rows legitimately share ONE fit —
# the _PAIRS_CACHE pattern. The cached value is the COLLECTED K-row
# table (bounded by construction), not a DataFrame, so there is
# nothing to unpersist; bench charges the fit to setup_bpe_model /
# setup_bpe_holdout_model. Cleared by queries.clear_caches().
_BPE_MERGES_CACHE: dict = {}


def _bpe_merges_cached(spark, sf_dir, train_sources=None):
    import os as _os

    key = (
        spark.sparkContext.applicationId,
        _os.path.abspath(_os.path.normpath(sf_dir)),
        _BPE_ROUNDS,
        tuple(train_sources or ()),
    )
    if key not in _BPE_MERGES_CACHE:
        from parquet_sampler_spark.operators.vocab import bpe_merge_rounds

        d = _t(spark, sf_dir, "documents")
        if train_sources:
            d = d.filter(F.col("source").isin(list(train_sources)))
        rows = bpe_merge_rounds(
            d, "doc_id", "text", rounds=_BPE_ROUNDS
        ).collect()
        _BPE_MERGES_CACHE[key] = [
            (r["round"], r["pair"], r["merged"], r["cnt"]) for r in rows
        ]
    return _BPE_MERGES_CACHE[key]


def _q_bpe_merges(spark, sf_dir):
    """Tokenizer vocabulary induction (r09): the first 4 rounds of the
    BPE trainer loop (Sennrich et al. 2016) over the documents corpus —
    each round ONE corpus scan counting every adjacent token pair
    (map-side partial + TakeOrderedAndProject(1); the single winning
    row is the only driver collect), then a pure string-expression
    rewrite merging the winner greedily leftmost-first (canonical BPE;
    ties break to the lexicographically smallest pair). Output = the
    merge table, the first K lines of a merges.txt. Oracle = the same
    K rounds as chained CTE stages with identical count/tie/rewrite
    primitives. The fit is session-cached (bounded K-row table) and
    shared with the encode/packing rows — bench charges it to
    setup_bpe_model."""
    rows = _bpe_merges_cached(spark, sf_dir)
    return spark.createDataFrame(
        rows, "round int, pair string, merged string, cnt bigint"
    )


def _bpe_round_ctes(
    rounds: int, carry: str = "", where: str = ""
) -> list[str]:
    """The shared K-round BPE CTE chain: per round, adjacent-pair
    counts ``p{r}`` from stream ``s{r-1}``, the winner ``w{r}``
    (max count, ties to the smallest pair string), and the rewritten
    stream ``s{r}`` (greedy leftmost-first via the double-space
    boundary expansion — the trainer's exact rewrite). ``carry``
    names extra columns (e.g. ``"doc_id, "``) threaded through the
    rewrite stages so the encode oracle keeps per-doc identity; the
    pair counting always ignores them (corpus-wide counts).
    ``where`` is an extra conjunct on the training stream (e.g. a
    source predicate for the held-out-corpus encode row)."""
    ctes = [f"s0 AS (SELECT {carry}trim(text) AS t FROM documents "
            f"WHERE length(trim(text)) > 0{where})"]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        ctes.append(f"""p{r} AS (
  SELECT t1 || ' ' || t2 AS p, count(*) AS c
  FROM (
    SELECT tk[i] AS t1, tk[i + 1] AS t2
    FROM (SELECT string_split(t, ' ') AS tk FROM {prev}) q,
         unnest(range(1, len(tk))) AS u(i)
  ) GROUP BY p
)""")
        ctes.append(f"""w{r} AS (
  SELECT p, c, replace(p, ' ', '_') AS m,
         ' ' || replace(p, ' ', '  ') || ' ' AS findp,
         ' ' || replace(p, ' ', '_') || ' ' AS replp
  FROM p{r} ORDER BY c DESC, p LIMIT 1
)""")
        ctes.append(f"""s{r} AS (
  SELECT {carry}trim(replace(replace(' ' || replace(t, ' ', '  ') || ' ',
           (SELECT findp FROM w{r}), (SELECT replp FROM w{r})),
         '  ', ' ')) AS t
  FROM {prev}
)""")
    return ctes


def _sql_bpe_merges() -> str:
    ctes = _bpe_round_ctes(_BPE_ROUNDS)
    selects = [
        f"SELECT {r} AS round, p AS pair, m AS merged, "
        f"CAST(c AS BIGINT) AS cnt FROM w{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    ]
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL ".join(selects))


def _q_bpe_encode(spark, sf_dir):
    """BPE encode/apply (r10, VERDICT r9 #3): induce the 4-round merge
    table (bpe_merge_rounds), then APPLY it to the corpus —
    vocabulary-true tokenization closing the tokenizer loop (token
    counts elsewhere are whitespace counts). Output = per-doc encoded
    symbol stream + its vocabulary-true token count. The oracle chains
    the SAME K winner/rewrite CTEs with doc_id carried through the
    rewrite stages, so every encoded byte is value-hash checked. Plan:
    K trainer scans (TakeOrderedAndProject(1) each) + ONE encode pass
    of stacked string expressions fused into the scan — no shuffle."""
    from parquet_sampler_spark.operators.vocab import bpe_encode

    d = _t(spark, sf_dir, "documents")
    pairs = [p for _, p, _, _ in _bpe_merges_cached(spark, sf_dir)]
    enc = bpe_encode(
        d.filter(F.length(F.trim(F.col("text"))) > 0), "text", pairs
    )
    return enc.select(
        "doc_id",
        F.size(F.split(F.col("bpe_text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
        "bpe_text",
    )


def _sql_bpe_encode() -> str:
    last = f"s{_BPE_ROUNDS}"
    ctes = _bpe_round_ctes(_BPE_ROUNDS, carry="doc_id, ")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT doc_id,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
       t AS bpe_text
FROM {last}
""")


def _q_bpe_roundtrip(spark, sf_dir):
    """BPE decode inverts encode (r12): apply the fitted merge table,
    then replay it in REVERSE (bpe_decode) and compare with the
    original — decode(encode(text)) == trim(text), the invertibility
    contract a tokenizer owes its corpus. The oracle chains the SAME
    winner CTEs forward (encode) and then backward (decode stages
    reusing each winner's find/replace patterns swapped), so both the
    encoded token counts AND the per-doc roundtrip verdicts are
    value-hash checked. Plan: 2K stacked string expressions fused
    into one scan — no shuffle, no Python (same shape as encode)."""
    from parquet_sampler_spark.operators.vocab import (
        bpe_decode, bpe_encode,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = [p for _, p, _, _ in _bpe_merges_cached(spark, sf_dir)]
    base = d.filter(F.length(F.trim(F.col("text"))) > 0)
    enc = bpe_encode(base, "text", pairs)
    dec = bpe_decode(enc, "bpe_text", pairs, out_col="__dec")
    return dec.select(
        "doc_id",
        F.size(F.split(F.col("bpe_text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
        (F.col("__dec") == F.trim(F.col("text"))).alias("roundtrip_ok"),
    )


def _sql_bpe_roundtrip() -> str:
    last = f"s{_BPE_ROUNDS}"
    ctes = _bpe_round_ctes(_BPE_ROUNDS, carry="doc_id, ")
    # decode chain: undo the merges last-first — each stage swaps the
    # winner's find/replace patterns inside the same double-space
    # boundary expansion the encode stages use
    ctes.append(f"d{_BPE_ROUNDS} AS (SELECT doc_id, t FROM {last})")
    for r in range(_BPE_ROUNDS, 0, -1):
        ctes.append(f"""d{r - 1} AS (
  SELECT doc_id, trim(replace(replace(' ' || replace(t, ' ', '  ') || ' ',
           (SELECT replp FROM w{r}), (SELECT findp FROM w{r})),
         '  ', ' ')) AS t
  FROM d{r}
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT e.doc_id,
       CAST(len(string_split(e.t, ' ')) AS BIGINT) AS n_tokens,
       d0.t = trim(doc.text) AS roundtrip_ok
FROM {last} e
JOIN d0 ON d0.doc_id = e.doc_id
JOIN documents doc ON doc.doc_id = e.doc_id
""")


# ---------------------------------------------------------------------------
# Corpus-statistics quality scoring (r10): unigram-LM rarity filter and
# fixed-point TF-IDF top terms — the CCNet-style quality gate the
# registry still lacked (operators/quality.py)
# ---------------------------------------------------------------------------

_RARITY_SCALE = 1000
_RARITY_KEEP_BELOW = 31_000
_TFIDF_K = 3
_TFIDF_SCALE = 1_000_000


def _q_quality_rarity(spark, sf_dir):
    """CCNet-style unigram-LM quality filter (r10), exact-arithmetic
    variant: corpus unigram counts -> per-token integer rarity
    (total DIV cnt, monotone in surprisal) -> per-doc (n_tokens,
    sum_rarity, fixed-point mean, kept-at-literal-threshold). ONE
    token hash agg (map-side partial, output = vocabulary), the
    vocabulary broadcast back onto the token stream, ONE per-doc agg —
    document text never shuffles. All-integer output so the value
    hash is order-independent (a true KenLM perplexity sums
    transcendentals; see operators/quality.py docstring)."""
    from parquet_sampler_spark.operators.quality import unigram_rarity

    d = _t(spark, sf_dir, "documents")
    return unigram_rarity(
        d,
        "doc_id",
        "text",
        scale=_RARITY_SCALE,
        keep_below=_RARITY_KEEP_BELOW,
    )


def _rarity_ctes(from_rel: str) -> str:
    """The unigram-rarity CTE chain over ``from_rel`` — shared by the
    standalone quality_rarity oracle and the curation_pipeline
    composite (CTE names are r-prefixed so the chain embeds cleanly
    next to the mixture/packing fragments)."""
    return f"""rtoks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM {from_rel} WHERE text IS NOT NULL AND length(trim(text)) > 0
),
rvocab AS (SELECT tok, count(*) AS cnt FROM rtoks GROUP BY tok),
rtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM rvocab),
rrar AS (
  SELECT tok, CAST((SELECT total FROM rtot) // cnt AS BIGINT) AS rarity
  FROM rvocab
),
rscore AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(rarity) AS BIGINT) AS sum_rarity
  FROM rtoks JOIN rrar USING (tok) GROUP BY doc_id
)"""


def _sql_quality_rarity() -> str:
    return ("WITH " + _rarity_ctes("documents") + f"""
SELECT doc_id, n_tokens, sum_rarity,
       CAST(({_RARITY_SCALE} * sum_rarity) // n_tokens AS BIGINT)
         AS mean_rarity_scaled,
       ({_RARITY_SCALE} * sum_rarity) // n_tokens
         <= {_RARITY_KEEP_BELOW} AS kept
FROM rscore
""")


def _q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity buckets (r12, Wenzek et al.
    2020): per language, documents split into 3 equal-count tiles by
    ascending unigram-LM mean rarity (low = fluent = head, what CCNet
    keeps). Tile semantics are exactly SQL NTILE(3) per language —
    but the plan never sorts raw docs in a whole-language window:
    exact ranks decompose into a per-(lang, score) count aggregate, a
    CDF window over that AGGREGATE (Θ(distinct scores) rows), a
    broadcast join-back, and a tie-group row_number — the skew-safe
    exact-ntile shape for languages that span most of a corpus."""
    from parquet_sampler_spark.operators.quality import ccnet_buckets

    d = _t(spark, sf_dir, "documents")
    return ccnet_buckets(
        d, "doc_id", "text", "lang", nbuckets=3, scale=_RARITY_SCALE
    )


def _sql_ccnet_buckets() -> str:
    return ("WITH " + _rarity_ctes("documents") + f"""
, sc AS (
  SELECT r.doc_id, d.lang,
         CAST(({_RARITY_SCALE} * r.sum_rarity) // r.n_tokens AS BIGINT)
           AS mean_rarity_scaled
  FROM rscore r JOIN documents d USING (doc_id)
),
tiled AS (
  SELECT doc_id, lang, mean_rarity_scaled,
         CAST(NTILE(3) OVER (PARTITION BY lang
                             ORDER BY mean_rarity_scaled, doc_id)
              AS INTEGER) AS bucket
  FROM sc
)
SELECT doc_id, lang, mean_rarity_scaled, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket_label
FROM tiled
""")


_WINNOW_K = 4
_WINNOW_W = 4
_WINNOW_MIN_SHARED = 2


def _q_winnow_pairs(spark, sf_dir):
    """Winnowing-fingerprint pairs (r12, Schleimer et al. 2003 /
    MOSS): docs sharing >= 2 winnowed fingerprints (k=4-token grams,
    w=4 window minima) — position-aware shared-substring detection at
    ~2/(w+1) of the gram-stream index size, guaranteeing any shared
    run >= w+k−1 tokens is caught. Selection is one per-row
    expression chain fused into the scan; pairs come from the
    inverted-index self-join on the (deduped, density-bounded)
    fingerprints; `max_fp_df` is the hot-key cap of the family."""
    from parquet_sampler_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W, min_shared=_WINNOW_MIN_SHARED,
    )


_WINNOW_CAP = 2


def _q_winnow_pairs_capped(spark, sf_dir):
    """The hot-fingerprint-capped sibling (r12): same selection, but
    fingerprints in more than ``max_fp_df`` docs are excluded from
    PAIR FORMATION (n_shared under-counts by the dropped prints,
    emitted-pair precision stays exact — the jaccard_pairs_capped
    contract). The Heaps decade-3 cells are the why: uncapped the
    hot-fp head (max df 195 → 1,812 across the decade — stopword-run
    prints scale with the corpus) drives pair output ×16.3 per ×10
    docs (α 1.07); capped at 64 the output returns to ×9.9 and α to
    0.97. The cap ships as a BROADCAST ANTI-join of the tiny over-cap
    head — never a keep-side broadcast, which is Θ(corpus tokens)
    (measured >8 GiB at the sf100 tier: the first cut did exactly
    that and died on the broadcast ceiling). Gate-scale cap = 2 so
    the drop is witnessed at sf0.01 (26 → 23 pairs); production caps
    are corpus-calibrated."""
    from parquet_sampler_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W, min_shared=_WINNOW_MIN_SHARED,
        max_fp_df=_WINNOW_CAP,
    )


def _q_winnow_pairs_censused(spark, sf_dir):
    """The CALIBRATED cap (r13, VERDICT r12 #2): ``max_fp_df`` set
    from the corpus's own fingerprint-df census — exact p99.9 of the
    df distribution with a floor of 2 (operators/dedup.
    winnow_fp_census) — instead of a hand-picked constant. The census
    is one extra df aggregation whose HISTOGRAM (distinct df values,
    a few thousand rows at any corpus size) is collapsed driver-side;
    the fingerprint relation is persisted so census and pair join
    share one computation. The oracle replays the identical census in
    SQL (row_number rank over the ascending df list, value at
    ceil(0.999·n)), so the data-derived cap itself is value-checked,
    not just the capped output."""
    from parquet_sampler_spark.operators.dedup import winnow_pairs

    return winnow_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        k=_WINNOW_K, w=_WINNOW_W, min_shared=_WINNOW_MIN_SHARED,
        max_fp_df="census",
    )


def _sql_winnow_pairs(
    cap: int | None = None, census: bool = False
) -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        mixed_string_hash_sql,
    )

    k, w, m = _WINNOW_K, _WINNOW_W, _WINNOW_MIN_SHARED
    if census:
        # the exact driver-side census replicated in SQL: ascending
        # df rank, value at ceil(p*n), floor 2 (winnow_fp_census)
        cap_cte = """,
dfs AS (SELECT f, CAST(count(*) AS BIGINT) AS df FROM fp GROUP BY f),
capv AS (
  SELECT GREATEST(MIN(df), 2) AS cap FROM (
    SELECT df, row_number() OVER (ORDER BY df) AS rn,
           count(*) OVER () AS n FROM dfs) t
  WHERE rn >= CAST(ceil(0.999 * n) AS BIGINT)),
hot AS (SELECT f FROM dfs WHERE df > (SELECT cap FROM capv))"""
    else:
        cap_cte = "" if cap is None else f""",
hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > {cap})"""
    fp_rel = "fp" if (cap is None and not census) else (
        "(SELECT * FROM fp WHERE f NOT IN (SELECT f FROM hot))"
    )
    return f"""
WITH th AS (
  SELECT doc_id,
         list_transform(string_split(trim(text), ' '),
                        x -> {mixed_string_hash_sql('x')}) AS h
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(h) - {k} + 2),
             i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                                           h[i:i+{k - 1}]),
                              (acc, x) -> (acc * 31 + x) % {MODULUS}))
           AS gh
  FROM th WHERE len(h) >= {k + w - 1}
),
fp AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(gh) - {w} + 2),
                i -> list_aggregate(gh[i:i+{w - 1}], 'min'))) AS f
  FROM g
){cap_cte}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM {fp_rel} a JOIN {fp_rel} b
  ON a.f = b.f AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {m}
"""


_DIVERSITY_N = 2
_DIVERSITY_SCALE = 1_000_000


def _q_ngram_diversity(spark, sf_dir):
    """Per-source corpus bigram diversity (r12): distinct grams over
    total gram occurrences — the corpus-level inverse of the Gopher
    per-doc repetition score; the self-BLEU-style monitor a mixture
    pipeline watches per domain before a boilerplate-collapsed crawl
    poisons the mix. One (source, gram-hash) aggregate whose partial
    phase dedups per partition, one per-source rollup; grams travel
    as the shared polynomial hashes."""
    from parquet_sampler_spark.operators.quality import ngram_diversity

    return ngram_diversity(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source",
        n=_DIVERSITY_N, scale=_DIVERSITY_SCALE,
    )


def _sql_ngram_diversity() -> str:
    from parquet_sampler_spark.functions.hashing import (
        MODULUS,
        mixed_string_hash_sql,
    )

    n, scale = _DIVERSITY_N, _DIVERSITY_SCALE
    return f"""
WITH th AS (
  SELECT source,
         list_transform(string_split(trim(text), ' '),
                        x -> {mixed_string_hash_sql('x')}) AS h
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
g AS (
  SELECT source,
         list_reduce(list_prepend(CAST(0 AS BIGINT), h[i:i+{n - 1}]),
                     (acc, x) -> (acc * 31 + x) % {MODULUS}) AS gh
  FROM th, unnest(range(1, len(h) - {n} + 2)) AS u(i)
  WHERE len(h) >= {n}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT gh) AS BIGINT) AS n_distinct,
       CAST(({scale} * count(DISTINCT gh)) // count(*) AS BIGINT)
         AS diversity_scaled
FROM g GROUP BY source
"""


_BM25_TERMS = ("spark", "hash", "merge", "window")
_BM25_K = 10
_BM25_SCALE = 1_000_000


def _q_bm25_topk(spark, sf_dir):
    """Fixed-point BM25 retrieval (r12, Robertson/Okapi k1=1.2,
    b=0.75): top-10 documents for a 4-term query. The Okapi quotient
    multiplied through by 20·T is the exact integer ratio
    44·T·tf / (20·T·tf + 6·T + 18·N·dl); idf is the RSJ-monotone
    fixed-point surrogate (scale·(2(N−df)+1)) DIV (2df+1) — both
    engines compute identical integers (DECIMAL(38,0)/HUGEINT for
    the triple product). The token explode FILTERS to the query
    terms before any shuffle (rows ∝ query-term occurrences, never
    corpus tokens); dl rides the groupBy key; the ≤|Q|-row df table
    broadcasts; top-k is TakeOrderedAndProject."""
    from parquet_sampler_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        list(_BM25_TERMS), k=_BM25_K, scale=_BM25_SCALE,
    )


def _sql_bm25_topk() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    dl = TX.token_count_sql("text")
    return f"""
WITH base AS (
  SELECT doc_id, CAST({dl} AS BIGINT) AS dl FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
        AND {dl} > 0
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS tt
  FROM base
),
qtf AS (
  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT d.doc_id, b.dl,
           unnest(string_split(trim(d.text), ' ')) AS tok
    FROM documents d JOIN base b USING (doc_id)
  )
  WHERE tok IN ({terms})
  GROUP BY doc_id, dl, tok
),
dfreq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM qtf GROUP BY tok
),
term AS (
  SELECT q.doc_id, q.dl,
         CAST(
           (CAST(({_BM25_SCALE} * (2 * ((SELECT n_docs FROM stats) - f.df)
                                   + 1))
                 // (2 * f.df + 1) AS HUGEINT)
            * 44 * CAST((SELECT tt FROM stats) AS HUGEINT) * q.tf)
           // (20 * CAST((SELECT tt FROM stats) AS HUGEINT) * q.tf
               + 6 * (SELECT tt FROM stats)
               + 18 * CAST((SELECT n_docs FROM stats) AS HUGEINT) * q.dl)
           AS BIGINT) AS s
  FROM qtf q JOIN dfreq f USING (tok)
)
SELECT doc_id, dl,
       CAST(count(*) AS BIGINT) AS n_hit_terms,
       CAST(sum(s) AS BIGINT) AS score_scaled
FROM term GROUP BY doc_id, dl
ORDER BY score_scaled DESC, doc_id LIMIT {_BM25_K}
"""


_DSIR_TARGET_SOURCES = ("src0", "src1")
_DSIR_SELECT_AT = 0


def _q_dsir_select(spark, sf_dir):
    """DSIR-style importance selection (r12, Xie et al. 2023): fit
    unigram models on the TARGET slice (src0-src1 — the wiki-like
    corpus a practitioner points DSIR at) and on the raw corpus;
    score every doc by the exact-integer target-affinity surrogate
    Σ[rarity_raw − rarity_target] (OOV-in-target = max rarity, the
    shared holdout rule); select affinity >= 0. On this corpus the
    selected slice is ~2× enriched in target-source docs — the row
    witnesses real selection, not a constant flag. Two vocab fits,
    the combined model broadcast back, one per-doc agg — text never
    shuffles."""
    from parquet_sampler_spark.operators.quality import dsir_affinity

    d = _t(spark, sf_dir, "documents")
    tgt = d.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES))
    return dsir_affinity(
        d, "doc_id", "text", tgt,
        scale=_RARITY_SCALE, select_at=_DSIR_SELECT_AT,
    )


def _sql_dsir_select() -> str:
    srcs = ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES)
    return f"""
WITH dtoks AS (
  SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
rawv AS (SELECT tok, count(*) AS cr FROM dtoks GROUP BY tok),
rtot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr FROM rawv),
tgtv AS (
  SELECT tok, count(*) AS ct FROM dtoks
  WHERE source IN ({srcs}) GROUP BY tok
),
ttot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM tgtv),
tab AS (
  SELECT r.tok,
         CAST((SELECT tr FROM rtot) // r.cr AS BIGINT)
         - COALESCE(CAST((SELECT tt FROM ttot) // g.ct AS BIGINT),
                    (SELECT tt FROM ttot)) AS d
  FROM rawv r LEFT JOIN tgtv g USING (tok)
),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(d) AS BIGINT) AS aff
  FROM dtoks JOIN tab USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(({_RARITY_SCALE} * aff) // n_tokens AS BIGINT)
         AS affinity_scaled,
       ({_RARITY_SCALE} * aff) // n_tokens >= {_DSIR_SELECT_AT}
         AS selected
FROM sc
"""


def _q_quality_gopher(spark, sf_dir):
    """Gopher-style rule gate (r12, Rae et al. 2021 App. A1.1): five
    per-rule boolean flags (token count, mean word length, symbol
    ratio, alphabetic-word fraction, distinct-stopword presence) plus
    their conjunction — the heuristic pre-filter that complements the
    model-based rarity rows. Every comparison is integer arithmetic
    (rational thresholds applied as integer multiples), so the oracle
    is exact; one scan, pure row expressions, no shuffle."""
    from parquet_sampler_spark.operators.quality import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_quality_gopher() -> str:
    n = TX.token_count_sql("text")
    nospace = "replace(trim(coalesce(text, '')), ' ', '')"
    chars = f"length({nospace})"
    symbols = f"length(regexp_replace({nospace}, '[a-zA-Z0-9]', '', 'g'))"
    toks = "string_split(trim(coalesce(text, '')), ' ')"
    alpha = (f"len(list_filter({toks}, "
             f"w -> regexp_matches(w, '[a-zA-Z]')))")
    stopl = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])
    stops = f"len(list_intersect(list_distinct({toks}), [{stopl}]))"
    len_ok = f"({n} >= 20 AND {n} <= 100000)"
    word_len_ok = f"(3 * {n} <= {chars} AND {chars} <= 10 * {n})"
    symbol_ok = f"(100 * {symbols} <= 10 * {chars})"
    alpha_ok = f"(100 * {alpha} >= 80 * {n})"
    stop_ok = f"({stops} >= 2)"
    return f"""
SELECT doc_id,
       {n} AS n_tokens,
       {len_ok} AS len_ok,
       {word_len_ok} AS word_len_ok,
       {symbol_ok} AS symbol_ok,
       {alpha_ok} AS alpha_ok,
       {stop_ok} AS stop_ok,
       ({len_ok} AND {word_len_ok} AND {symbol_ok} AND {alpha_ok}
        AND {stop_ok}) AS kept
FROM documents
"""


def _q_cooccurrence_topk(spark, sf_dir):
    """Top-20 token associations by fixed-point lift (r12): the PMI
    argument (scale · pair_docs · n_docs) DIV (df_a · df_b) over
    document-level distinct co-occurrence — collocation mining, the
    pairwise member of the corpus-statistics family (rarity = unary,
    tf-idf = doc×term, this = term×term). Triple product in
    DECIMAL(38,0)/HUGEINT so the integers stay exact; top-k is
    orderBy+limit (TakeOrderedAndProject), ties broken by token
    order. On this corpus the planted near-dup marker tokens rank
    top — a genuine association witness."""
    from parquet_sampler_spark.operators.quality import cooccurrence_topk

    return cooccurrence_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        k=20, scale=1_000_000, min_pair_docs=2,
    )


def _sql_cooccurrence_topk() -> str:
    return """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
    FROM documents
    WHERE text IS NOT NULL AND length(trim(text)) > 0
  )
),
dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS pair_docs
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT tok_a, tok_b, CAST(pair_docs AS BIGINT) AS pair_docs,
       CAST((CAST(1000000 AS HUGEINT) * pair_docs * (SELECT n FROM nd))
            // (CAST(da.df AS HUGEINT) * db.df) AS BIGINT)
         AS lift_scaled
FROM pairs
JOIN dfreq da ON da.tok = pairs.tok_a
JOIN dfreq db ON db.tok = pairs.tok_b
ORDER BY lift_scaled DESC, tok_a, tok_b LIMIT 20
"""


def _q_tfidf_topk(spark, sf_dir):
    """Per-document top-3 terms by fixed-point TF-IDF (r10): tf =
    in-doc occurrence count, idf = (scale * n_docs) DIV df(term) —
    the transcendental-free integer idf, monotone in ln(N/df); ties
    break (score DESC, term ASC) so the hash is stable. ONE
    (doc, term) hash agg, vocabulary-sized df table broadcast back,
    ONE per-doc top-k window."""
    from parquet_sampler_spark.operators.quality import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(
        d, "doc_id", "text", k=_TFIDF_K, scale=_TFIDF_SCALE
    )


def _sql_tfidf_topk() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS ndf FROM tf GROUP BY tok),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
scored AS (
  SELECT tf.doc_id, tf.tok AS term, tf.tf,
         CAST(tf.tf * (({_TFIDF_SCALE} * (SELECT n FROM nd)) // df.ndf)
              AS BIGINT) AS score_scaled
  FROM tf JOIN df ON tf.tok = df.tok
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score_scaled DESC, term ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tf, score_scaled, rank
FROM ranked WHERE rank <= {_TFIDF_K}
"""


def _q_pack_sequences_bpe(spark, sf_dir):
    """Vocabulary-true sequence packing (r10, VERDICT r9 #3 follow-
    through): induce the 4-round BPE merge table, ENCODE the corpus
    with it, then run concat-then-chunk packing on the encoded
    symbol streams — so sequence boundaries fall at vocabulary-true
    token counts, not whitespace counts (the exact layout a tokenized
    GPT loader materializes). Plan: the K trainer scans + one fused
    encode pass + one cum-sum window per hash shard; the only driver
    rows are the K 1-row merge winners."""
    from parquet_sampler_spark.operators.packing import pack_sequences
    from parquet_sampler_spark.operators.vocab import bpe_encode

    d = _t(spark, sf_dir, "documents")
    pairs = [p for _, p, _, _ in _bpe_merges_cached(spark, sf_dir)]
    enc = bpe_encode(
        d.filter(F.length(F.trim(F.col("text"))) > 0), "text", pairs
    )
    return pack_sequences(
        enc, "doc_id", "bpe_text", cap=_PACK_CAP, n_shards=_PACK_SHARDS
    )


def _sql_pack_sequences_bpe() -> str:
    cap, ns = _PACK_CAP, _PACK_SHARDS
    last = f"s{_BPE_ROUNDS}"
    ctes = _bpe_round_ctes(_BPE_ROUNDS, carry="doc_id, ")
    return ("WITH " + ",\n".join(ctes) + f""",
base AS (
  SELECT doc_id, ((doc_id % {ns}) + {ns}) % {ns} AS shard,
         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
  FROM {last}
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_end
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens) // {cap} AS seq_first,
       (cum_end - 1) // {cap} AS seq_last,
       (cum_end - n_tokens) % {cap} AS seq_offset,
       (cum_end - 1) // {cap} - (cum_end - n_tokens) // {cap} + 1 AS n_seqs
FROM c
""")


# ---------------------------------------------------------------------------
# End-to-end curation composite (r10): quality filter -> exact dedup ->
# mixture resample -> sequence packing, as ONE composed plan
# ---------------------------------------------------------------------------


def _q_curation_pipeline(spark, sf_dir):
    """The full training-data curation journey as ONE composed plan
    (r10): unigram-rarity quality filter (keep the low-perplexity
    head, CCNet-style) -> exact dedup on text (min-id keeper) ->
    DoReMi-style mixture resample (thresholds recomputed on the
    SURVIVING corpus — order matters and the oracle proves it) ->
    concat-then-chunk sequence packing. Every stage is the library
    operator, chained; output = the packed layout of the curated
    corpus. Plan shape: the rarity stats join back by key-only
    semi-join (doc_id, never text), one dedup window, the mixture
    thresholds broadcast, one cum-sum window per pack shard."""
    from parquet_sampler_spark.operators.dedup import exact_dedup
    from parquet_sampler_spark.operators.packing import pack_sequences
    from parquet_sampler_spark.operators.quality import unigram_rarity
    from parquet_sampler_spark.operators.sample import mixture_resample

    d = _t(spark, sf_dir, "documents")
    scored = unigram_rarity(
        d, "doc_id", "text",
        scale=_RARITY_SCALE, keep_below=_RARITY_KEEP_BELOW,
    )
    kept = d.join(
        scored.filter(F.col("kept")).select("doc_id"),
        "doc_id", "left_semi",
    )
    deduped = exact_dedup(kept, ["text"], "doc_id")
    mixed = mixture_resample(
        deduped, "doc_id", "text", "source", _MIX_WEIGHTS,
        seed=_MIX_SEED, keep_cols=["text"],
    )
    return pack_sequences(
        mixed, "doc_id", "text", cap=_PACK_CAP, n_shards=_PACK_SHARDS
    )


def _sql_curation_pipeline() -> str:
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql
    from parquet_sampler_spark.functions.text import token_count_sql

    cap, ns = _PACK_CAP, _PACK_SHARDS
    h = lehmer_hash_sql(["doc_id"], _MIX_SEED)
    return ("WITH " + _rarity_ctes("documents") + f""",
kept AS (
  SELECT d.* FROM documents d JOIN rscore s ON d.doc_id = s.doc_id
  WHERE ({_RARITY_SCALE} * s.sum_rarity) // s.n_tokens
        <= {_RARITY_KEEP_BELOW}
),
dd AS (
  SELECT k.* FROM kept k
  WHERE k.doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
),
""" + _mix_ctes("dd") + f""",
mixed AS (
  SELECT d.doc_id, ((d.doc_id % {ns}) + {ns}) % {ns} AS shard,
         {token_count_sql('d.text')} AS n_tokens
  FROM dd d JOIN thr ON d.source = thr.source
  WHERE {h} < thr.thr
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_end
  FROM mixed WHERE n_tokens > 0
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens) // {cap} AS seq_first,
       (cum_end - 1) // {cap} AS seq_last,
       (cum_end - n_tokens) % {cap} AS seq_offset,
       (cum_end - 1) // {cap} - (cum_end - n_tokens) // {cap} + 1 AS n_seqs
FROM c
""")


def _q_curation_pipeline_bpe(spark, sf_dir):
    """The curation composite made vocabulary-true end-to-end (r11,
    VERDICT r10 #8): rarity quality filter -> exact dedup -> DoReMi
    mixture -> BPE ENCODE -> pack, as ONE composed plan. Where
    curation_pipeline packs on whitespace token counts, this row
    encodes every surviving document with the corpus-trained 4-round merge
    table first (the session-cached fit — the tokenizer is trained
    once, on the raw corpus, and applied to whatever curation ships),
    so sequence boundaries fall at vocabulary-true token counts — the
    exact layout a tokenized GPT loader materializes. Plan shape: the
    curation_pipeline chain (key-only semi-join, one dedup window,
    broadcast mixture thresholds) + the stacked pure-string encode
    expressions (no shuffle, no Python) + one cum-sum window per pack
    shard; the K merge winners are the only driver rows and are
    charged to setup_bpe_model."""
    from parquet_sampler_spark.operators.dedup import exact_dedup
    from parquet_sampler_spark.operators.packing import pack_sequences
    from parquet_sampler_spark.operators.quality import unigram_rarity
    from parquet_sampler_spark.operators.sample import mixture_resample
    from parquet_sampler_spark.operators.vocab import bpe_encode

    d = _t(spark, sf_dir, "documents")
    scored = unigram_rarity(
        d, "doc_id", "text",
        scale=_RARITY_SCALE, keep_below=_RARITY_KEEP_BELOW,
    )
    kept = d.join(
        scored.filter(F.col("kept")).select("doc_id"),
        "doc_id", "left_semi",
    )
    deduped = exact_dedup(kept, ["text"], "doc_id")
    mixed = mixture_resample(
        deduped, "doc_id", "text", "source", _MIX_WEIGHTS,
        seed=_MIX_SEED, keep_cols=["text"],
    )
    pairs = [p for _, p, _, _ in _bpe_merges_cached(spark, sf_dir)]
    enc = bpe_encode(
        mixed.filter(F.length(F.trim(F.col("text"))) > 0), "text", pairs
    )
    return pack_sequences(
        enc, "doc_id", "bpe_text", cap=_PACK_CAP, n_shards=_PACK_SHARDS
    )


def _sql_curation_pipeline_bpe() -> str:
    from parquet_sampler_spark.functions.hashing import lehmer_hash_sql

    cap, ns = _PACK_CAP, _PACK_SHARDS
    h = lehmer_hash_sql(["d.doc_id"], _MIX_SEED)
    bpe = _bpe_round_ctes(_BPE_ROUNDS)
    ctes = ",\n".join(bpe)
    out = (f"WITH {ctes},\n" + _rarity_ctes("documents") + f""",
kept AS (
  SELECT d.* FROM documents d JOIN rscore s ON d.doc_id = s.doc_id
  WHERE ({_RARITY_SCALE} * s.sum_rarity) // s.n_tokens
        <= {_RARITY_KEEP_BELOW}
),
dd AS (
  SELECT k.* FROM kept k
  WHERE k.doc_id IN (SELECT min(doc_id) FROM kept GROUP BY text)
),
""" + _mix_ctes("dd") + f""",
mixd AS (
  SELECT d.doc_id, d.text
  FROM dd d JOIN thr ON d.source = thr.source
  WHERE {h} < thr.thr
),
h0 AS (SELECT doc_id, trim(text) AS t FROM mixd
       WHERE length(trim(text)) > 0)""")
    for r in range(1, _BPE_ROUNDS + 1):
        out += f""",
h{r} AS (
  SELECT doc_id, trim(replace(replace(' ' || replace(t, ' ', '  ') || ' ',
           (SELECT findp FROM w{r}), (SELECT replp FROM w{r})),
         '  ', ' ')) AS t
  FROM h{r - 1}
)"""
    out += f""",
base AS (
  SELECT doc_id, ((doc_id % {ns}) + {ns}) % {ns} AS shard,
         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
  FROM h{_BPE_ROUNDS}
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_end
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, shard, n_tokens,
       (cum_end - n_tokens) // {cap} AS seq_first,
       (cum_end - 1) // {cap} AS seq_last,
       (cum_end - n_tokens) % {cap} AS seq_offset,
       (cum_end - 1) // {cap} - (cum_end - n_tokens) // {cap} + 1 AS n_seqs
FROM c
"""
    return out


# ---------------------------------------------------------------------------
# BPE holdout encode (r10): train-once / apply-everywhere
# ---------------------------------------------------------------------------

_BPE_TRAIN_SRC = [f"src{k}" for k in range(10)]


def _q_bpe_encode_holdout(spark, sf_dir):
    """Tokenizer train/apply split (r10): induce the 4-round merge
    table on the TRAIN half of the corpus (sources src0–src9), then
    apply it to the HELD-OUT half (src10–src19) — the real tokenizer
    lifecycle (merges.txt is trained once and applied to every new
    corpus), where the registered bpe_encode row trains and applies on
    the same data. Output = per-heldout-doc encoded stream +
    vocabulary-true token count. The oracle computes the winners from
    a train-filtered stream and replays them over a parallel
    heldout-carry chain, so cross-corpus application is value-hashed
    byte-for-byte."""
    from parquet_sampler_spark.operators.vocab import bpe_encode

    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin(_BPE_TRAIN_SRC)
    pairs = [
        p for _, p, _, _ in
        _bpe_merges_cached(spark, sf_dir, _BPE_TRAIN_SRC)
    ]
    hold = d.filter(
        (~is_train) & (F.length(F.trim(F.col("text"))) > 0)
    )
    enc = bpe_encode(hold, "text", pairs)
    return enc.select(
        "doc_id",
        F.size(F.split(F.col("bpe_text"), " ")).cast("bigint").alias(
            "n_tokens"
        ),
        "bpe_text",
    )


def _sql_bpe_encode_holdout() -> str:
    srcs = ", ".join(f"'{s}'" for s in _BPE_TRAIN_SRC)
    ctes = _bpe_round_ctes(
        _BPE_ROUNDS, where=f" AND source IN ({srcs})"
    )
    ctes.append(
        "h0 AS (SELECT doc_id, trim(text) AS t FROM documents "
        f"WHERE length(trim(text)) > 0 AND source NOT IN ({srcs}))"
    )
    for r in range(1, _BPE_ROUNDS + 1):
        ctes.append(f"""h{r} AS (
  SELECT doc_id, trim(replace(replace(' ' || replace(t, ' ', '  ') || ' ',
           (SELECT findp FROM w{r}), (SELECT replp FROM w{r})),
         '  ', ' ')) AS t
  FROM h{r - 1}
)""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT doc_id,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
       t AS bpe_text
FROM h{_BPE_ROUNDS}
""")


def _q_quality_rarity_inline(spark, sf_dir):
    """The inline (model-shipped) rarity scorer as its own correctness
    row (r10): same statistic as quality_rarity, computed the way
    CCNet runs at 10^9+ docs — the vocabulary rarity table (bounded by
    MODEL size) collects once and ships into an Arrow-batched
    mapInPandas scorer; the scoring pass has NO join and NO shuffle
    (plan-audited: zero Exchange). Shares quality_rarity's oracle
    verbatim because the integer arithmetic is bit-identical by
    construction (also pytest-pinned against the join path)."""
    from parquet_sampler_spark.operators.quality import unigram_rarity

    d = _t(spark, sf_dir, "documents")
    return unigram_rarity(
        d,
        "doc_id",
        "text",
        scale=_RARITY_SCALE,
        keep_below=_RARITY_KEEP_BELOW,
        inline=True,
    )


def _q_quality_rarity_holdout(spark, sf_dir):
    """Cross-corpus rarity scoring (r11, VERDICT r10 #1): fit the
    unigram model on the TRAIN half of the corpus (sources src0–src9,
    the bpe_encode_holdout split), ship it inline, and score the
    HELD-OUT half — the model's actual lifecycle (CCNet ships a
    trained LM to every worker and scores corpora it never fit on).
    The gate corpus's 31-token vocabulary is fully shared across
    sources, so the held-out text is perturbed DETERMINISTICALLY to
    witness the OOV path: docs with doc_id ≡ 0 (mod 4) get a
    doc_id-derived token ``unk<doc_id mod 3>`` appended — provably
    absent from the train vocabulary — and the oracle replays the
    identical perturbation (the dq_quarantine injection pattern).
    Unseen tokens score the max rarity ``total DIV 1``; the scoring
    pass is the zero-Exchange inline shape (plan-audited)."""
    from parquet_sampler_spark.operators.quality import unigram_rarity

    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin(_BPE_TRAIN_SRC)
    fit = d.filter(is_train)
    hold = d.filter(~is_train).select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(4)) == 0,
            F.concat(
                F.col("text"),
                F.lit(" unk"),
                F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return unigram_rarity(
        hold, "doc_id", "text",
        scale=_RARITY_SCALE, keep_below=_RARITY_KEEP_BELOW,
        fit_df=fit, inline=True,
    )


def _sql_quality_rarity_holdout() -> str:
    srcs = ", ".join(f"'{s}'" for s in _BPE_TRAIN_SRC)
    train_rel = f"(SELECT * FROM documents WHERE source IN ({srcs})) tdocs"
    return ("WITH " + _rarity_ctes(train_rel) + f""",
hdocs AS (
  SELECT doc_id,
         CASE WHEN ((doc_id % 4) + 4) % 4 = 0
              THEN text || ' unk' ||
                   CAST(((doc_id % 3) + 3) % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE source NOT IN ({srcs})
),
htoks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
  FROM hdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
hscore AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(coalesce(rrar.rarity,
                           (SELECT total FROM rtot) // 1)) AS BIGINT)
           AS sum_rarity
  FROM htoks LEFT JOIN rrar USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_rarity,
       CAST(({_RARITY_SCALE} * sum_rarity) // n_tokens AS BIGINT)
         AS mean_rarity_scaled,
       ({_RARITY_SCALE} * sum_rarity) // n_tokens
         <= {_RARITY_KEEP_BELOW} AS kept
FROM hscore
""")


_BIGRAM_PENALTY = 3


def _q_quality_rarity_bigram(spark, sf_dir):
    """Order-2 rarity with stupid-backoff (the continuity-notes depth
    candidate): fit bigram + unigram models on the TRAIN sources,
    score the held-out rest with the holdout row's deterministic
    ``unk<k>`` perturbation. The word-salad corpus makes bigrams
    sparse, so the scored text exercises ALL THREE branches at gate
    sf: seen bigrams (total2 DIV cnt2), unseen-bigram/seen-word
    stupid-backoff (penalty · unigram rarity), and unseen-word OOV
    (penalty · total1) via the appended unk tokens. All integers —
    the value-hash compares exact arithmetic, never a float log."""
    from parquet_sampler_spark.operators.quality import (
        bigram_rarity_backoff,
    )

    fit, hold = _rarity_holdout_split(spark, sf_dir)
    return bigram_rarity_backoff(
        hold, "doc_id", "text",
        scale=_RARITY_SCALE, penalty=_BIGRAM_PENALTY, fit_df=fit,
    )


def _q_quality_rarity_bigram_inline(spark, sf_dir):
    """The zero-Exchange inline shape of the order-2 scorer (r12):
    both model tables collected (vocabulary-bounded) and shipped into
    an Arrow-batched mapInPandas pass — no join, no shuffle of the
    scored corpus, the same promotion quality_rarity_inline made for
    order 1. Bit-identical integer output: the oracle is
    quality_rarity_bigram's verbatim."""
    from parquet_sampler_spark.operators.quality import (
        bigram_rarity_backoff,
    )

    fit, hold = _rarity_holdout_split(spark, sf_dir)
    return bigram_rarity_backoff(
        hold, "doc_id", "text",
        scale=_RARITY_SCALE, penalty=_BIGRAM_PENALTY, fit_df=fit,
        inline=True,
    )


def _sql_quality_rarity_bigram() -> str:
    srcs = ", ".join(f"'{s}'" for s in _BPE_TRAIN_SRC)
    grams = TX.word_ngrams_sql("text", 2, distinct=False)
    p = _BIGRAM_PENALTY
    return f"""
WITH fdocs AS (SELECT * FROM documents WHERE source IN ({srcs})),
fb AS (
  SELECT doc_id, unnest({grams}) AS bg
  FROM fdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
v2 AS (SELECT bg, count(*) AS cnt2 FROM fb GROUP BY bg),
t2 AS (SELECT CAST(sum(cnt2) AS BIGINT) AS total2 FROM v2),
r2 AS (
  SELECT bg, CAST((SELECT total2 FROM t2) // cnt2 AS BIGINT) AS rar2
  FROM v2
),
fu AS (
  SELECT unnest(string_split(trim(text), ' ')) AS tok
  FROM fdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
v1 AS (SELECT tok, count(*) AS cnt1 FROM fu GROUP BY tok),
t1 AS (SELECT CAST(sum(cnt1) AS BIGINT) AS total1 FROM v1),
r1 AS (
  SELECT tok, CAST((SELECT total1 FROM t1) // cnt1 AS BIGINT) AS rar1
  FROM v1
),
hdocs AS (
  SELECT doc_id,
         CASE WHEN ((doc_id % 4) + 4) % 4 = 0
              THEN text || ' unk' ||
                   CAST(((doc_id % 3) + 3) % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE source NOT IN ({srcs})
),
hb AS (
  SELECT doc_id, unnest({grams}) AS bg
  FROM hdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
hscore AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(coalesce(r2.rar2,
                           {p} * r1.rar1,
                           {p} * (SELECT total1 FROM t1)))
              AS BIGINT) AS sum_rarity
  FROM hb
  LEFT JOIN r2 USING (bg)
  LEFT JOIN r1 ON r1.tok = string_split(hb.bg, ' ')[2]
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_rarity,
       CAST(({_RARITY_SCALE} * sum_rarity) // n_bigrams AS BIGINT)
         AS mean_rarity_scaled
FROM hscore
"""


def _rarity_holdout_split(spark, sf_dir):
    """The shared fit/holdout split of the order-2/order-3 rarity
    rows: fit on the TRAIN sources, score the rest with the
    deterministic ``unk<k>`` perturbation (so the OOV branch is
    value-hash-exercised at gate sf)."""
    d = _t(spark, sf_dir, "documents")
    is_train = F.col("source").isin(_BPE_TRAIN_SRC)
    fit = d.filter(is_train)
    hold = d.filter(~is_train).select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(4)) == 0,
            F.concat(
                F.col("text"),
                F.lit(" unk"),
                F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return fit, hold


def _q_quality_rarity_trigram(spark, sf_dir):
    """Order-3 rarity with the FULL stupid-backoff chain (r13,
    VERDICT r12 #6 — the order CCNet-style filters actually ship):
    seen trigram → total3 DIV cnt3; unseen trigram, seen trailing
    bigram → penalty · bigram rarity; unseen bigram, seen word →
    penalty² · unigram rarity; unseen word → penalty² · total1. The
    word-salad corpus makes trigrams VERY sparse, so all four
    branches fire at gate sf (trigram hits come from repeated
    phrases; the unk perturbation forces the OOV tail). Same split
    and exact-integer contract as the order-2 row; one more
    vocabulary-sized broadcast join on the same exploded trigram
    stream — no extra corpus pass."""
    from parquet_sampler_spark.operators.quality import (
        trigram_rarity_backoff,
    )

    fit, hold = _rarity_holdout_split(spark, sf_dir)
    return trigram_rarity_backoff(
        hold, "doc_id", "text",
        scale=_RARITY_SCALE, penalty=_BIGRAM_PENALTY, fit_df=fit,
    )


def _q_quality_rarity_trigram_inline(spark, sf_dir):
    """The zero-Exchange inline shape of the order-3 scorer (r13):
    all THREE model tables collected (each cardinality-guarded
    against INLINE_VOCAB_MAX_ROWS) and shipped into one Arrow-batched
    mapInPandas pass; consecutive triples via two global shifts + a
    same-document mask (the r12 groupby-free pairing extended one
    position). Bit-identical integer output: the oracle is
    quality_rarity_trigram's verbatim."""
    from parquet_sampler_spark.operators.quality import (
        trigram_rarity_backoff,
    )

    fit, hold = _rarity_holdout_split(spark, sf_dir)
    return trigram_rarity_backoff(
        hold, "doc_id", "text",
        scale=_RARITY_SCALE, penalty=_BIGRAM_PENALTY, fit_df=fit,
        inline=True,
    )


def _sql_quality_rarity_trigram() -> str:
    srcs = ", ".join(f"'{s}'" for s in _BPE_TRAIN_SRC)
    g3 = TX.word_ngrams_sql("text", 3, distinct=False)
    g2 = TX.word_ngrams_sql("text", 2, distinct=False)
    p = _BIGRAM_PENALTY
    return f"""
WITH fdocs AS (SELECT * FROM documents WHERE source IN ({srcs})),
ft AS (
  SELECT doc_id, unnest({g3}) AS tg
  FROM fdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
v3 AS (SELECT tg, count(*) AS cnt3 FROM ft GROUP BY tg),
t3 AS (SELECT CAST(sum(cnt3) AS BIGINT) AS total3 FROM v3),
r3 AS (
  SELECT tg, CAST((SELECT total3 FROM t3) // cnt3 AS BIGINT) AS rar3
  FROM v3
),
fb AS (
  SELECT doc_id, unnest({g2}) AS bg
  FROM fdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
v2 AS (SELECT bg, count(*) AS cnt2 FROM fb GROUP BY bg),
t2 AS (SELECT CAST(sum(cnt2) AS BIGINT) AS total2 FROM v2),
r2 AS (
  SELECT bg, CAST((SELECT total2 FROM t2) // cnt2 AS BIGINT) AS rar2
  FROM v2
),
fu AS (
  SELECT unnest(string_split(trim(text), ' ')) AS tok
  FROM fdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
v1 AS (SELECT tok, count(*) AS cnt1 FROM fu GROUP BY tok),
t1 AS (SELECT CAST(sum(cnt1) AS BIGINT) AS total1 FROM v1),
r1 AS (
  SELECT tok, CAST((SELECT total1 FROM t1) // cnt1 AS BIGINT) AS rar1
  FROM v1
),
hdocs AS (
  SELECT doc_id,
         CASE WHEN ((doc_id % 4) + 4) % 4 = 0
              THEN text || ' unk' ||
                   CAST(((doc_id % 3) + 3) % 3 AS VARCHAR)
              ELSE text END AS text
  FROM documents WHERE source NOT IN ({srcs})
),
ht AS (
  SELECT doc_id, unnest({g3}) AS tg
  FROM hdocs WHERE text IS NOT NULL AND length(trim(text)) > 0
),
hscore AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         CAST(sum(coalesce(r3.rar3,
                           {p} * r2.rar2,
                           {p * p} * r1.rar1,
                           {p * p} * (SELECT total1 FROM t1)))
              AS BIGINT) AS sum_rarity
  FROM ht
  LEFT JOIN r3 USING (tg)
  LEFT JOIN r2
    ON r2.bg = string_split(ht.tg, ' ')[2] || ' ' ||
               string_split(ht.tg, ' ')[3]
  LEFT JOIN r1 ON r1.tok = string_split(ht.tg, ' ')[3]
  GROUP BY doc_id
)
SELECT doc_id, n_trigrams, sum_rarity,
       CAST(({_RARITY_SCALE} * sum_rarity) // n_trigrams AS BIGINT)
         AS mean_rarity_scaled
FROM hscore
"""


# ---------------------------------------------------------------------------
# Weighted near-dup (r10): integer-weighted Jaccard via multiset
# expansion through the UNCHANGED MinHash-LSH pipeline
# ---------------------------------------------------------------------------

_WMH_T = 0.8


def _q_minhash_pairs_weighted(spark, sf_dir):
    """TF-weighted near-dup pairs (r10): integer-weighted Jaccard
    Σmin(tf)/Σmax(tf) — repeated terms count with multiplicity, so a
    doc repeating boilerplate 50× no longer looks identical to one
    mentioning it once. Each token's k-th occurrence expands to a
    distinct element tok#k (pure per-row expression, no extra
    shuffle); the banded-LSH signature/verify pipeline is unchanged,
    so blocking stays O(docs × bands). Oracle: the exact weighted
    threshold-pairs SQL — precision is structural (exact verify) and
    recall at 8×4 bands is deterministically 1 on this corpus's
    planted near-dups (all qualifying pairs sit at j_w ≥ 0.9, miss
    probability (1−0.9⁴)⁸ ≈ 2e-4, seeded signatures). Threshold 0.8
    keeps the 12k-pair j_w ≥ 0.5 background (the word-salad corpus's
    shared tiny vocabulary) out of the result — the near-dup list,
    not a similarity matrix (the simhash row's sizing argument)."""
    from parquet_sampler_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=2, threshold=_WMH_T, weighted=True,
    ).select("id_a", "id_b", F.col("jaccard").alias("jaccard_w"))


def _q_minhash_pairs_weighted_win(spark, sf_dir):
    """The long-document escape for weighted near-dup (r11, VERDICT
    r10 #2; redesigned r12): identical statistic and output to
    minhash_pairs_weighted, but occurrence indexes come by COUNT — a
    per-(doc, gram) aggregate plus a sequence explode — instead of
    the per-row expression's O(L²) string compares, so a 10⁴-token
    doc is no longer a straggler (the r11 form used a row_number
    window; the grouped form deletes the sorts — dedup.py). Shares
    the exact weighted-threshold-pairs oracle verbatim (the multiset
    encoding is identical; only its derivation differs — also
    pytest-pinned equal to the expression path on a long-doc
    fixture)."""
    from parquet_sampler_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=2, threshold=_WMH_T, weighted="windowed",
    ).select("id_a", "id_b", F.col("jaccard").alias("jaccard_w"))


def _sql_minhash_pairs_weighted() -> str:
    GRAMS2 = TX.word_ngrams_sql("text", 2, distinct=False)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({GRAMS2}) AS tok
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS size_w FROM tf GROUP BY 1),
mins AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS min_sum
  FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(min_sum AS DOUBLE) /
       CAST(ta.size_w + tb.size_w - min_sum AS DOUBLE) AS jaccard_w
FROM mins JOIN tot ta ON ta.doc_id = mins.id_a
          JOIN tot tb ON tb.doc_id = mins.id_b
WHERE CAST(min_sum AS DOUBLE) /
      CAST(ta.size_w + tb.size_w - min_sum AS DOUBLE) >= {_WMH_T}
"""
