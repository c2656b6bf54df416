"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with .count() (full plan execution, no driver-side
collect overhead). A warmup query first absorbs JVM/codegen startup so
per-query times reflect steady-state execution.

Median protocol (round 7, revised round 14): the whole suite runs
``$SPARK_GRAFT_BENCH_REPS`` times (default 3) in one session and each
query's recorded time is the MEDIAN across suite passes — the r5→r6
cross-round comparison showed a +14% drift on identical code that sat
inside the measured ±30% single-shot host-noise band, so single-shot
numbers can't tell a real regression from a noisy neighbor.

Setup rows (r14, VERDICT r13 "What's wrong #3"): session caches are
now CLEARED between passes (``clear_caches()``), so every pass re-pays
the one-time builds inside its ``setup_*`` rows and those rows take
the median like everything else — under the old "setup rows keep
pass-1" rule a noisy first pass (r13: calibration_cpu 4.67 s vs
2.51/2.71 in passes 2-3) inflated every setup row by protocol
accident. Non-setup rows still measure the same warm state as before:
the builds happen first within each pass, so registry rows always run
against a fully-warmed session. The two SESSION_WARM_ROWS
(setup_streaming, setup_ngram_warm) are the exception — they absorb
once-per-SESSION costs (state-store/listener init, whole-stage-codegen
JIT) that no cache reset can bring back, so pass 2+ would measure ~0
of what they exist to capture; they keep the pass-1 cost. Raw
per-pass times land in BENCH_LOCAL.json (``raw`` key) for mover
attribution.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# rows whose output shape (left join against an aggregate-unique
# relation, no right column needed by count) lets Catalyst eliminate
# their real work under a bare .count() — forced with a full-row hash
# fold instead so the bench measures what a user materializes
FULL_EVAL_ROWS = frozenset({"decontaminate_scrub", "dup_triangles"})

# rows that absorb once-per-SESSION warmup (not cache builds): a cache
# reset cannot bring the cost back, so the median would record ~0 of
# what they exist to capture — they keep the pass-1 time
SESSION_WARM_ROWS = frozenset({"setup_streaming", "setup_ngram_warm"})

# rows whose cost is a per-pass build under the r14 cache-reset
# protocol (kept as an explicit set so ab_compare and the scaling
# harnesses can keep attributing them separately from query rows)
SETUP_ROWS = frozenset({
    "setup_pairs_graph", "setup_dup_graph", "setup_bucketed_tables",
    "setup_merge_batch", "setup_ivf_model", "setup_streaming",
    "setup_pq_model", "setup_ivfpq_model", "setup_sem_model",
    "setup_zorder", "setup_compaction", "setup_dpp",
    "setup_ivfpqr_model", "setup_ivfpqr8_model",
    "setup_ivf_hier_model", "setup_ivf_sized_model",
    "setup_ngram_warm",
    "setup_bpe_model", "setup_bpe_holdout_model",
    "setup_minhash_index", "setup_bigram_model",
    "setup_trigram_model",
    "setup_embneardup_index", "setup_embneardup_ivf_index",
    "setup_embneardup_ivf_sized_index",
    "setup_star_v1",
})


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    """One full pass over setup rows + every registry query + the
    composed reference workflow; returns {entry: seconds}."""
    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark import queries_ext, queries_olap

    times: dict[str, float] = {}

    # Host-noise calibration (r8 VERDICT #5): a fixed, data-independent
    # CPU + shuffle workload (seeded integer keys, 1M-key hash agg over
    # 40M generated rows) timed once per pass. Same-code bench totals
    # swing ×1.15 between runs on this host; cross-round comparisons
    # (tools/ab_compare.py) divide the common-subset ratio by this
    # row's ratio so host drift cancels out of the verdict. First in
    # the pass, so it samples the same scheduler epoch the pass runs in.
    t0 = time.perf_counter()
    (
        spark.range(0, 40_000_000, 1, 32)
        .selectExpr("(id * 2654435761) % 1000003 AS k", "id % 97 AS v")
        .groupBy("k").sum("v").selectExpr("sum(`sum(v)`)").collect()
    )
    times["calibration_cpu"] = round(time.perf_counter() - t0, 4)

    # Pre-warm the shared Jaccard pairs graph and time it as an explicit
    # setup row: several queries (jaccard_pairs/dedup, dup_clusters,
    # cluster_dedup) reuse this persisted graph, and without a setup step
    # the alphabetically-first consumer pays the whole build — r3 showed
    # cluster_dedup absorbing a 3.7x cost that belongs to the graph.
    t0 = time.perf_counter()
    queries_ext._jaccard_pairs_cached(spark, sf_dir).count()
    times["setup_pairs_graph"] = round(time.perf_counter() - t0, 4)

    # ... and the LSH-verified dup graph (minhash_pairs, dup_clusters,
    # cluster_dedup, pagerank_dups — the scale-path wiring)
    t0 = time.perf_counter()
    queries_ext._dup_graph_cached(spark, sf_dir).count()
    times["setup_dup_graph"] = round(time.perf_counter() - t0, 4)

    # ... and the co-bucketed catalog tables (one-time write-side
    # shuffle; bucketed_join's row should time the exchange-free read)
    t0 = time.perf_counter()
    queries_ext._q_bucketed_join(spark, sf_dir).count()
    times["setup_bucketed_tables"] = round(time.perf_counter() - t0, 4)

    # Same for the shared CDC merge result (merge_upsert + diff_snapshots):
    # alphabetical order would otherwise charge the merge build to diff.
    t0 = time.perf_counter()
    queries_olap._q_merge_upsert(spark, sf_dir).count()
    times["setup_merge_batch"] = round(time.perf_counter() - t0, 4)

    # And the IVF coarse quantizer (one-time fit, cached per session):
    # ann_ivf's bench row should time the probe, not the training.
    t0 = time.perf_counter()
    queries_ext._q_ann_ivf(spark, sf_dir).count()
    times["setup_ivf_model"] = round(time.perf_counter() - t0, 4)

    # The r07 cached builds get the same treatment (r07 ADVICE): the
    # PQ and IVF+PQ codebook trainings and the z-order table rewrite
    # happen once per session, so without explicit setup rows pass 1
    # pays the build, passes 2-3 hit the cache, and the median would
    # silently drop the build cost from the suite total.
    t0 = time.perf_counter()
    queries_ext._q_ann_pq(spark, sf_dir).count()
    times["setup_pq_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_ann_ivfpq(spark, sf_dir).count()
    times["setup_ivfpq_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_ann_ivfpq_residual(spark, sf_dir).count()
    times["setup_ivfpqr_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_ann_ivfpq_residual8(spark, sf_dir).count()
    times["setup_ivfpqr8_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_ann_ivf_hier(spark, sf_dir).count()
    times["setup_ivf_hier_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_ann_ivf_sized(spark, sf_dir).count()
    times["setup_ivf_sized_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_semantic_dedup(spark, sf_dir).count()
    times["setup_sem_model"] = round(time.perf_counter() - t0, 4)

    # ngram_dup_spans has no session cache, but its FIRST execution
    # pays whole-stage-codegen compile + first-shuffle costs ~3x the
    # warm plan cost (r9: 6.5 s in-suite vs 2.3 s solo-warm; VERDICT
    # r9 #6) — run it once as a setup row so the registry row times
    # the PLAN, not the JIT order.
    t0 = time.perf_counter()
    queries_ext._q_ngram_dup_spans(spark, sf_dir).count()
    times["setup_ngram_warm"] = round(time.perf_counter() - t0, 4)

    # the BPE merge table is session-cached and shared by four rows
    # (bpe_merges / bpe_encode / pack_sequences_bpe use the full-corpus
    # fit; bpe_encode_holdout its train-half fit) — charge each fit
    # here so the registry rows time encode/pack, not re-training
    t0 = time.perf_counter()
    queries_ext._bpe_merges_cached(spark, sf_dir)
    times["setup_bpe_model"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._bpe_merges_cached(
        spark, sf_dir, queries_ext._BPE_TRAIN_SRC
    )
    times["setup_bpe_holdout_model"] = round(time.perf_counter() - t0, 4)

    # incremental dedup probes a STANDING corpus index + shingle
    # relation (both operator-persisted): one full run builds them
    # here so the registry row times the batch probe — the operator's
    # actual incremental cost (the index is storage-resident state in
    # production, not per-batch work)
    t0 = time.perf_counter()
    queries_ext._q_minhash_incremental(spark, sf_dir).count()
    times["setup_minhash_index"] = round(time.perf_counter() - t0, 4)

    # the bigram+unigram rarity model is fit-once/score-many state
    # (operator-persisted, vocabulary-sized): charge the fit here so
    # the registry row times holdout scoring
    t0 = time.perf_counter()
    queries_ext._q_quality_rarity_bigram(spark, sf_dir).count()
    times["setup_bigram_model"] = round(time.perf_counter() - t0, 4)

    # ... and the order-3 model stack (trigram + bigram + unigram
    # tables, all operator-persisted fit-once state)
    t0 = time.perf_counter()
    queries_ext._q_quality_rarity_trigram(spark, sf_dir).count()
    times["setup_trigram_model"] = round(time.perf_counter() - t0, 4)

    # ... and the embedding-space standing state (sign-bit bucket
    # index + normalized corpus vectors) for the SemDeDup ingest gate
    t0 = time.perf_counter()
    queries_ext._q_embedding_neardup_incremental(spark, sf_dir).count()
    times["setup_embneardup_index"] = round(time.perf_counter() - t0, 4)

    # ... and the IVF-routed gate's standing state (coarse quantizer
    # fit + cell assignment + normalized corpus, all operator- or
    # cache-persisted)
    t0 = time.perf_counter()
    queries_ext._q_embedding_neardup_incremental_ivf(spark, sf_dir).count()
    times["setup_embneardup_ivf_index"] = round(
        time.perf_counter() - t0, 4)

    # ... and the sized-nlist gate's standing state (its own quantizer
    # fit + cell index — keyed separately from the fixed-nlist row's)
    t0 = time.perf_counter()
    queries_ext._q_embedding_neardup_incremental_ivf_sized(
        spark, sf_dir
    ).count()
    times["setup_embneardup_ivf_sized_index"] = round(
        time.perf_counter() - t0, 4)

    # the v1 star-snapshot store is standing state (yesterday's
    # snapshot already exists in a deployment): publish it once here
    # so star_snapshot_refresh times drift-diff + selective
    # re-publish + read-back, not the full v1 write (r12 VERDICT #4)
    t0 = time.perf_counter()
    registry._star_v1_store(spark, sf_dir)
    times["setup_star_v1"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_zorder_scan(spark, sf_dir).count()
    times["setup_zorder"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_compaction_scan(spark, sf_dir).count()
    times["setup_compaction"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    queries_ext._q_dpp_scan(spark, sf_dir).count()
    times["setup_dpp"] = round(time.perf_counter() - t0, 4)

    # Absorb the one-time Structured Streaming machinery cost (state
    # store providers, streaming listener, checkpoint plumbing) with a
    # minimal file-stream drain over the tiny region table — otherwise
    # the alphabetically-first streaming query pays ~5 s that belongs
    # to session init, not to its plan.
    t0 = time.perf_counter()
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm = (
        spark.readStream.schema(region.schema)
        .option("pathGlobFilter", "region.parquet")
        .parquet(sf_dir)
        .groupBy("r_regionkey").count()
    )
    wq = (
        warm.writeStream.format("memory")
        .queryName("psx_bench_stream_warm").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    wq.awaitTermination()
    times["setup_streaming"] = round(time.perf_counter() - t0, 4)

    qs = registry.queries()
    # stable name order: the registry itself rotates per round (driver
    # capture rotation), which would otherwise scramble which query
    # absorbs session warm-up costs and make per-query times
    # incomparable across BENCH_r{N} artifacts
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if name in FULL_EVAL_ROWS:
            # .count() on these rows lets Catalyst ELIMINATE the
            # expensive branch entirely (their output shape is a left
            # join against an aggregate-unique-keyed relation; with no
            # right-side column consumed the optimizer correctly drops
            # the join — measured: dup_triangles 0.3 s counted vs 39 s
            # materialized at sf10). A user of these rows materializes
            # every column (the scrubbed corpus, the per-doc triangle
            # table), so the bench forces full-row evaluation via a
            # column-consuming hash fold (bit_xor: sum would overflow
            # int64 under ANSI).
            from pyspark.sql import functions as F

            df.agg(F.expr(
                "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
            )).collect()
        else:
            df.count()
        times[name] = round(time.perf_counter() - t0, 4)

    # the reference's composed workflow end-to-end INCLUDING the sinks
    # (README.md:15-26: sample the fact, write it, reduce each dim
    # against it, write those) — the headline user journey
    import shutil
    import tempfile

    from parquet_sampler_spark.operators.semijoin import semi_join_reduce
    from parquet_sampler_spark.sources.io import write_parquet

    out_dir = tempfile.mkdtemp(prefix="psx_bench_")
    try:
        t0 = time.perf_counter()
        s = registry.lineitem_sample(spark, sf_dir)
        write_parquet(s, f"{out_dir}/lineitem_s.parquet")
        orders_red = registry.orders_reduced(spark, sf_dir)
        write_parquet(orders_red, f"{out_dir}/orders_red.parquet")
        for dim, key, fk in [("part", "p_partkey", "l_partkey"),
                             ("supplier", "s_suppkey", "l_suppkey")]:
            red = semi_join_reduce(
                registry.table(spark, sf_dir, dim), key, s, fk
            )
            write_parquet(red, f"{out_dir}/{dim}_red.parquet")
        times["workflow_e2e_with_sinks"] = round(
            time.perf_counter() - t0, 4
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from parquet_sampler_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: JVM + codegen + parquet footer caches
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from parquet_sampler_spark.queries import clear_caches

    passes: list[dict[str, float]] = []
    for i in range(reps):
        if i:
            # r14 protocol: reset session caches so every pass re-pays
            # the one-time builds inside its setup rows — setup rows
            # then take the median like everything else instead of
            # inheriting whatever noise pass 1 had
            clear_caches()
        passes.append(run_suite(spark, sf_dir))

    names = list(passes[0])
    times: dict[str, float] = {}
    for name in names:
        vals = [p[name] for p in passes]
        if name in SESSION_WARM_ROWS:
            # once-per-session costs (streaming machinery init, JIT):
            # no cache reset brings them back — pass 1 is the honest cost
            times[name] = vals[0]
        else:
            times[name] = round(statistics.median(vals), 4)

    # the calibration row measures the HOST, not the suite — report it
    # but keep the headline total a pure suite number
    total = round(
        sum(v for k, v in times.items() if k != "calibration_cpu"), 4
    )
    payload = {
        "metric": "query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "reps": reps,
        "protocol": ("median-of-reps, cache reset per pass "
                     "(session-warm rows: first pass)"),
    }
    print(json.dumps(payload))
    # the driver's tail capture truncates the front of the 100+-entry
    # per-query dict (BENCH_r04 lost half the history) — always persist
    # the FULL record to a file too; each round commits it as
    # BENCH_LOCAL_r{N}.json
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", str(REPO / "BENCH_LOCAL.json")
    )
    try:
        # temp file + atomic replace: a partial write must never leave a
        # stale/corrupt BENCH_LOCAL.json masquerading as this round's
        # result (the very data-loss mode this file exists to prevent)
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            json.dump({**payload, "raw": passes}, f, indent=1)
        os.replace(tmp_path, out_path)
    except OSError as ex:
        print(
            f"warning: failed to persist full bench record to "
            f"{out_path}: {ex}",
            file=sys.stderr,
        )
    # The per-query dict above now exceeds the driver's fixed tail-capture
    # window (BENCH_r03 recorded parsed:null); repeat the headline metric
    # as one compact line so the tail always contains a parseable record.
    print(json.dumps({
        "metric": "query_suite_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "sf": float(sf),
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
