"""parquet_sampler_spark — a PySpark-native analytics engine with the
capabilities of the ``parquet-sampler`` reference (join-aware sampling of
Parquet star schemas) plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Reference capability map (see SURVEY.md §2): the reference is a 355-LoC
Rust crate with two CLIs — ``sample`` (exact-count uniform random
downsampling of a Parquet file, sample.rs:36-79) and ``join`` (hash left
semi-join reduction of a dimension table against a sampled fact,
join.rs:39-129) — over a schema-preserving Parquet sink (lib.rs:13-134).
This package re-expresses those semantics Spark-first: declarative
DataFrame plans, Catalyst pushdown/pruning, broadcast semi-joins, and a
sampler designed for 100 TB inputs rather than driver RAM.
"""

from parquet_sampler_spark.session import get_spark
from parquet_sampler_spark.operators.sample import (
    mixture_resample,
    sample_exact,
    sample_fraction,
    sample_stratified,
)
from parquet_sampler_spark.operators.semijoin import semi_join_reduce
from parquet_sampler_spark.operators.asof import asof_join
from parquet_sampler_spark.operators.merge import merge_upsert
from parquet_sampler_spark.operators.packing import pack_sequences
from parquet_sampler_spark.operators.vocab import bpe_merge_rounds
from parquet_sampler_spark.operators.dedup import (
    bloom_decontaminate,
    cluster_dedup,
    duplicate_clusters,
    exact_dedup,
    jaccard_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_dup_spans,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from parquet_sampler_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
    semantic_dedup,
)
from parquet_sampler_spark.plans.skew import salted_join
from parquet_sampler_spark.sources.io import (
    read_parquet,
    metadata_row_count,
    write_parquet,
)

__all__ = [
    "get_spark",
    "mixture_resample",
    "sample_exact",
    "sample_fraction",
    "sample_stratified",
    "semi_join_reduce",
    "asof_join",
    "merge_upsert",
    "pack_sequences",
    "bpe_merge_rounds",
    "bloom_decontaminate",
    "cluster_dedup",
    "duplicate_clusters",
    "exact_dedup",
    "jaccard_dedup",
    "minhash_dedup",
    "minhash_lsh_pairs",
    "ngram_dup_spans",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "cosine_topk",
    "embedding_neardup_pairs",
    "ivf_topk",
    "lsh_topk",
    "semantic_dedup",
    "salted_join",
    "read_parquet",
    "metadata_row_count",
    "write_parquet",
]

__version__ = "0.1.0"
