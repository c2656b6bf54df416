"""Property-based cross-validation for the r09 operators.

Each test pits the Spark implementation against an INDEPENDENT
reference implementation on randomized inputs — pandas.merge_asof for
the as-of directions, and a direct list-walking BPE trainer for the
merge rounds — so the Spark string/window trickery is checked against
straightforward code, not against itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_sampler_spark.operators.asof import asof_join
from parquet_sampler_spark.operators.packing import pack_sequences
from parquet_sampler_spark.operators.vocab import bpe_merge_rounds

# ---------------------------------------------------------------------------
# asof_join vs pandas.merge_asof
# ---------------------------------------------------------------------------

# distinct, tie-free timestamps: pandas resolves exact-distance ties
# and duplicate right timestamps by positional rules this corpus
# sidesteps; our explicit tie tests live in test_asof.py
_asof_case = st.tuples(
    st.lists(st.integers(0, 500), min_size=1, max_size=12, unique=True),
    st.lists(st.integers(0, 500), min_size=1, max_size=12, unique=True),
    st.sampled_from(["backward", "forward", "nearest"]),
    st.sampled_from([None, 25, 100]),
).filter(
    # 2*lt != rt_i + rt_j for all pairs -> no equidistant nearest ties
    lambda c: all(
        2 * lt != r1 + r2
        for lt in c[0] for r1 in c[1] for r2 in c[1] if r1 != r2
    ) and not set(c[0]) & set(c[1])  # no exact matches either
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(_asof_case)
def test_asof_directions_match_pandas(spark, case):
    lts, rts, direction, tol = case
    l = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(lts)], "k int, ts bigint, lid int"
    )
    r = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(rts)], "k int, ts bigint, rid int"
    )
    got = {
        row["lid"]: row["asof_ts"]
        for row in asof_join(
            l, r, ["k"], "ts", "ts", ["rid"], how="left",
            direction=direction, tolerance=tol,
        ).collect()
    }
    lp = pd.DataFrame({"ts": sorted(lts),
                       "lid": [lts.index(t) for t in sorted(lts)]})
    rp = pd.DataFrame({"ts": sorted(rts),
                       "rid": [rts.index(t) for t in sorted(rts)]})
    m = pd.merge_asof(lp, rp, on="ts", direction=direction,
                      tolerance=tol, suffixes=("", "_r"))
    # merge_asof keeps the left ts; recover the matched right ts
    rid_to_ts = dict(zip(rp["rid"], rp["ts"]))
    for _, row in m.iterrows():
        want = (None if pd.isna(row["rid"])
                else rid_to_ts[int(row["rid"])])
        assert got[int(row["lid"])] == want, (
            f"lid={row['lid']} direction={direction} tol={tol}: "
            f"spark={got[int(row['lid'])]} pandas={want}"
        )


# ---------------------------------------------------------------------------
# bpe_merge_rounds vs a direct list-walking trainer
# ---------------------------------------------------------------------------


def _bpe_reference(texts, rounds):
    docs = [t.strip().split(" ") for t in texts if t.strip()]
    merges = []
    for r in range(1, rounds + 1):
        counts: dict[str, int] = {}
        for d in docs:
            for i in range(len(d) - 1):
                p = f"{d[i]} {d[i + 1]}"
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        # max count, ties to lexicographically smallest pair
        pair = min(counts, key=lambda p: (-counts[p], p))
        a, b = pair.split(" ", 1)
        merged = f"{a}_{b}"
        merges.append((r, pair, merged, counts[pair]))
        new_docs = []
        for d in docs:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(merged)
                    i += 2  # greedy leftmost, non-overlapping
                else:
                    out.append(d[i])
                    i += 1
            new_docs.append(out)
        docs = new_docs
    return merges


_token = st.sampled_from(["a", "b", "c", "ab", "x"])
_doc = st.lists(_token, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=1, max_size=6), st.integers(1, 3))
def test_bpe_matches_list_walking_reference(spark, texts, rounds):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in
           bpe_merge_rounds(df, "doc_id", "text", rounds=rounds).collect()]
    assert got == _bpe_reference(texts, rounds)


# ---------------------------------------------------------------------------
# pack_sequences invariants vs a sequential fold
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 9), min_size=1, max_size=30),
       st.integers(1, 7))
def test_pack_sequences_matches_sequential_fold(spark, tok_counts, cap):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(tok_counts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in
           pack_sequences(df, "doc_id", "text", cap=cap, n_shards=3)
           .collect()}
    # reference: per shard, walk docs in id order and fold the stream
    streams: dict[int, int] = {}
    for i, n in enumerate(tok_counts):
        if n == 0:
            assert i not in got
            continue
        shard = i % 3
        before = streams.get(shard, 0)
        end = before + n
        streams[shard] = end
        g = got[i]
        assert g["shard"] == shard and g["n_tokens"] == n
        assert g["seq_first"] == before // cap
        assert g["seq_last"] == (end - 1) // cap
        assert g["seq_offset"] == before % cap
        assert g["n_seqs"] == g["seq_last"] - g["seq_first"] + 1
