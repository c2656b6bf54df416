"""Registry-wide driver-contract lint (r14, VERDICT r13 #2).

The driver's correctness harness canonicalizes each query's output in
pandas: it sorts the rows and factorizes every column, which requires
HASHABLE (scalar) cells. A registered query returning an array / map /
struct column is therefore driver-RED even when its values are
perfectly correct — exactly how r13's ``embedding_admit`` (raw
``array<float>`` output) became the round's one red row while being
hash-green in the local gate (whose canonicalizer happens to stringify
lists). The repo convention since r2 is to EXPLODE such columns to
scalar long-form rows (``_q_multimodal_features``) or emit a scalar
fingerprint.

This test makes the failure class unshippable: it walks every
``queries()`` entry at sf0.001 and asserts the output schema is
scalar-only. It builds each DataFrame (running whatever eager work the
callable does — model fits, stream drains) but never collects, so it
is strictly cheaper than the local oracle sweep that already runs
every entry.
"""

from __future__ import annotations

from pyspark.sql import types as T

SF_SMALL = "/root/testdata/sf0.001"

_NON_SCALAR = (T.ArrayType, T.MapType, T.StructType)


def test_all_registered_query_outputs_are_scalar(spark):
    import __spark_entry__ as e
    from parquet_sampler_spark.queries import clear_caches

    bad: list[str] = []
    errors: list[str] = []
    try:
        for name, fn in e.queries().items():
            try:
                df = fn(spark, SF_SMALL)
            except Exception as ex:  # pragma: no cover - sweep covers
                errors.append(f"{name}: {type(ex).__name__}: {ex}")
                continue
            for f in df.schema.fields:
                if isinstance(f.dataType, _NON_SCALAR):
                    bad.append(
                        f"{name}.{f.name}: {f.dataType.simpleString()}"
                    )
    finally:
        clear_caches()
    assert not errors, "queries failed to build: " + "; ".join(errors)
    assert not bad, (
        "non-scalar output columns violate the driver canonicalizer "
        "contract (explode to long-form scalar rows or emit a "
        "fingerprint): " + "; ".join(bad)
    )
