"""Portable deterministic hashing expressions.

The reference sampler draws indexes from an *unseeded* ``thread_rng``
(reference: src/bin/sample.rs:42), which makes runs non-reproducible —
SURVEY.md §2.1 flags that as a defect, not a behavior to preserve. Our
engine replaces it with a seeded multiplicative (Lehmer-style) hash over
the row's key columns. Two properties matter:

1. **Deterministic & engine-portable.** The hash is plain 64-bit integer
   arithmetic (``(k·a + seed·c) mod M``), expressible identically in
   Spark SQL and ANSI SQL, so a DuckDB oracle reproduces the exact same
   sample. No reliance on engine-specific ``hash()``/``xxhash64``.
2. **Uniform on [0, M).** Lets the scalable sampler prefilter candidates
   with a *closed-form* threshold (no quantile scan): the expected
   fraction of rows with ``pr < t`` is ``t/M``.

M = 2^31 - 1 (Mersenne prime), multiplier 48271 (MINSTD). Key column
values must be integers well below 2^63 / 48271 to avoid overflow — true
for every key in the TPC-H-ish testdata and for typical surrogate keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MODULUS = 2_147_483_647  # 2^31 - 1
MULTIPLIER = 48_271  # MINSTD / Lehmer
SEED_MIX = 65_537
# distinct odd multipliers for combining multiple key columns
COLUMN_MULTIPLIERS = (48_271, 12_820_163, 22_695_477, 69_069, 1_103_515_245)


def _seed_params(seed: int) -> tuple[int, int]:
    """Derive a multiplicative + additive constant from the seed.

    The multiplier must be nonzero mod M (M is prime, so any such value
    is a bijection of Z_M — every seed permutes the hash space). A
    purely *additive* seed would shift all hashes by a constant and
    leave the induced ranking almost unchanged — different seeds must
    produce genuinely different samples.
    """
    sm = (int(seed) * 69_069 + MULTIPLIER) % MODULUS
    if sm == 0:
        sm = MULTIPLIER
    sa = (int(seed) * SEED_MIX) % MODULUS
    return sm, sa


def lehmer_hash(key_cols: list[str | Column], seed: int) -> Column:
    """Deterministic pseudo-random value in [0, M) from integer key cols.

    ``inner = (sum_i key_i * a_i) % M;  pr = (inner * sm + sa) % M``
    with ``(sm, sa)`` derived from the seed. All intermediates stay
    below 2^62, so plain BIGINT arithmetic is exact — the identical
    expression runs in the DuckDB oracle (:func:`lehmer_hash_sql`).
    """
    if not key_cols:
        raise ValueError("lehmer_hash requires at least one key column")
    if len(key_cols) > len(COLUMN_MULTIPLIERS):
        raise ValueError(
            f"at most {len(COLUMN_MULTIPLIERS)} key columns supported"
        )
    sm, sa = _seed_params(seed)
    acc = F.lit(0).cast("bigint")
    for col, mult in zip(key_cols, COLUMN_MULTIPLIERS):
        c = F.col(col) if isinstance(col, str) else col
        acc = acc + c.cast("bigint") * F.lit(mult)
    # pmod, not %: both engines' % keeps the dividend's sign, so a
    # negative key would yield a negative hash that passes every
    # `< t` threshold (r12 ADVICE). pmod maps into [0, M) for any
    # integer key; identical to % for the non-negative case. The
    # outer combine needs no pmod — inner, sm, sa are all in [0, M).
    inner = F.pmod(acc, F.lit(MODULUS))
    return (inner * F.lit(sm) + F.lit(sa)) % F.lit(MODULUS)


def lehmer_hash_sql(key_cols: list[str], seed: int) -> str:
    """The exact same expression as :func:`lehmer_hash`, as a SQL string
    runnable by both Spark SQL and DuckDB (for oracle parity)."""
    sm, sa = _seed_params(seed)
    terms = [
        f"CAST({col} AS BIGINT) * {mult}"
        for col, mult in zip(key_cols, COLUMN_MULTIPLIERS)
    ]
    # portable pmod spelling (DuckDB has no pmod builtin); see the
    # sign note in lehmer_hash — identical for non-negative keys
    inner = (
        "((" + " + ".join(terms) + f") % {MODULUS} + {MODULUS})"
        f" % {MODULUS}"
    )
    return f"(({inner}) * {sm} + {sa}) % {MODULUS}"


def polynomial_string_hash(col: str | Column, modulus: int = MODULUS) -> Column:
    """Deterministic 31-base polynomial rolling hash of a string column.

    ``h = (h*31 + code(ch)) % modulus`` over the characters. Built from
    ``aggregate`` over a codepoint sequence — stays JVM-side (no UDF).
    Used for document fingerprinting and portable token hashing.
    """
    c = F.col(col) if isinstance(col, str) else col
    # aggregate over character positions; ascii() gives the codepoint of
    # each 1-char substring. Guard the empty string: sequence(1, 0) would
    # produce a *descending* [1, 0] sequence in Spark.
    hashed = F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast("bigint"),
        lambda acc, i: (acc * F.lit(31) + F.ascii(F.substring(c, i, F.lit(1))))
        % F.lit(modulus),
    )
    return F.when(F.length(c) == 0, F.lit(0).cast("bigint")).otherwise(hashed)


def mixed_string_hash(col: str | Column, modulus: int = MODULUS) -> Column:
    """:func:`polynomial_string_hash` plus two Lehmer-LCG mixing rounds.

    The raw rolling hash of a SHORT string is numerically small (a
    1-char token hashes below 256), so its high bits are all zero —
    useless for sign/band schemes like SimHash that read individual
    bits. Two multiplicative rounds mod the Mersenne prime diffuse any
    input across all 31 bits (one round is not enough: 97·48271 is
    still < 2^23). Same arithmetic in :func:`mixed_string_hash_sql`."""
    h = polynomial_string_hash(col, modulus)
    for mult, add in ((MULTIPLIER, SEED_MIX), (69_069, 12_345)):
        h = (h * F.lit(mult) + F.lit(add)) % F.lit(modulus)
    return h


def mixed_string_hash_sql(expr: str, modulus: int = MODULUS) -> str:
    """DuckDB twin of :func:`mixed_string_hash` over a string SQL
    expression ``expr`` (evaluated once per reference — keep it a
    simple column/identifier)."""
    poly = (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ascii(substr({expr}, i, 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {modulus}) END"
    )
    h = poly
    for mult, add in ((MULTIPLIER, SEED_MIX), (69_069, 12_345)):
        h = f"(({h}) * {mult} + {add}) % {modulus}"
    return h
