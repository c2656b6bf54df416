"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Everything here is built from JVM-side ``pyspark.sql.functions`` (array
lambdas, no Python UDFs) so it stays inside whole-stage codegen and
scales linearly over a 100 TB documents table with zero shuffle — these
are all per-row map operators.

Each function has a twin ``*_sql`` fragment generator emitting the same
formula in DuckDB-compatible SQL, used by the oracle gate. Formulas
avoid transcendentals (exp/log) so both engines produce bit-identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from parquet_sampler_spark.functions.hashing import MODULUS

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language classifier. Order matters: argmax ties break in list order.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "los", "y", "del", "un", "una", "es", "que"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), " ")


def token_count(col: str | Column) -> Column:
    """Whitespace token count (single-space tokenizer — matches
    DuckDB ``len(string_split(trim(x), ' '))``). NULL text counts as
    0 tokens in BOTH engines: without the explicit guard Spark's
    ``size(split(NULL))`` yields -1 while SQL ``len`` yields NULL —
    a silent divergence that corrupts any SUM over the counts (the
    -1s subtract; the NULLs skip)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.length(F.trim(c)) == 0), F.lit(0)
    ).otherwise(F.size(_tokens(c))).cast("bigint")


def token_count_sql(col: str) -> str:
    return (
        f"CAST(CASE WHEN {col} IS NULL OR length(trim({col})) = 0 THEN 0 "
        f"ELSE len(string_split(trim({col}), ' ')) END AS BIGINT)"
    )


def _stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(
        F.filter(_tokens(col), lambda t: t.isin(*words))
    )


def _stopword_hits_sql(col: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(trim({col}), ' '), "
        f"t -> t IN ({words})))"
    )


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords — a standard quality signal
    (very low → gibberish/boilerplate; used by e.g. C4/Gopher rules)."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _stopword_hits(c, lang).cast("double") / n.cast("double")
    )


def stopword_ratio_sql(col: str, lang: str = "en") -> str:
    n = token_count_sql(col)
    return (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE "
        f"CAST({_stopword_hits_sql(col, lang)} AS DOUBLE) / "
        f"CAST({n} AS DOUBLE) END"
    )


def language_id(col: str | Column) -> Column:
    """Stopword-vote language classifier: count stopword hits per
    language, argmax with deterministic tie-break (en > fr > de > es),
    'und' (undetermined) when no list scores a hit."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: _stopword_hits(c, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    result = F.lit("und")
    # build the CASE from last to first so earlier languages win ties
    for lang in reversed(list(STOPWORDS)):
        result = F.when((hits[lang] == best) & (best > 0), lang).otherwise(
            result
        )
    return result


def language_id_sql(col: str) -> str:
    hits = {lang: _stopword_hits_sql(col, lang) for lang in STOPWORDS}
    greatest = f"greatest({', '.join(hits.values())})"
    whens = " ".join(
        f"WHEN {hits[lang]} = {greatest} AND {greatest} > 0 THEN '{lang}'"
        for lang in STOPWORDS
    )
    return f"CASE {whens} ELSE 'und' END"


def quality_score(col: str | Column) -> Column:
    """Composite [0, 1] quality score from length, mean token length,
    and stopword ratio — rational arithmetic only (cross-engine exact):

    ``0.4 * min(n_tokens, 50)/50 + 0.4 * min(stop_ratio, 0.25)/0.25
    + 0.2 * (1 if 3 <= avg_tok_len <= 8 else 0)``
    """
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c).cast("double")
    stop = stopword_ratio(c)
    avg_len = F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.translate(F.trim(c), " ", "")).cast("double") / n
    )
    return (
        F.least(n, F.lit(50.0)) / 50.0 * 0.4
        + F.least(stop, F.lit(0.25)) / 0.25 * 0.4
        + F.when((avg_len >= 3.0) & (avg_len <= 8.0), 0.2).otherwise(0.0)
    )


def quality_score_sql(col: str) -> str:
    n = f"CAST({token_count_sql(col)} AS DOUBLE)"
    stop = stopword_ratio_sql(col)
    avg = (
        f"CASE WHEN {n} = 0 THEN 0.0 ELSE "
        f"CAST(length(replace(trim({col}), ' ', '')) AS DOUBLE) / {n} END"
    )
    return (
        f"least({n}, 50.0) / 50.0 * 0.4 "
        f"+ least({stop}, 0.25) / 0.25 * 0.4 "
        f"+ CASE WHEN {avg} >= 3.0 AND {avg} <= 8.0 THEN 0.2 ELSE 0.0 END"
    )


def fingerprint(col: str | Column, modulus: int = MODULUS) -> Column:
    """Rolling polynomial document fingerprint over the whitespace-
    normalized text: ``h = (h*31 + code(ch)) % M`` — Java-hashCode-style,
    order-sensitive, expressible identically in DuckDB."""
    from parquet_sampler_spark.functions.hashing import polynomial_string_hash

    c = F.col(col) if isinstance(col, str) else col
    return polynomial_string_hash(F.trim(c), modulus)


def fingerprint_sql(col: str, modulus: int = MODULUS) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length(trim({col})) + 1), "
        f"i -> CAST(ascii(substr(trim({col}), i, 1)) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {modulus}) END"
    )

_BPE_ISH = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_count_bpe(col: str | Column) -> Column:
    """BPE-ish subword-boundary token count: alphabetic runs, digit
    runs, and individual punctuation each count as one token (the
    pre-tokenization split most BPE vocabularies apply before merges).
    Regex evaluates identically in Spark (Java regex) and DuckDB (RE2)
    for this metacharacter-free character-class pattern."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(_BPE_ISH), F.lit(0))
    ).cast("bigint")


def token_count_bpe_sql(col: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({col}, '{_BPE_ISH}')) AS BIGINT)"
    )



# ---------------------------------------------------------------------------
# Normalization + PII redaction (per-row map, no shuffle, no UDFs)
# ---------------------------------------------------------------------------

# Redaction patterns restricted to syntax Java regex and RE2 interpret
# identically (character classes, bounded repetition, \b word breaks —
# no lookarounds, no backrefs). Applied in order: email first (contains
# dots + digits), then IPv4, then phone.
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


# Explicit whitespace class instead of \s: Java's \s and RE2's \s
# disagree on vertical tab (\x0B), and SQL trim() strips only spaces —
# collapsing FIRST then trimming makes edge tabs/newlines canonicalize
# identically to edge spaces in both engines.
_WS_RUN = r"[ \t\n\r\f\x0B]+"


def normalize_text(col: str | Column) -> Column:
    """Canonical text normalization for dedup/training prep: lowercase,
    collapse every whitespace run to one space, trim the edges."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), _WS_RUN, " "))


def normalize_text_sql(col: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag (Spark replaces all
    # occurrences by default)
    return rf"trim(regexp_replace(lower({col}), '{_WS_RUN}', ' ', 'g'))"


def redact_pii(col: str | Column) -> Column:
    """Redact emails, IPv4 addresses, and NNN-NNN-NNNN phone numbers
    with typed placeholders — the standard scrub pass before text lands
    in a training corpus. Pure regexp_replace chain: codegen-friendly,
    linear scale-out."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii_sql(col: str) -> str:
    out = col
    for pat, rep in _PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def word_ngrams(
    col: str | Column, n: int = 1, distinct: bool = False
) -> Column:
    """Sliding word n-grams of the single-space-tokenized text as an
    array column (n=1 → tokens). THE shared gram builder — dedup
    shingles and repetition stats both derive from it, so the tokenize/
    slide/short-doc-guard semantics can never drift apart. Guard: a doc
    shorter than n tokens yields an EMPTY array (Spark's sequence(0, -1)
    would otherwise produce a descending sequence)."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.split(F.trim(c), " ")
    if n == 1:
        grams = tokens
    else:
        slid = F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
        grams = F.when(
            F.size(tokens) < n, F.array().cast("array<string>")
        ).otherwise(slid)
    return F.array_distinct(grams) if distinct else grams


def word_ngrams_sql(col: str, n: int = 1, distinct: bool = False) -> str:
    """DuckDB twin of :func:`word_ngrams` — the single source for every
    shingle/gram SQL fragment in the oracle suite."""
    toks = f"string_split(trim({col}), ' ')"
    if n == 1:
        grams = toks
    else:
        parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
        grams = (
            f"CASE WHEN len({toks}) < {n} THEN [] "
            f"ELSE list_transform(range(1, len({toks}) - {n} + 2), "
            f"i -> {parts}) END"
        )
    return f"list_distinct({grams})" if distinct else grams


def repetition_score(col: str | Column, n: int = 2) -> Column:
    """Within-document repetition: ``1 − distinct_ngrams/total_ngrams``
    over word n-grams — 0 for repetition-free text, →1 for degenerate
    loops (the Gopher-style repetition filter signal). Pure per-row
    array math, no shuffle; DuckDB twin divides the same integer counts
    in the same order, so values are bit-identical."""
    grams = word_ngrams(col, n)
    total = F.size(grams)
    # size(NULL) is -1 in Spark, so the <=0 guard already maps NULL text
    # to 0.0 — the SQL twin needs an explicit IS NULL branch to agree
    # (DuckDB would propagate NULL through the division otherwise)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double")
        / total.cast("double")
    )


def repetition_score_sql(col: str, n: int = 2) -> str:
    grams = word_ngrams_sql(col, n)
    return (
        f"CASE WHEN {col} IS NULL THEN 0.0 "
        f"WHEN len({grams}) <= 0 THEN 0.0 ELSE "
        f"1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / "
        f"CAST(len({grams}) AS DOUBLE) END"
    )
