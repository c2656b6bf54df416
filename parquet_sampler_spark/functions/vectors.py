"""Vector (embedding) functions over ``array<float>`` columns.

Built from JVM-side array lambdas (``zip_with`` + ``aggregate``) — no
UDFs, codegen-friendly, linear scale-out. Accumulation is left-to-right
in double precision; the ``*_sql`` twins replicate the identical
evaluation order in DuckDB (``list_reduce`` over ``list_prepend(0.0,
products)``), so cosine scores are bit-identical across engines —
``sqrt`` and the four basic ops are IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ a_i·b_i, double accumulation, left-to-right."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: str | Column) -> Column:
    """Euclidean norm: sqrt(Σ a_i²)."""
    return F.sqrt(dot(a, a))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        d / (na * nb)
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def norm2_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm2_sql(a)} = 0.0 OR {norm2_sql(b)} = 0.0 THEN 0.0 "
        f"ELSE {dot_sql(a, b)} / ({norm2_sql(a)} * {norm2_sql(b)}) END"
    )


def normalized_cte_sql(table: str = "embeddings", id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """CTE fragment producing (id, unit vector) — operation-for-operation
    the twin of ``operators.similarity._normalized``."""
    return (
        f"norms AS (SELECT {id_col}, sqrt({dot_sql(vec_col, vec_col)}) AS nrm "
        f"FROM {table}), "
        f"normed AS (SELECT e.{id_col}, "
        f"list_transform(e.{vec_col}, x -> CAST(x AS DOUBLE) / n.nrm) AS v "
        f"FROM {table} e JOIN norms n USING ({id_col}) WHERE n.nrm > 0)"
    )


def unit_dot_sql(a: str, b: str) -> str:
    """Left-to-right dot of two pre-normalized DOUBLE lists — the twin of
    ``operators.similarity._unit_dot``."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
    )
