"""Session-lifetime registry for operator-persisted DataFrames.

Operators persist relations their (lazy) returned plans re-read —
shingle/signature tables, normalized vectors, CC labels. Nothing evicts
those automatically, so every persisting module registers them HERE and
``queries.clear_caches()`` drains one registry instead of enumerating
modules (the forget-to-wire failure mode of per-module registries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# FIFO-bounded: a long-lived service or bench loop calling persisting
# operators repeatedly must not pin an unbounded set of cached blocks.
# Evicting the oldest entry only unpersists it — any plan still
# referencing it silently recomputes, so eviction is always safe.
MAX_PERSISTED = 32
_PERSISTED: list[DataFrame] = []


def _evict_overflow() -> None:
    while len(_PERSISTED) > MAX_PERSISTED:
        old = _PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # session may already be stopped


def persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`clear`."""
    out = df.persist()
    _PERSISTED.append(out)
    _evict_overflow()
    return out


def register(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for :func:`clear`."""
    _PERSISTED.append(df)
    _evict_overflow()
    return df


def clear() -> None:
    """Unpersist and drop every registered DataFrame."""
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _PERSISTED.clear()
