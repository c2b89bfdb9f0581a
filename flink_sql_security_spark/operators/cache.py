"""Scoped lifetime for persisted super-stage intermediates.

Several operators persist() an intermediate that the returned (lazy)
DataFrame consumes more than once — the standard super-stage boundary of
a multi-stage pipeline. The op itself can never unpersist (the cache must
outlive the caller's action), so without bookkeeping a long-lived session
running many pipeline invocations accumulates storage memory until
eviction churn. Every such operator therefore ATTACHES its persisted
handles to the DataFrame it returns; after the consuming action the
caller releases them:

    out = clean_corpus(docs)
    rows = out.collect()
    release(out)                      # storage freed, deterministic

or, scoped:

    with released_after(clean_corpus(docs)) as out:
        rows = out.collect()

Attachment is a plain Python attribute on the returned DataFrame object —
it does NOT survive further transformations (``out.select(...)`` is a new
object), so release the object the operator returned — operators that
COMPOSE a handle-carrying frame either re-attach the upstream handles to
their own output (``clean_corpus``, ``cross_split_contamination``,
``dsir_select``) or release them internally once the upstream pipeline
is fully consumed (``connected_components``). ``release`` is idempotent
and safe on DataFrames with nothing attached, which makes
``release(df)`` after any query's action a harmless habit (bench.py's
measured loop and tools/check_oracles.py do exactly that). At 100 TB the
same boundary is usually a parquet write, where lifetime is the table's,
not the session's.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_ATTR = "_fss_cached_deps"


def attach(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record persisted ``deps`` on ``out`` for a later :func:`release`.

    Flattens: any handles already attached to a dep (an op composing
    another persisting op) are re-attached to ``out``, so one release at
    the outermost result frees the whole chain.
    """
    collected = list(getattr(out, _ATTR, ()))
    for d in deps:
        collected.append(d)
        collected.extend(getattr(d, _ATTR, ()))
    setattr(out, _ATTR, tuple(collected))
    return out


def cached_deps(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persisted intermediates attached to ``df`` (possibly empty)."""
    return getattr(df, _ATTR, ())


def release(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every attached intermediate. Idempotent; call after the
    consuming action. No-op on frames with nothing attached."""
    for d in cached_deps(df):
        try:
            d.unpersist(blocking)
        except Exception:
            pass  # session already stopped / already unpersisted
    try:
        setattr(df, _ATTR, ())
    except Exception:
        pass


@contextmanager
def released_after(df: DataFrame, blocking: bool = False):
    """``with released_after(op(...)) as out:`` — release on scope exit."""
    try:
        yield df
    finally:
        release(df, blocking)
