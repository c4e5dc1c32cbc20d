"""Scoped DataFrame caching for query builders.

Several gate builders cache an intermediate that feeds two consumers in
the SAME returned plan (e.g. ``text_dup_ngram_mass``'s gram frame feeds
both the spread aggregate and the join probe).  A bare ``df.cache()``
there leaks: the builder returns a lazy plan, the caller runs the action,
and nobody ever unpersists — across a 274-gate single-session sweep the
cached blocks accumulate executor/driver memory (ADVICE r11 #4).

``scoped_cache`` records every such frame; ``release_scoped_caches``
frees them all.  ``__spark_entry__.queries()`` wraps each builder so
invoking gate N+1 first releases gate N's scoped caches — by then the
driver (and the pytest parity sweep) has collected gate N's result, so
at most one gate's cache blocks are ever live.  Releasing *early* is
safe regardless: an unpersisted frame silently recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the frame for the next
    :func:`release_scoped_caches` sweep."""
    _SCOPED.append(df)
    return df.cache()


def release_scoped_caches() -> int:
    """Unpersist every frame recorded since the last release; returns the
    number freed.  Non-blocking: the executors drop blocks async."""
    n = len(_SCOPED)
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
        except Exception:
            # a stopped/replaced SparkSession can't unpersist — the JVM
            # holding the blocks is gone with it, so nothing leaks
            pass
    return n
