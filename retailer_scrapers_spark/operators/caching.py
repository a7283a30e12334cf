"""Cache-lifetime helpers shared by operators that persist intermediates.

``localCheckpoint(eager=True)`` row-serializes every block and
anti-scales at multi-million-row inputs (BENCH/BASELINE.md); operators
use ``persist()`` (columnar cache) instead — but a bare persist leaks
blocks for the SparkContext lifetime in long-lived drivers. The helper
here ties a cache's lifetime to the returned result handle.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def unpersist_when_collected(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Release every ``cached`` DataFrame when the caller drops ``result``.

    A weakref finalizer ties the caches' lifetime to the returned
    DataFrame handle: once the caller has consumed and released the
    result, the blocks are freed. Callers holding the result across many
    actions keep the caches (correct — recomputation would be the
    expensive path).
    """

    def _release(cs=tuple(cached)) -> None:
        for c in cs:
            try:
                c.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped

    weakref.finalize(result, _release)
    return result
