"""Checkpointed sketch metrics for the crawl (north_star: "fetch/dedup/
politeness-wait metrics" checkpointed per epoch with per-partition
lineage).

Each epoch writes one ``metrics_sketches`` delta snapshot holding
per-host mergeable sketches:

- ``hll_urls``        — HyperLogLog over the URLs the epoch TOUCHED
                        (fetched, dup-seen, deferred, denied): distinct
                        URL pressure per host without materializing
                        sets (operators/hll.py).
- ``tdigest_wait_ms`` — merging t-digest over the politeness waits of
                        the epoch's fetches: per-host wait percentiles
                        across the whole crawl without raw samples
                        (operators/tdigest.py).

Both merge associatively and idempotently across epochs, so the
cross-epoch rollup is a pure fold over the committed deltas — the same
read shape as the ``seen`` table, and replay-safe for the same reason
(an epoch re-write overwrites the identical deterministic snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from retailer_scrapers_spark.operators.hll import HyperLogLog, hll_by_key
from retailer_scrapers_spark.operators.tdigest import TDigest, tdigest_by_key

SKETCH_SCHEMA = "host string, kind string, sketch binary, epoch int"


def epoch_sketch_rows(
    touched: DataFrame, fetched: DataFrame, epoch: int, hll_p: int = 12
) -> list[tuple]:
    """Build the epoch's (host, kind, sketch, epoch) rows.

    ``touched``: (url_canon, host, …) — every URL the epoch handled;
    ``fetched``: (host, wait_ms, …) — the epoch's actual fetches.
    """
    rows: list[tuple] = []
    for host, sk in hll_by_key(touched, "host", "url_canon", p=hll_p).items():
        rows.append((host, "hll_urls", bytearray(sk.serialize()), epoch))
    for host, td in tdigest_by_key(fetched, "host", "wait_ms").items():
        rows.append((host, "tdigest_wait_ms", bytearray(td.serialize()), epoch))
    return rows


def merged_sketches(catalog, max_epoch: int | None = None) -> dict[str, dict[str, object]]:
    """Fold every committed ``metrics_sketches`` delta into per-host
    sketches: ``{"hll_urls": {host: HyperLogLog}, "tdigest_wait_ms":
    {host: TDigest}}``. Sketch payloads are tiny (2^p bytes / a few
    hundred clusters per host), so the fold collects to the driver."""
    out: dict[str, dict[str, object]] = {"hll_urls": {}, "tdigest_wait_ms": {}}
    df = catalog.read_all("metrics_sketches", max_epoch=max_epoch)
    if df is None:
        return out
    for r in df.sort("epoch").collect():
        blob = bytes(r.sketch)
        if r.kind == "hll_urls":
            sk = HyperLogLog.deserialize(blob)
            cur = out["hll_urls"].get(r.host)
            out["hll_urls"][r.host] = sk if cur is None else cur.merge(sk)
        elif r.kind == "tdigest_wait_ms":
            td = TDigest.deserialize(blob)
            cur = out["tdigest_wait_ms"].get(r.host)
            out["tdigest_wait_ms"][r.host] = td if cur is None else cur.merge(td)
    return out
