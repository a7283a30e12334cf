"""retailer_scrapers_spark — a PySpark-native crawl-frontier analytics engine.

A from-scratch re-expression of the dataflow semantics of the reference
repo ``JoshuaVanStraaten/retailer-scrapers`` (four imperative per-retailer
Python crawlers + an orchestrator) as one unified, declarative Spark
DataFrame pipeline:

    seeds → canonicalize → URL-seen dedup (partitioned Bloom filter)
          → robots / visit-window gate → host-bucketed priority top-k
          → skew salting → per-host politeness schedule (simulated clock)
          → vectorized fetch+parse (Arrow batches)
          → image decode / phash → product dedup + id repair
          → append/merge sinks → frontier' → checkpoint → next epoch

Subpackages
-----------
``functions``  scalar column expressions (URL canon, price coalesce,
               promo derivation, text quality, image codec, phash)
``operators``  relational/custom operators (dedup family, seen-filter,
               top-k per host, politeness, salting, similarity search)
``sources``    synthetic web fixture generator + fetch/parse stages
``plans``      the epoch-loop crawl driver + checkpoint catalog
``streaming``  Structured Streaming variants of the frontier ops

Design notes (scale): every operator is expressed against the DataFrame
API so Catalyst applies pushdown/pruning/AQE; Python appears only in
Arrow-vectorized UDFs (never per-row); joins against small dimension
tables are broadcast; per-host grouped work is salted to bound skew.
"""

from retailer_scrapers_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
