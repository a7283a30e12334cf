"""Partitioned Bloom URL-seen filter (SURVEY.md D6, §4.2.1; north_rule).

The reference keeps a driver-side ``visited_pages`` set
(scrape_shoprite.py:417-425); at 10^10 URLs that must become a
distributed membership structure. Design:

- hashes are computed JVM-side (``xxhash64`` twice with different
  seeds — Kirsch-Mitzenmacher double hashing gives k indexes from 2);
- each partition builds a local bit array over its rows via
  ``mapInArrow`` (numpy, vectorized);
- the driver OR-merges the per-partition arrays (a few MB each) and
  re-broadcasts the union for the next epoch's probe;
- probing is a scalar Arrow UDF over the two hash columns against the
  broadcast bits.

Exactness: Bloom probes have false positives but NO false negatives,
so the engine uses the filter as a *prefilter*: probe-positive rows are
verified with an exact anti-join against the seen table (tiny input
after the prefilter); probe-negative rows pass directly. The final
URL-seen set is therefore exact (north_rule) while the big anti-join
shrinks by ~(1 − fpp) at scale.

Sizing: m = −n·ln(p)/ln(2)², k = (m/n)·ln(2). For n = 10^10 and
p = 1e−3 this is ~17.9 GB of bits cluster-wide — per-partition slices
of a few MB each, which is why the structure is partitioned and
checkpointed rather than driver-resident.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER = struct.Struct("<QQIQ")  # m_bits, n_words, k_hashes, n_items
H1_SEED = 0
H2_SEED = 1


class BloomFilter:
    """Numpy-backed Bloom filter with Kirsch-Mitzenmacher double hashing."""

    def __init__(self, m_bits: int, k_hashes: int, bits: np.ndarray | None = None, n_items: int = 0):
        self.m_bits = int(m_bits)
        self.k = int(k_hashes)
        n_words = (self.m_bits + 63) // 64
        self.bits = bits if bits is not None else np.zeros(n_words, dtype=np.uint64)
        self.n_items = int(n_items)

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 1e-3) -> "BloomFilter":
        n = max(n, 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _indexes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(len, k) bit indexes; inputs are int64 from xxhash64."""
        u1 = h1.astype(np.uint64)
        u2 = h2.astype(np.uint64) | np.uint64(1)  # odd so strides cover the table
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (u1[:, None] + i * u2[:, None]) % np.uint64(self.m_bits)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Set bits for a hash batch.

        Implementation note: a boolean scatter (`bool_arr[idx] = True`,
        duplicate-safe because OR is idempotent) plus one `packbits` pass
        is ~20× faster than `np.bitwise_or.at` (unbuffered scatter) at
        millions of keys — this is the filter-build hot loop.
        """
        idx = self._indexes(np.asarray(h1, dtype=np.int64), np.asarray(h2, dtype=np.int64)).ravel()
        as_bool = np.zeros(len(self.bits) * 64, dtype=bool)
        as_bool[idx.astype(np.int64)] = True
        packed = np.packbits(as_bool, bitorder="little").view(np.uint64)
        self.bits |= packed
        self.n_items += len(h1)

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indexes(np.asarray(h1, dtype=np.int64), np.asarray(h2, dtype=np.int64))
        words = self.bits[(idx // 64).astype(np.int64)]
        hit = (words >> (idx % np.uint64(64))).astype(np.uint64) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.k) == (other.m_bits, other.k), "incompatible filters"
        self.bits |= other.bits
        self.n_items += other.n_items
        return self

    def serialize(self) -> bytes:
        return _HEADER.pack(self.m_bits, len(self.bits), self.k, self.n_items) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        m_bits, n_words, k, n_items = _HEADER.unpack(data[: _HEADER.size])
        bits = np.frombuffer(data[_HEADER.size :], dtype=np.uint64, count=n_words).copy()
        return cls(m_bits, k, bits, n_items)

    @classmethod
    def deserialize_readonly(cls, data: bytes) -> "BloomFilter":
        """Zero-copy view over the serialized bytes (probe-only use)."""
        m_bits, n_words, k, n_items = _HEADER.unpack(data[: _HEADER.size])
        bits = np.frombuffer(data[_HEADER.size :], dtype=np.uint64, count=n_words)
        return cls(m_bits, k, bits, n_items)


def with_url_hashes(df: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Attach the two JVM-side hash columns the filter consumes."""
    return df.withColumn("__h1", F.xxhash64(F.col(url_col), F.lit(H1_SEED))).withColumn(
        "__h2", F.xxhash64(F.col(url_col), F.lit(H2_SEED))
    )


def build_bloom(df: DataFrame, url_col: str = "url_canon", m_bits: int = 1 << 20, k_hashes: int = 7) -> BloomFilter:
    """Build the union filter: per-partition numpy builds via ``mapInArrow``
    (each task emits its serialized slice — a few MB), then a driver
    OR-merge. The collect moves only filter bytes, never rows."""
    hashed = with_url_hashes(df, url_col).select("__h1", "__h2")

    def build_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # gather the partition's hashes first so the bool-scatter + packbits
        # in add_hashes runs ONCE per partition, not once per Arrow batch
        h1s, h2s = [], []
        for batch in batches:
            h1s.append(batch.column("__h1").to_numpy(zero_copy_only=False))
            h2s.append(batch.column("__h2").to_numpy(zero_copy_only=False))
        bf = BloomFilter(m_bits, k_hashes)
        if h1s:
            bf.add_hashes(np.concatenate(h1s), np.concatenate(h2s))
        yield pa.RecordBatch.from_pydict({"filter_bytes": pa.array([bf.serialize()], type=pa.binary())})

    parts = hashed.mapInArrow(build_partition, "filter_bytes binary").collect()
    out = BloomFilter(m_bits, k_hashes)
    for row in parts:
        out.merge(BloomFilter.deserialize(bytes(row.filter_bytes)))
    return out


_probe_filter_cache: dict[int, tuple[bytes, BloomFilter]] = {}


def _cached_probe_filter(data: bytes) -> BloomFilter:
    """Per-worker memo: the broadcast value is the same bytes object across
    batches, so the zero-copy view is built once per executor. The cache
    pins ``data`` so the id key can never dangle."""
    hit = _probe_filter_cache.get(id(data))
    if hit is None or hit[0] is not data:
        bf = BloomFilter.deserialize_readonly(data)
        _probe_filter_cache.clear()  # hold at most one filter per worker
        _probe_filter_cache[id(data)] = (data, bf)
        return bf
    return hit[1]


def probe_bloom(df: DataFrame, bloom: BloomFilter, url_col: str = "url_canon", out_col: str = "__maybe_seen") -> DataFrame:
    """Add a boolean ``out_col``: True when the URL is *possibly* in the
    filter (no false negatives). Bits ship to executors via broadcast."""
    sc = df.sparkSession.sparkContext
    b = sc.broadcast(bloom.serialize())

    @F.pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bf = _cached_probe_filter(b.value)
        return pd.Series(bf.contains_hashes(h1.to_numpy(), h2.to_numpy()))

    return (
        with_url_hashes(df, url_col)
        .withColumn(out_col, _probe(F.col("__h1"), F.col("__h2")))
        .drop("__h1", "__h2")
    )


def filter_unseen(
    frontier: DataFrame,
    bloom: BloomFilter | None,
    seen: DataFrame | None,
    url_col: str = "url_canon",
) -> DataFrame:
    """Exact unseen-set with a Bloom prefilter (see module docstring).

    ``seen`` is the exact seen table (one column ``url_canon``); rows
    flagged possibly-seen are verified against it with LEFT ANTI; the
    rest skip the join entirely.
    """
    if bloom is None or seen is None:
        if seen is None:
            return frontier
        return frontier.join(seen.select(F.col(url_col)).distinct(), url_col, "left_anti")
    probed = probe_bloom(frontier, bloom, url_col)
    negatives = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    positives = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified = positives.join(seen.select(F.col(url_col)).distinct(), url_col, "left_anti")
    return negatives.unionByName(verified)
