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

_HEADER = struct.Struct("<QQIQI")  # m_bits, n_words, k_hashes, n_items, n_slices
H1_SEED = 0
H2_SEED = 1


class BloomFilter:
    """Numpy-backed Bloom filter with Kirsch-Mitzenmacher double hashing."""

    def __init__(
        self,
        m_bits: int,
        k_hashes: int,
        bits: np.ndarray | None = None,
        n_items: int = 0,
        n_slices: int = 1,
    ):
        """``n_slices`` > 1 selects the KEY-SPACE-SLICED layout: the bit
        table is split into ``n_slices`` disjoint sub-filters and a key
        belongs to exactly one slice (low bits of h1). Each partition
        then builds only the slices its keys hash to — total build work
        and state volume stay O(m) no matter how many partitions run,
        where the naive per-partition-full-filter design costs O(m × P).
        ``n_slices`` must be a power of two (so int64 masking == uint64
        modulo); 1 degenerates to a classic single filter."""
        assert n_slices & (n_slices - 1) == 0, "n_slices must be a power of two"
        self.n_slices = int(n_slices)
        self.m_slice = ((int(m_bits) + n_slices * 64 - 1) // (n_slices * 64)) * 64
        self.m_bits = self.m_slice * self.n_slices
        self.k = int(k_hashes)
        n_words = self.m_bits // 64
        self.bits = bits if bits is not None else np.zeros(n_words, dtype=np.uint64)
        self.n_items = int(n_items)

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 1e-3) -> "BloomFilter":
        n = max(n, 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _indexes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(len, k) GLOBAL bit indexes; inputs are int64 from xxhash64."""
        u1 = h1.astype(np.uint64)
        u2 = h2.astype(np.uint64) | np.uint64(1)  # odd so strides cover the table
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        if self.n_slices == 1:
            return (u1[:, None] + i * u2[:, None]) % np.uint64(self.m_bits)
        shift = np.uint64(self.n_slices.bit_length() - 1)
        s = u1 & np.uint64(self.n_slices - 1)
        local = ((u1 >> shift)[:, None] + i * u2[:, None]) % np.uint64(self.m_slice)
        return s[:, None] * np.uint64(self.m_slice) + local

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
        assert (self.m_bits, self.k, self.n_slices) == (other.m_bits, other.k, other.n_slices), "incompatible filters"
        self.bits |= other.bits
        self.n_items += other.n_items
        return self

    def serialize(self) -> bytes:
        return _HEADER.pack(self.m_bits, len(self.bits), self.k, self.n_items, self.n_slices) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        m_bits, n_words, k, n_items, n_slices = _HEADER.unpack(data[: _HEADER.size])
        bits = np.frombuffer(data[_HEADER.size :], dtype=np.uint64, count=n_words).copy()
        return cls(m_bits, k, bits, n_items, n_slices)

    @classmethod
    def deserialize_readonly(cls, data: bytes) -> "BloomFilter":
        """Zero-copy view over the serialized bytes (probe-only use)."""
        m_bits, n_words, k, n_items, n_slices = _HEADER.unpack(data[: _HEADER.size])
        bits = np.frombuffer(data[_HEADER.size :], dtype=np.uint64, count=n_words)
        return cls(m_bits, k, bits, n_items, n_slices)


def filter_state_rows(bloom: BloomFilter) -> list[tuple]:
    """Per-slice checkpoint rows (north_rule: the serialized membership
    filter state is partitioned, not one driver blob). Row shape matches
    ``schemas.SEEN_FILTER_STATE`` (partition_id == slice_id)."""
    words = bloom.m_slice // 64 if bloom.n_slices > 1 else len(bloom.bits)
    rows = []
    for s in range(bloom.n_slices):
        seg = bloom.bits[s * words : (s + 1) * words]
        rows.append((s, bytearray(seg.tobytes()), bloom.n_items, bloom.m_bits, bloom.k, bloom.n_slices))
    return rows


def filter_from_state_rows(rows) -> BloomFilter:
    """Rebuild the filter from checkpointed per-slice rows."""
    rows = sorted(rows, key=lambda r: r[0])
    _, _, n_items, m_bits, k, n_slices = rows[0][0], None, rows[0][2], rows[0][3], rows[0][4], rows[0][5]
    bits = np.concatenate([np.frombuffer(bytes(r[1]), dtype=np.uint64) for r in rows])
    return BloomFilter(m_bits, k, bits.copy(), n_items, n_slices)


def with_url_hashes(df: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Attach the two JVM-side hash columns the filter consumes."""
    return df.withColumn("__h1", F.xxhash64(F.col(url_col), F.lit(H1_SEED))).withColumn(
        "__h2", F.xxhash64(F.col(url_col), F.lit(H2_SEED))
    )


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length() if n & (n - 1) else max(n, 1)


def build_bloom(
    df: DataFrame,
    url_col: str = "url_canon",
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    n_slices: int | None = None,
) -> BloomFilter:
    """Build the partitioned URL-seen filter (north_rule D6).

    Key-space-sliced: keys are shuffled by their slice id (low bits of
    h1), each task builds only the m/n_slices-bit sub-filters for the
    slices it received, and the driver places the slices into the
    global table. Total bit-array work AND bytes collected are O(m)
    regardless of parallelism (the naive per-partition-full-filter
    design is O(m × P) both ways — it measurably anti-scales past 8
    cores). The per-slice rows are exactly the per-partition state the
    checkpoint stores (schemas.SEEN_FILTER_STATE).
    """
    spark = df.sparkSession
    if n_slices is None:
        n_slices = _next_pow2(spark.sparkContext.defaultParallelism)
    template = BloomFilter(m_bits, k_hashes, n_slices=n_slices)
    m_slice, shift = template.m_slice, n_slices.bit_length() - 1

    hashed = (
        with_url_hashes(df, url_col)
        .select("__h1", "__h2", F.col("__h1").bitwiseAND(F.lit(n_slices - 1)).alias("__slice"))
        .repartition(min(n_slices, spark.sparkContext.defaultParallelism), "__slice")
    )

    def build_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        h1s, h2s = [], []
        for batch in batches:
            h1s.append(batch.column("__h1").to_numpy(zero_copy_only=False))
            h2s.append(batch.column("__h2").to_numpy(zero_copy_only=False))
        if not h1s:
            return
        u1 = np.concatenate(h1s).astype(np.uint64)
        u2 = np.concatenate(h2s).astype(np.uint64) | np.uint64(1)
        s = (u1 & np.uint64(n_slices - 1)).astype(np.int64)
        order = np.argsort(s, kind="stable")
        u1, u2, s = u1[order], u2[order], s[order]
        bounds = np.flatnonzero(np.diff(s)) + 1
        slice_ids = s[np.concatenate([[0], bounds])] if len(s) else np.array([], dtype=np.int64)
        out_ids, out_bytes, out_counts = [], [], []
        i = np.arange(k_hashes, dtype=np.uint64)[None, :]
        for seg, sid in zip(np.split(np.arange(len(s)), bounds), slice_ids):
            lu1, lu2 = u1[seg], u2[seg]
            local = ((lu1 >> np.uint64(shift))[:, None] + i * lu2[:, None]) % np.uint64(m_slice)
            as_bool = np.zeros(m_slice, dtype=bool)
            as_bool[local.ravel().astype(np.int64)] = True
            out_ids.append(int(sid))
            out_bytes.append(np.packbits(as_bool, bitorder="little").tobytes())
            out_counts.append(len(seg))
        yield pa.RecordBatch.from_pydict(
            {
                "slice_id": pa.array(out_ids, type=pa.int32()),
                "slice_bytes": pa.array(out_bytes, type=pa.binary()),
                "n_items": pa.array(out_counts, type=pa.int64()),
            }
        )

    rows = hashed.mapInArrow(build_partition, "slice_id int, slice_bytes binary, n_items long").collect()
    out = template
    words_per_slice = m_slice // 64
    for row in rows:
        seg = np.frombuffer(bytes(row.slice_bytes), dtype=np.uint64, count=words_per_slice)
        lo = row.slice_id * words_per_slice
        out.bits[lo : lo + words_per_slice] |= seg
        out.n_items += row.n_items
    return out


_probe_filter_cache: dict[int, tuple] = {}


def _deserialize_any(data: bytes):
    """Dispatch on the serialization tag: cuckoo blobs are prefixed with
    CKF1 (operators/cuckoo.py); everything else is a Bloom filter."""
    if data[:4] == b"SCK1":
        from retailer_scrapers_spark.operators.cuckoo import SlicedCuckoo

        return SlicedCuckoo.deserialize(data)
    if data[:4] == b"CKF1":
        from retailer_scrapers_spark.operators.cuckoo import CuckooFilter

        return CuckooFilter.deserialize(data)
    return BloomFilter.deserialize_readonly(data)


def _cached_probe_filter(data: bytes):
    """Per-worker memo: the broadcast value is the same bytes object across
    batches, so the zero-copy view is built once per executor. The cache
    pins ``data`` so the id key can never dangle."""
    hit = _probe_filter_cache.get(id(data))
    if hit is None or hit[0] is not data:
        bf = _deserialize_any(data)
        _probe_filter_cache.clear()  # hold at most one filter per worker
        _probe_filter_cache[id(data)] = (data, bf)
        return bf
    return hit[1]


def probe_bloom(df: DataFrame, bloom, url_col: str = "url_canon", out_col: str = "__maybe_seen") -> DataFrame:
    """Add a boolean ``out_col``: True when the URL is *possibly* in the
    filter (no false negatives). Bits ship to executors via broadcast.
    Accepts either filter class (Bloom or Cuckoo — shared contract:
    ``contains_hashes(h1, h2)`` / ``serialize``)."""
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
    bloom,
    seen: DataFrame | None,
    url_col: str = "url_canon",
) -> DataFrame:
    """Exact unseen-set with a Bloom prefilter (see module docstring).

    ``seen`` is the exact seen table (one column ``url_canon``); rows
    flagged possibly-seen are verified against it with LEFT ANTI; the
    rest skip the join entirely.
    """
    # LEFT ANTI is existence-only: duplicates on the build side are
    # harmless, so no distinct — that was a full extra shuffle of the
    # (at scale, 10^10-row) seen set per epoch
    if bloom is None or seen is None:
        if seen is None:
            return frontier
        return frontier.join(seen.select(F.col(url_col)), url_col, "left_anti")
    probed = probe_bloom(frontier, bloom, url_col)
    negatives = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    positives = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified = positives.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return negatives.unionByName(verified)


def filter_unseen_split(
    frontier: DataFrame,
    bloom,
    seen: DataFrame | None,
    url_col: str = "url_canon",
    pin=None,
) -> tuple[DataFrame, DataFrame]:
    """``(unseen, dup_seen)`` without re-shuffling the frontier.

    Same semantics as :func:`filter_unseen` plus the complement: the
    rows that ARE already seen. The complement comes from the Bloom
    probe's own intermediates — a LEFT SEMI over only the
    probable-positive rows (≈ true dupes + FP rate, tiny vs the
    frontier) — instead of the previous ``in_window LEFT ANTI unseen``,
    which re-shuffled the whole frontier on ``url_canon`` once per
    epoch purely to log a metric (VERDICT r3 #3). ``pin`` persists the
    shared positives slice so the anti + semi pair reads one
    materialization.
    """
    pin = pin or (lambda d: d)
    if bloom is None or seen is None:
        if seen is None:
            return frontier, frontier.limit(0)
        frontier = pin(frontier)
        unseen = frontier.join(seen.select(F.col(url_col)), url_col, "left_anti")
        dup = frontier.join(seen.select(F.col(url_col)), url_col, "left_semi")
        return unseen, dup
    probed = probe_bloom(frontier, bloom, url_col)
    negatives = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    positives = pin(probed.filter(F.col("__maybe_seen")).drop("__maybe_seen"))
    verified = positives.join(seen.select(F.col(url_col)), url_col, "left_anti")
    dup = positives.join(seen.select(F.col(url_col)), url_col, "left_semi")
    return negatives.unionByName(verified), dup
