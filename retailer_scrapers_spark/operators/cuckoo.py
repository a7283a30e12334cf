"""Cuckoo filter — the deletable membership-filter variant (north_rule
"Bloom/cuckoo"; SURVEY.md §4.2.1 optional second filter class).

Why a crawl engine wants deletion: a URL scheduled for retry (R4) was
optimistically marked seen but must become crawlable again if its fetch
is abandoned; a Bloom filter cannot un-set bits, a cuckoo filter can
delete its fingerprint (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014 — public algorithm).

Layout: ``n_buckets`` buckets × ``bucket_size`` slots of 16-bit
fingerprints (0 = empty). Insert tries bucket i1 = hash(x) and its
partner i2 = i1 XOR hash(fingerprint); on overflow it kicks a random
resident (seeded RNG — deterministic) up to ``max_kicks`` times.

Same engine contract as the Bloom side: build from the two JVM-side
xxhash64 columns, serialize/deserialize for checkpointing, vectorized
numpy probe. Membership: no false negatives; fpp ≈ 2·bucket_size/2^16
per stored item at 95% load.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct("<QIIQ")  # n_buckets, bucket_size, _pad, n_items


class CuckooFilter:
    def __init__(self, n_buckets: int, bucket_size: int = 4, table: np.ndarray | None = None, n_items: int = 0):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
        self.n_buckets = int(n_buckets)
        self.bucket_size = int(bucket_size)
        self.table = table if table is not None else np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.n_items = int(n_items)
        self._rng = np.random.default_rng(42)
        self.max_kicks = 500

    @classmethod
    def for_capacity(cls, n: int, bucket_size: int = 4) -> "CuckooFilter":
        # size for ~95% max load
        need = max(int(n / 0.95 / bucket_size), 1)
        n_buckets = 1 << (need - 1).bit_length()
        return cls(n_buckets, bucket_size)

    # -- hashing ---------------------------------------------------------------
    def _fp(self, h1: np.ndarray) -> np.ndarray:
        """16-bit fingerprint, never 0 (0 marks an empty slot)."""
        fp = (h1.astype(np.uint64) >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h1: np.ndarray) -> np.ndarray:
        return (h1.astype(np.uint64) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partner bucket: i XOR hash(fp) (64-bit odd multiplier mix)
        mixed = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) & np.uint64(self.n_buckets - 1)
        return (i1.astype(np.uint64) ^ mixed).astype(np.int64) & (self.n_buckets - 1)

    # -- single-item ops (build path) --------------------------------------------
    def _insert_one(self, i1: int, fp: int) -> bool:
        i2 = int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for b in (i1, i2):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.n_items += 1
                return True
        # kick loop
        b = i1 if self._rng.integers(2) else i2
        cur = np.uint16(fp)
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(self.bucket_size))
            cur, self.table[b][slot] = self.table[b][slot], cur
            b = int(self._i2(np.array([b]), np.array([cur]))[0])
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.n_items += 1
                return True
        raise RuntimeError("cuckoo filter over capacity")

    def add_hashes(self, h1: np.ndarray) -> None:
        h1 = np.asarray(h1, dtype=np.int64)
        fps = self._fp(h1)
        i1s = self._i1(h1)
        for i1, fp in zip(i1s.tolist(), fps.tolist()):
            self._insert_one(int(i1), int(fp))

    def contains_hashes(self, h1: np.ndarray) -> np.ndarray:
        h1 = np.asarray(h1, dtype=np.int64)
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h1)
        i1 = self._i1(h1)
        i2 = self._i2(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_hashes(self, h1: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per item; returns per-item success."""
        h1 = np.asarray(h1, dtype=np.int64)
        fps = self._fp(h1)
        i1s = self._i1(h1)
        i2s = self._i2(i1s, fps)
        out = np.zeros(len(h1), dtype=bool)
        for j in range(len(h1)):
            for b in (int(i1s[j]), int(i2s[j])):
                row = self.table[b]
                hit = np.flatnonzero(row == fps[j])
                if len(hit):
                    row[hit[0]] = 0
                    self.n_items -= 1
                    out[j] = True
                    break
        return out

    # -- serialization -------------------------------------------------------------
    def serialize(self) -> bytes:
        return _HEADER.pack(self.n_buckets, self.bucket_size, 0, self.n_items) + self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CuckooFilter":
        n_buckets, bucket_size, _, n_items = _HEADER.unpack(data[: _HEADER.size])
        table = (
            np.frombuffer(data[_HEADER.size :], dtype=np.uint16, count=n_buckets * bucket_size)
            .reshape(n_buckets, bucket_size)
            .copy()
        )
        return cls(n_buckets, bucket_size, table, n_items)
