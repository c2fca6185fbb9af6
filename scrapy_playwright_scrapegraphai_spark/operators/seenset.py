"""Partitioned bloom-filter URL-seen set (K5, north-rule scale structure).

The reference's seen set is a Postgres unique index probed one URL per
round-trip (frontier_crud.py:122-139) — its principal bottleneck. At the
10^10-URL design point an exact anti-join of every candidate batch against
the full frontier would shuffle the frontier every superstep; the bloom
shards cut that to (a) a broadcast-size bitmap probe that discards the
vast majority of already-seen candidates map-side, then (b) an exact
anti-join of the few survivors against only the matching hash partitions.

Exactness contract: bloom false positives are *re-checked* by the exact
anti-join (never dropped); bloom has no false negatives, so no unseen URL
is ever lost. The final seen set is therefore byte-equal to the exact
path — asserted in tests.

Sharding: shard = pmod(xxhash64(url), P) computed JVM-side (consistent
between build and probe). Bit positions inside a shard come from
blake2b(url) — stable across Python versions/processes. Each shard is a
numpy bitmap blob; P blobs are collected (a few MB total at sandbox
scale) and broadcast. At cluster scale, shards live as binary rows in an
Iceberg table, loaded per-superstep and broadcast-merged (delta-OR of the
new-URL bitmaps), never rebuilt from scratch.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_positions(url: str, m_bits: int, k: int) -> list[int]:
    digest = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(digest[:8], "little")
    h2 = int.from_bytes(digest[8:], "little") | 1
    return [((h1 + i * h2) % m_bits) for i in range(k)]


def _positions_matrix(urls, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions, bit-identical to ``_bit_positions`` per row.

    One blake2b per URL is the only per-row Python work; the double-hash
    position arithmetic is vectorized. uint64 wraparound would diverge
    from Python's arbitrary-precision ``(h1 + i*h2) % m`` (h1 + 7*h2 can
    exceed 2^64), so both hashes are reduced mod m FIRST — algebraically
    identical, and ``h1%m + i*(h2%m)`` stays < 8*m ≪ 2^64 for any
    realistic shard size. Equivalence is asserted in tests.
    """
    if len(urls) == 0:
        return np.empty((0, k), dtype=np.uint64)
    buf = b"".join(
        hashlib.blake2b(u.encode("utf-8"), digest_size=16).digest()
        for u in urls
    )
    h = np.frombuffer(buf, dtype="<u8").reshape(-1, 2)
    m = np.uint64(m_bits)
    h1m = h[:, 0:1] % m
    h2m = (h[:, 1:2] | np.uint64(1)) % m
    i = np.arange(k, dtype=np.uint64)
    return (h1m + i * h2m) % m


def _byte_and_mask(pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a position matrix into (byte index int64, uint8 bit mask)."""
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    mask = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    return byte_idx, mask


class BloomShards:
    """P independent bloom bitmaps keyed by pmod(xxhash64(url), P)."""

    def __init__(self, num_shards: int, bits_per_shard: int, num_hashes: int = 5):
        self.num_shards = num_shards
        self.bits = bits_per_shard
        self.k = num_hashes
        self.bitmaps = [
            np.zeros(math.ceil(bits_per_shard / 8), dtype=np.uint8)
            for _ in range(num_shards)
        ]

    @classmethod
    def sized_for(cls, expected_urls: int, num_shards: int = 16,
                  fpp: float = 0.01) -> "BloomShards":
        per_shard = max(1, expected_urls // num_shards)
        m = max(1024, int(-per_shard * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / per_shard * math.log(2))) if per_shard else 5
        return cls(num_shards, m, min(k, 8))

    def add(self, url: str, shard: int) -> None:
        bm = self.bitmaps[shard]
        for pos in _bit_positions(url, self.bits, self.k):
            bm[pos >> 3] |= 1 << (pos & 7)

    def might_contain(self, url: str, shard: int) -> bool:
        bm = self.bitmaps[shard]
        return all(
            bm[pos >> 3] & (1 << (pos & 7))
            for pos in _bit_positions(url, self.bits, self.k)
        )

    # --- Spark integration --------------------------------------------------

    def add_df(self, df: DataFrame, url_col: str = "url") -> None:
        """OR the URLs of ``df`` into the shards.

        Shuffles URLs by shard key and builds ONE delta bitmap per shard
        executor-side (groupBy + applyInPandas) — exactly ``num_shards``
        blobs travel to the driver, independent of input partitioning.
        (A per-input-partition variant collected partitions × shards blobs
        — 100+ MB per superstep at 64 partitions — and anti-scaled.)
        """
        num_shards, bits, k = self.num_shards, self.bits, self.k
        nbytes = self.bitmaps[0].nbytes

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(nbytes, dtype=np.uint8)
            byte_idx, mask = _byte_and_mask(
                _positions_matrix(pdf["u"].tolist(), bits, k)
            )
            # unbuffered |= — duplicate byte indices within the batch must
            # all land (plain fancy-index assignment would keep only one)
            np.bitwise_or.at(bm, byte_idx.ravel(), mask.ravel())
            return pd.DataFrame(
                {"shard": [int(pdf["s"].iloc[0])], "blob": [bm.tobytes()]}
            )

        deltas = (
            df.select(
                F.col(url_col).alias("u"),
                F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_shards)).alias("s"),
            )
            # explicit user repartition on the shard key: AQE would
            # otherwise coalesce the groupBy exchange of a few-hundred-MB
            # url batch into ONE reducer (profiled: a 3 s single task
            # building all shards serially); pinning to num_shards keeps
            # the build num_shards-way parallel, and groupBy reuses the
            # partitioning so no second exchange is added
            .repartition(num_shards, "s")
            .groupBy("s")
            .applyInPandas(_build, "shard int, blob binary")
            .collect()
        )
        for row in deltas:
            self.bitmaps[row["shard"]] |= np.frombuffer(row["blob"], dtype=np.uint8)

    def with_maybe_flag(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Append a boolean ``_maybe`` column (broadcast bitmap probe).

        Single-output form: callers that branch on the flag should
        materialize this result ONCE (cache/localCheckpoint) before
        filtering — ``prefilter_maybe_seen``'s two filtered branches
        otherwise re-execute the whole upstream per branch.
        """
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(
            [bm.tobytes() for bm in self.bitmaps]
        )
        bits, k, num_shards = self.bits, self.k, self.num_shards

        def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # all shards share one nbytes; flatten to a single array so the
            # per-row shard lookup is one vectorized offset add
            maps = np.concatenate(
                [np.frombuffer(b, dtype=np.uint8) for b in bc.value]
            )
            nbytes = len(bc.value[0])
            for pdf in batches:
                byte_idx, mask = _byte_and_mask(
                    _positions_matrix(pdf["_u"].tolist(), bits, k)
                )
                base = pdf["_s"].to_numpy().astype(np.int64) * nbytes
                hits = (maps[base[:, None] + byte_idx] & mask) != 0
                pdf = pdf.copy()
                pdf["_maybe"] = hits.all(axis=1)
                yield pdf

        with_flag = (
            df.withColumn("_u", F.col(url_col))
            .withColumn("_s", F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_shards)))
        )
        from pyspark.sql.types import BooleanType, StructField, StructType

        # fresh StructType — .add() would mutate the DataFrame's cached schema
        schema = StructType(
            list(with_flag.schema.fields) + [StructField("_maybe", BooleanType())]
        )
        return with_flag.mapInPandas(_probe, schema).drop("_u", "_s")

    def total_bytes(self) -> int:
        return sum(bm.nbytes for bm in self.bitmaps)

    def with_maybe_flag_shard_local(
        self, df: DataFrame, url_col: str = "url"
    ) -> DataFrame:
        """Partition-local probe — the 10^10-URL design point.

        Broadcast arithmetic: a bloom at 1% fpp costs ~1.2 bytes/URL, so
        10^10 URLs ≈ 12 GB of bitmaps — far beyond what can ship to every
        executor each superstep (``with_maybe_flag`` broadcasts the whole
        set and is right only while the set is tens of MB). Here the
        candidates shuffle on pmod(xxhash64(url), P) — the SAME key the
        bitmaps are sharded by — and COGROUP with the shard-blob table,
        so each task loads exactly ONE shard's bitmap (12 GB / P; a few
        MB at P=4096). Under Iceberg the blob side is the persisted
        seen-shard table, so the probe reads only current shard files.
        Output and exactness contract are identical to
        ``with_maybe_flag`` (asserted in tests); the driver picks the
        probe by ``total_bytes()`` against its broadcast budget.
        """
        spark = df.sparkSession
        blobs = spark.createDataFrame(self.serialize(), "shard int, blob binary")
        bits, k = self.bits, self.k
        num_shards = self.num_shards
        cand = (
            df.withColumn("_u", F.col(url_col))
            .withColumn("_s", F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_shards)))
        )
        from pyspark.sql.types import BooleanType, StructField, StructType

        schema = StructType(
            list(cand.schema.fields) + [StructField("_maybe", BooleanType())]
        )

        def _probe(cands: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
            if cands.empty:
                return cands.assign(_maybe=pd.Series(dtype=bool))
            bm = (
                np.frombuffer(blob_pdf["blob"].iloc[0], dtype=np.uint8)
                if len(blob_pdf)
                else None
            )
            if bm is None:  # shard never built → nothing seen in it
                return cands.assign(_maybe=False)
            byte_idx, mask = _byte_and_mask(
                _positions_matrix(cands["_u"].tolist(), bits, k)
            )
            hits = (bm[byte_idx] & mask) != 0
            return cands.assign(_maybe=hits.all(axis=1))

        probed = (
            cand.groupby("_s")
            .cogroup(blobs.groupby("shard"))
            .applyInPandas(_probe, schema)
        )
        return probed.drop("_u", "_s")

    def prefilter_maybe_seen(self, df: DataFrame, url_col: str = "url"):
        """Split df into (maybe_seen, definitely_new) via broadcast probe.

        ``definitely_new`` rows need no exact anti-join (no false
        negatives); ``maybe_seen`` rows go to the exact check. NB: each
        branch re-executes the upstream plan — materialize ``df`` first,
        or use ``with_maybe_flag`` + one materialization (the driver's
        hot path does the latter).
        """
        probed = self.with_maybe_flag(df, url_col)
        maybe = probed.filter(F.col("_maybe")).drop("_maybe")
        new = probed.filter(~F.col("_maybe")).drop("_maybe")
        return maybe, new

    def serialize(self) -> list[tuple[int, bytes]]:
        return [(i, bm.tobytes()) for i, bm in enumerate(self.bitmaps)]

    # --- checkpoint persistence ---------------------------------------------

    def save(self, path: str, step: int) -> None:
        """Atomically persist the shards + params as of committed ``step``.

        Driver-side plain-file write (the blobs already live in driver
        memory after the delta merge) — tmp file + rename, so a kill
        mid-write leaves the previous snapshot. At 10^10 scale with an
        Iceberg catalog the same rows live in a seen-shards table keyed
        by (step, shard); this is the parquet-fallback equivalent.
        """
        import os
        import pickle

        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(
                {
                    "step": step,
                    "num_shards": self.num_shards,
                    "bits": self.bits,
                    "k": self.k,
                    "blobs": [bm.tobytes() for bm in self.bitmaps],
                },
                fh,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "tuple[BloomShards, int] | None":
        """(shards, committed_step) from ``save``; None if absent/corrupt
        (callers fall back to rebuilding from the frontier)."""
        import os
        import pickle

        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as fh:
                d = pickle.load(fh)
            obj = cls(d["num_shards"], d["bits"], d["k"])
            obj.bitmaps = [
                np.frombuffer(b, dtype=np.uint8).copy() for b in d["blobs"]
            ]
            return obj, int(d["step"])
        except Exception:
            return None

    @classmethod
    def deserialize(cls, rows, bits_per_shard: int, num_hashes: int) -> "BloomShards":
        rows = sorted(rows)
        obj = cls(len(rows), bits_per_shard, num_hashes)
        obj.bitmaps = [np.frombuffer(b, dtype=np.uint8).copy() for _, b in rows]
        return obj
