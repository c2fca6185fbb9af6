"""Document deduplication suite for large-scale training-data pipelines.

The reference deduplicates URLs only (exact string, via unique index —
schema.sql:30). A 100 TB web-text pipeline additionally needs *content*
dedup; these operators extend the same first-writer-wins discipline to
document text:

- exact dedup            — hash groupBy (one shuffle on a 64-bit hash)
- MinHash + LSH          — shingle → signature (Arrow UDF) → band →
                           bucket join; near-dup candidates without the
                           O(n²) pair space
- SimHash                — 64-bit signature + banded hamming candidates
- n-gram Jaccard         — exact set-similarity via shingle explode +
                           self-join (the verifier for the sketches)

Scale notes: every op shuffles on a bounded-width key (hash / band
bucket / shingle), never on raw text; signatures are computed in
Arrow-batched pandas UDFs; candidate verification touches only bucket
collisions. Skewed shingles (stopword shingles shared by millions of
docs) are the classic hot spot — ``ngram_jaccard_pairs`` filters
shingles above a document-frequency cap before the self-join, which is
both the standard trick and a large constant-factor win.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1


def _hash_pair(data: bytes) -> tuple[int, int]:
    """Per-shingle universal-hash parameters (a, b) from md5.

    md5 (not blake2b) so an independent SQL engine can recompute the
    identical signature: DuckDB's ``md5_number_upper(s)`` equals
    ``int.from_bytes(md5(s)[:8], 'little')`` and ``md5_number_lower(s)``
    equals bytes 8:16 — the driver's oracle check recomputes every
    MinHash/SimHash signature in SQL from these. Stable across processes
    and PYTHONHASHSEED.
    """
    d = hashlib.md5(data).digest()
    return (
        int.from_bytes(d[:8], "little") & _MERSENNE,
        (int.from_bytes(d[8:], "little") | 1) & _MERSENNE,
    )


def _shingles(text: str, n: int) -> set[bytes]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks).encode("utf-8")} if toks else set()
    return {" ".join(toks[i : i + n]).encode("utf-8") for i in range(len(toks) - n + 1)}


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: canonical id (min id = first writer) +
    copy count. Single hash-aggregate; at scale group on xxhash64(text)
    first so the shuffle key is 8 bytes, then confirm within group."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("n_copies"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly the first-writer row per distinct text."""
    w = Window.partitionBy(F.xxhash64(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# bucket-local pair expansion (shared by the LSH sketches)
# --------------------------------------------------------------------------


def _bucket_pair_expand(bucketed: DataFrame, key_cols: list[str],
                        payload) -> DataFrame:
    """Emit all within-bucket pairs (a, b), a before b in sorted order.

    One groupBy shuffle + in-memory explode per bucket — the sketch side
    of the plan evaluates ONCE (a self-join would recompute the signature
    UDF for each side) and the candidate pair space materializes only
    inside buckets. LSH bucket sizes are small by construction; a
    pathological hot bucket (all-identical docs) degrades to that
    bucket's local quadratic, same as any LSH implementation.
    """
    grouped = (
        bucketed.groupBy(*key_cols)
        .agg(F.collect_list(payload).alias("_items"))
        .filter(F.size("_items") >= 2)
        .withColumn("_items", F.array_sort("_items"))
    )
    items = F.col("_items")
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(
                    items,
                    i + F.lit(2),
                    F.greatest(F.size(items) - i - F.lit(1), F.lit(0)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return grouped.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def make_minhash_udf(num_hashes: int = 64, shingle_n: int = 3):
    """pandas UDF: text → array<long> MinHash signature.

    Universal-hash family h_i(x) = (a + i*b) mod p over blake2b-derived
    (a, b) per shingle — stable across processes/versions (no PYTHONHASHSEED
    dependence)."""

    @pandas_udf(ArrayType(LongType()))
    def minhash_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        M = np.uint64(_MERSENNE)
        for texts in it:
            out = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                shingles = _shingles(t, shingle_n)
                if not shingles:
                    out.append([_MERSENNE] * num_hashes)
                    continue
                ab = np.array(
                    [_hash_pair(sh) for sh in shingles], dtype=np.uint64
                )
                # sig[i] = min_sh (a + i*b) mod M, computed iteratively so no
                # intermediate exceeds 2^62 (a, b < 2^61): v_{i+1} = (v_i+b)%M
                v, b = ab[:, 0].copy(), ab[:, 1]
                sig = np.empty(num_hashes, dtype=np.uint64)
                for i in range(num_hashes):
                    sig[i] = v.min()
                    v = (v + b) % M
                out.append(sig.astype(np.int64).tolist())
            yield pd.Series(out)

    return minhash_udf


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded LSH.

    rows r = num_hashes/bands; two docs collide iff some band of their
    signatures is identical — P(collide) ≈ 1-(1-j^r)^b for Jaccard j.
    The pair space never materializes: docs meet only inside
    (band_idx, band_hash) buckets.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    df = df.filter(F.col(text_col).isNotNull())  # null docs carry no signature
    sig = df.select(
        F.col(id_col).alias("doc"), make_minhash_udf(num_hashes, shingle_n)(
            F.col(text_col)
        ).alias("sig"),
    )
    # band key = the band's signature values joined as a string — portable
    # (the SQL oracle rebuilds the identical key; xxhash64 of the slice
    # would be Spark-only). At cluster scale wrap it in md5() to bound the
    # shuffle key width; collision semantics are unchanged.
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.concat_ws(
                        "-",
                        F.transform(
                            F.slice("sig", b * F.lit(r) + 1, r),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select("doc", "bb.band_idx", "bb.band_hash")
    return (
        _bucket_pair_expand(banded, ["band_idx", "band_hash"], F.col("doc"))
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def make_simhash_udf(shingle_n: int = 1):
    """pandas UDF: text → 64-bit SimHash (signed long)."""

    @pandas_udf(LongType())
    def simhash_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        shifts = np.arange(64, dtype=np.uint64)
        for texts in it:
            out = []
            for t in texts:
                if t is None:
                    out.append(None)
                    continue
                shingles = _shingles(t, shingle_n)
                # md5[:8] little-endian == DuckDB md5_number_upper — the
                # oracle SQL recomputes the identical signature
                hs = np.array(
                    [
                        int.from_bytes(hashlib.md5(sh).digest()[:8], "little")
                        for sh in shingles
                    ],
                    dtype=np.uint64,
                )
                # counts[bit] = ones - zeros > 0  ⟺  2*ones > n_shingles
                ones = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
                v = int(
                    ((2 * ones > len(hs)).astype(np.uint64) << shifts).sum(
                        dtype=np.uint64
                    )
                )
                # to signed 64-bit
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.Series(out)

    return simhash_udf


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 1,
) -> DataFrame:
    """Near-dup pairs with hamming(sig_a, sig_b) ≤ max_hamming.

    Banded exact search: split the 64-bit signature into 4 16-bit chunks;
    any pair within hamming ≤ 3 shares at least one chunk verbatim
    (pigeonhole), so candidates come from chunk-bucket joins, then the
    exact hamming check filters. Returns (doc_a, doc_b, hamming).
    """
    df = df.filter(F.col(text_col).isNotNull())  # null docs carry no signature
    sigs = df.select(
        F.col(id_col).alias("doc"),
        make_simhash_udf(shingle_n)(F.col(text_col)).alias("sig"),
    )
    chunked = sigs.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned("sig", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc", "sig", "cc.chunk_idx", "cc.chunk")
    pairs = (
        _bucket_pair_expand(
            chunked, ["chunk_idx", "chunk"], F.struct(F.col("doc"), F.col("sig"))
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.sig").bitwiseXOR(F.col("b.sig"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# exact n-gram Jaccard (DataFrame-native; the sketch verifier)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs with shingle-set Jaccard ≥ threshold_num/threshold_den.

    Integer-exact: jaccard = shared/(n_a + n_b - shared) ≥ p/q
    ⟺ q·shared ≥ p·(n_a + n_b - shared) — no floating point, so the
    DuckDB oracle matches bit-for-bit. ``max_shingle_df`` drops shingles
    appearing in more than that many docs before the self-join (skew
    guard; candidate-complete for any threshold > 0 only if the dropped
    shingles can't flip the verdict — use None for exact small-scale runs).
    Returns (doc_a, doc_b, shared, n_a, n_b).
    """
    # Python str.split() semantics (split on whitespace RUNS, drop empty
    # tokens) — identical to the sketch UDFs' _shingles tokenizer and to
    # the oracle SQL's filtered regex split, so multi-space/tab/newline
    # documents shingle the same way on every path
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("toks"),
    )
    shingled = toks.select(
        "doc",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.concat_ws(
                        " ", F.slice("toks", i + 1, n)
                    ),
                ),
            ).otherwise(F.array(F.concat_ws(" ", F.col("toks"))))
        ).alias("sh"),
    ).distinct()
    counts = shingled.groupBy("doc").agg(F.count("*").alias("n_sh"))
    if max_shingle_df is not None:
        # skew guard: shingles shared by more than max_shingle_df docs
        # (boilerplate/templates) are dropped BEFORE the self-join — they
        # are exactly the quadratic hot keys. No broadcast hint: the hot
        # list is usually tiny but is corpus-dependent, so AQE picks the
        # join strategy from its runtime size.
        hot = (
            shingled.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        shingled = shingled.join(hot, "sh", "left_anti")
    a, b = shingled.alias("a"), shingled.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    # per-doc count tables are corpus-sized (one row per doc) — never
    # force-broadcast them; the surviving `shared` pair set is usually the
    # small side and AQE broadcasts it instead
    ca = counts.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    p, q = threshold_num, threshold_den
    return (
        shared.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(
            F.lit(q) * F.col("shared")
            >= F.lit(p) * (F.col("n_a") + F.col("n_b") - F.col("shared"))
        )
        .select("doc_a", "doc_b", "shared", "n_a", "n_b")
    )
