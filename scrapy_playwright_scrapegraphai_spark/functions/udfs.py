"""Arrow-vectorized Spark wrappers around the pure kernels.

Everything here is batch-vectorized (pandas UDF / mapInPandas over Arrow
record batches) — the north rule forbids per-row Python in the hot path.
The wrapped kernels live in ``kernels.py`` and are shared verbatim with
the single-process oracle (byte parity by construction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import kernels

# --- scalar pandas UDFs (iterator form amortizes worker/parser setup) ------


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(html binary, base_url) → array<string> of resolved links.

    Vectorizes kernels.extract_links (frontier_spider.py:186-212 parity).
    """
    for html, base in it:
        yield pd.Series(
            [
                kernels.extract_links(h, b) if h is not None else []
                for h, b in zip(html, base)
            ]
        )


@pandas_udf(StringType())
def extract_text_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """html binary → extracted visible text (north-rule byte invariant)."""
    for html in it:
        yield pd.Series(
            [kernels.extract_text(h) if h is not None else None for h in html]
        )


@pandas_udf(StringType())
def main_domain_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """urlparse(url).netloc (frontier_model.py:53-58). Python-urllib parity
    path; ``F.parse_url(url,'HOST')`` is the native prefilter variant."""
    for urls in it:
        yield urls.map(lambda u: kernels.main_domain(u) if u else None)


@pandas_udf(BooleanType())
def is_valid_url_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for urls in it:
        yield urls.map(lambda u: kernels.is_valid_url(u) if u is not None else False)


@pandas_udf(StringType())
def canonicalize_url_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Normalization-mode canonical URL (seen-set scale key)."""
    for urls in it:
        yield urls.map(
            lambda u: kernels.canonicalize_url(u, mode="normalize") if u else None
        )


@pandas_udf(BooleanType())
def matches_pattern_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(url, patterns array) → dual substring/regex match (url_utils.py:14-24).

    Invalid-regex rows yield False here (row-granular use); page-granular
    abort semantics live in ``expand_pages``/``classify_links``.
    """
    import re

    for urls, pats in it:
        out = []
        for u, p in zip(urls, pats):
            if u is None:
                out.append(False)
                continue
            try:
                out.append(kernels.matches_pattern(u, list(p) if p is not None else []))
            except re.error:
                out.append(False)
        yield pd.Series(out)


@pandas_udf(BooleanType())
def robots_allows_udf(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(url, allow_patterns, deny_patterns) → admission verdict."""
    for urls, allows, denies in it:
        yield pd.Series(
            [
                kernels.robots_allows(
                    u,
                    list(a) if a is not None else [],
                    list(d) if d is not None else [],
                )
                for u, a, d in zip(urls, allows, denies)
            ]
        )


# --- page expansion: extract + classify in ONE Arrow pass -------------------

# Output schema of expand_pages (child-link rows).
EXPANDED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("category", StringType()),
        StructField("url_type", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("max_depth", IntegerType()),
        StructField("target_patterns", ArrayType(StringType())),
        StructField("seed_pattern", StringType()),
        StructField("is_target", BooleanType()),
        StructField("parent_url", StringType()),
        StructField("parent_seq", LongType()),
        StructField("item_seq", IntegerType()),
        StructField("root_seed_id", IntegerType()),
        StructField("found_count", IntegerType()),
    ]
)

_EXPAND_IN_COLS = [
    "url",
    "category",
    "url_type",
    "depth",
    "max_depth",
    "target_patterns",
    "seed_pattern",
    "html",
    "discovery_seq",
    "root_seed_id",
]


def expand_pages(fetched: DataFrame) -> DataFrame:
    """Fetched frontier pages → classified child-link rows.

    One ``mapInPandas`` pass fuses link extraction
    (frontier_spider.py:186-212), validity filtering (url_utils.py:5-11)
    and target/seed classification with depth gating
    (crawl_manager_utils.py:18-125). Fusing keeps the huge intermediate
    found-links arrays inside the Python worker instead of shipping them
    through the JVM for a posexplode — at 10^10-URL scale that array
    shuffle would dominate.

    Input columns: url, category, url_type, depth, max_depth,
    target_patterns, seed_pattern, html, discovery_seq, root_seed_id.
    Output: EXPANDED_SCHEMA; ``item_seq`` preserves the reference's
    yielded-item order (targets in link order, then seeds), ``found_count``
    is len(found_links) for lineage metrics (logging_utils.py:93-122).
    """

    names = [f.name for f in EXPANDED_SCHEMA.fields]

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation: per-page extend of plain lists — no
            # per-link dict construction (the hot path at 10^10 links)
            cols: dict[str, list] = {n: [] for n in names}
            for r in pdf.itertuples(index=False):
                if r.html is None:
                    continue
                found = kernels.extract_links(r.html, r.url)
                patterns = (
                    list(r.target_patterns) if r.target_patterns is not None else []
                )
                items = kernels.classify_links(
                    r.url,
                    found,
                    int(r.url_type),
                    patterns,
                    r.seed_pattern,
                    int(r.depth),
                    int(r.max_depth),
                )
                if not items:
                    continue
                n = len(items)
                cols["url"].extend(item.url for item in items)
                cols["category"].extend([r.category] * n)
                cols["url_type"].extend([int(r.url_type)] * n)
                cols["depth"].extend(item.depth for item in items)
                cols["max_depth"].extend([int(r.max_depth)] * n)
                cols["target_patterns"].extend([patterns] * n)
                cols["seed_pattern"].extend([r.seed_pattern] * n)
                cols["is_target"].extend(item.is_target for item in items)
                cols["parent_url"].extend([r.url] * n)
                cols["parent_seq"].extend([int(r.discovery_seq)] * n)
                cols["item_seq"].extend(item.item_seq for item in items)
                cols["root_seed_id"].extend([int(r.root_seed_id)] * n)
                cols["found_count"].extend([len(found)] * n)
            yield pd.DataFrame(cols) if cols["url"] else pd.DataFrame(
                {n: pd.Series(dtype="object") for n in names}
            )

    return fetched.select(*_EXPAND_IN_COLS).mapInPandas(_expand, EXPANDED_SCHEMA)


# --- fused per-page parse: links + classification + text in ONE pass --------

# parse_pages output: one row per fetched page. ``items`` holds the
# classified child links (exploded JVM-side by ``explode_parsed``); page-
# constant columns ride once per page instead of being duplicated per
# link through the Arrow boundary.
PARSED_SCHEMA = StructType(
    [
        StructField("discovery_seq", LongType()),
        StructField("page_url", StringType()),
        StructField("category", StringType()),
        StructField("url_type", IntegerType()),
        StructField("max_depth", IntegerType()),
        StructField("target_patterns", ArrayType(StringType())),
        StructField("seed_pattern", StringType()),
        StructField("root_seed_id", IntegerType()),
        StructField("found_count", IntegerType()),
        # per-page classified-item counts, computed inside the parse pass
        # so lineage aggregation reads 1 row/page instead of re-exploding
        # every child link (A1 semantics: crawl_manager_utils.py:33,42-48)
        StructField("n_targets", IntegerType()),
        StructField("n_seeds", IntegerType()),
        StructField("text", StringType()),
        StructField(
            "items",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType()),
                        StructField("depth", IntegerType()),
                        StructField("is_target", BooleanType()),
                        StructField("item_seq", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_pages(fetched: DataFrame) -> DataFrame:
    """Fetched frontier pages → one parsed row per page.

    Fuses K1 link extraction (frontier_spider.py:186-212), P2-P6
    classification with depth gating (crawl_manager_utils.py:18-125) AND
    K2 text extraction into a SINGLE Arrow pass — the html bytes cross
    the JVM→Python boundary exactly once per superstep and the HTML is
    parsed exactly once (the previous design parsed every page twice:
    once for links, once for text). Emits one row per input page even
    when html is null/empty (text null, items empty) so fetch-success
    bookkeeping can ride this output.
    """
    names = [f.name for f in PARSED_SCHEMA.fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for r in pdf.itertuples(index=False):
                patterns = (
                    list(r.target_patterns) if r.target_patterns is not None else []
                )
                if r.html is None:
                    found: list = []
                    items: list = []
                    text = None
                else:
                    found, text = kernels.parse_page(r.html, r.url)
                    items = kernels.classify_links(
                        r.url, found, int(r.url_type), patterns,
                        r.seed_pattern, int(r.depth), int(r.max_depth),
                    )
                cols["discovery_seq"].append(int(r.discovery_seq))
                cols["page_url"].append(r.url)
                cols["category"].append(r.category)
                cols["url_type"].append(int(r.url_type))
                cols["max_depth"].append(int(r.max_depth))
                cols["target_patterns"].append(patterns)
                cols["seed_pattern"].append(r.seed_pattern)
                cols["root_seed_id"].append(int(r.root_seed_id))
                cols["found_count"].append(len(found))
                nt = sum(1 for i in items if i.is_target)
                cols["n_targets"].append(nt)
                cols["n_seeds"].append(len(items) - nt)
                cols["text"].append(text)
                cols["items"].append(
                    [(i.url, i.depth, i.is_target, i.item_seq) for i in items]
                )
            yield pd.DataFrame(cols) if cols["page_url"] else pd.DataFrame(
                {n: pd.Series(dtype="object") for n in names}
            )

    return fetched.select(*_EXPAND_IN_COLS).mapInPandas(_parse, PARSED_SCHEMA)


def explode_parsed(parsed: DataFrame) -> DataFrame:
    """parse_pages output → child-link rows (EXPANDED_SCHEMA + partition_id).

    The explode is native columnar JVM work; ``partition_id`` (per-
    partition lineage grain) is taken on the parsed-page rows.
    """
    return (
        parsed.withColumn("partition_id", F.spark_partition_id())
        .select(
            "category", "url_type", "max_depth", "target_patterns",
            "seed_pattern", "root_seed_id", "found_count", "partition_id",
            F.col("page_url").alias("parent_url"),
            F.col("discovery_seq").alias("parent_seq"),
            F.explode("items").alias("_it"),
        )
        .select(
            F.col("_it.url").alias("url"),
            "category", "url_type",
            F.col("_it.depth").alias("depth"),
            "max_depth", "target_patterns", "seed_pattern",
            F.col("_it.is_target").alias("is_target"),
            "parent_url", "parent_seq",
            F.col("_it.item_seq").alias("item_seq"),
            "root_seed_id", "found_count", "partition_id",
        )
    )


def with_main_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach main_domain. Uses the urllib-parity pandas UDF; the native
    ``parse_url`` expression exists as a prefilter but urllib and Java
    disagree on edge cases (userinfo, bare ports), so the stored column
    comes from the parity path."""
    return df.withColumn("main_domain", main_domain_udf(F.col(url_col)))


def main_domain_native(url: "F.Column | str"):
    """JVM-side ``urlparse(url).netloc`` — valid ONLY for urls that pass
    ``kernels.is_valid_url`` (scheme + netloc present), which is the
    invariant of every row reaching ``finalize_new_rows`` (the P2
    validity gate runs inside the fused parse before classification).

    Replicates CPython ``urlsplit`` exactly on that domain: tab/CR/LF
    removed anywhere, the LEADING C0-control/space run stripped (CPython
    does not strip trailing — a netloc really can end in a space), then
    the authority is everything between ``scheme://`` and the first of
    ``/ ? #``. Java's ``parse_url(..., 'HOST')`` is NOT equivalent
    (drops userinfo and port), hence the regexp. Property-tested against
    the Python kernel in tests/test_kernels.py; keeps the frontier
    advance free of Python workers (the Arrow eval was 2-3 s/superstep
    at 8 cores on the bench corpus)."""
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, "[\\t\\n\\r]", "")
    c = F.regexp_replace(c, "^[\\x00-\\x20]+", "")
    return F.regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
