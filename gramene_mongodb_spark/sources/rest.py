"""S8 — REST API sources (ThaleMine, RapDB, Reactome, GXA shapes).

Reference: synchronous HTTP pulls building small LUTs
(``search/thalemine.js:7-28``, ``search/rapdb.js:7-52``,
``reactome/get_pathways.js:32-82``).

Design: REST pulls are driver-side (they're small, rate-limited, and
upstream-flaky — SURVEY.md §7 risk 6 says snapshot them, never call
live in tests), staged immediately into DataFrames that broadcast into
the decoration joins. The ``fetcher`` is injectable so tests and
air-gapped runs use fixtures; a production run passes a real HTTP
callable.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

#: fetcher: url -> response text. Injectable; no default HTTP client so
#: nothing in the engine can accidentally call the network in tests.
Fetcher = Callable[[str], str]


def fetch_json_lut(
    spark: SparkSession,
    url: str,
    fetcher: Fetcher,
    record_path: Iterable[str] = (),
    schema: str | None = None,
) -> DataFrame:
    """GET a JSON document and stage the (optionally nested) record list
    as a DataFrame. ``record_path`` walks into the payload (e.g.
    ``("results",)`` for ThaleMine's ``{"results": [...]}`` envelope)."""
    payload = json.loads(fetcher(url))
    for key in record_path:
        payload = payload[key]
    if not isinstance(payload, list):
        raise ValueError(f"record_path did not reach a list: {type(payload)}")
    if schema is not None:
        return spark.createDataFrame(payload, schema)
    return spark.createDataFrame(payload)


def fetch_tsv_lut(
    spark: SparkSession,
    url: str,
    fetcher: Fetcher,
    columns: list[str],
    sep: str = "\t",
    skip_header: bool = False,
) -> DataFrame:
    """GET a TSV payload (the RapDB/GXA shape) and stage it as a
    DataFrame with the given column names; malformed rows (wrong field
    count) are dropped, mirroring the reference's row-validation
    predicates (P6, ``search/rapdb.js:26-35``)."""
    lines = fetcher(url).splitlines()
    if skip_header and lines:
        lines = lines[1:]
    n = len(columns)
    rows = [
        tuple(parts)
        for line in lines
        if line.strip() and len(parts := line.split(sep)) == n
    ]
    schema = ", ".join(f"{c} STRING" for c in columns)
    return spark.createDataFrame(rows or [], schema)
