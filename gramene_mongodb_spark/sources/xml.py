"""S7 — XML sources (InterPro, Reactome-style).

Reference: ``ontologies/parseInterpro.js:39-52`` (InterPro XML via
fast-xml-parser) and the indent-stack ParentChildTree parse (``:22-36``);
``reactome/extract_docs_from_reactome.js:16-34``.

Design: these XML inputs are SMALL metadata files (tens of MB), so the
idiomatic Spark path is a driver-side parse → ``createDataFrame`` →
broadcast-side of downstream joins — exactly how the reference treats
them (whole-file LUT builds). ``read_interpro_xml`` enforces that
contract with a measured size dispatch: above ``driver_max_bytes``
(64 MB default) it switches to :func:`read_interpro_xml_distributed`,
the record-split path (``lineSep="</interpro>"`` text read → per-entry
ElementTree parse in Arrow batches — the same trick the OBO source
uses for stanzas, and the same rowTag model as the spark-xml package,
without the external JAR). Output schema is identical either way, so
nothing downstream changes.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

INTERPRO_SCHEMA = (
    "id STRING, type STRING, short_name STRING, name STRING, "
    "abstract STRING"
)

#: driver-side parse ceiling — above this, read_interpro_xml dispatches
#: to the distributed record-split path
DRIVER_MAX_BYTES = 64 * 1024 * 1024


def _interpro_fields(entry) -> tuple:
    name_el = entry.find("name")
    abstract_el = entry.find("abstract")
    return (
        entry.get("id"),
        entry.get("type"),
        entry.get("short_name"),
        name_el.text if name_el is not None else None,
        "".join(abstract_el.itertext()).strip() if abstract_el is not None else None,
    )


def read_interpro_xml(
    spark: SparkSession, path: str, driver_max_bytes: int = DRIVER_MAX_BYTES
) -> DataFrame:
    """Parse an InterPro-style XML dump into one row per <interpro>
    entry (id, type, short_name, name, abstract).

    Files up to ``driver_max_bytes`` parse driver-side (one ET pass →
    createDataFrame — these are broadcast-LUT inputs); larger files
    take the distributed record-split path automatically, so a 100 GB
    dump never lands on the driver. Both paths are equality-tested on
    the same bytes (test_sources.py)."""
    if os.path.getsize(path) > driver_max_bytes:
        return read_interpro_xml_distributed(spark, path)
    root = ET.parse(path).getroot()
    rows = [_interpro_fields(entry) for entry in root.iter("interpro")]
    return spark.createDataFrame(rows, INTERPRO_SCHEMA)


def read_interpro_xml_distributed(
    spark: SparkSession, path: str, row_tag: str = "interpro"
) -> DataFrame:
    """Distributed record-oriented XML parse — the large-file path.

    ``spark.read.text(lineSep="</interpro>")`` splits the dump into one
    fragment per entry AT THE SOURCE (parallel reads, no driver
    bytes) — the same record-split trick as the OBO stanza source and
    the rowTag model of the public spark-xml package. Each fragment is
    then parsed with ElementTree inside ``mapInPandas`` Arrow batches:
    per-record work, embarrassingly parallel, malformed fragments
    quarantine to null-id rows the caller can filter.

    Contract (same as spark-xml's rowTag): the row tag delimits
    NON-NESTED records, and the literal closing tag must not appear
    inside attribute values or CDATA — true for InterPro/Reactome
    dumps and record-dump XML generally.
    """
    import pandas as pd

    close = f"</{row_tag}>"
    raw = spark.read.text(path, lineSep=close)

    def parse(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import re

        start_re = re.compile(f"<{row_tag}[\\s>]")
        cols = ["id", "type", "short_name", "name", "abstract"]
        for pdf in batches:
            rows = []
            for chunk in pdf["value"]:
                if chunk is None:
                    continue
                m = start_re.search(chunk)
                if not m:
                    continue  # trailer after the last record / prolog
                frag = chunk[m.start():] + close
                try:
                    rows.append(_interpro_fields(ET.fromstring(frag)))
                except ET.ParseError:
                    rows.append((None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(parse, INTERPRO_SCHEMA)


def read_parent_child_tree(spark: SparkSession, path: str) -> DataFrame:
    """Parse the InterPro ParentChildTreeFile (indentation = depth,
    ``--`` per level) into (child, parent) edges — the K7 closure input.

    Reference: the indent-stack walk of ``ontologies/parseInterpro.js:19-36``.
    Driver-side (the file is ~1 MB); emits a DataFrame so the closure and
    all joins stay distributed.
    """
    edges: list[tuple[str, str]] = []
    stack: list[str] = []
    with open(path) as fh:
        for line in fh:
            raw = line.rstrip("\n")
            if not raw.strip():
                continue
            depth = 0
            while raw.startswith("--"):
                raw = raw[2:]
                depth += 1
            node = raw.split("::")[0].strip()
            del stack[depth:]
            if stack:
                edges.append((node, stack[-1]))
            stack.append(node)
    return spark.createDataFrame(edges or [], "child STRING, parent STRING")
