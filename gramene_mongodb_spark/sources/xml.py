"""S7 — XML sources (InterPro, Reactome-style).

Reference: ``ontologies/parseInterpro.js:39-52`` (InterPro XML via
fast-xml-parser) and the indent-stack ParentChildTree parse (``:22-36``);
``reactome/extract_docs_from_reactome.js:16-34``.

Design: these XML inputs are SMALL metadata files (tens of MB), so the
idiomatic Spark path is a driver-side parse → ``createDataFrame`` →
broadcast-side of downstream joins — exactly how the reference treats
them (whole-file LUT builds). For genuinely large XML, plug the
spark-xml package in ``io``; nothing downstream changes because the
output is a plain DataFrame.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

INTERPRO_SCHEMA = (
    "id STRING, type STRING, short_name STRING, name STRING, "
    "abstract STRING"
)


def read_interpro_xml(spark: SparkSession, path: str) -> DataFrame:
    """Parse an InterPro-style XML dump into one row per <interpro>
    entry (id, type, short_name, name, abstract)."""
    root = ET.parse(path).getroot()
    rows = []
    for entry in root.iter("interpro"):
        name_el = entry.find("name")
        abstract_el = entry.find("abstract")
        rows.append(
            (
                entry.get("id"),
                entry.get("type"),
                entry.get("short_name"),
                name_el.text if name_el is not None else None,
                "".join(abstract_el.itertext()).strip() if abstract_el is not None else None,
            )
        )
    return spark.createDataFrame(rows, INTERPRO_SCHEMA)


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
