"""K5 — protein domain architecture clustering + LCA labeling.

Reference: ``search/domain_architect.js:84-222`` — per canonical
translation: group InterPro hits by hierarchy root, sort by (start,
end), merge clusters whose coordinate overlap is ≥20% of the shorter
one, label each cluster with the LCA (deepest common ancestor) of its
members' hierarchy paths, emit the ordered root string.

Spark-first: the feature rows join (broadcast) to the InterPro
hierarchy's root-path table (from K7's closure or the ParentChildTree
file), then a grouped-map kernel runs per translation — tens of
features each, so groups are tiny and perfectly parallel. The kernel
only merges sorted intervals and intersects paths; all heavy lineage
computation stays relational.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLUSTER_SCHEMA = (
    "translation_id STRING, cluster_idx INT, start BIGINT, end BIGINT, "
    "lca STRING, root STRING, members ARRAY<STRING>"
)


def _lca(paths: list[list[str]]) -> str:
    """Deepest common prefix of root→node paths
    (``search/domain_architect.js:180-192``)."""
    if not paths:
        return None
    common = paths[0]
    for p in paths[1:]:
        n = 0
        for a, b in zip(common, p):
            if a != b:
                break
            n += 1
        common = common[:n]
        if not common:
            return None
    return common[-1] if common else None


def cluster_architecture(
    features: DataFrame,
    paths: DataFrame,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Cluster per-translation InterPro hits into architecture clusters.

    ``features``: (translation_id, interpro, start, end).
    ``paths``: (interpro, path ARRAY<STRING>) — root-first hierarchy path
    per InterPro id (root = path[0]); broadcast-joined.

    Two hits merge when they share a hierarchy root AND their coordinate
    overlap ≥ ``min_overlap`` × the shorter hit's length
    (``search/domain_architect.js:119-165``). Output: one row per
    cluster with bounds, member ids, the members' LCA, and the root.
    """
    enriched = features.join(F.broadcast(paths), "interpro", "left").select(
        "translation_id", "interpro", "start", "end",
        F.coalesce(F.col("path"), F.array(F.col("interpro"))).alias("path"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start", "end", "interpro"])
        clusters: list[dict] = []
        for row in pdf.itertuples(index=False):
            root = row.path[0]
            merged = False
            for c in clusters:
                if c["root"] != root:
                    continue
                ov = min(c["end"], row.end) - max(c["start"], row.start) + 1
                shorter = min(c["end"] - c["start"] + 1, row.end - row.start + 1)
                if ov > 0 and shorter > 0 and ov / shorter >= min_overlap:
                    c["start"] = min(c["start"], row.start)
                    c["end"] = max(c["end"], row.end)
                    c["members"].append(row.interpro)
                    c["paths"].append(list(row.path))
                    merged = True
                    break
            if not merged:
                clusters.append(
                    {
                        "root": root,
                        "start": int(row.start),
                        "end": int(row.end),
                        "members": [row.interpro],
                        "paths": [list(row.path)],
                    }
                )
        clusters.sort(key=lambda c: (c["start"], c["end"]))
        out = []
        tid = pdf["translation_id"].iloc[0] if len(pdf) else None
        for i, c in enumerate(clusters):
            out.append(
                (
                    tid, i, c["start"], c["end"],
                    _lca(c["paths"]), c["root"], sorted(set(c["members"])),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "translation_id", "cluster_idx", "start", "end",
                "lca", "root", "members",
            ],
        )

    return enriched.groupBy("translation_id").applyInPandas(kernel, _CLUSTER_SCHEMA)


def architecture_strings(clusters: DataFrame) -> DataFrame:
    """The ordered root string per translation — the reference's final
    ``roots.join(' ')`` (``search/domain_architect.js:201-203``)."""
    return (
        clusters.groupBy("translation_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("cluster_idx", "root")
                        )
                    ),
                    lambda s: s["root"],
                ),
                " ",
            ).alias("architecture")
        )
    )
