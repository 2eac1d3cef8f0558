"""Operator library — one module per family from SURVEY.md §2.

relational   joins (J1-J12), aggregations (A1-A8), windows (W1-W5),
             set ops (U1-U5), binning (K10), interval merge (K6),
             sessionization (A3)
closure      K7 iterative transitive closure + A6 ancestor rollup
trees        grouped-map tree kernels (K3/K4/K8/K9) — applyInPandas
dedup        exact / minhash-LSH / simhash / n-gram-jaccard dedup
similarity   brute-force + IVF cosine top-k over embedding columns
textops      language-ID, quality scoring, token stats, fingerprinting
multimodal   binary-column decode/feature plumbing (stubs, real schemas)
"""
