"""triangle_counting_spark — a PySpark-native link-graph analytics engine.

A from-scratch Spark-first re-expression of the capabilities of
Bader-Research/triangle-counting (reference at /root/reference, cited by
file:line in docstrings):

- exact triangle counting via degree-ordered edge orientation + sorted
  adjacency intersection joins (reference: tc.c tc_forward_hash_degreeOrder,
  tc.c:944-958; kernels graph.c:276-459),
- PageRank, connected components (hash-min), label propagation over the same
  iterative gather-scatter substrate the reference's BFS loops embody
  (bfs.c:7-31, tc.c:1174-1178),
- graph statistics / heavy-light skew profiling mirroring the analysis
  notebook (triangle_counting_analysis.ipynb cells 8-27),
- co-occurrence edge derivation from a source-code files table
  (repo, path, commit, lang, content) with a sha256 per-row audit,
- large-scale training-data pipeline functions: dedup (exact / n-gram
  Jaccard / MinHash-LSH / SimHash), embedding similarity search, text
  quality analysis, multimodal column plumbing.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join planning and AQE; Python appears only as vectorized pandas/Arrow UDFs
(`applyInPandas` / `mapInPandas`) — never per-row Python.
"""

__version__ = "0.2.0"


def __getattr__(name):
    # lazy so `import triangle_counting_spark` stays cheap; the facade is
    # the documented one-import entry point (README Quick start)
    if name == "Graph":
        from .graph import Graph

        return Graph
    raise AttributeError(name)
