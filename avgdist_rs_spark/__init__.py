"""avgdist_rs_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the Rust reference ``massimo-nocentini/avgdist-rs``
(sampling estimator of average pairwise distance via multi-source BFS, harmonic /
closeness centrality, sink counting) as idiomatic Spark DataFrame programs, and adds
the north-rule algorithm suite (PageRank, connected components, label propagation,
triangle counting) plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design notes (scale-first):
- The graph lives as a hash-partitioned edge DataFrame ``edges(src long, dst long)``
  with a co-partitioned transpose; all iterative algorithms are superstep loops of
  DataFrame joins so Catalyst/Tungsten/AQE pick physical strategies.
- A broadcast-CSR numpy fast path (`operators.bfs.bfs_csr`) covers graphs whose
  adjacency fits in executor memory (reference-scale: 2.16e9 edges ≈ 17 GB as CSR);
  the DataFrame superstep loop covers graphs beyond that.
- No per-row Python anywhere: vectorized pandas/Arrow UDFs only.
"""

__version__ = "0.1.0"
