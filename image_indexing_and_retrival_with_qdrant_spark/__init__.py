"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``pranshuchaurasia/image-indexing-and-retrival-with-qdrant``
(vector indexing + retrieval pipeline), re-expressed Spark-first.

The reference delegates all query semantics (cosine KNN, MaxSim
multivector KNN, top-k, payload projection) to a Qdrant server; this
engine implements the same semantics natively as Catalyst-friendly
DataFrame plans, plus the generalized large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) that the 100 TB north star requires.

Layout:
- ``functions/``  column-level building blocks (vector math, text, paths)
- ``operators/``  DataFrame-in/DataFrame-out query operators (KNN, MaxSim,
                  dedup, ANN, text analysis, relational)
- ``sources/``    scans + ingestion (binaryFile, JSON docs, embedder seam)
- ``streaming/``  Structured Streaming variants (incremental indexing,
                  windowed aggregation, sessionization)
- ``plans/``      plan-inspection helpers used by tests/bench
"""

__version__ = "0.1.0"
