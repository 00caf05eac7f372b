"""graphiti_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
getzep/graphiti (reference at /root/reference, studied for semantics only).

The reference is an async, per-episode, LLM-in-the-loop, graph-DB-backed
Python library. This package keeps its *semantics* — episode ingestion,
entity mention + (subj, pred, obj) triple extraction, MinHash/LSH entity
resolution, connected-components canonicalization, bi-temporal edge
invalidation, hybrid retrieval — and re-expresses the *execution* as a
declarative Spark DataFrame DAG: native columnar expressions wherever
possible, Arrow-vectorized pandas UDFs where Python is unavoidable
(hashing, embeddings), and iterative DataFrame jobs for fixpoint
algorithms (connected components, label propagation, BFS).

Layout:
  config.py     frozen constants (ported values from the reference) + run config
  session.py    SparkSession factory (UTC, Arrow, AQE)
  ids.py        deterministic sha256 identities (replaces uuid4)
  schemas.py    StructTypes for pages/episodes/nodes/edges/mentions
  textnorm.py   text cleaning + html→text extraction (byte-identical invariant)
  sources/      input table derivations (Common-Crawl-style `pages`)
  functions/    scalar/vector kernels (dedup text kernels, hash embeddings)
  operators/    the engine: extract, resolve, cc, edges, edge_dedup,
                temporal, communities, maintenance + training-data ops
                (dedup_docs, textstats, multimodal)
  search/       retrieval: BM25 postings, cosine/ANN, RRF/MMR fusion, BFS,
                rerankers, filters, hybrid driver + recipes
  materialize.py partitioned graph sinks (Iceberg MERGE shape)
  lineage.py    per-partition lineage + metrics rows, checkpoint resume
  pipeline.py   the end-to-end batch DAG (pages → canonical nodes/edges)
"""

__version__ = "0.1.0"
