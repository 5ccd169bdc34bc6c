"""PySpark-native analytics engine with the query capabilities of
omarguzmanm/mcp-server-vector-search (reference: /root/reference), rebuilt
Spark-first.

The reference is an MCP server whose single tool runs a top-10 cosine
vector search delegated to a Neo4j HNSW index
(reference: servers/mcp_neo4j_vector_search/server.py:85-91).  This package
re-expresses that query — plus the LLM-data-pipeline operator surface a
100 TB vector engine implies (similarity join, dedup, text analysis,
ANN indexing, streaming ingest, multimodal columns) — as lazy
DataFrame-in / DataFrame-out functions optimized by Catalyst.

Layout
------
- ``functions/``  column-expression libraries (vector math, text, hashing)
- ``operators/``  composed query operators (top-k, similarity join, dedup,
  ANN, relational breadth, event windows)
- ``sources/``    table loaders and multimodal binary-column plumbing
- ``streaming/``  Structured Streaming ingest and windowed aggregation
- ``plans/``      physical-plan introspection helpers (scale assertions)
"""

__version__ = "0.1.0"
