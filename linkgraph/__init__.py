"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Capability surface (BASELINE.json north_rule): derive an edge table from
multi-turn conversation/agent transcripts (vertices = actors/tools; edges =
consecutive-turn + tool-invocation links under stable turn ordering), build
hash-partitioned CSR adjacency blocks as packed Arrow arrays, and run
Pregel-style iterative PageRank / connected components (hash-min) / community
label propagation / triangle counting as vectorized pandas/Arrow UDF
gather-scatter passes, with explicit hub-skew salting, per-superstep
checkpoints (lineage + metrics) and mid-iteration resume.

Design stance (SURVEY.md §7): DataFrame + Catalyst for all relational
structure; numpy-over-Arrow inside cogrouped UDFs only for the per-edge hot
loop; zero RDD API, zero per-row Python UDFs, zero JVM extensions.
"""

__version__ = "0.1.0"

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
