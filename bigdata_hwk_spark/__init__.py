"""bigdata_hwk_spark — a PySpark-native analytics engine.

A brand-new DataFrame/SQL/Structured-Streaming engine with the query and
data-processing capabilities of the reference repo ``jiecksanguin/BigData_HWK``
(distance-based outlier detection, k-center clustering via Farthest-First
Traversal, streaming frequent items), plus the relational operator surface
and large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Design principles (see SURVEY.md §7):
- DataFrame-first: declare logical plans, let Catalyst/Tungsten optimize.
- Theta-joins re-expressed as equi-joins (grid bucketing + offset explode)
  so Spark plans hash joins instead of nested loops.
- Pandas UDFs / mapInPandas only where built-ins can't express semantics
  (per-partition FFT kernels, stateful sampling).
- Every operator designed for multi-executor scale: partial aggregation,
  broadcast of small sides, no driver-side collects in hot paths.
"""

__version__ = "0.1.0"
