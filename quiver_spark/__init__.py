"""quiver_spark — a PySpark-native link-graph analytics engine.

Re-expresses the inductive multi-graph model of the public
Verizon/quiver Scala library (Erwig's FGL: labeled directed
multi-graphs, context decomposition, gmap/fold, DFS/BFS traversals,
reachability) as distributed edge-table algorithms on Spark
DataFrames: PageRank, connected components, label propagation, and
triangle counting over a vertex/edge DataFrame pair.

This is a from-scratch Spark-first design, NOT a port: quiver is a
single-threaded persistent-map library; here a graph is two
DataFrames, every operator is a Catalyst plan, and the iteration
primitive is a checkpointed superstep loop (see SURVEY.md for the
full mapping and [pub: Verizon/quiver core/src/main/scala/quiver/*]
for the reference semantics each operator mirrors).
"""

from quiver_spark.graph import Graph

__all__ = ["Graph"]
__version__ = "0.1.0"
