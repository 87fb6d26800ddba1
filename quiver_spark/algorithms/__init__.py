from quiver_spark.algorithms.components import connected_components
from quiver_spark.algorithms.hits import hits
from quiver_spark.algorithms.kcore import kcore
from quiver_spark.algorithms.labelprop import label_propagation
from quiver_spark.algorithms.pagerank import pagerank
from quiver_spark.algorithms.scc import strongly_connected_components
from quiver_spark.algorithms.triangles import (
    local_clustering_coefficient,
    triangle_count,
    triangles_per_vertex,
)

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangles_per_vertex",
    "local_clustering_coefficient",
    "hits",
    "strongly_connected_components",
    "kcore",
]
