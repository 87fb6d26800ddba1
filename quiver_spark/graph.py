"""Graph core: a labeled directed multi-graph as two DataFrames.

Mirrors the public Verizon/quiver ``Graph[N,A,B]`` surface
[pub: core/src/main/scala/quiver/Graph.scala, package.scala] with a
Spark-first data model (SURVEY.md §1.2):

- ``vertices``: DataFrame with an ``id: long`` column; every other
  column is a vertex label (quiver's ``A``), kept first-class.
- ``edges``: DataFrame with ``src: long, dst: long``; every other
  column is an edge label (quiver's ``B``).
- Multigraph semantics: quiver stores ``Set[B]`` per (src,dst) — a
  parallel edge exists iff its label differs. Here the canonical edge
  identity is ``(src, dst, *label_cols)`` and every constructor /
  mutator dedups on it [pub: package.scala#GrContext].

All operators are pure DataFrame transformations (Catalyst handles
pushdown/pruning/join selection); nothing collects to the driver
except explicit point lookups (``label(v)``, ``contains(v)``) and
counts. Graphs are immutable values, like quiver's persistent maps:
every mutator returns a new Graph sharing lineage.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ids_df(spark: SparkSession, ids: Iterable[int] | DataFrame, col: str = "id") -> DataFrame:
    """Normalize a python iterable or a DataFrame to a 1-column id frame."""
    if isinstance(ids, DataFrame):
        c = ids.columns[0] if col not in ids.columns else col
        return ids.select(F.col(c).cast("long").alias(col)).dropDuplicates()
    return spark.createDataFrame(
        [(int(i),) for i in ids], T.StructType([T.StructField(col, T.LongType(), False)])
    )


class Graph:
    """Immutable (vertices, edges) pair with quiver's operator surface.

    Construction goes through :meth:`mk_graph` / :meth:`safe_mk_graph`
    (which enforce the dedup + referential invariants) or
    :meth:`from_edges` (derives the vertex set). The raw constructor
    trusts its inputs — internal use only.
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        if "id" not in vertices.columns:
            raise ValueError("vertices must have an 'id' column")
        if "src" not in edges.columns or "dst" not in edges.columns:
            raise ValueError("edges must have 'src' and 'dst' columns")
        self.vertices = vertices
        self.edges = edges

    # ------------------------------------------------------------------
    # schema helpers
    # ------------------------------------------------------------------
    @property
    def spark(self) -> SparkSession:
        return self.vertices.sparkSession

    @property
    def vlabel_cols(self) -> list[str]:
        return [c for c in self.vertices.columns if c != "id"]

    @property
    def elabel_cols(self) -> list[str]:
        """Edge label columns — quiver's ``B`` [pub: package.scala#LEdge]."""
        return [c for c in self.edges.columns if c not in ("src", "dst")]

    @property
    def edge_id_cols(self) -> list[str]:
        """Canonical multigraph edge identity: (src, dst, all labels)."""
        return ["src", "dst", *self.elabel_cols]

    def _dedup_edges(self, edges: DataFrame) -> DataFrame:
        return edges.dropDuplicates(["src", "dst", *[c for c in edges.columns if c not in ("src", "dst")]])

    # ------------------------------------------------------------------
    # §2.1 construction  [pub: Graph.scala#mkGraph/#addNode/#addEdge]
    # ------------------------------------------------------------------
    @classmethod
    def empty(cls, spark: SparkSession, vschema: str = "id long", eschema: str = "src long, dst long") -> Graph:
        """quiver ``empty`` [pub: package.scala#empty]."""
        return cls(
            spark.createDataFrame([], vschema),
            spark.createDataFrame([], eschema),
        )

    @classmethod
    def mk_graph(cls, vertices: DataFrame, edges: DataFrame, validate: bool = True) -> Graph:
        """quiver ``mkGraph`` [pub: package.scala#mkGraph]: dedup both
        sides; edges referencing absent vertices are an error.

        Validation is one count over a double left-anti join — at 100 TB
        you would run it as an audit query, so it is switchable.
        """
        v = vertices.dropDuplicates(["id"])
        g = cls(v, edges)
        e = g._dedup_edges(edges)
        if validate:
            vids = v.select("id")
            dangling = (
                e.join(vids.withColumnRenamed("id", "src"), "src", "left_anti")
                .unionByName(e.join(vids.withColumnRenamed("id", "dst"), "dst", "left_anti"))
                .limit(1)
                .count()
            )
            if dangling:
                raise ValueError("mk_graph: edges reference vertices not in the vertex set")
        return cls(v, e)

    @classmethod
    def safe_mk_graph(cls, vertices: DataFrame, edges: DataFrame, ids_unique: bool = False) -> Graph:
        """quiver ``safeMkGraph`` [pub: package.scala#safeMkGraph]:
        silently drop dangling edges (double left-semi join).

        ids_unique=True: the caller warrants vertex ids are already
        distinct, skipping the dedup shuffle. With a persisted vertex
        frame this makes BOTH semi-joins (and any later vertex read)
        cache hits instead of re-running the vertex pipeline — ingest
        at 1M files recomputed it 3x before this seam."""
        v = vertices if ids_unique else vertices.dropDuplicates(["id"])
        g = cls(v, edges)
        e = g._dedup_edges(edges)
        vids = v.select("id")
        e = e.join(vids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            vids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        # key-joins put the join key first — restore the declared order
        return cls(v, e.select(*edges.columns))

    @classmethod
    def from_edges(cls, edges: DataFrame) -> Graph:
        """Derive the vertex set as src ∪ dst (unlabeled vertices)."""
        e = cls(edges.sparkSession.createDataFrame([], "id long"), edges)._dedup_edges(edges)
        v = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .dropDuplicates()
        )
        return cls(v, e)

    def add_nodes(self, nodes: DataFrame) -> Graph:
        """quiver ``addNode(s)`` [pub: Graph.scala#addNode]: upsert —
        re-adding an existing vertex replaces its label."""
        kept = self.vertices.join(nodes.select("id"), "id", "left_anti")
        return Graph(kept.unionByName(nodes.dropDuplicates(["id"])), self.edges)

    def add_edges(self, edges: DataFrame, safe: bool = False) -> Graph:
        """quiver ``addEdge(s)`` / ``safeAddEdge(s)``
        [pub: Graph.scala#addEdge/#safeAddEdge]. ``safe`` drops edges
        whose endpoints are missing instead of raising."""
        vids = self.vertices.select("id")
        if safe:
            cols = edges.columns
            edges = (
                edges.join(vids.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(vids.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select(*cols)
            )
        else:
            dangling = (
                edges.join(vids.withColumnRenamed("id", "src"), "src", "left_anti")
                .unionByName(edges.join(vids.withColumnRenamed("id", "dst"), "dst", "left_anti"))
                .limit(1)
                .count()
            )
            if dangling:
                raise ValueError("add_edges: endpoint vertex missing (use safe=True to drop)")
        return Graph(self.vertices, self._dedup_edges(self.edges.unionByName(edges)))

    def embed(self, node: DataFrame, in_edges: DataFrame, out_edges: DataFrame) -> Graph:
        """quiver ``ctx & g`` [pub: Graph.scala#&]: insert a vertex with
        its incident edges in one step."""
        return self.add_nodes(node).add_edges(in_edges.unionByName(out_edges), safe=False)

    # ------------------------------------------------------------------
    # §2.2 inspection  [pub: Graph.scala#isEmpty/#countNodes/...]
    # ------------------------------------------------------------------
    def is_empty(self) -> bool:
        return self.vertices.isEmpty()

    def count_nodes(self) -> int:
        return self.vertices.count()

    def count_edges(self) -> int:
        return self.edges.count()

    def nodes(self) -> DataFrame:
        return self.vertices.select("id")

    def lab_nodes(self) -> DataFrame:
        return self.vertices

    def edge_pairs(self) -> DataFrame:
        """quiver ``edges`` (unlabeled) [pub: Graph.scala#edges]."""
        return self.edges.select("src", "dst").dropDuplicates()

    def lab_edges(self) -> DataFrame:
        return self.edges

    def contains(self, v: int) -> bool:
        return not self.vertices.filter(F.col("id") == v).isEmpty()

    def label(self, v: int) -> dict | None:
        rows = self.vertices.filter(F.col("id") == v).collect()
        if not rows:
            return None
        d = rows[0].asDict()
        d.pop("id")
        return d

    def find_edges(self, src: int, dst: int) -> DataFrame:
        """quiver ``findEdge`` [pub: Graph.scala#findEdge] — all parallel
        labeled edges between src and dst."""
        return self.edges.filter((F.col("src") == src) & (F.col("dst") == dst))

    # ------------------------------------------------------------------
    # context / decomposition  [pub: Graph.scala#context/#decomp]
    # ------------------------------------------------------------------
    def contexts(self) -> DataFrame:
        """Batch context view — one row per vertex with its full
        in/out adjacency as arrays of structs. This is the engine's
        substrate for gmap/extend (quiver ``contexts``
        [pub: Graph.scala#contexts], ``Context``
        [pub: package.scala#Context]).

        Plan shape: two shuffles (groupBy src, groupBy dst) + two
        joins; at scale both aggregations are partial-combine friendly
        and the join keys are the vertex id, so co-partitioning holds.
        """
        lbl = self.elabel_cols
        out_adj = self.edges.groupBy("src").agg(
            F.collect_list(F.struct(F.col("dst").alias("nbr"), *[F.col(c) for c in lbl])).alias("out_adj")
        )
        in_adj = self.edges.groupBy("dst").agg(
            F.collect_list(F.struct(F.col("src").alias("nbr"), *[F.col(c) for c in lbl])).alias("in_adj")
        )
        empty = F.array().cast(out_adj.schema["out_adj"].dataType)
        return (
            self.vertices.join(out_adj, self.vertices["id"] == out_adj["src"], "left")
            .drop("src")
            .join(in_adj, self.vertices["id"] == in_adj["dst"], "left")
            .drop("dst")
            .withColumn("out_adj", F.coalesce(F.col("out_adj"), empty))
            .withColumn("in_adj", F.coalesce(F.col("in_adj"), empty))
        )

    def context(self, v: int) -> DataFrame:
        """Context of one vertex (raises if absent), as a 1-row frame."""
        ctx = self.contexts().filter(F.col("id") == v)
        if ctx.isEmpty():
            raise KeyError(f"vertex {v} not in graph")
        return ctx

    def decomp(self, v: int) -> tuple[DataFrame, Graph]:
        """quiver ``decomp`` [pub: Graph.scala#decomp]: (context, rest).
        ``rest`` removes v and all incident edges."""
        return self.context(v), self.remove_nodes([v])

    def decomp_any(self) -> tuple[DataFrame, Graph]:
        """quiver ``decompAny`` [pub: Graph.scala#decompAny]."""
        first = self.vertices.select("id").limit(1).collect()
        if not first:
            raise ValueError("decomp_any on empty graph")
        return self.decomp(first[0]["id"])

    def bidecomp(self, a: int, b: int) -> tuple[DataFrame, DataFrame, Graph]:
        """quiver ``bidecomp`` [pub: Graph.scala#bidecomp]."""
        return self.context(a), self.context(b), self.remove_nodes([a, b])

    def select_contexts(self, pred: Column) -> DataFrame:
        """quiver ``select`` [pub: Graph.scala#select]: contexts matching
        a predicate Column over the context-view schema."""
        return self.contexts().filter(pred)

    # ------------------------------------------------------------------
    # §2.3 adjacency / degrees
    # ------------------------------------------------------------------
    def successors(self, v: int) -> DataFrame:
        return self.edges.filter(F.col("src") == v).select(F.col("dst").alias("id")).dropDuplicates()

    def predecessors(self, v: int) -> DataFrame:
        return self.edges.filter(F.col("dst") == v).select(F.col("src").alias("id")).dropDuplicates()

    def neighbors(self, v: int) -> DataFrame:
        return self.successors(v).unionByName(self.predecessors(v)).dropDuplicates()

    def out_edges(self, v: int) -> DataFrame:
        return self.edges.filter(F.col("src") == v)

    def in_edges(self, v: int) -> DataFrame:
        return self.edges.filter(F.col("dst") == v)

    def out_degrees(self) -> DataFrame:
        """(id, out_degree) for every vertex; parallel labeled edges
        count individually, vertices with none get 0
        [pub: Graph.scala#outDegree]."""
        d = self.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
        return self.vertices.select("id").join(d, "id", "left").fillna(0, ["out_degree"])

    def in_degrees(self) -> DataFrame:
        d = self.edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
        return self.vertices.select("id").join(d, "id", "left").fillna(0, ["in_degree"])

    def degrees(self) -> DataFrame:
        return (
            self.out_degrees()
            .join(self.in_degrees(), "id")
            .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
        )

    def roots(self) -> DataFrame:
        """Vertices with no incoming edges [pub: Graph.scala#roots]."""
        return self.vertices.join(
            self.edges.select(F.col("dst").alias("id")), "id", "left_anti"
        )

    def leaves(self) -> DataFrame:
        return self.vertices.join(
            self.edges.select(F.col("src").alias("id")), "id", "left_anti"
        )

    # ------------------------------------------------------------------
    # §2.4 maps / filters
    # ------------------------------------------------------------------
    def nmap(self, **cols: Column) -> Graph:
        """quiver ``nmap`` [pub: Graph.scala#nmap]: map vertex labels
        with native Column expressions (JVM-side, codegen-friendly)."""
        return Graph(self.vertices.withColumns(cols), self.edges)

    def emap(self, **cols: Column) -> Graph:
        """quiver ``emap`` [pub: Graph.scala#emap]. Dedup re-applied:
        a label map can merge previously-distinct parallel edges
        (Set[B] semantics)."""
        return Graph(self.vertices, self._dedup_edges(self.edges.withColumns(cols)))

    def vmap(self, f: Column) -> Graph:
        """quiver ``vmap`` [pub: Graph.scala#vmap]: relabel vertex ids by
        an injective Column expression over the vertex row; edges are
        remapped through a join (no assumption the map is computable
        from the id alone on the edge side)."""
        mapping = self.vertices.select(F.col("id").alias("_old"), f.alias("_new"))
        v = self.vertices.join(mapping, self.vertices["id"] == mapping["_old"]).drop("id", "_old").withColumnRenamed("_new", "id")
        e = (
            self.edges.join(mapping.withColumnRenamed("_old", "src").withColumnRenamed("_new", "_nsrc"), "src")
            .drop("src")
            .withColumnRenamed("_nsrc", "src")
            .join(mapping.withColumnRenamed("_old", "dst").withColumnRenamed("_new", "_ndst"), "dst")
            .drop("dst")
            .withColumnRenamed("_ndst", "dst")
        )
        return Graph(v.select("id", *self.vlabel_cols), self._dedup_edges(e.select("src", "dst", *self.elabel_cols)))

    def gmap(self, kernel, schema) -> DataFrame:
        """quiver ``gmap`` [pub: Graph.scala#gmap]: apply a vectorized
        pandas kernel to every context (grouped by a hash bucket so
        batches are bounded); returns the kernel's output frame.

        The kernel receives a pandas DataFrame with the context-view
        schema (id, vertex labels, in_adj, out_adj) and returns rows of
        ``schema``. Label-only rewrites; structural edits go through
        gfiltermap/filters.
        """
        ctx = self.contexts().withColumn("_bucket", F.pmod(F.xxhash64("id"), F.lit(256)))
        return ctx.groupBy("_bucket").applyInPandas(
            lambda pdf: kernel(pdf.drop(columns=["_bucket"])), schema
        )

    def gfiltermap(self, kernel, vschema) -> Graph:
        """quiver ``gfiltermap`` [pub: Graph.scala#gfiltermap]: the
        kernel sees every context and returns zero-or-one vertex rows
        (``vschema`` must contain ``id``) — a filter+rewrite in one
        pass. Dropped vertices cascade their incident edges
        (labfilter semantics); surviving edges keep their labels.
        """
        new_v = self.gmap(kernel, vschema)
        vids = new_v.select("id")
        e = self.edges.join(vids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            vids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        return Graph(new_v, e.select(*self.edges.columns))

    def fold_contexts(self, agg_exprs: Sequence[Column]) -> DataFrame:
        """quiver ``fold``/``ufold`` [pub: Graph.scala#fold], restricted
        to commutative-monoid folds (SURVEY.md §7 hard part (c)):
        sequential decomposition order is not reproducible on a
        distributed engine, so the API takes Spark aggregate
        expressions over the context view instead of an arbitrary
        binary function."""
        return self.contexts().agg(*agg_exprs)

    def labfilter(self, pred: Column) -> Graph:
        """quiver ``labfilter`` [pub: Graph.scala#labfilter]: keep
        vertices whose label passes; incident edges of dropped
        vertices are removed (double semi-join cascade)."""
        v = self.vertices.filter(pred)
        vids = v.select("id")
        e = self.edges.join(vids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            vids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        return Graph(v, e.select(*self.edges.columns))

    def nfilter(self, pred: Column) -> Graph:
        """quiver ``nfilter`` [pub: Graph.scala#nfilter] — same cascade,
        predicate over the id."""
        return self.labfilter(pred)

    def efilter(self, pred: Column) -> Graph:
        """quiver ``efilter``/``elfilter`` [pub: Graph.scala#efilter]:
        keep passing edges; vertices untouched."""
        return Graph(self.vertices, self.edges.filter(pred))

    def subgraph(self, ids: Iterable[int] | DataFrame) -> Graph:
        """quiver ``subgraph`` [pub: Graph.scala#subgraph]: induced
        subgraph. The id set is broadcast when small (Spark decides via
        AQE; we hint when it's a literal list)."""
        idf = _ids_df(self.spark, ids)
        hint = F.broadcast(idf) if not isinstance(ids, DataFrame) else idf
        v = self.vertices.join(hint, "id", "left_semi")
        e = self.edges.join(hint.withColumnRenamed("id", "src"), "src", "left_semi").join(
            hint.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        return Graph(v, e.select(*self.edges.columns))

    # ------------------------------------------------------------------
    # §2.5 mutation / deletes  [pub: Graph.scala#removeNode/#removeEdge]
    # ------------------------------------------------------------------
    def remove_nodes(self, ids: Iterable[int] | DataFrame) -> Graph:
        idf = _ids_df(self.spark, ids)
        v = self.vertices.join(idf, "id", "left_anti")
        e = self.edges.join(idf.withColumnRenamed("id", "src"), "src", "left_anti").join(
            idf.withColumnRenamed("id", "dst"), "dst", "left_anti"
        )
        return Graph(v, e.select(*self.edges.columns))

    def remove_edges(self, pairs: DataFrame) -> Graph:
        """Drop ALL parallel edges for each (src,dst) pair
        [pub: Graph.scala#removeEdge]."""
        return Graph(self.vertices, self.edges.join(pairs.select("src", "dst"), ["src", "dst"], "left_anti"))

    def remove_ledges(self, ledges: DataFrame) -> Graph:
        """Drop only the exact labeled instances
        [pub: Graph.scala#removeLEdge]."""
        return Graph(self.vertices, self.edges.join(ledges, self.edge_id_cols, "left_anti"))

    def update_nodes(self, nodes: DataFrame) -> Graph:
        """quiver ``updateNode`` [pub: Graph.scala#updateNode] — label
        upsert; alias of add_nodes (same anti-join + union; at real
        scale this is a MERGE INTO)."""
        return self.add_nodes(nodes)

    # ------------------------------------------------------------------
    # §2.6 global structural transforms
    # ------------------------------------------------------------------
    def reverse(self) -> Graph:
        """FGL ``grev`` [pub: Graph.scala#reverse]: flip every edge.
        Pure projection — no shuffle."""
        e = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), *[F.col(c) for c in self.elabel_cols]
        )
        return Graph(self.vertices, e)

    def undir(self) -> Graph:
        """quiver ``undir`` [pub: Graph.scala#undir]: add the reverse of
        each edge (same label), Set-deduped."""
        return Graph(self.vertices, self._dedup_edges(self.edges.unionByName(self.reverse().edges)))

    def union(self, other: Graph) -> Graph:
        """Graph union [pub: Graph.scala#union + monoid instance in
        package.scala]. Vertex labels are right-biased on id conflict
        (``other`` wins); edges Set-merge on full identity."""
        v = (
            other.vertices.withColumn("_pri", F.lit(0))
            .unionByName(self.vertices.withColumn("_pri", F.lit(1)))
            .withColumn("_rn", F.row_number().over(Window.partitionBy("id").orderBy("_pri")))
            .filter(F.col("_rn") == 1)
            .drop("_pri", "_rn")
        )
        e = self._dedup_edges(self.edges.unionByName(other.edges))
        return Graph(v, e)

    # ------------------------------------------------------------------
    # plumbing
    # ------------------------------------------------------------------
    def persist(self) -> Graph:
        self.vertices.persist()
        self.edges.persist()
        return self

    def unpersist(self) -> Graph:
        self.vertices.unpersist()
        self.edges.unpersist()
        return self

    def local_checkpoint(self) -> Graph:
        """Truncate lineage (iterative callers; SURVEY.md §4.3)."""
        return Graph(self.vertices.localCheckpoint(), self.edges.localCheckpoint())

    def __repr__(self) -> str:  # pragma: no cover
        return f"Graph(vlabels={self.vlabel_cols}, elabels={self.elabel_cols})"
