package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph utilities shared by the loaders and the clusterer. */
object Graph {

  /** Undirected connected components. `nodes` has one column `node`;
    * `edges` has `src`/`dst` (one row per undirected edge, either
    * orientation). Returns `(node, comp)` where `comp` is the minimum
    * node id of the component.
    *
    * Min-label propagation with POINTER JUMPING: each round a node
    * takes the least of its own label, its neighbors' labels, and its
    * label's label (path doubling). Plain propagation needs O(diameter)
    * rounds — a chain-shaped graph would exhaust any fixed cap and
    * silently split components; the hop makes convergence O(log
    * diameter), so the cap is a true backstop, and hitting it throws
    * rather than returning split components.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 60): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = nodes.select(col("node")).withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = bidir
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("comp").as("nComp"))
      // comp values are always node ids, so `comp`'s own label exists
      val hop = labels
        .join(labels.select(col("node").as("comp"), col("comp").as("hComp")), Seq("comp"))
        .select(col("node"), col("hComp"))
      val updated = labels
        .join(neighborMin, Seq("node"), "left")
        .join(hop, Seq("node"), "left")
        .select(col("node"), col("comp").as("oldComp"),
          least(col("comp"), col("nComp"), col("hComp")).as("comp"))
        .localCheckpoint(true)
      changed = updated.filter(col("comp") =!= col("oldComp")).count()
      labels = updated.select("node", "comp")
      iter += 1
    }
    bidir.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds")
    labels
  }
}
