package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster election: connected components over a near-dup
  * pair graph, labeling every document with the minimum doc id of its
  * component (the kept representative). The missing last step of every
  * dedup pipeline — pairs alone over-delete when A~B and B~C but A≁C.
  *
  * Implementation is iterative min-label propagation as dataflow: each
  * round joins labels to the symmetric edge list, takes the min
  * neighbor label, and stops when no label changes. Rounds needed =
  * graph diameter (near-dup clusters are dense → few rounds). Each
  * round is one shuffle on node id; for trillion-edge graphs swap in
  * the alternating big-star/small-star variant — same join shapes.
  */
object DupClusters {

  /** Label every node with its component's min node id.
    * @param edges (s, t) pair frame, undirected (one direction enough)
    * @param nodes (id) frame: all nodes incl. singletons
    */
  def components(edges: DataFrame, nodes: DataFrame,
                 maxIter: Int = 20): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    val sym = edges.select(col("s"), col("t"))
      .union(edges.select(col("t").as("s"), col("s").as("t")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint, not persist: each round's plan embeds the prior
    // round's twice (next + convergence check), so without lineage
    // truncation the logical plan grows 2^rounds and the analyzer OOMs
    // on deep chains. (Production: reliable checkpoint dir instead.)
    // Superseded rounds' checkpoint blocks are freed explicitly —
    // tracked via the getPersistentRDDs delta around each checkpoint
    // (the Dataset API exposes no handle to the backing RDD) — so a
    // long CC run holds at most two rounds of labels, not all of them.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val cp = df.localCheckpoint(true)
      (cp, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    var (labels, labelIds) =
      checkpointTracked(nodes.select(col("id"), col("id").as("label")))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neigh = sym.join(labels, sym("s") === labels("id"))
        .groupBy(col("t").as("nid")).agg(min(col("label")).as("nlabel"))
      val (next, nextIds) = checkpointTracked(
        labels.join(neigh, labels("id") === neigh("nid"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label")))
      changed = next.as("n")
        .join(labels.withColumnRenamed("label", "old").as("o"), "id")
        .filter(col("label") =!= col("old")).count()
      free(labelIds) // convergence count above was the last reader
      labels = next
      labelIds = nextIds
      i += 1
    }
    sym.unpersist()
    labels // final round stays checkpointed: it is the returned frame
  }

  /** Cluster summary: representative (min id) and member count, for
    * clusters with at least `minSize` members.
    */
  def clusters(edges: DataFrame, nodes: DataFrame,
               minSize: Int = 2): DataFrame =
    components(edges, nodes)
      .groupBy(col("label").as("rep"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= minSize)
}
