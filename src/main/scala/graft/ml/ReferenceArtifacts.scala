package graft.ml

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, when}

/** Loaders for the reference's COMMITTED trained-model artifacts — the
  * parquet centers + plain-text thresholds the original pipeline serves from
  * (reference checkout layout):
  *
  *  - KMeans centers:     clustering/data (parquet: id, point.values)
  *  - Bisecting tree:     clustering_bisect/data (parquet: index,
  *                        center.values, children; negative index =
  *                        internal node, leaves carry the predict indices)
  *  - thresholds:         threshold / threshold_bisect (one decimal scalar,
  *                        KMeansClusterInvoices.scala:44-50 derivation)
  *
  * These tie the rebuild to the reference's actual trained state rather than
  * to re-derived semantics: scoring against these artifacts must reproduce
  * the original anomaly verdicts (realtime/InvoicePipeline.scala:340-354).
  */
object ReferenceArtifacts {

  val DefaultRoot = "/root/reference"

  /** k=5 cluster centers, ordered by the model's cluster id. The parquet
    * footer carries mllib VectorUDT metadata, so the column reads as a UDT —
    * vector_to_array deserializes it to a plain array<double>. */
  def kmeansCenters(spark: SparkSession, root: String = DefaultRoot): Seq[Seq[Double]] =
    spark.read.parquet(s"$root/clustering/data")
      .orderBy("id")
      .select(org.apache.spark.ml.functions.vector_to_array(col("point")))
      .collect()
      .map(_.getSeq[Double](0).toSeq)
      .toSeq

  def kmeansThreshold(root: String = DefaultRoot): Double =
    Anomaly.loadThreshold(s"$root/threshold")

  def bisectingThreshold(root: String = DefaultRoot): Double =
    Anomaly.loadThreshold(s"$root/threshold_bisect")

  /** One node of the bisecting model's cluster tree. */
  final case class TreeNode(index: Int, center: Seq[Double], children: Seq[Int])

  /** The bisecting model's tree, keyed by node index. */
  def bisectingTree(spark: SparkSession, root: String = DefaultRoot): Map[Int, TreeNode] =
    spark.read.parquet(s"$root/clustering_bisect/data")
      .select(col("index"),
        org.apache.spark.ml.functions.vector_to_array(col("center")).as("c"),
        col("children"))
      .collect()
      .map { r =>
        val n = TreeNode(r.getInt(0), r.getSeq[Double](1).toSeq, r.getSeq[Int](2).toSeq)
        n.index -> n
      }
      .toMap

  /** Squared distance to the leaf the bisecting model's predict would pick:
    * a tree DESCENT (root → closer child → …, ties to the earlier child),
    * not a global nearest-leaf — MLlib's ClusteringTreeNode.predict walks
    * the hierarchy, and on skewed trees the descent leaf can differ from the
    * globally closest one. Rendered as a nested when(...) cascade over the
    * committed tree, so the whole score is one codegen'd expression. */
  def bisectingDescentSqdist(tree: Map[Int, TreeNode]): Column = {
    val rootIdx = (tree.keySet -- tree.values.flatMap(_.children)).toSeq match {
      case Seq(r) => r
      case other  => throw new IllegalArgumentException(s"tree has no unique root: $other")
    }
    def go(i: Int): Column = {
      val n = tree(i)
      n.children match {
        case Seq() => Anomaly.sqdistTo(n.center)
        case kids =>
          // descend into the closest child; <= keeps the earlier child on
          // ties, matching minBy's first-minimum
          val dists = kids.map(k => Anomaly.sqdistTo(tree(k).center))
          def pick(remaining: Seq[(Int, Column)]): Column = remaining match {
            case Seq((k, _)) => go(k)
            case (k, d) +: rest =>
              when(rest.map(_._2).foldLeft(lit0true)((acc, o) => acc && d <= o), go(k))
                .otherwise(pick(rest))
          }
          pick(kids.zip(dists))
      }
    }
    go(rootIdx)
  }

  private def lit0true: Column = org.apache.spark.sql.functions.lit(true)
}
