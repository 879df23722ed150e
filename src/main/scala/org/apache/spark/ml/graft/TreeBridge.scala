package org.apache.spark.ml.graft

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** Accessor for Spark-private tree internals (`Node.impurityStats` is
  * `private[ml]`), mirroring the sql-side `Bridge` shim: the one-file
  * re-export the TreeSHAP explainer needs to read per-node training
  * covers from a fitted tree ensemble.
  */
object TreeBridge {

  /** Flattened tree arrays: (left, right, feature, threshold, value,
    * cover); `feature(i) == -1` marks a leaf. Cover is the training
    * instance count that reached the node (the conditioning weight
    * TreeSHAP marginalises with).
    */
  def flatten(root: Node): (Array[Int], Array[Int], Array[Int],
      Array[Double], Array[Double], Array[Double]) = {
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    val threshold = scala.collection.mutable.ArrayBuffer.empty[Double]
    val value = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cover = scala.collection.mutable.ArrayBuffer.empty[Double]

    def visit(n: Node): Int = {
      val id = left.length
      left += -1; right += -1; feature += -1; threshold += 0.0
      value += n.prediction
      val stats = n.impurityStats
      require(stats != null,
        "tree node carries no impurity stats (model loaded without them?) — " +
          "TreeSHAP needs per-node training covers")
      cover += stats.count
      n match {
        case i: InternalNode =>
          i.split match {
            case cs: ContinuousSplit =>
              feature(id) = cs.featureIndex
              threshold(id) = cs.threshold
            case s =>
              throw new UnsupportedOperationException(
                s"TreeSHAP supports continuous splits only, got ${s.getClass}")
          }
          left(id) = visit(i.leftChild)
          right(id) = visit(i.rightChild)
        case _: LeafNode => ()
      }
      id
    }
    visit(root)
    (left.toArray, right.toArray, feature.toArray, threshold.toArray,
      value.toArray, cover.toArray)
  }
}
