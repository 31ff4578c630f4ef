package graft.quality

/** Pure-Scala isolation forest — the algorithm the reference actually runs
  * (sklearn IsolationForest, `anomaly_detection_agent.py:124-205`), standard
  * construction after Liu/Ting/Zhou 2008: random sub-sampled trees, random
  * feature + random split value per node, anomaly score
  * `2^(-E[path length]/c(ψ))`.
  *
  * Deterministic under a fixed seed. Sized for control-plane-small inputs
  * (the daily-metrics matrix is one row per day — a decade ≈ 3 650 rows), so
  * fit + score run on the driver while the feature extraction stays a
  * distributed aggregation; see [[AnomalyDetection]].
  */
object IsolationForestModel {

  sealed trait Tree
  final case class Leaf(size: Int) extends Tree
  final case class Split(feature: Int, value: Double, lo: Tree, hi: Tree) extends Tree

  final case class Forest(trees: Seq[Tree], subsample: Int)

  private val EulerGamma = 0.5772156649015329

  /** Average unsuccessful-search path length in a BST of `m` external nodes
    * — the standard depth adjustment for unsplit leaves. */
  def c(m: Double): Double =
    if (m <= 1.0) 0.0
    else 2.0 * (math.log(m - 1.0) + EulerGamma) - 2.0 * (m - 1.0) / m

  def fit(data: IndexedSeq[Array[Double]], numTrees: Int = 100,
      subsample: Int = 256, seed: Long = 42L): Forest = {
    require(data.nonEmpty, "isolation forest needs at least one row")
    val rnd = new scala.util.Random(seed)
    val psi = math.min(subsample, data.length)
    // standard height limit: average depth of a ψ-node random tree
    val heightLimit = math.ceil(math.log(math.max(psi, 2).toDouble) / math.log(2.0)).toInt
    val trees = (1 to numTrees).map { _ =>
      // sub-sample WITHOUT replacement (as the paper and sklearn do):
      // partial Fisher–Yates over an index array, first ψ slots
      val idx = Array.tabulate(data.length)(identity)
      var i = 0
      while (i < psi) {
        val j = i + rnd.nextInt(data.length - i)
        val t = idx(i); idx(i) = idx(j); idx(j) = t
        i += 1
      }
      val sample = Array.tabulate(psi)(k => data(idx(k)))
      grow(sample, 0, heightLimit, rnd)
    }
    Forest(trees, psi)
  }

  private def grow(rows: Array[Array[Double]], depth: Int, heightLimit: Int,
      rnd: scala.util.Random): Tree =
    if (depth >= heightLimit || rows.length <= 1) Leaf(rows.length)
    else {
      // only features with spread in this node can isolate anything
      val nFeat = rows(0).length
      val candidates = (0 until nFeat).filter { f =>
        val first = rows(0)(f)
        rows.exists(_(f) != first)
      }
      if (candidates.isEmpty) Leaf(rows.length)
      else {
        val f = candidates(rnd.nextInt(candidates.length))
        var mn = rows(0)(f); var mx = mn
        rows.foreach { r => val v = r(f); if (v < mn) mn = v; if (v > mx) mx = v }
        val split = mn + rnd.nextDouble() * (mx - mn)
        val (lo, hi) = rows.partition(_(f) < split)
        Split(f, split, grow(lo, depth + 1, heightLimit, rnd),
          grow(hi, depth + 1, heightLimit, rnd))
      }
    }

  def pathLength(t: Tree, x: Array[Double]): Double = {
    @annotation.tailrec
    def walk(t: Tree, depth: Int): Double = t match {
      case Leaf(sz) => depth + c(sz.toDouble)
      case Split(f, v, lo, hi) => if (x(f) < v) walk(lo, depth + 1) else walk(hi, depth + 1)
    }
    walk(t, 0)
  }

  /** Anomaly score in (0, 1]: higher = isolated in fewer random splits. */
  def score(forest: Forest, x: Array[Double]): Double = {
    val meanPath = forest.trees.iterator.map(t => pathLength(t, x)).sum / forest.trees.size
    math.pow(2.0, -meanPath / math.max(c(forest.subsample.toDouble), 1e-12))
  }

  /** One row per node of a fitted forest — the replay-oracle dump format.
    * Node ids are preorder within a tree (root = 0); leaves carry
    * `feature = -1`, `lo = hi = -1`. `psi` (the subsample size, constant
    * across rows) rides along so the scoring side needs no second table.
    */
  final case class NodeRow(tree: Int, node: Int, is_leaf: Boolean, feature: Int,
    split: Double, leaf_size: Int, lo: Int, hi: Int, psi: Int)

  /** Flatten a fitted forest to [[NodeRow]]s so another engine can replay
    * [[pathLength]]/[[score]] exactly: walk each day down the dumped split
    * nodes, then apply `2^(-E[depth + c(leaf_size)]/c(psi))`.
    */
  def flatten(forest: Forest): Seq[NodeRow] = {
    val out = Seq.newBuilder[NodeRow]
    forest.trees.zipWithIndex.foreach { case (root, t) =>
      var nextId = 0
      def emit(n: Tree): Int = {
        val id = nextId; nextId += 1
        n match {
          case Leaf(sz) =>
            out += NodeRow(t, id, is_leaf = true, -1, 0.0, sz, -1, -1, forest.subsample)
          case Split(f, v, lo, hi) =>
            val loId = emit(lo)
            val hiId = emit(hi)
            out += NodeRow(t, id, is_leaf = false, f, v, 0, loId, hiId, forest.subsample)
        }
        id
      }
      emit(root)
    }
    out.result()
  }
}
