package graft

import graft.quality.IsolationForestModel
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the pure-Scala isolation forest (the sklearn
  * IsolationForest analog behind x4b). */
class IsolationForestSpec extends AnyFunSuite {

  // tight cluster around (0, 0) + one far outlier
  private val cluster: IndexedSeq[Array[Double]] =
    (0 until 200).map { i =>
      Array(math.sin(i * 2.39996) * 0.5, math.cos(i * 1.17) * 0.5)
    }
  private val outlier = Array(50.0, -40.0)

  test("planted outlier scores strictly above every inlier") {
    val data = cluster :+ outlier
    val forest = IsolationForestModel.fit(data, numTrees = 100, seed = 7L)
    val outlierScore = IsolationForestModel.score(forest, outlier)
    val inlierMax = cluster.map(IsolationForestModel.score(forest, _)).max
    assert(outlierScore > inlierMax,
      s"outlier $outlierScore must beat best inlier $inlierMax")
    // the canonical iForest reading: anomalies ≳ 0.6, dense points ≲ 0.5
    assert(outlierScore > 0.6 && inlierMax < 0.6)
  }

  test("flatten round-trip: re-scoring through the node table equals score()") {
    // the x4b replay oracle walks the FLATTENED trees; a lo/hi swap or an
    // id-numbering bug in flatten would silently re-score every day wrong
    val data = cluster :+ outlier
    val forest = IsolationForestModel.fit(data, numTrees = 50, seed = 42L)
    val nodes = IsolationForestModel.flatten(forest)
    val byTree = nodes.groupBy(_.tree).map { case (t, ns) =>
      t -> ns.map(n => n.node -> n).toMap
    }
    assert(byTree.size === 50)
    assert(nodes.forall(_.psi === forest.subsample))
    def walk(t: Int, x: Array[Double]): Double = {
      var n = byTree(t)(0); var depth = 0
      while (!n.is_leaf) {
        n = byTree(t)(if (x(n.feature) < n.split) n.lo else n.hi)
        depth += 1
      }
      depth + IsolationForestModel.c(n.leaf_size.toDouble)
    }
    data.foreach { x =>
      val mean = (0 until 50).map(walk(_, x)).sum / 50.0
      val replayed = math.pow(2.0,
        -mean / math.max(IsolationForestModel.c(forest.subsample.toDouble), 1e-12))
      assert(replayed === IsolationForestModel.score(forest, x))
    }
  }

  test("scores are deterministic under a fixed seed and fall in (0, 1]") {
    val data = cluster :+ outlier
    val s1 = {
      val f = IsolationForestModel.fit(data, numTrees = 50, seed = 42L)
      data.map(IsolationForestModel.score(f, _))
    }
    val s2 = {
      val f = IsolationForestModel.fit(data, numTrees = 50, seed = 42L)
      data.map(IsolationForestModel.score(f, _))
    }
    assert(s1 == s2)
    assert(s1.forall(s => s > 0.0 && s <= 1.0))
  }

  test("constant features cannot split; degenerate data still scores") {
    val flat = (0 until 50).map(_ => Array(1.0, 2.0)).toIndexedSeq
    val forest = IsolationForestModel.fit(flat, numTrees = 20, seed = 1L)
    val s = IsolationForestModel.score(forest, Array(1.0, 2.0))
    assert(s > 0.0 && s <= 1.0)
  }

  test("c(m) matches the published closed form") {
    assert(IsolationForestModel.c(1.0) == 0.0)
    // c(2) = 2*(ln(1)+γ) - 2*1/2 = 2γ - 1 ≈ 0.1544
    assert(math.abs(IsolationForestModel.c(2.0) - (2 * 0.5772156649015329 - 1.0)) < 1e-9)
    // c(256) ≈ 10.24 (the standard ψ=256 normalizer)
    assert(math.abs(IsolationForestModel.c(256.0) - 10.244) < 0.01)
  }
}
