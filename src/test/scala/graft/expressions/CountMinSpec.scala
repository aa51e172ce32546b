package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 3
  private val width = 16 // tiny: force collisions

  private def idxArr = array((0 until depth).map(d =>
    pmod(TextFunctions.md5Bits32(concat(lit(d + ":"), col("tok"))),
      lit(width.toLong))): _*)

  private def cellsOf(df: DataFrame, parts: Int = 1): Array[Long] =
    df.repartition(parts)
      .agg(CountMinSketch.cmsAgg(idxArr, depth, width))
      .collect()(0).getSeq[Long](0).toArray

  private def rowIdxs(p: String): Seq[Long] =
    CountMinSketch.probeIdxs(p, depth, width)

  private val corpusTokens =
    Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++ ('a' to 'z').map("w" + _)
  private val corpus = corpusTokens.toDF("tok")

  /** Local reference: the exact collision mass of each probe cell. */
  private def refEstimate(p: String): Long =
    rowIdxs(p).zipWithIndex.map { case (idx, d) =>
      corpusTokens.count(t => rowIdxs(t)(d) == idx).toLong
    }.min

  test("estimates equal the exact collision mass — never undercount, absent keys included") {
    val cells = cellsOf(corpus)
    Seq("alpha", "beta", "absent", "wq").foreach { p =>
      assert(CountMinSketch.estimate(cells, width, rowIdxs(p)) === refEstimate(p), p)
    }
    assert(CountMinSketch.estimate(cells, width, rowIdxs("alpha")) >= 50L)
    assert(CountMinSketch.estimate(cells, width, rowIdxs("beta")) >= 7L)
  }

  test("merge is cell-wise addition: partitioning never changes the sketch") {
    assert(cellsOf(corpus, 1).toSeq === cellsOf(corpus, 7).toSeq)
  }

  test("total mass per row equals the input count") {
    val cells = cellsOf(corpus)
    val n = corpus.count()
    (0 until depth).foreach { d =>
      assert(cells.slice(d * width, (d + 1) * width).sum === n)
    }
  }

  test("estimate takes the min across rows (collision mass differs per row)") {
    val cells = cellsOf(corpus)
    val perRow = rowIdxs("beta").zipWithIndex.map { case (i, d) => cells(d * width + i.toInt) }
    assert(CountMinSketch.estimate(cells, width, rowIdxs("beta")) === perRow.min)
  }

  test("malformed index arrays are rejected") {
    intercept[Exception] {
      corpus.agg(CountMinSketch.cmsAgg(array(lit(1L)), depth, width)).collect()
    }
  }
}
