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

  private def rowIdxs(p: String): Seq[Long] = (0 until depth).map { d =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$p".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % width
  }

  private val corpus =
    (Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++
      ('a' to 'z').map("w" + _)).toDF("tok")

  test("estimates never undercount; exact for keys without collisions elsewhere") {
    val cells = cellsOf(corpus)
    assert(CountMinSketch.estimate(cells, width, rowIdxs("alpha")) >= 50L)
    assert(CountMinSketch.estimate(cells, width, rowIdxs("beta")) >= 7L)
    assert(CountMinSketch.estimate(cells, width, rowIdxs("absent")) >= 0L)
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
