package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def refZ(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; i <- vals.indices)
      z |= ((vals(i) >> b) & 1L) << (b * vals.size + i)
    z
  }

  test("zValue matches the reference bit-interleave and is bijective on the full small domain") {
    val bits = 3
    val pairs = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", Layout.zValue(Seq($"x", $"y"), bits).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == refZ(Seq(x, y), bits), s"($x,$y)") }
    assert(got.map(_._3).distinct.length == 64, "z must be a bijection on the domain")
    // known anchor: x=0b101, y=0b011; bit b of dim i lands at position b·2+i →
    // x bits at 0,4 and y bits at 1,3 → z = 0b11011 = 27
    assert(refZ(Seq(5L, 3L), 3) == 27L)
  }

  test("zValue supports three dimensions") {
    val bits = 4
    val triples = Seq((1L, 2L, 3L), (15L, 0L, 9L), (7L, 7L, 7L))
    val got = triples.toDF("a", "b", "c")
      .select(Layout.zValue(Seq($"a", $"b", $"c"), bits).as("z")).as[Long].collect()
    triples.zip(got).foreach { case ((a, b, c), z) =>
      assert(z == refZ(Seq(a, b, c), bits))
    }
  }

  test("bucket clamps to [0, 2^bits)") {
    val got = Seq(-5L, 0L, 100L, 1023L, 1024L, 99999L).toDF("v")
      .select(Layout.bucket($"v", 10).as("b")).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 100L, 1023L, 1023L, 1023L))
  }

  test("zorderWrite preserves rows, produces the requested file count, and clusters both dims") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37L) % 1024L, (i * 101L) % 1024L)
    }.toDF("id", "x", "y")
    val out = tempDir().resolve("z").toString
    Layout.zorderWrite(df, Seq($"x", $"y"), 10, out, numFiles = 16)
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    // clustering contract: within every output file both dims' spans are far
    // narrower than the full domain (a hash layout leaves them ~full-width)
    val spans = back.withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
    assert(spans._1 < 512 && spans._2 < 512,
      s"z-order files span too much of the domain: $spans")
  }

  test("linearWrite clusters its dim only") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37L) % 1024L, (i * 101L) % 1024L)
    }.toDF("id", "x", "y")
    val out = tempDir().resolve("lin").toString
    Layout.linearWrite(df, $"x", out, numFiles = 16)
    val spans = spark.read.parquet(out).withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
    assert(spans._1 < 128, s"linear layout must cluster x tightly: $spans")
    assert(spans._2 > 512, s"linear layout cannot cluster y — if it does, the fixture is degenerate: $spans")
  }
}
