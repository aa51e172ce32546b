package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Randomized law checks for the round-4 curation operators (seeded →
  * deterministic): idempotence and count-conservation properties that must
  * hold on ANY input — the structural guarantees downstream pipeline stages
  * quietly rely on. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rounds = 10

  private def randomUrls(rnd: Random, n: Int): Seq[String] = {
    def part() = Seq("utm_source=x", "gclid=99", "id=7", "ref=rss", "q=a b",
      "utm_medium=mail")(rnd.nextInt(6))
    (1 to n).map { _ =>
      val scheme = if (rnd.nextBoolean()) "https" else "HTTP"
      val www = if (rnd.nextBoolean()) "www." else ""
      val host = s"Host${rnd.nextInt(5)}.example.com"
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/a", "/a/b", "/a/")(rnd.nextInt(4))
      val query = if (rnd.nextBoolean()) "?" + part() + "&" + part() else ""
      val frag = if (rnd.nextBoolean()) "#frag" else ""
      s"$scheme://$www$host$port$path$query$frag"
    }
  }

  test("canonicalUrl is idempotent: canon(canon(u)) == canon(u)") {
    val rnd = new Random(42)
    (1 to rounds).foreach { round =>
      val urls = randomUrls(rnd, 60).toDF("u")
      val once = urls.select(TextFunctions.canonicalUrl(col("u")).as("c1"))
      val twice = once.select(col("c1"),
        TextFunctions.canonicalUrl(col("c1")).as("c2"))
        .filter(col("c1") =!= col("c2"))
        .collect()
      assert(twice.isEmpty,
        s"round $round not idempotent: ${twice.take(3).mkString(", ")}")
    }
  }

  test("corpus line dedup is idempotent: a second pass removes nothing") {
    val rnd = new Random(7)
    (1 to rounds).foreach { round =>
      val lines = Seq("boiler one", "boiler two", "x", "y", "z", "w", "v")
      val docs = (1L to 30L).map { i =>
        val n = 1 + rnd.nextInt(4)
        (i, (1 to n).map(_ => lines(rnd.nextInt(lines.length))).mkString("\n"))
      }.toDF("doc_id", "text")
      val first = LineDedup.removeRepeatedLines(docs, "doc_id", "text", maxDocs = 3)
        .select(col("doc_id"), col("clean_text").as("text"))
        .filter(col("text") =!= "")
      val second = LineDedup.removeRepeatedLines(first, "doc_id", "text", maxDocs = 3)
      assert(second.filter(col("n_removed") =!= 0L).count() === 0L,
        s"round $round: second pass still removed lines")
    }
  }

  test("within-doc line dedup is idempotent") {
    val rnd = new Random(11)
    val docs = (1L to 40L).map { i =>
      val ls = (1 to 1 + rnd.nextInt(6)).map(_ => s"l${rnd.nextInt(4)}")
      (i, ls.mkString("\n"))
    }.toDF("doc_id", "text")
    val once = LineDedup.dedupLinesWithinDoc(docs, "doc_id", "text")
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = LineDedup.dedupLinesWithinDoc(once, "doc_id", "text")
    assert(twice.filter(col("n_lines") =!= col("n_kept")).count() === 0L)
  }

  test("span corruption conserves tokens: kept + masked == total, spans <= masked") {
    val rnd = new Random(23)
    val docs = (1L to 40L).map { i =>
      (i, (1 to 5 + rnd.nextInt(60)).map(_ => s"t${rnd.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "text")
    Seq(0, 15, 60, 100).foreach { pct =>
      val bad = SpanCorruption.corrupt(docs, "doc_id", "text", pct)
        .withColumn("n_kept_tokens",
          size(split(col("corrupted"), " ")) -
            size(filter(split(col("corrupted"), " "), x => x === "<mask>")))
        .filter(
          col("n_kept_tokens") =!= col("n_tokens") - col("n_masked") ||
          col("n_spans") > col("n_masked"))
        .count()
      assert(bad === 0L, s"conservation violated at pct=$pct")
    }
  }

  test("weighted upsample + rejection sample compose without draw correlation") {
    // survivors of p=0.5 upsampled at w=1.5 must NOT all get 2 copies (the
    // correlated-seed failure mode fixed in round 4)
    val docs = (1L to 2000L).toDF("doc_id")
    val survivors = Sampling.rejectionSample(docs, "doc_id", lit(0.5))
      .filter(col("keep")).select("doc_id")
    val copies = Sampling.upsampleByWeight(survivors, "doc_id", lit(1.5))
      .groupBy("doc_id").count().select("count").as[Long].collect()
    val twos = copies.count(_ == 2L)
    assert(twos > 0 && twos < copies.length,
      s"draws correlated: $twos of ${copies.length} got the fractional copy")
  }
}
