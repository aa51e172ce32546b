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

  test("curateForTraining with repetitionGate + diversity: every stage's invariant holds on the output") {
    val rnd = new Random(7)
    val en = Seq("the", "a", "of", "to", "and", "in", "is", "was", "for", "on",
      "with", "that", "quick", "brown", "fox", "jumps", "river", "mountain",
      "garden", "window", "journey", "evening")
    def sentence(n: Int) = (1 to n).map(_ => en(rnd.nextInt(en.length))).mkString(" ")
    val docs = ((1L to 40L).map { i =>
      // every doc long + English enough for the quality/language gates
      (i, sentence(60) + s" marker$i")
    } ++ Seq(
      (90L, ("spam phrase now " * 20).trim + " " + sentence(40)), // repetition offender
      (91L, sentence(60) + " contaminated eval gram overlap here three"))).toDF("doc_id", "text")
    val eval = Seq((1000L, "contaminated eval gram overlap here three"))
      .toDF("doc_id", "text")
    val emb = docs.select(col("doc_id"),
      array((0 until 4).map(j => pmod(col("doc_id") + j, lit(5)).cast("float") + 0.1f): _*)
        .as("embedding"))
    val centroids = Seq(Seq(1.0, 2.0, 3.0, 4.0), Seq(4.0, 3.0, 2.0, 1.0))
    val perCell = 8
    val out = tempDir().resolve("cpt_full").toString
    val th = RepetitionStats.RepetitionThresholds()
    val chunks = CurationPipeline.curateForTraining(docs, eval, out,
      repetitionGate = Some(th),
      diversity = Some(CurationPipeline.DiversitySpec(emb, "embedding", centroids, perCell)))
    val kept = chunks.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // the repetition offender and the contaminated doc are gone
    assert(!kept.contains(90L), "repetition gate must drop the planted offender")
    assert(!kept.contains(91L), "decontamination must drop the eval-overlap doc")
    assert(kept.nonEmpty)
    // every kept doc passes the repetition thresholds (gate soundness)
    val passIds = RepetitionStats.repetitionFilter(docs, "text", th)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(passIds), "a kept doc failed the repetition gate")
    // the Voronoi cap holds: at most perCell kept docs per cell
    val cells = Sampling.diversitySample(
        emb.join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        "embedding", "doc_id", centroids, Int.MaxValue)
      .select(col("doc_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perCellCounts = kept.groupBy(cells).map { case (_, ids) => ids.size }
    assert(perCellCounts.forall(_ <= perCell),
      s"diversity cap violated: $perCellCounts")
    // the written layout agrees with the returned frame
    val written = spark.read.parquet(out).select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(written === kept)
  }
}
