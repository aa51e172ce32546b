package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TokenBudgetMixSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i =>
    (i, Seq("a", "b", "c")(((i % 3) + 3 % 3).toInt % 3), (i % 17) + 1L))
    .toDF("id", "dom", "tok")

  test("bucketed plan equals the plain window-cumsum reference, recipe domains only") {
    val budgets = Map("a" -> 150L, "b" -> 0L) // c absent from the recipe
    val got = Sampling.tokenBudgetMix(docs, "dom", "tok", "id", budgets)
      .select("id").as[Long].collect().toSet
    val win = Window.partitionBy($"dom").orderBy($"_d", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.filter($"dom".isin("a", "b"))
      .withColumn("_d", md5(concat($"id".cast("string"), lit(":mix"))))
      .withColumn("cum", sum($"tok").over(win))
      .withColumn("bud", when($"dom" === "a", 150L).otherwise(0L))
      .filter($"cum" <= $"bud").select("id").as[Long].collect().toSet
    assert(got === ref)
    assert(got.nonEmpty, "budget 150 over ~600 tokens must keep a strict subset")
    val bIds = docs.filter($"dom" === "b").select("id").as[Long].collect().toSet
    assert(got.intersect(bIds).isEmpty, "budget 0 with positive tokens keeps nothing")
    val cIds = docs.filter($"dom" === "c").select("id").as[Long].collect().toSet
    assert(got.intersect(cIds).isEmpty, "domains outside the recipe drop")
  }

  test("budget at or above the domain total keeps the whole domain") {
    val all = Sampling.tokenBudgetMix(docs, "dom", "tok", "id",
      Map("a" -> 1000000L)).select("id").as[Long].collect().toSet
    assert(all === docs.filter($"dom" === "a").select("id").as[Long].collect().toSet)
  }

  test("crafted boundary: five 10-token docs, budget 25 keeps exactly two") {
    val five = (1L to 5L).map((_, "x", 10L)).toDF("id", "dom", "tok")
    val kept = Sampling.tokenBudgetMix(five, "dom", "tok", "id", Map("x" -> 25L))
    assert(kept.count() === 2L)
    // and they are the FIRST two in hash order (greedy prefix, not any two)
    val order = five
      .withColumn("_d", md5(concat($"id".cast("string"), lit(":mix"))))
      .orderBy($"_d", $"id").select("id").as[Long].collect()
    assert(kept.select("id").as[Long].collect().toSet === order.take(2).toSet)
  }

  test("deterministic across runs; schema preserved") {
    val m = Map("a" -> 200L, "c" -> 77L)
    val r1 = Sampling.tokenBudgetMix(docs, "dom", "tok", "id", m)
    val r2 = Sampling.tokenBudgetMix(docs, "dom", "tok", "id", m)
    assert(r1.columns.toSeq === Seq("id", "dom", "tok"))
    assert(r1.collect().map(_.toSeq).toSet === r2.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetMix(docs, "dom", "tok", "id", Map.empty))
    intercept[IllegalArgumentException](
      Sampling.tokenBudgetMix(docs, "dom", "tok", "id", Map("a" -> -1L)))
  }

  test("negative or NULL token counts fail loudly instead of breaking the greedy prefix") {
    def firstMsg(e: Throwable): String =
      (Option(e.getMessage).toSeq ++ Option(e.getCause).map(_.getMessage)).mkString(" | ")
    val neg = Seq((1L, "a", 10L), (2L, "a", -5L), (3L, "a", 10L))
      .toDF("id", "dom", "tok")
    val e1 = intercept[Exception] {
      Sampling.tokenBudgetMix(neg, "dom", "tok", "id", Map("a" -> 100L)).collect()
    }
    assert(firstMsg(e1).contains("negative or null tok"), s"unexpected: $e1")
    // a NULL count would vanish from the sums but still emit its row —
    // equally loud, and the message survives even here
    val nul = Seq((1L, "a", Some(10L)), (2L, "a", None), (3L, "a", Some(10L)))
      .toDF("id", "dom", "tok")
    val e2 = intercept[Exception] {
      Sampling.tokenBudgetMix(nul, "dom", "tok", "id", Map("a" -> 100L)).collect()
    }
    assert(firstMsg(e2).contains("negative or null tok"), s"unexpected: $e2")
  }
}
