package graft.plans

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window row_number formulation on random data, any partitioning") {
    val rnd = new Random(5)
    (1 to 8).foreach { round =>
      val rows = (1 to 300).map(i =>
        (s"g${rnd.nextInt(6)}", i.toLong, rnd.nextInt(40).toDouble))
      Seq(1, 4, 13).foreach { parts =>
        val df = rows.toDF("g", "id", "score").repartition(parts)
        val got = GroupTopK.topK(df, Seq("g"), Seq("score" -> false, "id" -> true), 5)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val want = df.withColumn("rn", row_number().over(
            Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)))
          .filter($"rn" <= 5)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        assert(got === want, s"round $round parts $parts")
      }
    }
  }

  test("plan is partial → exchange → final, with no Sort and no Window") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
      .repartition(4)
    val out = GroupTopK.topK(df, Seq("g"), Seq("id" -> true), 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopKPartial"), s"plan:\n$plan")
    assert(plan.contains("GroupTopKFinal"), s"plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!"\\bSort\\b".r.findFirstIn(plan).isDefined, s"unexpected sort:\n$plan")
    // the final stage consumes the hash exchange, the partial feeds it
    assert(plan.indexOf("GroupTopKFinal") < plan.indexOf("Exchange hashpartitioning"))
    assert(plan.indexOf("Exchange hashpartitioning") < plan.indexOf("GroupTopKPartial"))
  }

  test("empty groupCols means GLOBAL top-k, not top-k per partition") {
    val df = (1L to 1000L).toDF("id").repartition(8)
    val out = GroupTopK.topK(df, Seq.empty, Seq("id" -> true), 3)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L)) // 8 partitions must still yield exactly 3 rows
  }

  test("groups smaller than k keep all rows; k=1 keeps the single best") {
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 3.0), ("b", 3L, 5.0)).toDF("g", "id", "s")
    val all = GroupTopK.topK(df, Seq("g"), Seq("s" -> false, "id" -> true), 10)
      .collect().map(_.getLong(1)).toSet
    assert(all === Set(1L, 2L, 3L))
    val best = GroupTopK.topK(df, Seq("g"), Seq("s" -> false, "id" -> true), 1)
      .collect().map(_.getLong(1)).toSet
    assert(best === Set(1L, 3L))
  }

  test("total tie-break keeps the deterministic boundary row") {
    // two rows tie on score at the k-boundary; id tie-break must pick min id
    val df = Seq(("a", 10L, 1.0), ("a", 7L, 1.0), ("a", 3L, 2.0)).toDF("g", "id", "s")
    val kept = GroupTopK.topK(df, Seq("g"), Seq("s" -> false, "id" -> true), 2)
      .collect().map(_.getLong(1)).toSet
    assert(kept === Set(3L, 7L))
  }

  test("Sampling.topMByScore and stratifiedLimit route through the operator — no Window/Sort") {
    import graft.operators.Sampling
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 4}", (i % 17).toDouble))
      .toDF("id", "g", "score").repartition(4)
    val top = Sampling.topMByScore(df, "g", 3, col("score"), col("id"))
    val topPlan = top.queryExecution.executedPlan.toString
    assert(topPlan.contains("GroupTopKFinal") && topPlan.contains("GroupTopKPartial"),
      s"topMByScore must plan through GroupTopK:\n$topPlan")
    assert(!topPlan.contains("Window") && !"\\bSort\\b".r.findFirstIn(topPlan).isDefined,
      s"no window/sort expected:\n$topPlan")
    // values identical to the window formulation it replaced
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 3).drop("rn")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(top.collect().map(r => (r.getLong(0), r.getString(1))).toSet === want)
    assert(top.columns.toSeq === Seq("id", "g", "score")) // helpers dropped

    val strat = Sampling.stratifiedLimit(df, "g", "id", m = 5)
    val stratPlan = strat.queryExecution.executedPlan.toString
    assert(stratPlan.contains("GroupTopKFinal"),
      s"stratifiedLimit must plan through GroupTopK:\n$stratPlan")
    assert(!stratPlan.contains("Window"), s"no window expected:\n$stratPlan")
    val wantStrat = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy(md5($"id".cast("string")), $"id")))
      .filter($"rn" <= 5).drop("rn")
      .collect().map(_.getLong(0)).toSet
    assert(strat.collect().map(_.getLong(0)).toSet === wantStrat)
    assert(strat.columns.toSeq === Seq("id", "g", "score"))
  }

  test("reserved helper names are rejected, ambiguous case-colliding columns fail") {
    import graft.operators.Sampling
    val bad = Seq((1L, "g", 0.5)).toDF("id", "g", "__topm_score")
    intercept[IllegalArgumentException] {
      Sampling.topMByScore(bad, "g", 1, col("id").cast("double"), col("id"))
    }
    val dup = Seq((1L, 2L)).toDF("ID", "id")
    intercept[IllegalArgumentException] {
      GroupTopK.topK(dup, Seq.empty, Seq("Id" -> true), 1)
    }
    // exact case still disambiguates
    assert(GroupTopK.topK(dup, Seq.empty, Seq("id" -> true), 1).count() == 1L)
  }

  test("ascending order and multi-column groups work") {
    val df = Seq(
      ("a", "x", 1L, 5.0), ("a", "x", 2L, 1.0), ("a", "y", 3L, 9.0),
      ("b", "x", 4L, 2.0), ("b", "x", 5L, 7.0)).toDF("g1", "g2", "id", "s")
    val kept = GroupTopK.topK(df, Seq("g1", "g2"), Seq("s" -> true, "id" -> true), 1)
      .collect().map(_.getLong(2)).toSet
    assert(kept === Set(2L, 3L, 4L))
  }
}
