package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // One plane along dim 0: cluster = sign of x(0). a~b~c chain via slight
  // rotations; d is a's mirror image (opposite cluster, cosine -1 to a).
  private val planes = Seq(Seq(1.0, 0.0, 0.0))
  private def vecs: DataFrame = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),    // a
    (2L, Seq(1.0f, 0.2f, 0.0f)),    // b ~ a
    (3L, Seq(1.0f, 0.4f, 0.0f)),    // c ~ b, barely ~ a
    (4L, Seq(-1.0f, 0.0f, 0.0f)),   // mirror of a, other cluster
    (5L, Seq(0.1f, 1.0f, 0.0f))     // same cluster as a, dissimilar
  ).toDF("vec_id", "embedding")

  test("greedy lower-id pruning keeps one representative per tight region") {
    val out = SimilaritySearch.semanticDedup(vecs, "embedding", "vec_id",
      planes, threshold = 0.95)
      .orderBy("vec_id").collect()
    val keep = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // cos(a,b)=0.98, cos(b,c)=0.996, cos(a,c)=0.928: chain a-b-c -> only a.
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))
  }

  test("cluster boundaries shield cross-cluster near-dups (recall contract)") {
    // 4 is identical to 1 up to sign: cosine=-1 (not a dup anyway), but a
    // TRUE near-dup in another cluster would be kept — prove the cluster
    // column drives candidate generation.
    val shifted = Seq((1L, Seq(1.0f, 0.01f, 0.0f)), (2L, Seq(-1.0f, -0.01f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.semanticDedup(shifted, "embedding", "vec_id",
      Seq(Seq(0.0, 1.0, 0.0)), threshold = -2.0) // everything qualifies by cosine
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // opposite y-signs -> different clusters -> both kept despite threshold.
    assert(out === Map(1L -> true, 2L -> true))
  }

  test("kmeans-quantizer variant gives identical verdicts to a brute-force reference") {
    val centroids = SimilaritySearch.kmeansCentroids(vecs, "embedding", "vec_id",
      k = 2, iters = 2)
    val out = SimilaritySearch.semanticDedupByCluster(vecs, "embedding", "vec_id",
      SimilaritySearch.nearestCentroid(col("embedding"), centroids), threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))

    // brute-force reference: same clustering, same greedy rule, local arithmetic
    val rows = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (a, b) => a * b }.sum
      d / (math.sqrt(x.map(a => a * a).sum) * math.sqrt(y.map(a => a * a).sum))
    }
    // mirror nearestCentroid's greatest(struct(s, i)): max cosine, max i on tie
    def cluster(v: Seq[Double]) = centroids.zipWithIndex
      .maxBy { case (c, i) => (cos(v, c), i) }._2
    val expected = rows.map { case (id, v) =>
      val c = cluster(v)
      val dup = rows.exists { case (id2, v2) =>
        id2 < id && cluster(v2) == c && cos(v, v2) >= 0.95 }
      (id, c, !dup)
    }
    assert(out.sortBy(_._1).toSeq === expected.sortBy(_._1).toSeq)
  }

  test("semanticDedupByKnnGraph: graph-candidate verdicts equal the all-pairs greedy rule when edges cover the dup pairs") {
    val pq = graft.operators.ProductQuantization
    // exhaustive codebook (ksub = n) -> codes are exact -> the full SDC
    // graph's top-k candidates include every true neighbor
    val cb = pq.seedCodebooks(vecs, "embedding", "vec_id", m = 1, ksub = 5)
    val enc = pq.encode(vecs, "embedding", cb)
      .select($"vec_id", pq.packCodes($"pq_codes", 1, 5).as("packed"),
        lit(0).as("cell"))
    val edges = pq.knnGraphSdc(enc, enc, "vec_id", "packed", "cell",
      Seq(Seq(0.0)), cb, nprobe = 1, k = 4)
    val out = SimilaritySearch.semanticDedupByKnnGraph(vecs, "embedding",
        "vec_id", edges, threshold = 0.95)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // all-pairs reference at the same threshold: a-b (0.98) and b-c (0.996)
    // trip; a-c (0.928) does not; verdict drops any row with a LOWER-id
    // match -> 2 and 3 dropped, everything else kept
    assert(out === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))
    // edges that do NOT cover a pair cannot drop it (k bounds recall):
    // an empty edge frame keeps everything
    val none = SimilaritySearch.semanticDedupByKnnGraph(vecs, "embedding",
        "vec_id", edges.filter(lit(false)), threshold = 0.0)
      .collect().map(_.getBoolean(1))
    assert(none.forall(identity))
  }

  test("knnJoinLsh: per-query top-k by cosine, self-pairs excluded, bucket-bounded") {
    val out = SimilaritySearch.knnJoinLsh(vecs, vecs, "embedding", "vec_id",
      "vec_id", planes, k = 2)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // vector 4 sits alone in the negative-x bucket: no candidates, no rows.
    assert(!out.exists(_._1 == 4L))
    assert(!out.exists(t => t._1 == t._2)) // no self-pairs
    // query 1's nearest same-bucket neighbor is 2 (cos .98) then 3 (.93)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq(2L, 3L))
    // ranks are 1..k per query
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq === (1L to rows.length).toSeq)
    }
  }

  test("small dropped-id sets come back as an AQE-chosen broadcast join") {
    val df = SimilaritySearch.semanticDedup(vecs, "embedding", "vec_id",
      planes, 0.95)
    df.collect() // let AQE finalize from runtime stats (no forced hint anymore)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("knnJoinLsh excludeSelf=false keeps equal-id cross-table neighbors") {
    val leftQ = Seq((1L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rightT = Seq((1L, Seq(1.0f, 0.1f, 0.0f)), (9L, Seq(1.0f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    val incl = SimilaritySearch.knnJoinLsh(leftQ, rightT, "embedding", "vec_id",
      "vec_id", planes, k = 2, excludeSelf = false).collect().map(_.getLong(1)).toSet
    assert(incl === Set(1L, 9L)) // id-17-style coincidence retrievable
    val excl = SimilaritySearch.knnJoinLsh(leftQ, rightT, "embedding", "vec_id",
      "vec_id", planes, k = 2).collect().map(_.getLong(1)).toSet
    assert(excl === Set(9L))
  }
}
