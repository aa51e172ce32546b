package graft.tools

import graft.operators.{ProductQuantization, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Planted-duplicate A/B: the bucketed SemDeDup (`semanticDedupAuto` —
  * within-quantizer-bucket all-pairs verification) vs the k-NN-graph-driven
  * form (`semanticDedupByKnnGraph` over `knnGraphSdc` / `knnGraphIvfPq`
  * candidates — n·k exactly-verified pairs).
  *
  * A `dupFrac` sample of the corpus is cloned with high ids and tiny
  * deterministic jitter (cosine(orig, clone) ≈ 1 ≫ threshold), giving
  * ground truth the verdicts are scored against: RECALL = fraction of
  * planted clones dropped (the greedy rule drops the higher id, which is
  * the clone by construction); OTHER-DROPS counts legitimate background
  * near-dups separately (reported, not judged — both arms apply the same
  * exact-cosine verdict, they differ only in candidate generation).
  *
  * What the A/B isolates: candidate-generation COVERAGE (does the dup pair
  * surface in a shared bucket / in one side's top-k?) and COST SHAPE
  * (bucket-population² pair work vs n·k pair work + index build). The graph
  * arms' index build is timed separately — a pipeline amortizes it across
  * every ANN use of the corpus, not just dedup.
  *
  * Usage: SemDedupGraphAb <embDir> [dupFrac=0.05] [threshold=0.99]
  *                        [kCent=64] [m=8] [ksub=256] [k=10] [nprobe=4]
  *                        [iters=4]
  */
object SemDedupGraphAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SemDedupGraphAb <embDir> [dupFrac] [threshold] [kCent] [m] [ksub] [k] [nprobe] [iters]")
    val dir = args(0)
    val dupFrac = args.lift(1).map(_.toDouble).getOrElse(0.05)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.99)
    val kCent = args.lift(3).map(_.toInt).getOrElse(64)
    val m = args.lift(4).map(_.toInt).getOrElse(8)
    val ksub = args.lift(5).map(_.toInt).getOrElse(256)
    val k = args.lift(6).map(_.toInt).getOrElse(10)
    val nprobe = args.lift(7).map(_.toInt).getOrElse(4)
    val iters = args.lift(8).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pq = ProductQuantization

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    // plant clones: every ceil(1/dupFrac)-th row, id shifted into a disjoint
    // high range, each dim jittered by ~1e-3 (cosine to the original ≈ 1)
    val stride = math.max(1L, math.round(1.0 / dupFrac))
    val idShift = 1L << 40
    val clones = base.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select((col("vec_id") + idShift).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + sin(col("vec_id").cast("double") * lit(0.77)
            + i.cast("double")) * lit(1e-3f)).cast("float")).as("embedding"))
    val corpus = base.unionByName(clones).localCheckpoint(true)
    val n = corpus.count()
    val planted = n - nBase

    def score(verdict: DataFrame): (Long, Long, Long) = {
      // verdict: (vec_id, keep) — possibly with extra cols
      val dropped = verdict.filter(!col("keep")).select(col("vec_id"))
        .as[Long].collect().toSet
      val caught = dropped.count(_ >= idShift)
      (caught.toLong, (dropped.size - caught).toLong, dropped.size.toLong)
    }

    // arm A: bucketed SemDeDup (corpus-adaptive quantizer depth)
    val tA = System.nanoTime()
    val vA = SimilaritySearch.semanticDedupAuto(corpus, "embedding", "vec_id",
      threshold).select(col("vec_id"), col("keep")).localCheckpoint(true)
    val wallA = (System.nanoTime() - tA) / 1e9
    val (caughtA, otherA, _) = score(vA)
    ColumnBridge.unpersistFrame(vA, blocking = true)

    // shared index build for the graph arms (timed separately — amortized
    // across every ANN use of the corpus in a real pipeline)
    val tB0 = System.nanoTime()
    val cents = SimilaritySearch.kmeansCentroids(corpus, "embedding", "vec_id", kCent, iters)
    val assigned = SimilaritySearch.assignCells(corpus, "embedding", cents)
      .localCheckpoint(true)
    val cb = pq.trainCodebooks(corpus, "embedding", "vec_id", m, ksub, iters)
    val enc = pq.encode(assigned, "embedding", cb)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
        col("ivf_cell"))
      .localCheckpoint(true)
    val buildSec = (System.nanoTime() - tB0) / 1e9

    // arm B: SDC graph candidates + exact verify
    val tB = System.nanoTime()
    val edgesSdc = pq.knnGraphSdc(enc, enc, "vec_id", "packed", "ivf_cell",
      cents, cb, nprobe, k)
    val vB = SimilaritySearch.semanticDedupByKnnGraph(corpus, "embedding",
      "vec_id", edgesSdc, threshold).localCheckpoint(true)
    val wallB = (System.nanoTime() - tB) / 1e9
    val (caughtB, otherB, _) = score(vB)
    ColumnBridge.unpersistFrame(vB, blocking = true)

    // arm C: ADC graph candidates (asymmetric — raw query vector, so a
    // clone's distance to its original is one quantization error, not two)
    val tC = System.nanoTime()
    val edgesAdc = pq.knnGraphIvfPq(corpus, "vec_id", "embedding", enc,
      "packed", "ivf_cell", cents, cb, nprobe, k, residual = false,
      broadcastLuts = false)
    val vC = SimilaritySearch.semanticDedupByKnnGraph(corpus, "embedding",
      "vec_id", edgesAdc, threshold).localCheckpoint(true)
    val wallC = (System.nanoTime() - tC) / 1e9
    val (caughtC, otherC, _) = score(vC)

    println(
      f"""{"metric":"semdedup_graph_ab","dir":"$dir","n_base":$nBase,"n_planted":$planted,"threshold":$threshold,"k_cent":$kCent,"m":$m,"ksub":$ksub,"k":$k,"nprobe":$nprobe,"index_build_sec":$buildSec%.1f,"bucketed_auto":{"wall_sec":$wallA%.1f,"planted_recall":${caughtA.toDouble / planted}%.4f,"other_drops":$otherA},"sdc_graph":{"wall_sec":$wallB%.1f,"planted_recall":${caughtB.toDouble / planted}%.4f,"other_drops":$otherB},"adc_graph":{"wall_sec":$wallC%.1f,"planted_recall":${caughtC.toDouble / planted}%.4f,"other_drops":$otherC}}""")
    spark.stop()
  }
}
