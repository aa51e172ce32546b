package graft.tools

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** FULL-SUITE multi-executor smoke: every registered `SparkEntry.queries`
  * entry run under `local-cluster[2,16,4096]` — separate executor OS
  * processes, real closure serialization, executor-side classloading of
  * every custom expression/codegen path — with an order-insensitive
  * checksum compared against the same query on the same data in `local[4]`.
  * `local[*]` (the only topology the oracle gate runs in) cannot catch a
  * driver==executor assumption: a non-serializable closure capture, repo
  * classes missing from the executor classpath, driver-local state read
  * from a task. One green row per query here closes exactly that gap for
  * the whole surface at once.
  *
  * Checksum: `bit_xor(xxhash64(to_json(struct(*))))` + row count, with
  * float/double columns rounded to 6 decimals first — aggregation order can
  * legally differ between topologies, so last-bit float drift must not read
  * as a correctness diff (any real divergence is far above 1e-6).
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001),
  * SPARK_GRAFT_MASTER (default local-cluster[2,16,4096]), SPARK_GRAFT_OUT
  * (artifact path). Launch with SPARK_HOME=/opt/spark and
  * SPARK_SCALA_VERSION=2.13 (the standalone worker's executor command
  * builder needs both).
  */
object LocalClusterSuite {

  private def checksum(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.types.ArrayType
    val rounded = df.columns.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case DoubleType | FloatType => d.withColumn(c, round(col(c), 6))
        // one level of array nesting (embedding/score vectors) — deeper
        // nested doubles (struct fields) would need a per-schema rebuild;
        // none of the registered queries returns one today
        case ArrayType(DoubleType | FloatType, _) =>
          d.withColumn(c, transform(col(c), x => round(x, 6)))
        case _ => d
      }
    }
    val r = rounded
      .select(xxhash64(to_json(struct(rounded.columns.map(col).toIndexedSeq: _*))).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("chk"))
      .collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def runSuite(spark: SparkSession, sfDir: String,
                       names: Seq[String]): Map[String, Either[String, (Long, Long)]] = {
    spark.sparkContext.setLogLevel("WARN")
    names.map { name =>
      val res = try Right(checksum(ColumnBridge.dropRootSort(
        graft.SparkEntry.queries(name)(spark, sfDir))))
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200))
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> res
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,4096]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT",
      "bench/results/r9_lcluster_suite.json")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted

    // Leg A: the reference run — same checksum, classic local mode.
    val localSpark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val t0 = System.nanoTime()
    val localRes = runSuite(localSpark, sfDir, names)
    val localWall = (System.nanoTime() - t0) / 1e9
    localSpark.stop()
    // A fresh context for the cluster leg — getOrCreate after stop() builds
    // a new SparkContext against the standalone in-process master.
    val clusterSpark = SparkSession.builder()
      .master(master)
      .config("spark.executor.memory", sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      .config("spark.executor.extraJavaOptions", LocalClusterProbe.AddOpens)
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.local.dir", "/root/repo/bench/tmp/lcluster")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val t1 = System.nanoTime()
    val clusterRes = runSuite(clusterSpark, sfDir, names)
    val clusterWall = (System.nanoTime() - t1) / 1e9
    // Task-level topology proof, not a registry sample (a builder-time
    // getExecutorMemoryStatus sees only the driver's BlockManager — the
    // standalone executors register asynchronously): collect the executor id
    // each task actually ran in. In local-cluster these are "0"/"1"; a
    // driver-executed task would report "driver".
    val execs = clusterSpark.sparkContext.parallelize(0 until 64, 64)
      .map(_ => org.apache.spark.SparkEnv.get.executorId).distinct().collect()
      .toSeq.sorted
    clusterSpark.stop()
    require(execs.size >= 2 && !execs.contains("driver"),
      s"expected tasks on >=2 non-driver executors, saw: $execs")

    def fmt(r: Either[String, (Long, Long)]): String = r match {
      case Right((n, c)) => s"""{"rows":$n,"chk":$c}"""
      case Left(e) => s"""{"error":"${e.replace("\\", "/").replace("\"", "'")}"}"""
    }
    val rows = names.map { n =>
      val ok = (localRes(n), clusterRes(n)) match {
        case (Right(a), Right(b)) => a == b
        case _ => false
      }
      n -> ok
    }
    val mismatches = rows.filterNot(_._2).map(_._1)
    val detail = mismatches.map(n =>
      s""""$n":{"local":${fmt(localRes(n))},"cluster":${fmt(clusterRes(n))}}""")
      .mkString("{", ",", "}")
    val record =
      s"""{"metric":"lcluster_suite","master":"$master","corpus":"$sfDir",
         |"task_executor_ids":${execs.map(e => "\"" + e + "\"").mkString("[", ",", "]")},"n_queries":${names.size},
         |"n_equal":${rows.count(_._2)},"n_mismatch":${mismatches.size},
         |"mismatches":$detail,
         |"local_wall_sec":${f"$localWall%.1f"},"cluster_wall_sec":${f"$clusterWall%.1f"}}"""
        .stripMargin.replace("\n", "")
    println(record)
    val f = new File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(f.toPath, record + "\n")
    System.err.println(s"[lcsuite] ${rows.count(_._2)}/${names.size} equal; artifact $outPath")
  }
}
