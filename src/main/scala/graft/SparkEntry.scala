package graft

import graft.queries.{FormatQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented SURVEY §2 operator, each expressed
  * over the shared test corpus with a DuckDB oracle in `oracleSql`. The genomics
  * file-format/driver surface (TSV/RSEM/BED/JSON writers+readers, external-stage
  * protocol) is oracle-checked too, via corpus-derived fixture ROUND-TRIPS
  * ([[graft.queries.FormatQueries]] q34–q39/q56–q63) on top of the ScalaTest
  * fixture specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's step-2 core: per-group gate → PASS semi-join → matrix pivot
    * (SURVEY §3.3 stages 5–9) over the shared corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val gate = RelationalQueries.queries("q03_starqc_gate")(spark, dir)
    val passed = gate.filter(col("status") === "PASS").select(col("l_orderkey"))
    spark.read.parquet(s"$dir/lineitem.parquet")
      .join(passed, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
  }

  /** One entry per implemented operator from SURVEY.md §2 + the training-data
    * pipeline suite (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++ FormatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ PipelineQueries.oracles ++ FormatQueries.oracles
}
