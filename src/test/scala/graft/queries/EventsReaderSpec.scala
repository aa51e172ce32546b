package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Environment-drift smoke test: reads the REAL driver-generated
  * `events.parquet` (the one table whose parquet timestamp encoding has
  * changed under us between Spark versions — TIMESTAMP(NANOS) readable only
  * via legacy `nanosAsLong`, then TIMESTAMP(MICROS) resolving to
  * TIMESTAMP_NTZ). Round 5 shipped six silently-broken queries because all
  * 271 specs exercised synthetic frames or MemoryStream and never touched
  * this read path; this spec turns the next parquet-timestamp semantic
  * change into a red build instead of a silent correctness hole.
  */
class EventsReaderSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def available: Boolean = new java.io.File(s"$sfDir/events.parquet").exists()

  test("events() resolves ts to a micro-precision TimestampType on the live corpus") {
    assume(available, s"$sfDir/events.parquet not present in this environment")
    val ev = RelationalQueries.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts resolved to ${ev.schema("ts").dataType} — events() must normalize to TimestampType")
  }

  test("events() supports aggregation and ts arithmetic on the live corpus") {
    assume(available, s"$sfDir/events.parquet not present in this environment")
    val ev = RelationalQueries.events(spark, sfDir)
    // One aggregate + one ts arithmetic expression — the exact shapes that
    // failed analysis in round 5 (DATATYPE_MISMATCH on `ts div 1000`).
    val agg = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(unix_millis(col("ts"))).as("max_ms"))
      .collect()
    assert(agg.nonEmpty, "events aggregate returned no rows")
    assert(agg.forall(_.getLong(2) > 0L), "unix_millis(ts) must be positive epoch millis")
    // Window bucketing (q33/q66/q116's entry shape) must analyze and execute.
    val w = ev.groupBy(window(col("ts"), "1 hour")).count().collect()
    assert(w.nonEmpty, "event-time window aggregate returned no rows")
  }
}
