package graft.io

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.ops.MatrixBuilder

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL sink: one object per line, pinned field order, escaping round-trips") {
    val df = Seq(
      (1L, "plain text", 0.5),
      (2L, "tricky \"quote\"\ttab\nnewline", 0.25))
      .toDF("doc_id", "text", "score")
    val out = tempDir().resolve("docs.jsonl").toString
    Sinks.writeJsonl(df.orderBy("doc_id"), out)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.size() === 2) // newline in content stays escaped on one line
    assert(lines.get(0).startsWith("{\"doc_id\":1,\"text\":")) // field order pinned
    val back = spark.read.schema("doc_id BIGINT, text STRING, score DOUBLE")
      .json(out).orderBy("doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1L, "plain text", 0.5), (2L, "tricky \"quote\"\ttab\nnewline", 0.25)))
  }

  test("TSV report sink: single file, header, NA for nulls, atomic publish (S9)") {
    val df = Seq(
      ("GSM1", Some(24776293L), Some(4.84), "PASS"),
      ("GSM2", None, None, "NO_LOG"))
      .toDF("SampleID", "input_reads", "Unmapped_Rate", "Status")
    val out = tempDir().resolve("report.txt").toString
    Sinks.writeTsvReport(df.orderBy("SampleID"), out)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.get(0) == "SampleID\tinput_reads\tUnmapped_Rate\tStatus")
    assert(lines.get(1) == "GSM1\t24776293\t4.84\tPASS")
    assert(lines.get(2) == "GSM2\tNA\tNA\tNO_LOG")
    assert(!Files.exists(Paths.get(out + ".tmp"))) // temp dir cleaned up
  }

  test("matrix sink: quoted ids + quoted source headers, Symbol unquoted (S10)") {
    val long = Seq(
      ("Xist", "s1.genes.results", "812.44"), ("Xist", "s2.genes.results", "1.50"),
      ("Uty", "s1.genes.results", "0.00"), ("Uty", "s2.genes.results", "99.99"))
      .toDF("gene_id", "source", "value")
    val m = MatrixBuilder.pivotMatrix(long, "gene_id", "source", "value",
      Seq("s1.genes.results", "s2.genes.results")).orderBy("Symbol")
    val out = tempDir().resolve("PRJ.genes.TPM.matrix").toString
    Sinks.writeMatrix(m, out)
    val lines = Files.readAllLines(Paths.get(out))
    assert(lines.get(0) == "Symbol\t\"s1.genes.results\"\t\"s2.genes.results\"")
    assert(lines.get(1) == "\"Uty\"\t0.00\t99.99")
    assert(lines.get(2) == "\"Xist\"\t812.44\t1.50")
  }

  test("BED sink: tab-joined rows, no quoting (S12)") {
    val bed = Seq(("chr1", 100L, 200L, "GeneA", "812.44", ".", 100L, 200L, "0,0,205"))
      .toDF("chrom", "start", "end", "name", "score", "strand", "ts", "te", "rgb")
    val out = tempDir().resolve("x.bed").toString
    Sinks.writeBed(bed, out)
    assert(Files.readAllLines(Paths.get(out)).get(0)
      == "chr1\t100\t200\tGeneA\t812.44\t.\t100\t200\t0,0,205")
  }

  test("compactParquet: fragmented dataset rewritten to byte-budgeted file count") {
    import spark.implicits._
    val in = tempDir().resolve("fragmented").toString
    // 64 tiny files
    (1 to 1024).map(i => (i.toLong, s"payload$i")).toDF("id", "v")
      .repartition(64).write.parquet(in)
    def parquetFiles(dir: String) = {
      val ls = Files.list(Paths.get(dir))
      try ls.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally ls.close()
    }
    assert(parquetFiles(in) == 64L)
    val df = spark.read.parquet(in)
    // huge target → exactly one output file
    val out1 = tempDir().resolve("compacted1").toString
    Sinks.compactParquet(df, in, out1, targetFileBytes = 1L << 30)
    assert(parquetFiles(out1) == 1L)
    assert(spark.read.parquet(out1).count() == 1024L)
    // target ~ quarter of the input bytes → ceil gives a small multi-file layout
    val total = {
      val ls = Files.list(Paths.get(in))
      try ls.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .mapToLong(p => Files.size(p)).sum()
      finally ls.close()
    }
    val out2 = tempDir().resolve("compacted2").toString
    Sinks.compactParquet(spark.read.parquet(in), in, out2, targetFileBytes = total / 4 + 1)
    val n2 = parquetFiles(out2)
    assert(n2 >= 2L && n2 <= 5L, s"expected ~4 files, got $n2")
    assert(spark.read.parquet(out2).count() == 1024L)
  }

  test("writePartitionedParquet: one file per partition value, record cap splits big values") {
    import spark.implicits._
    val df = (1 to 900).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part")
    val out = tempDir().resolve("layout").toString
    Sinks.writePartitionedParquet(df, out, Seq("part"), maxRecordsPerFile = 1000L)
    def partFiles(v: String) = {
      val d = Paths.get(out, s"part=$v")
      val ls = Files.list(d)
      try ls.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
      finally ls.close()
    }
    // 300 rows per value, cap 1000 -> exactly one file each (no task-fragmenting)
    assert(Seq("p0", "p1", "p2").map(partFiles) == Seq(1L, 1L, 1L))
    // skewed value over the cap rolls into multiple files
    val out2 = tempDir().resolve("layout2").toString
    Sinks.writePartitionedParquet(df, out2, Seq("part"), maxRecordsPerFile = 100L)
    val d2 = Paths.get(out2, "part=p0")
    val ls2 = Files.list(d2)
    val n2 = try ls2.filter(p => p.getFileName.toString.endsWith(".parquet")).count()
             finally ls2.close()
    assert(n2 == 3L) // 300 rows / 100-record cap
    // round-trip intact
    assert(spark.read.parquet(out2).count() == 900L)
  }
}
