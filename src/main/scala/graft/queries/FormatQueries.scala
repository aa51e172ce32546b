package graft.queries

import java.nio.file.{Files, Path, Paths}

import graft.external.ExternalStage
import graft.driver.Orchestrator
import graft.io.{Sinks, TsvSources}
import graft.ops.{ColorAssigner, ConflictReport, MatrixBuilder, SessionBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Oracle-backed queries for the FILE-FORMAT and DRIVER-PROTOCOL operators
  * (SURVEY §2.1 S2/S5/S7/S9–S12/S14, §2.2 P12/P13, §2.4 A8, §2.7 C1/C6–C8,
  * §2.6 F4/F11/F12/F14) that the parquet-corpus harness can't reach directly.
  *
  * Shape: each query derives a deterministic fixture from the `nation`/`region`
  * tables, pushes it through the REAL writer/reader/protocol code
  * ([[graft.io.Sinks]] → file → [[graft.io.TsvSources]], or
  * [[graft.external.ExternalStage]] with injected exec), and returns the
  * parsed-back result. The DuckDB oracle recomputes the expected values straight
  * from the corpus — so a writer bug, a reader bug, or a protocol-semantics bug
  * each breaks the hash match. Nothing compares a file against itself.
  *
  * Fixtures live under a per-JVM temp root (the oracle SQL never references the
  * fixture path — it recomputes expected values from the corpus tables), so two
  * concurrent verify/bench processes can never race on each other's files.
  */
object FormatQueries {

  // one fresh root per JVM: concurrent driver runs are isolated, and a
  // predictable /tmp path would be a symlink-tampering surface
  private lazy val FixRoot: String =
    Files.createTempDirectory("graft_fixtures_").toString

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def fixDir(name: String): Path = {
    val d = Paths.get(FixRoot, name)
    Files.createDirectories(d)
    d
  }

  private def cleanDir(d: Path): Path = {
    def rec(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rec(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rec(d)
    Files.createDirectories(d)
    d
  }

  /** Nation rows collected driver-side (25 rows by TPC-H construction — the
    * fixture generator, not a data path). */
  private def nationRows(s: SparkSession, dir: String): Seq[(Long, String, Long)] =
    t(s, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ─── q34: S9 TSV report sink + C8 atomic publish, read back through a
    //     header/NA-aware scan (`pSTARQC_v1.sh:46,63-99` tmp+mv, NA sentinel). ──
    "q34_report_roundtrip" -> ((s, dir) => {
      val rep = t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(
          col("n_name").as("SampleID"),
          (col("n_nationkey").cast("long") * lit(1000L) + lit(37L)).as("input_reads"),
          when(col("n_nationkey") % 5 === 0, lit(null).cast(StringType))
            .otherwise(col("r_name")).as("region_name"),
          format_string("%.2f", col("n_nationkey").cast("double") / lit(4.0)).as("rate_str"))
        .orderBy(col("SampleID"))
      val out = s"${fixDir("q34")}/report.tsv"
      Sinks.writeTsvReport(rep, out)
      s.read.option("sep", "\t").option("header", "true").option("nullValue", "NA")
        .schema("SampleID STRING, input_reads BIGINT, region_name STRING, rate_str STRING")
        .csv(out)
        .orderBy(col("SampleID"))
    }),

    // ─── q35: A7 pivot (argv order) → S10 matrix sink (quoting contract,
    //     `rsem-generate-data-matrix:76-89`) → quote-stripping read-back (F7) →
    //     unpivot + suffix strip (F6, `ConflictedSampleReport_v4.sh:43-66`). ───
    "q35_matrix_roundtrip" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val long = n.select(col("n_name").as("gene"), lit("PRJ_A.genes.results").as("src"),
          format_string("%.2f", col("n_nationkey").cast("double") * lit(1.25)).as("v"))
        .unionByName(n.select(col("n_name").as("gene"), lit("PRJ_B.genes.results").as("src"),
          format_string("%.2f", col("n_nationkey").cast("double") * lit(2.5) + lit(0.75)).as("v")))
      val matrix = MatrixBuilder.pivotMatrix(long, "gene", "src", "v",
        Seq("PRJ_A.genes.results", "PRJ_B.genes.results"))
      val out = s"${fixDir("q35")}/matrix.tsv"
      Sinks.writeMatrix(matrix, out)
      val back = s.read.option("sep", "\t").option("header", "true")
        .schema(StructType(Seq(
          StructField("Symbol", StringType),
          StructField("PRJ_A.genes.results", StringType),
          StructField("PRJ_B.genes.results", StringType))))
        .csv(out)
      MatrixBuilder.unpivot(back, "Symbol")
        .select(col("Symbol").as("gene"),
          regexp_replace(col("sample"), "\\.genes\\.results$", "").as("sample"),
          col("value").as("tpm"))
        .orderBy(col("gene"), col("sample"))
    }),

    // ─── q36: S5 RSEM results scan — 7-col header files with CRLF endings
    //     (P13), sample/source from file name (F5/F6,
    //     `rsem-generate-data-matrix:16,72`). ───────────────────────────────────
    "q36_rsem_scan" -> ((s, dir) => {
      val d = fixDir("q36")
      // Locale.ROOT: a comma-decimal default locale would emit "3,50" and break
      // both the reader parse and the oracle hash
      def fmt(x: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
      val header = "gene_id\ttranscript_id(s)\tlength\teffective_length\texpected_count\tTPM\tFPKM"
      val byFile = nationRows(s, dir).groupBy { case (k, _, _) => k % 2 == 0 }
      val files = byFile.toSeq.sortBy(!_._1).map { case (even, rows) =>
        val name = if (even) "GSM_EVEN.genes.results" else "GSM_ODD.genes.results"
        val body = rows.map { case (k, nname, _) =>
          s"$nname\tNR_$k\t${k * 100 + 500}.00\t${k * 100 + 450}.50\t${k * 7}.00\t${fmt(k * 3.5 + 0.25)}\t${fmt(k * 2.5)}"
        }
        val f = d.resolve(name)
        Files.writeString(f, (header +: body).mkString("\r\n") + "\r\n")
        f.toString
      }
      TsvSources.readRsemResults(s, files)
        .select(col("gene_id"), col("transcript_ids").as("transcript_id"),
          col("TPM"), col("TPM_d"), col("expected_count_d"),
          col("sample"), col("source_file"))
        .orderBy(col("gene_id"))
    }),

    // ─── q37: C6 track-JSON assembly (`BWjson_v7.sh:119-164`) → S11 per-sample
    //     JSON sink → S7 glob scan with geneTPMbed exclusion
    //     (`make_jbrowse_session_for_bioproject.py:62-70`) → F4 escaping
    //     (embedded quote + tab round-trip), F11 URL templating, J4 Unknown. ───
    "q37_track_json_roundtrip" -> ((s, dir) => {
      val d = cleanDir(fixDir("q37").resolve("tracks"))
      val acc = t(s, dir, "nation").select(
        concat(lit("T"), col("n_regionkey")).as("Tissue"),
        col("n_name").as("Strain"),
        when(col("n_nationkey") % 2 === 0, "M").otherwise("F").as("Sex"),
        col("n_nationkey").cast("string").as("PMID"),
        concat(lit("https://geo/GSM"), col("n_nationkey")).as("GEOpath"),
        concat(lit("T_"), col("n_name")).as("Title"),
        concat(lit("note \""), col("n_name"), lit("\"\tage: "), col("n_nationkey"))
          .as("Sample_characteristics"),
        concat(lit("SI"), col("n_nationkey")).as("StrainInfo"),
        concat(lit("GSM"), col("n_nationkey")).as("geo_accession"),
        when(col("n_nationkey") % 3 === 0, lit(null).cast(StringType))
          .otherwise(lit("M")).as("ComputedSex"))
      val docs = graft.ops.AccListOps.withUniqueName(acc)
        .select(col("unique_name"), SessionBuilder.trackJson("PRJTEST").as("doc"))
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      docs.foreach { case (uname, doc) =>
        Files.writeString(d.resolve(s"RNAseq_$uname.json"), doc)
      }
      // S7 exclusion contract: a valid doc whose path contains geneTPMbed must
      // NOT appear in the scan (it would add a row and fail the count).
      Files.writeString(d.resolve("RNAseq_zz_geneTPMbed.json"), docs.head._2)
      TsvSources.readTrackJsons(s, s"$d/*.json")
        .select(
          col("trackId"),
          col("type").as("track_type"),
          col("metadata").getField("Sample Characteristic").as("sample_char"),
          col("metadata").getField("Computed Sex").as("computed_sex"),
          col("metadata").getField("RGD Metadata Report").as("rgd_url"),
          col("metadata").getField("Project Accession ID").as("project_acc"),
          col("metadata").getField("PubMed ID").as("pubmed"),
          col("adapter").getField("bigWigLocation").getField("uri").as("uri"))
        .orderBy(col("trackId"))
    }),

    // ─── q38: C6 session doc assembly + C5 first-seen palette (12 groups → tab10
    //     wraparound) + O6 path sort + F11 public URI + F12 viewport math
    //     (`make_jbrowse_session_for_bioproject.py:33-39,111-176,223-235`);
    //     C7: a malformed doc would fail the strict read-back parse. ───────────
    "q38_session_viewport" -> ((s, dir) => {
      val tracks = t(s, dir, "nation").select(
        concat(lit("RNAseq_GSM"), col("n_nationkey")).as("trackId"),
        concat(lit("grp_"), col("n_nationkey") % 12).as("combo_key"),
        format_string("/x/%03d", col("n_nationkey")).as("_path"))
      val json = SessionBuilder.buildSession(tracks, "PRJTEST", "20260101")
      val f = fixDir("q38").resolve("session.json")
      Files.writeString(f, json)
      val doc = s.read.option("multiLine", "true").json(f.toString)
      doc.select(
          col("session.name").as("session_name"),
          element_at(col("session.views"), 1).getField("bpPerPx").as("bp_per_px"),
          element_at(col("session.views"), 1).getField("offsetPx").as("offset_px"),
          explode(col("session.sessionTracks")).as("tr"))
        .select(
          col("session_name"), col("bp_per_px"), col("offset_px"),
          col("tr").getField("trackId").as("trackId"),
          col("tr").getField("adapter").getField("bigWigLocation").getField("uri").as("uri"),
          element_at(col("tr").getField("displays"), 1)
            .getField("renderer").getField("color1").as("color"))
        .orderBy(col("trackId"))
    }),

    // ─── q39: S2 project-list scan (CRLF + comment + readlen-default-150,
    //     `bulk_orchestrator_production_diskGuard.bash:220-231`) driving REAL
    //     ExternalStage runs — C1 memoize/retry/verify, F14 backoff waits,
    //     S14 spurious-exit-0 protocol (`SRA2QC_production.sh:152-159,227-247`). ─
    "q39_stage_protocol" -> ((s, dir) => {
      val root = fixDir("q39")
      val outs = cleanDir(root.resolve("outs"))
      val rows = nationRows(s, dir)
      val lines = "# graft q39 project list" +: rows.map { case (k, name, _) =>
        val rl = if (k % 3 == 0) "" else s" ${50 + k}"
        s"$root/acc_$name.txt $name$rl"
      }
      Files.writeString(root.resolve("projects.txt"), lines.mkString("\r\n") + "\r\n")
      val readLen = TsvSources.readProjectList(s, root.resolve("projects.txt").toString)
        .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
      val result = rows.map { case (k, name, _) =>
        val out = outs.resolve(s"$name.out")
        if (k % 5 == 0) Files.writeString(out, "done") // memoized: outputs pre-exist
        val wrongLayout = k % 5 != 0 && k % 11 == 1 // SE data in the PE pipeline
        val spurious = !wrongLayout && k % 5 != 0 && k % 7 == 3
        val failuresBeforeSuccess = (k % 3).toInt
        var calls = 0
        var waited = 0L
        val res = ExternalStage.run(
          ExternalStage.StageSpec(s"stage_$name", Seq("kernel", name), Seq(out.toString),
            maxAttempts = 3, wrongLayoutExit = Some(2)),
          exec = _ => {
            calls += 1
            if (wrongLayout) 2 // exit-2 protocol: single-end layout detected
            else if (spurious) 0 // exit 0 but never writes the output
            else if (calls <= failuresBeforeSuccess) 1
            else { Files.writeString(out, "ok"); 0 }
          },
          sleep = waited += _)
        val (status, attempts) = res match {
          case ExternalStage.Skipped              => ("SKIPPED", 0)
          case ExternalStage.Succeeded(a)         => ("COMPLETE", a)
          case ExternalStage.WrongLayout(a)       => ("WRONG_LAYOUT", a)
          case ExternalStage.Failed(a, 0, _)      => ("FAILED_SPURIOUS_EXIT0", a)
          case ExternalStage.Failed(a, _, _)      => ("FAILED", a)
        }
        (name, readLen(name), status, attempts, waited)
      }
      import s.implicits._
      result.toDF("project", "read_length", "status", "attempts", "waited_sec")
        .orderBy(col("project"))
    }),

    // ─── q56: P12 conflict-only filter — q14's report restricted to Conflict
    //     rows (`ConflictedSampleReport_v4.sh:94-102` commented-out variant). ──
    "q56_conflict_only" -> ((s, dir) => {
      val inSex = when(col("c_nationkey") % 2 === 0, "M").otherwise("F")
      val calcSex = when(col("c_acctbal") > 5000.0, "M").otherwise("F")
      val sexResult = t(s, dir, "customer").select(
        col("c_custkey").cast("string").as("SampleID"),
        inSex.as("InputSex"), calcSex.as("ComputedSex"),
        col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("string").as("Ratio"),
        when(inSex === calcSex, "Agree").otherwise("Conflict").as("Agreement"))
      val geneOf = Map("1-URGENT" -> "Xist", "2-HIGH" -> "Uty", "3-MEDIUM" -> "Sry",
        "4-NOT SPECIFIED" -> "Ddx3y", "5-LOW" -> "Kdm5d")
      val tpmLong = t(s, dir, "orders").select(
        col("o_custkey").cast("string").as("sample"),
        geneOf.foldLeft(lit(null).cast("string")) { case (acc, (p, g)) =>
          when(col("o_orderpriority") === p, g).otherwise(acc)
        }.as("gene"),
        col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("string").as("tpm"))
        .groupBy(col("sample"), col("gene")).agg(min(col("tpm")).as("tpm"))
      ConflictReport.build(sexResult, tpmLong, conflictsOnly = true)
        .orderBy(col("SampleID"))
    }),

    // ─── q57: A8 orchestrator outcomes — REAL runAll (threaded waves, resume
    //     markers, failure isolation; `bulk_orchestrator…:266-283,299-364`). ───
    "q57_orchestrator_outcomes" -> ((s, dir) => {
      val ps = nationRows(s, dir).map { case (k, name, _) =>
        Orchestrator.Project(name, s"/x/$name", 150, k,
          if (k % 6 == 5) "large" else "small")
      }
      val completed = ps.filter(_.sampleCount % 8 == 1).map(_.name).toSet
      val outcomes = Orchestrator.runAll(ps, completed,
        runProject = p => p.sampleCount % 4 != 2)
      import s.implicits._
      outcomes.map(o => (o.project, o.status))
        .toDF("project", "status")
        .orderBy(col("project"))
    }),

    // ─── q59: P11 input validation — BioProjectID charset + readlen digit
    //     checks as column predicates (`run_RNApipeline…diskGuard.bash:58-72`). ─
    "q59_input_validation" -> ((s, dir) => {
      val pl = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 3 === 0, regexp_replace(col("c_name"), "#", "_"))
          .otherwise(col("c_name")).as("project"), // '#' violates the charset
        when(col("c_custkey") % 4 === 0, "150")
          .when(col("c_custkey") % 4 === 1, "")
          .when(col("c_custkey") % 4 === 2, "15x")
          .otherwise("200").as("read_length"))
      graft.driver.InputValidation.flagProjectList(pl)
        .select(col("c_custkey"), col("project"), col("read_length"),
          col("valid"), col("reject_reason"))
        .orderBy(col("c_custkey"))
    }),

    // ─── q60: REAL image kernel — deterministic two-tone PNGs encoded with
    //     javax.imageio, decoded distributed (Multimodal.decodeImages); the
    //     oracle recomputes dims + exact channel means from the construction
    //     arithmetic (PNG is lossless, so decode must recover them exactly). ───
    "q60_image_decode" -> ((s, dir) => {
      val rows = nationRows(s, dir).map { case (k, _, _) =>
        val ki = k.toInt
        val w = 16 + ki % 9
        val h = 2 * (4 + ki % 5) // even → equal halves, closed-form means
        def rgb(r: Int, g: Int, b: Int) = (r << 16) | (g << 8) | b
        val top = rgb(ki * 3 % 256, ki * 5 % 256, ki * 7 % 256)
        val bot = rgb(ki * 11 % 256, ki * 13 % 256, ki * 17 % 256)
        (k, graft.operators.Multimodal.encodePng(w, h, top, bot))
      }
      import s.implicits._
      val media = graft.operators.Multimodal.asMediaFrame(
        rows.toDF("media_id", "payload"), "media_id", "payload", "image")
      graft.operators.Multimodal.decodeImages(media).toDF()
        .orderBy(col("media_id"))
    }),

    // ─── q61: REAL audio kernel — 16-bit PCM WAVs encoded with
    //     javax.sound.sampled, decoded distributed (Multimodal.decodeAudio);
    //     sample rate comes from the RIFF header parse, mean amplitude from the
    //     PCM payload — both recomputed by the oracle from the generator. ──────
    "q61_audio_decode" -> ((s, dir) => {
      val rows = nationRows(s, dir).map { case (k, _, _) =>
        val ki = k.toInt
        val n = 256 * (2 + ki % 4) // whole sawtooth periods → closed-form mean
        val samples = Array.tabulate(n)(i => (((i % 256) - 128) * (ki + 1)).toShort)
        (k, graft.operators.Multimodal.encodeWav(samples, 8000 + 100 * ki))
      }
      import s.implicits._
      val media = graft.operators.Multimodal.asMediaFrame(
        rows.toDF("media_id", "payload"), "media_id", "payload", "audio")
      graft.operators.Multimodal.decodeAudio(media).toDF()
        .orderBy(col("media_id"))
    }),

    // ─── q62: combined-project session — two projects' track docs merged,
    //     public links rewritten to the combined id (update_project_links,
    //     `make_jbrowse_session_for_combined_bioproject_v2.py:55-84,165`),
    //     Project Accession ID PRESERVED, first-seen palette across the merged
    //     path-sorted track list, combined download URIs; verified by strict
    //     parse-back of the written session doc. ────────────────────────────────
    "q62_combined_session" -> ((s, dir) => {
      val root = cleanDir(fixDir("q62"))
      def accFrame(even: Boolean) = t(s, dir, "nation")
        .filter(col("n_nationkey") % 2 === (if (even) 0 else 1))
        .select(
          concat(lit("T"), col("n_regionkey")).as("Tissue"),
          col("n_name").as("Strain"),
          when(col("n_nationkey") % 2 === 0, "M").otherwise("F").as("Sex"),
          col("n_nationkey").cast("string").as("PMID"),
          concat(lit("https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc=GSM"),
            col("n_nationkey"), lit("&db=geo")).as("GEOpath"),
          concat(lit("T_"), col("n_name")).as("Title"),
          concat(lit("sc "), col("n_name")).as("Sample_characteristics"),
          concat(lit("SI"), col("n_nationkey")).as("StrainInfo"),
          concat(lit("GSM"), col("n_nationkey")).as("geo_accession"),
          lit("M").as("ComputedSex"))
      Seq((true, "PRJ_A"), (false, "PRJ_B")).foreach { case (even, prj) =>
        val d = Files.createDirectories(root.resolve(prj))
        val docs = graft.ops.AccListOps.withUniqueName(accFrame(even))
          .select(col("unique_name"), SessionBuilder.trackJson(prj).as("doc"))
          .collect().map(r => (r.getString(0), r.getString(1)))
        docs.foreach { case (uname, doc) =>
          Files.writeString(d.resolve(s"RNAseq_$uname.json"), doc)
        }
        // S7 exclusion contract holds for the combined scan too
        Files.writeString(d.resolve("RNAseq_zz_geneTPMbed.json"), docs.head._2)
      }
      val tracks = TsvSources.readTrackJsons(s, s"$root/*/RNAseq_*.json")
      val json = SessionBuilder.buildCombinedSession(tracks, "GSE_COMB", "20260101")
      val f = root.resolve("combined_session.json")
      Files.writeString(f, json)
      val doc = s.read.option("multiLine", "true").json(f.toString)
      doc.select(explode(col("session.sessionTracks")).as("tr"))
        .select(
          col("tr").getField("trackId").as("trackId"),
          col("tr").getField("type").as("track_type"),
          col("tr").getField("metadata").getField("RGD Metadata Report").as("rgd_url"),
          col("tr").getField("metadata").getField("Project Repository Link").as("repo_url"),
          col("tr").getField("metadata").getField("Project Accession ID").as("project_acc"),
          col("tr").getField("adapter").getField("bigWigLocation").getField("uri").as("uri"),
          element_at(col("tr").getField("displays"), 1)
            .getField("renderer").getField("color1").as("color"))
        .orderBy(col("trackId"))
    }),

    // ─── q63: S16 MultiQC-lite — FastQC summary.txt fixtures (CRLF, the q36
    //     pattern) scanned into (sample, module, status) triples and pivoted to
    //     the per-project sample × module QC matrix
    //     (`run_SRA2QC_diskGuard.bash:159-165`). ────────────────────────────────
    "q63_qc_summary" -> ((s, dir) => {
      val root = cleanDir(fixDir("q63"))
      val modules = Seq("Basic Statistics", "Per base sequence quality",
        "Per sequence GC content", "Overrepresented sequences", "Adapter Content")
      nationRows(s, dir).foreach { case (k, name, _) =>
        val d = Files.createDirectories(root.resolve(s"${name}_fastqc"))
        val lines = modules.zipWithIndex.map { case (m, j) =>
          val st = (k + j) % 4 match { case 0 => "FAIL"; case 1 => "WARN"; case _ => "PASS" }
          s"$st\t$m\t$name.fastq.gz"
        }
        Files.writeString(d.resolve("summary.txt"), lines.mkString("\r\n") + "\r\n")
        if (k % 5 == 0) { // paired-end R2 report: duplicate (sample, module) row;
          // worst status must win (WARN may not be shadowed by a PASS)
          val d2 = Files.createDirectories(root.resolve(s"${name}_rep2_fastqc"))
          Files.writeString(d2.resolve("summary.txt"),
            s"WARN\tBasic Statistics\t$name.fastq.gz\r\n")
        }
      }
      val qc = TsvSources.readQcSummaries(s, s"$root/*_fastqc/summary.txt")
      graft.ops.QcSummary.pivotStatuses(qc, modules)
        .select(col("sample"),
          col("Basic Statistics").as("basic_statistics"),
          col("Per base sequence quality").as("per_base_sequence_quality"),
          col("Per sequence GC content").as("per_sequence_gc_content"),
          col("Overrepresented sequences").as("overrepresented_sequences"),
          col("Adapter Content").as("adapter_content"))
        .orderBy(col("sample"))
    }),

    // ─── q70: REAL multi-frame demux — animated GIFs built with the JDK's
    //     sequence writer, demuxed + frame-sampled distributed
    //     (Multimodal.sampleGifFrames); the oracle regenerates every sampled
    //     frame's index and exact channel means from the construction
    //     arithmetic (solid colors survive the GIF palette losslessly). ────────
    "q70_video_frames" -> ((s, dir) => {
      val rows = nationRows(s, dir).map { case (k, _, _) =>
        val ki = k.toInt
        val n = 2 + ki % 4
        val frames = (0 until n).map(f =>
          (((ki * 7 + f * 31) % 256) << 16) | (((ki * 11 + f * 37) % 256) << 8) |
            ((ki * 13 + f * 41) % 256))
        (k, graft.operators.Multimodal.encodeGif(frames, 8 + ki % 5, 6))
      }
      import s.implicits._
      val media = graft.operators.Multimodal.asMediaFrame(
        rows.toDF("media_id", "payload"), "media_id", "payload", "video")
      graft.operators.Multimodal.sampleGifFrames(media, every = 2).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // ─── q58: S12 BED sink round-trip — tab-joined, unquoted, position-sorted
    //     (`GeneTPMbed_v2.sh:49,93-99,124`); read back through the S6 BED scan. ─
    "q58_bed_roundtrip" -> ((s, dir) => {
      val bed = t(s, dir, "nation").select(
        concat(lit("chr"), col("n_nationkey") % 3 + 1).as("chrom"),
        (col("n_nationkey").cast("long") * 1000L).as("start"),
        (col("n_nationkey").cast("long") * 1000L + 500L).as("end"),
        col("n_name").as("name"))
        .orderBy(col("chrom"), col("start"))
      val out = s"${fixDir("q58")}/regions.bed"
      Sinks.writeBed(bed, out)
      TsvSources.readBed(s, out).orderBy(col("chrom"), col("start"))
    }),

    // ─── q103: JSONL sink round-trip — the training-data interchange format.
    //     Text carries quote/tab/newline to prove the writer's JSON escaping;
    //     the reader parses back with an explicit schema; the oracle recomputes
    //     the same rows from the nation parquet (never reads the fixture). ───
    "q103_jsonl_roundtrip" -> ((s, dir) => {
      val rows = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("doc_id"),
          concat(col("n_name"), lit(" \"quoted\"\ttabbed\nnewline")).as("text"),
          (col("n_nationkey").cast("double") / lit(8.0)).as("score"))
        .orderBy(col("doc_id"))
      val out = s"${fixDir("q103")}/docs.jsonl"
      Sinks.writeJsonl(rows, out)
      s.read.schema("doc_id BIGINT, text STRING, score DOUBLE").json(out)
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q34_report_roundtrip" ->
      """SELECT n_name AS SampleID,
        | CAST(n_nationkey*1000 + 37 AS BIGINT) AS input_reads,
        | CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE r_name END AS region_name,
        | printf('%.2f', n_nationkey/4.0) AS rate_str
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY SampleID""".stripMargin,
    "q35_matrix_roundtrip" ->
      """WITH src(sample, m, a) AS (VALUES ('PRJ_A', 1.25, 0.0), ('PRJ_B', 2.5, 0.75))
        |SELECT n_name AS gene, src.sample AS sample,
        | printf('%.2f', n_nationkey*m + a) AS tpm
        |FROM nation CROSS JOIN src ORDER BY gene, sample""".stripMargin,
    "q36_rsem_scan" ->
      """SELECT n_name AS gene_id, 'NR_' || n_nationkey AS transcript_id,
        | printf('%.2f', n_nationkey*3.5 + 0.25) AS TPM,
        | CAST(n_nationkey*3.5 + 0.25 AS DOUBLE) AS TPM_d,
        | CAST(n_nationkey*7 AS DOUBLE) AS expected_count_d,
        | CASE WHEN n_nationkey % 2 = 0 THEN 'GSM_EVEN' ELSE 'GSM_ODD' END AS sample,
        | CASE WHEN n_nationkey % 2 = 0 THEN 'GSM_EVEN.genes.results'
        |      ELSE 'GSM_ODD.genes.results' END AS source_file
        |FROM nation ORDER BY gene_id""".stripMargin,
    "q37_track_json_roundtrip" ->
      """WITH a AS (SELECT n_nationkey AS k, n_name, n_regionkey,
        |  'T' || n_regionkey || '_' || n_name || '_' ||
        |    (CASE WHEN n_nationkey % 2 = 0 THEN 'M' ELSE 'F' END) ||
        |    '_GSM' || n_nationkey AS uname
        |  FROM nation)
        |SELECT 'RNAseq_' || uname AS trackId,
        | 'FeatureTrack' AS track_type,
        | 'note "' || n_name || '"' || chr(9) || 'age: ' || k AS sample_char,
        | CASE WHEN k % 3 = 0 THEN 'Unknown' ELSE 'M' END AS computed_sex,
        | 'https://rgd.mcw.edu/rgdweb/report/expressionStudy/main.html?geoAcc=PRJTEST' AS rgd_url,
        | 'PRJTEST' AS project_acc,
        | 'PMID:' || k AS pubmed,
        | 'RNAseq_' || uname || '.bigwig' AS uri
        |FROM a ORDER BY trackId""".stripMargin,
    "q38_session_viewport" ->
      """WITH c AS (SELECT n_nationkey AS k, 'RNAseq_GSM' || n_nationkey AS trackId,
        |  CASE CAST((n_nationkey % 12) % 10 AS INT)
        |    WHEN 0 THEN '#1f77b4' WHEN 1 THEN '#ff7f0e' WHEN 2 THEN '#2ca02c'
        |    WHEN 3 THEN '#d62728' WHEN 4 THEN '#9467bd' WHEN 5 THEN '#8c564b'
        |    WHEN 6 THEN '#e377c2' WHEN 7 THEN '#7f7f7f' WHEN 8 THEN '#bcbd22'
        |    ELSE '#17becf' END AS color
        |  FROM nation)
        |SELECT 'PRJTEST_RNAseq_expression' AS session_name,
        | GREATEST(1.0, (14497135 - 12315273 + 1)/2000.0) AS bp_per_px,
        | (12315273 - 1)/GREATEST(1.0, (14497135 - 12315273 + 1)/2000.0) AS offset_px,
        | trackId,
        | 'https://download.rgd.mcw.edu/expression/PRJTEST/Genome-wide_read_coverage_BigWig_files/'
        |   || trackId || '.bigwig' AS uri,
        | color
        |FROM c ORDER BY trackId""".stripMargin,
    "q39_stage_protocol" ->
      """SELECT n_name AS project,
        | CAST(CASE WHEN n_nationkey % 3 = 0 THEN 150 ELSE 50 + n_nationkey END AS INT) AS read_length,
        | CASE WHEN n_nationkey % 5 = 0 THEN 'SKIPPED'
        |      WHEN n_nationkey % 11 = 1 THEN 'WRONG_LAYOUT'
        |      WHEN n_nationkey % 7 = 3 THEN 'FAILED_SPURIOUS_EXIT0'
        |      ELSE 'COMPLETE' END AS status,
        | CAST(CASE WHEN n_nationkey % 5 = 0 THEN 0
        |      WHEN n_nationkey % 11 = 1 THEN 1
        |      WHEN n_nationkey % 7 = 3 THEN 3
        |      ELSE n_nationkey % 3 + 1 END AS INT) AS attempts,
        | CAST(CASE WHEN n_nationkey % 5 = 0 THEN 0
        |      WHEN n_nationkey % 11 = 1 THEN 0
        |      WHEN n_nationkey % 7 = 3 THEN 720
        |      WHEN n_nationkey % 3 = 0 THEN 0
        |      WHEN n_nationkey % 3 = 1 THEN 240
        |      ELSE 720 END AS BIGINT) AS waited_sec
        |FROM nation ORDER BY project""".stripMargin,
    "q56_conflict_only" ->
      """WITH sex AS (SELECT CAST(c_custkey AS VARCHAR) AS SampleID,
        |  CASE WHEN c_nationkey % 2 = 0 THEN 'M' ELSE 'F' END AS InputSex,
        |  CASE WHEN c_acctbal > 5000.0 THEN 'M' ELSE 'F' END AS ComputedSex,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS XYRatio,
        |  CASE WHEN (CASE WHEN c_nationkey % 2 = 0 THEN 'M' ELSE 'F' END) = (CASE WHEN c_acctbal > 5000.0 THEN 'M' ELSE 'F' END) THEN 'Agree' ELSE 'Conflict' END AS Agreement
        |  FROM customer),
        |tl AS (SELECT CAST(o_custkey AS VARCHAR) AS sample,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 'Xist' WHEN '2-HIGH' THEN 'Uty' WHEN '3-MEDIUM' THEN 'Sry' WHEN '4-NOT SPECIFIED' THEN 'Ddx3y' WHEN '5-LOW' THEN 'Kdm5d' END AS gene,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS tpm FROM orders),
        |g AS (SELECT sample, gene, MIN(tpm) AS tpm FROM tl GROUP BY 1,2),
        |p AS (SELECT sample,
        |  MIN(CASE WHEN gene='Xist' THEN tpm END) AS Xist,
        |  MIN(CASE WHEN gene='Uty' THEN tpm END) AS Uty,
        |  MIN(CASE WHEN gene='Sry' THEN tpm END) AS Sry,
        |  MIN(CASE WHEN gene='Ddx3y' THEN tpm END) AS Ddx3y,
        |  MIN(CASE WHEN gene='Kdm5d' THEN tpm END) AS Kdm5d,
        |  CAST(NULL AS VARCHAR) AS Eif2s3y
        |  FROM g GROUP BY sample)
        |SELECT sex.SampleID, sex.InputSex, sex.ComputedSex, sex.XYRatio, sex.Agreement,
        |  p.Xist, p.Uty, p.Sry, p.Ddx3y, p.Kdm5d, p.Eif2s3y
        |FROM sex JOIN p ON sex.SampleID = p.sample
        |WHERE sex.Agreement = 'Conflict'
        |ORDER BY sex.SampleID""".stripMargin,
    "q57_orchestrator_outcomes" ->
      """SELECT n_name AS project,
        | CASE WHEN n_nationkey % 8 = 1 THEN 'SKIPPED'
        |      WHEN n_nationkey % 4 = 2 THEN 'FAILED'
        |      ELSE 'COMPLETE' END AS status
        |FROM nation ORDER BY project""".stripMargin,
    "q59_input_validation" ->
      """WITH pl AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', '_') ELSE c_name END AS project,
        |  CASE WHEN c_custkey % 4 = 0 THEN '150' WHEN c_custkey % 4 = 1 THEN ''
        |       WHEN c_custkey % 4 = 2 THEN '15x' ELSE '200' END AS read_length
        |  FROM customer)
        |SELECT c_custkey, project, read_length,
        | (regexp_matches(project, '^[a-zA-Z0-9_-]+$') AND regexp_matches(read_length, '^[0-9]+$')) AS valid,
        | CASE WHEN NOT regexp_matches(project, '^[a-zA-Z0-9_-]+$') THEN 'invalid_project_id'
        |      WHEN NOT regexp_matches(read_length, '^[0-9]+$') THEN 'invalid_read_length' END AS reject_reason
        |FROM pl ORDER BY c_custkey""".stripMargin,
    "q63_qc_summary" ->
      """SELECT n_name AS sample,
        | CASE WHEN n_nationkey % 5 = 0 THEN
        |   (CASE WHEN n_nationkey % 4 = 0 THEN 'FAIL' ELSE 'WARN' END)
        | ELSE CASE (n_nationkey + 0) % 4 WHEN 0 THEN 'FAIL' WHEN 1 THEN 'WARN' ELSE 'PASS' END
        | END AS basic_statistics,
        | CASE (n_nationkey + 1) % 4 WHEN 0 THEN 'FAIL' WHEN 1 THEN 'WARN' ELSE 'PASS' END AS per_base_sequence_quality,
        | CASE (n_nationkey + 2) % 4 WHEN 0 THEN 'FAIL' WHEN 1 THEN 'WARN' ELSE 'PASS' END AS per_sequence_gc_content,
        | CASE (n_nationkey + 3) % 4 WHEN 0 THEN 'FAIL' WHEN 1 THEN 'WARN' ELSE 'PASS' END AS overrepresented_sequences,
        | CASE (n_nationkey + 4) % 4 WHEN 0 THEN 'FAIL' WHEN 1 THEN 'WARN' ELSE 'PASS' END AS adapter_content
        |FROM nation ORDER BY sample""".stripMargin,
    "q62_combined_session" ->
      """WITH a AS (SELECT n_nationkey AS k, n_name, n_regionkey,
        |  CASE WHEN n_nationkey % 2 = 0 THEN 'PRJ_A' ELSE 'PRJ_B' END AS prj,
        |  'T' || n_regionkey || '_' || n_name || '_' ||
        |    (CASE WHEN n_nationkey % 2 = 0 THEN 'M' ELSE 'F' END) ||
        |    '_GSM' || n_nationkey AS uname
        |  FROM nation),
        |t AS (SELECT k, prj, 'RNAseq_' || uname AS trackId,
        |  CASE WHEN prj = 'PRJ_A' THEN 0 ELSE 1 END AS dir_ord FROM a),
        |c AS (SELECT *, row_number() OVER (ORDER BY dir_ord, trackId) - 1 AS rnk FROM t)
        |SELECT trackId,
        | 'QuantitativeTrack' AS track_type,
        | 'https://rgd.mcw.edu/rgdweb/report/expressionStudy/main.html?geoAcc=GSE_COMB' AS rgd_url,
        | 'https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc=GSE_COMB&db=geo' AS repo_url,
        | prj AS project_acc,
        | 'https://download.rgd.mcw.edu/expression/GSE_COMB/Genome-wide_read_coverage_BigWig_files/'
        |   || trackId || '.bigwig' AS uri,
        | CASE CAST(rnk % 10 AS INT)
        |   WHEN 0 THEN '#1f77b4' WHEN 1 THEN '#ff7f0e' WHEN 2 THEN '#2ca02c'
        |   WHEN 3 THEN '#d62728' WHEN 4 THEN '#9467bd' WHEN 5 THEN '#8c564b'
        |   WHEN 6 THEN '#e377c2' WHEN 7 THEN '#7f7f7f' WHEN 8 THEN '#bcbd22'
        |   ELSE '#17becf' END AS color
        |FROM c ORDER BY trackId""".stripMargin,
    "q60_image_decode" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS media_id,
        | CAST(16 + n_nationkey % 9 AS INT) AS width,
        | CAST(2 * (4 + n_nationkey % 5) AS INT) AS height,
        | CAST(n_nationkey*3 % 256 + n_nationkey*11 % 256 AS DOUBLE)/2.0 AS mean_r,
        | CAST(n_nationkey*5 % 256 + n_nationkey*13 % 256 AS DOUBLE)/2.0 AS mean_g,
        | CAST(n_nationkey*7 % 256 + n_nationkey*17 % 256 AS DOUBLE)/2.0 AS mean_b
        |FROM nation ORDER BY media_id""".stripMargin,
    "q70_video_frames" ->
      """WITH f AS (SELECT n_nationkey AS k, unnest(range(0, 2 + n_nationkey % 4, 2)) AS frame_idx
        |  FROM nation)
        |SELECT CAST(k AS BIGINT) AS media_id,
        | CAST(frame_idx AS INT) AS frame_idx,
        | CAST(8 + k % 5 AS INT) AS width,
        | 6 AS height,
        | CAST((k*7 + frame_idx*31) % 256 AS DOUBLE) AS mean_r,
        | CAST((k*11 + frame_idx*37) % 256 AS DOUBLE) AS mean_g,
        | CAST((k*13 + frame_idx*41) % 256 AS DOUBLE) AS mean_b
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "q61_audio_decode" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS media_id,
        | CAST(8000 + 100*n_nationkey AS INT) AS sample_rate,
        | CAST(256*(2 + n_nationkey % 4) AS BIGINT) AS n_frames,
        | -CAST(n_nationkey + 1 AS DOUBLE)/2.0 AS mean_amp
        |FROM nation ORDER BY media_id""".stripMargin,
    "q103_jsonl_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS doc_id,
        | n_name || ' "quoted"' || chr(9) || 'tabbed' || chr(10) || 'newline' AS text,
        | CAST(n_nationkey AS DOUBLE) / 8.0 AS score
        |FROM nation ORDER BY doc_id""".stripMargin,
    "q58_bed_roundtrip" ->
      """SELECT 'chr' || (n_nationkey % 3 + 1) AS chrom,
        | CAST(n_nationkey*1000 AS BIGINT) AS start,
        | CAST(n_nationkey*1000 + 500 AS BIGINT) AS "end",
        | n_name AS name
        |FROM nation ORDER BY chrom, start""".stripMargin
  )
}
