package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.DedupSuite
import org.apache.spark.sql.functions._

/** The SQL surface is one code path with the Column API ([[SqlFunctions]]
  * bridges the same builders), so the contract here is equality: for every
  * function family, the `spark.sql(...)` result must match the Column-API
  * result row for row on the same frame. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    SqlFunctions.registerAll(spark)
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog and the cat", "src0",
        "HTTP://WWW.Example.COM:80/page/1/?utm_source=x&q=2#frag"),
      (2L, "the quick brown fox jumps over the lazy dog and the cat", "src0",
        "http://example.com/page/1?q=2"),
      (3L, "le renard brun rapide saute par dessus le chien paresseux", "src1",
        "https://cdn.sub.example.org/a"),
      (4L, "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb", "src1",
        "http://example2.net:8080/b/"),
      (5L, "reach me at bob@example.com or 555-123-4567 today", "src2",
        "http://example.net/c"))
      .toDF("id", "text", "source", "url")
      .createOrReplaceTempView("docs")
  }

  private def df = spark.table("docs")

  test("scalar text/url functions: SQL ≡ Column API") {
    val sql = spark.sql(
      """SELECT id,
        |  graft_token_count(text) AS tc,
        |  graft_quality_score(text) AS q,
        |  graft_lang_id_en(text) AS en,
        |  graft_lang_id(text) AS lang,
        |  graft_fingerprint_md5(text) AS fp,
        |  graft_rolling_token_hash(text) AS rh,
        |  graft_redact_pii(text) AS red,
        |  graft_url_host(url) AS host,
        |  graft_registrable_domain(graft_url_host(url)) AS dom,
        |  graft_canonical_url(url) AS curl,
        |  graft_hash_bucket(CAST(id AS STRING), 10) AS hb
        |FROM docs ORDER BY id""".stripMargin).collect()
    val api = df.select(col("id"),
      TextFunctions.tokenCount(col("text")).as("tc"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langIdEn(col("text")).as("en"),
      TextFunctions.langIdMulti(TextFunctions.tokens(col("text"))).as("lang"),
      TextFunctions.fingerprintMd5(col("text")).as("fp"),
      TextFunctions.rollingTokenHash(col("text")).as("rh"),
      TextFunctions.redactPii(col("text")).as("red"),
      TextFunctions.urlHost(col("url")).as("host"),
      TextFunctions.registrableDomain(TextFunctions.urlHost(col("url"))).as("dom"),
      TextFunctions.canonicalUrl(col("url")).as("curl"),
      TextFunctions.hashBucket(col("id").cast("string"), 10).as("hb"))
      .orderBy(col("id")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("graft_lang_id_en accepts a bare decimal threshold (SQL parses 0.05 as DECIMAL)") {
    val sql = spark.sql(
      """SELECT id, graft_lang_id_en(text, 0.05) AS en05,
        |  graft_lang_id_en(text, 0.05D) AS en05d,
        |  graft_lang_id_en(text, 0) AS en0
        |FROM docs ORDER BY id""".stripMargin).collect()
    val api = df.select(col("id"),
      TextFunctions.langIdEn(col("text"), 0.05).as("en05"),
      TextFunctions.langIdEn(col("text"), 0.05).as("en05d"),
      TextFunctions.langIdEn(col("text"), 0.0).as("en0"))
      .orderBy(col("id")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("dedup signatures: SQL ≡ Column API (minhash, bands, simhash, shingles)") {
    val sql = spark.sql(
      """SELECT id,
        |  graft_word_shingles(text, 3) AS sh,
        |  graft_minhash(text, 2, 8) AS mh,
        |  graft_lsh_bands(graft_minhash(text, 2, 8), 8, 4) AS bands,
        |  graft_simhash(text) AS sim16,
        |  graft_simhash(text, 8) AS sim8
        |FROM docs ORDER BY id""".stripMargin).collect()
    val mh = DedupSuite.minHashSignature(TextFunctions.wordShingles(col("text"), 2), 8)
    val api = df.select(col("id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"),
      mh.as("mh"),
      DedupSuite.lshBands(mh, 8, 4).as("bands"),
      DedupSuite.simHash(col("text")).as("sim16"),
      DedupSuite.simHash(col("text"), 8).as("sim8"))
      .orderBy(col("id")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("table functions: FROM-clause pair generators ≡ Scala API") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("id_a"), col("id_b")).collect().toSeq
    val sqlJ = rows(spark.sql(
      "SELECT * FROM graft_jaccard_pairs('docs', 'id', 'text', 'source', 2, 0.5)"))
    val apiJ = rows(DedupSuite.ngramJaccardPairs(df, "id", "text", "source",
      n = 2, threshold = 0.5))
    assert(sqlJ == apiJ && apiJ.nonEmpty)
    val sqlC = rows(spark.sql(
      "SELECT * FROM graft_containment_pairs('docs', 'id', 'text', 'source', 2, 0.5)"))
    val apiC = rows(DedupSuite.ngramContainmentPairs(df, "id", "text", "source",
      n = 2, threshold = 0.5))
    assert(sqlC == apiC)
    val sqlM = rows(spark.sql(
      "SELECT * FROM graft_minhash_pairs('docs', 'id', 'text', 2, 8, 4)"))
    val apiM = rows(DedupSuite.minHashLshPairs(df, "id", "text",
      shingleSize = 2, numHashes = 8, bands = 4))
    assert(sqlM == apiM)
    // TVF output composes like any relation: aggregate over it in the same query
    val n = spark.sql(
      """SELECT count(*) AS n
        |FROM graft_jaccard_pairs('docs', 'id', 'text', 'source', 2, 0.5)
        |WHERE jaccard >= 0.5""".stripMargin).head().getLong(0)
    assert(n == apiJ.size.toLong)
    // non-literal table name is a clear error, not a silent empty relation
    val err = intercept[Exception](
      spark.sql("SELECT * FROM graft_jaccard_pairs(id, 'id', 'text', 'source', 2, 0.5)"))
    assert(err.getMessage.contains("STRING literal") ||
      err.getMessage.toLowerCase.contains("unresolved"))
  }

  test("graft_group_topk TVF ≡ Scala GroupTopK API (multi-col specs, bad spec errors)") {
    val scored = df.select(col("source"), col("id"),
      length(col("text")).cast("double").as("score"))
    scored.createOrReplaceTempView("scored_docs")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(col("source"), col("id")).collect().toSeq
    val viaSql = rows(spark.sql(
      "SELECT * FROM graft_group_topk('scored_docs', 'source', 'score desc, id asc', 2)"))
    val viaApi = rows(graft.plans.GroupTopK.topK(scored,
      Seq("source"), Seq("score" -> false, "id" -> true), k = 2))
    assert(viaSql == viaApi && viaApi.nonEmpty)
    // bare column defaults to ascending
    val ascSql = rows(spark.sql(
      "SELECT * FROM graft_group_topk('scored_docs', 'source', 'id', 1)"))
    val ascApi = rows(graft.plans.GroupTopK.topK(scored,
      Seq("source"), Seq("id" -> true), k = 1))
    assert(ascSql == ascApi)
    val bad = intercept[Exception](spark.sql(
      "SELECT * FROM graft_group_topk('scored_docs', 'source', 'score sideways', 2)"))
    assert(bad.getMessage.contains("asc|desc"))
  }

  test("sketch aggregates group-wise: SQL ≡ Column API") {
    val sql = spark.sql(
      """SELECT source,
        |  graft_kmv_sketch(xxhash64(text), 4) AS kmv,
        |  misra_gries(source, 2) AS mg
        |FROM docs GROUP BY source ORDER BY source""".stripMargin).collect()
    val api = df.groupBy(col("source"))
      .agg(KmvSketch.kmvMinima(xxhash64(col("text")), 4).as("kmv"),
        MisraGries.misraGries(col("source"), 2).as("mg"))
      .orderBy(col("source")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("bloom agg + membership round-trips through SQL") {
    val hits = spark.sql(
      """WITH bf AS (SELECT graft_bloom_agg(xxhash64(text), 1024, 3) AS b FROM docs)
        |SELECT count(*) AS n FROM docs, bf
        |WHERE bloom_might_contain(bf.b, xxhash64(docs.text))""".stripMargin)
      .head().getLong(0)
    assert(hits == 5L) // no false negatives over the build set itself
  }

  test("vector functions: SQL ≡ Column API") {
    Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f), Array(0.0f, 0.0f, 2.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql(
      "SELECT id, vec_dot(a, b) AS d, graft_cosine(a, b) AS c FROM vecs ORDER BY id")
      .collect()
    val api = spark.table("vecs").select(col("id"),
      NativeVec.dot(col("a"), col("b")).as("d"),
      NativeVec.cosine(col("a"), col("b")).as("c"))
      .orderBy(col("id")).collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("graft_pq_encode TVF ≡ Scala ProductQuantization API, literal geometry enforced") {
    import graft.operators.ProductQuantization
    val vecs = (0 until 12).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.7 + d).toFloat).toArray)
    }.toDF("vid", "v")
    vecs.createOrReplaceTempView("pq_vecs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_pq_encode('pq_vecs', 'vid', 'v', 4, 3)")
      .orderBy(col("vid"), col("sub")).collect().toSeq
    val cb = ProductQuantization.seedCodebooks(vecs, "v", "vid", 4, 3)
    val viaApi = ProductQuantization.encode(vecs, "v", cb)
      .select(col("vid"), posexplode(col("pq_codes")).as(Seq("sub", "code")))
      .select(col("vid"), col("sub").cast("long").as("sub"),
        col("code").cast("long").as("code"))
      .orderBy(col("vid"), col("sub")).collect().toSeq
    assert(viaSql == viaApi && viaApi.size == 48)
    // a non-integer literal must hit the builder's guard (a bare column name
    // dies earlier, at identifier resolution — TVF args are not a row scope)
    val bad = intercept[Exception](spark.sql(
      "SELECT * FROM graft_pq_encode('pq_vecs', 'vid', 'v', 'four', 3)").collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(bad).exists(_.contains("must be an INTEGER literal")), bad.toString)
  }

  test("graft_knn_graph_sdc TVF ≡ Scala knnGraphSdc full graph") {
    import graft.operators.ProductQuantization
    val vecs = (0 until 12).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 0.7 + d).toFloat).toArray)
    }.toDF("vid", "v")
    vecs.createOrReplaceTempView("pq_vecs")
    val viaSql = spark.sql(
      "SELECT * FROM graft_knn_graph_sdc('pq_vecs', 'vid', 'v', 4, 3, 3)")
      .orderBy(col("query_id"), col("sdc_dist"), col("vid")).collect().toSeq
    val cb = ProductQuantization.seedCodebooks(vecs, "v", "vid", 4, 3)
    val enc = ProductQuantization.encode(vecs, "v", cb)
      .select(col("vid"),
        ProductQuantization.packCodes(col("pq_codes"), 4, 3).as("packed"),
        lit(0).as("_cell"))
    val viaApi = ProductQuantization.knnGraphSdc(enc, enc, "vid", "packed",
        "_cell", Seq(Seq(0.0)), cb, nprobe = 1, k = 3)
      .orderBy(col("query_id"), col("sdc_dist"), col("vid")).collect().toSeq
    assert(viaSql == viaApi && viaApi.size == 36)
  }

  test("layout functions: SQL ≡ Column API, variadic dims, literal bit width enforced") {
    import graft.operators.Layout
    Seq((1L, 5L, 3L, 7L), (2L, 1023L, 0L, 4L), (3L, 2000L, -4L, 1L))
      .toDF("id", "x", "y", "w").createOrReplaceTempView("zdims")
    val sql = spark.sql(
      """SELECT id, graft_zbucket(x, 10) AS bx,
        |  graft_zvalue(graft_zbucket(x, 10), graft_zbucket(y, 10), 10) AS z2,
        |  graft_zvalue(graft_zbucket(x, 4), graft_zbucket(y, 4), graft_zbucket(w, 4), 4) AS z3
        |FROM zdims ORDER BY id""".stripMargin).collect()
    val api = spark.table("zdims").select(col("id"),
      Layout.bucket(col("x"), 10).as("bx"),
      Layout.zValue(Seq(Layout.bucket(col("x"), 10), Layout.bucket(col("y"), 10)), 10).as("z2"),
      Layout.zValue(Seq(Layout.bucket(col("x"), 4), Layout.bucket(col("y"), 4),
        Layout.bucket(col("w"), 4)), 4).as("z3"))
      .orderBy(col("id")).collect()
    assert(sql.toSeq == api.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zvalue(x, y, id) FROM zdims").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must be an INTEGER literal")), e.toString)
  }

  test("sketch parameters demand integer literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_kmv_sketch(xxhash64(text), id) FROM docs").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must be an INTEGER literal")), e.toString)
  }

  test("graft_html_text: SQL surface equals the Column API on markup") {
    import org.apache.spark.sql.functions.col
    Seq((1L, "<p>a &amp; b.</p><script>x()</script><div>two here.</div>"))
      .toDF("id", "h").createOrReplaceTempView("html_docs")
    val viaSql = spark.sql("SELECT graft_html_text(h) FROM html_docs")
      .collect()(0).getString(0)
    val viaApi = spark.table("html_docs")
      .select(graft.operators.HtmlExtract.htmlToText(col("h")))
      .collect()(0).getString(0)
    assert(viaSql == viaApi && viaSql == "a & b.\ntwo here.\n")
  }

  test("registry names are distinct and registered") {
    val names = SqlFunctions.registry.map(_._1)
    assert(names.distinct.size == names.size)
    names.foreach { n =>
      assert(spark.catalog.functionExists(n), s"function $n not registered")
    }
  }
}
