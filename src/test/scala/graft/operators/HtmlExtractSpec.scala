package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): (String, Long) = {
    val out = HtmlExtract.extract(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html").collect()(0)
    (out.getString(1), out.getLong(2))
  }

  test("script/style content vanishes WITH the tags; comments hide their tags") {
    val (text, n) = extractOne(
      "<style>.x{color:red}</style><script>if(1<2){beep();}</script>" +
        "<!-- secret <b>tags</b> inside --><p>real visible content stays here.</p>")
    assert(text === "real visible content stays here.")
    assert(n === 1L)
    assert(!text.contains("color") && !text.contains("beep") && !text.contains("secret"))
  }

  test("block closers and <br> become line boundaries; inline tags do not") {
    val raw = HtmlExtract.htmlToText(lit(
      "<p>one <b>bold</b> line.</p><div>two here now.</div>three<br/>four"))
    val got = Seq(1).toDF("x").select(raw.as("t")).collect()(0).getString(0)
    assert(got === "one bold line.\ntwo here now.\nthree\nfour")
  }

  test("entities decode AFTER tag stripping, &amp; last — no double decode") {
    val (text, _) = extractOne(
      "<p>a &lt;b&gt; c &quot;d&quot; &#39;e&#39;&nbsp;and &amp;lt; stays encoded.</p>")
    // literal <b> survives as text because tags were already stripped;
    // &amp;lt; decodes to the four characters &lt; — NOT to '<'
    assert(text === "a <b> c \"d\" 'e' and &lt; stays encoded.")
  }

  test("numeric character references: decimal/hex/leading-zero forms decode, table is bounded") {
    val (text, _) = extractOne(
      "<p>It&#8217;s &#8220;curly&#8221; an em&#8212;dash &#x2026; now " +
        "&#169;&#174;&#8482; and&#0160;leading zeros too.</p>")
    assert(text === "It’s “curly” an em—dash … now ©®™ and leading zeros too.")
    // hex forms, either case, decode to the same characters
    val (hexText, _) = extractOne(
      "<p>hex quotes &#x201C;work&#X201d; and dashes &#x2013;&#x2014; do too.</p>")
    assert(hexText === "hex quotes “work” and dashes –— do too.")
    // the & family decodes LAST even in numeric form: &#038;lt; -> literal &lt;
    val (ampText, _) = extractOne("<p>one &#038;lt; two &#x26;gt; three stay.</p>")
    assert(ampText === "one &lt; two &gt; three stay.")
    // references OUTSIDE the curated table survive as literal text (the
    // decode is a bounded regex chain, not a chr() evaluator — documented)
    val (alien, _) = extractOne("<p>unknown ref &#1234; stays put here.</p>")
    assert(alien === "unknown ref &#1234; stays put here.")
  }

  test("C4 line rules: min words, terminal punctuation, banned fragments") {
    val html =
      "<p>this line is kept for sure.</p>" +
        "<p>no punct so dropped</p>" +
        "<p>ok.</p>" + // 1 word → dropped
        "<p>please enable JavaScript to continue.</p>" + // banned (case-folded)
        "<p>braces { are code artifacts here.</p>" + // banned fragment
        "<p>lorem ipsum dolor sit amet.</p>" + // banned fragment
        "<p>  spaced   out   words   survive  .</p>" // squeezed, kept
    val (text, n) = extractOne(html)
    assert(text === "this line is kept for sure.\nspaced out words survive .")
    assert(n === 2L)
  }

  test("pages with no surviving line come out empty, not missing") {
    val out = HtmlExtract.extract(
      Seq((1L, "<p>nothing</p>"), (2L, "<p>good page text here.</p>"))
        .toDF("doc_id", "html"), "doc_id", "html")
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "" && out(0).getLong(2) === 0L)
    assert(out(1).getLong(2) === 1L)
  }

  test("keepCols carries metadata columns through extraction") {
    val out = HtmlExtract.extract(
      Seq((1L, "<p>kept line of text.</p>", "web")).toDF("doc_id", "html", "source"),
      "doc_id", "html", keepCols = Seq("source")).collect()(0)
    assert(out.getString(3) === "web")
  }

  test("curateForTraining(htmlInput=true): markup runs first, boilerplate-only pages drop") {
    val body = "the quick brown fox jumps over the lazy dog and runs far away home. " * 3
    val body3 = "a small cat sat on the warm mat and then it went to sleep in the sun. " * 3
    val docs = Seq(
      (1L, s"<html><body><p>$body</p><div>home | about</div></body></html>"),
      (2L, "<html><body><div>home | about</div><script>x();</script></body></html>"),
      (3L, s"<body><p>$body3</p><p>enable javascript now.</p></body>"))
      .toDF("doc_id", "text")
    val evalSet = Seq((90L, "zz held out zz")).toDF("doc_id", "text")
    val out = tempDir().resolve("htmlchunks").toString
    val chunks = graft.operators.CurationPipeline.curateForTraining(
      docs, evalSet, out, minQuality = 0.4, chunkSize = 16, stride = 12,
      numShards = 2, htmlInput = true)
    val ids = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(ids === Set(1L, 3L), s"survivors: $ids") // page 2 had no real text
    assert(chunks.filter(col("chunk").contains("javascript")).count() === 0)
    assert(chunks.filter(col("chunk").contains("about")).count() === 0)
  }

  test("end-to-end: crawled HTML to packed token ids — the full modern pipeline composes") {
    // HTML pages → markup strip + C4 rules → quality/dedup/decontamination/
    // redaction/chunking (curateForTraining) → BPE train on the survivors →
    // scan-side encode → token-level packing. Every stage is the real
    // operator; the assertions are the chain's conservation laws.
    val bodies = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and runs far away home. ",
      2L -> "a small cat sat on the warm mat and then it went to sleep in the sun. ",
      3L -> "many users of the community write long detailed notes for their tools. ")
    val pages = bodies.map { case (i, b) =>
      (i, s"<html><head><script>x()</script></head><body><p>${b * 3}</p>" +
        "<div>home | nav</div></body></html>")
    }.toDF("doc_id", "text")
    val evalSet = Seq((90L, "zz held out zz")).toDF("doc_id", "text")
    val out = tempDir().resolve("e2e").toString
    val chunks = graft.operators.CurationPipeline.curateForTraining(
      pages, evalSet, out, minQuality = 0.4, chunkSize = 16, stride = 16,
      numShards = 2, htmlInput = true)
    assert(chunks.select("doc_id").distinct().count() === 3)
    val docs = chunks.select(
      ($"doc_id" * 1000 + $"chunk_idx").as("doc_id"), $"chunk".as("text"))
    val merges = BpeTrainer.trainMerges(docs, "text", rounds = 4)
    val voc = BpeTrainer.vocab(docs, "text", merges)
    val withIds = BpeTrainer.encodeToIds(docs, "text", merges, voc)
    // conservation 1: encode is lossless per chunk (decode == chunk text)
    val symVersion = BpeTrainer.encode(docs, "text", merges)
    assert(symVersion.filter(concat_ws("", col("bpe_tokens")) =!= col("text"))
      .count() === 0)
    val packed = SequencePacking.packTokenIds(
      withIds.select($"doc_id", $"token_ids"), "doc_id", "token_ids",
      budget = 64L, nShards = 2, sepId = -1)
    // conservation 2: every token of every chunk lands in exactly one pack
    val totalTokens = withIds.select(sum(size($"token_ids"))).as[Long].collect()(0)
    val packedTokens = packed
      .select(sum(size(filter($"packed_ids", x => x =!= -1)))).as[Long].collect()(0)
    assert(packedTokens === totalTokens, "packing must conserve tokens")
    // conservation 3: separators count n_docs-1 per pack
    val sepOk = packed.select(
      (size(filter($"packed_ids", x => x === -1)) === ($"n_docs" - 1)).as("ok"))
      .filter(!$"ok").count()
    assert(sepOk === 0L)
  }
}
