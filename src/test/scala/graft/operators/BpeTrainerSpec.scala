package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts are weighted by pre-token frequency") {
    // "ab ab ab cd" -> pre-tokens: "ab", " ab"×2, " cd"
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val out = BpeTrainer.topPairs(docs, "text", 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ab") === 3L)   // from "ab" ×1 and " ab" ×2 (pair at offset 2)
    assert(out(" a") === 2L)   // leading-space pairs of " ab"
    assert(out("cd") === 1L)
  }

  test("single-char pre-tokens contribute no pairs") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // pre-tokens "a", " b", " c": only " b"/" c" have length 2
    val out = BpeTrainer.topPairs(docs, "text", 10).collect()
      .map(r => r.getString(0)).toSet
    assert(out === Set(" b", " c"))
  }

  test("ranking is (count desc, pair asc) with a hard k cap") {
    val docs = Seq((1L, "xy xy zz zz aa")).toDF("doc_id", "text")
    val out = BpeTrainer.topPairs(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length === 3)
    assert(out.map(_._2).sorted.reverse.toSeq === out.map(_._2).toSeq) // desc
    // " x"," z" both appear; ties broken lexicographically
    val tied = out.filter(_._2 == out.head._2).map(_._1)
    assert(tied.sorted.toSeq === tied.toSeq)
  }

  test("frequency table is reusable and vocabulary-sized") {
    val docs = Seq((1L, "the the the cat"), (2L, "the cat")).toDF("doc_id", "text")
    val freq = BpeTrainer.preTokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("the") === 2L)  // doc-initial "the" twice
    assert(freq(" the") === 2L)
    assert(freq(" cat") === 2L)
  }

  // ── trainMerges: the full iterative loop ──────────────────────────────────

  /** Reference BPE (Sennrich alg. 1) on a word-frequency map — plain Scala,
    * independently written: pair argmax with (cnt desc, left, right) ties,
    * greedy L2R non-overlapping fusion. */
  private def referenceBpe(freqs: Map[String, Long],
                           rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var table: Map[Vector[String], Long] =
      freqs.collect { case (w, f) if w.length >= 2 =>
        w.map(_.toString).toVector -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = table.toSeq.flatMap { case (syms, f) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> f }.toSeq
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.nonEmpty) {
        val ((l, rt), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r.toLong, l, rt, l + rt, cnt))
        table = table.toSeq.map { case (syms, f) =>
          val fused = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
              fused += (l + rt); i += 2
            } else { fused += syms(i); i += 1 }
          }
          fused.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("trainMerges matches an independent reference BPE, multiple rounds") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new new"),
      (3L, "low lowest newer")).toDF("doc_id", "text")
    val got = BpeTrainer.trainMerges(docs, "text", rounds = 8)
      .orderBy("merge_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // reference runs on the same pre-token frequency table
    val freqs = BpeTrainer.preTokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.toSeq === referenceBpe(freqs, 8))
    assert(got.length === 8)
  }

  test("trainMerges tie-break is deterministic: (cnt desc, left asc, right asc)") {
    // pre-tokens: "xy"×1, " xy"×1, " xz"×2 → round 1 argmax (" ","x") cnt 3;
    // later rounds tie on cnt — every round must agree with the reference
    // exactly, and rerunning must reproduce it bit-for-bit
    val docs = Seq((1L, "xy xy xz xz")).toDF("doc_id", "text")
    val first = BpeTrainer.trainMerges(docs, "text", rounds = 1).collect()(0)
    assert((first.getString(1), first.getString(2), first.getLong(4)) === (" ", "x", 3L))
    val freqs = BpeTrainer.preTokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(freqs, 4)
    (1 to 2).foreach { _ =>
      val got = BpeTrainer.trainMerges(docs, "text", rounds = 4)
        .orderBy("merge_idx").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(got.toSeq === want)
    }
  }

  test("greedy L2R fusion is non-overlapping: aaaa fuses to two aa, aaa to aa+a") {
    // single pre-token docs: "aaaa" (freq 1), "aaa" (freq 1) → round-1 pair (a,a)
    val docs = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val m = BpeTrainer.trainMerges(docs, "text", rounds = 2)
      .orderBy("merge_idx").collect()
    // round 1: (a,a) cnt = 3 (aaaa) + 2 (aaa) = 5
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) === ("a", "a", 5L))
    // round 2 sees [aa,aa] and [aa,a]: pair (aa,aa) cnt 1, (aa,a) cnt 1 →
    // tie broken by right asc: ("aa","a") wins
    assert((m(1).getString(1), m(1).getString(2)) === ("aa", "a"))
    // exhaustion: more rounds than merges available stops cleanly
    val all = BpeTrainer.trainMerges(docs, "text", rounds = 50).collect()
    assert(all.length < 50)
  }

  // ── encode: BPE apply with the trained merges ─────────────────────────────

  private def mergesDf(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r, l + r, 0L) }
      .toDF("merge_idx", "left_sym", "right_sym", "merged", "cnt")

  test("encode replays merges SEQUENTIALLY in learn order, greedy L2R non-overlapping") {
    // learn order decides: (a,b) fires first, so (b,c) never matches in "abc"
    val docs = Seq((1L, "abc"), (2L, "aaaaa")).toDF("doc_id", "text")
    val out = BpeTrainer.encode(docs, "text", mergesDf("a" -> "b", "b" -> "c", "a" -> "a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    assert(out(1L) === Seq("ab", "c"))
    // greedy L2R non-overlapping: aaaaa -> aa, aa, a
    assert(out(2L) === Seq("aa", "aa", "a"))
  }

  test("encode of the training corpus reproduces the training-table state (q136's identity)") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new new")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", rounds = 6)
    // independent replay over the frequency map with referenceBpe's fuse rule
    val freqs = BpeTrainer.preTokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val learned = BpeTrainer.collectMerges(merges)
    def applyAll(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      learned.foreach { m =>
        val fused = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m(0) && syms(i + 1) == m(1)) {
            fused += m(2); i += 2
          } else { fused += syms(i); i += 1 }
        }
        syms = fused.result()
      }
      syms
    }
    val got = BpeTrainer.encode(docs, "text", merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    import graft.functions.TextFunctions
    val pretoks = docs.select($"doc_id",
        TextFunctions.bpeTokens($"text").as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(got(id) === pretoks(id).flatMap(applyAll))
    }
    freqs.keys.foreach(w => assert(applyAll(w).mkString === w)) // sanity
  }

  test("encode is lossless: token symbols concatenate back to the original text") {
    val docs = Seq(
      (1L, "the quick brown fox, 1999 — naïve café!"),
      (2L, "it's we've they'll  spaced\ttabs"),
      (3L, "")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs.filter($"doc_id" =!= 3L), "text", rounds = 4)
    val bad = BpeTrainer.encode(docs, "text", merges)
      .filter(concat_ws("", col("bpe_tokens")) =!= col("text")).count()
    assert(bad === 0L)
  }

  test("vocab: alphabet takes 0..A-1 in binary order, merges take A+idx-1, dupes keep lowest id") {
    val docs = Seq((1L, "ba ab ab")).toDF("doc_id", "text")
    // alphabet of pre-tokens {"ba", " ab", "ab"}: ' ', 'a', 'b' -> ids 0,1,2
    val merges = mergesDf("a" -> "b", "a" -> "b") // duplicate product "ab"
    val v = BpeTrainer.vocab(docs, "text", merges).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v === Map(" " -> 0, "a" -> 1, "b" -> 2, "ab" -> 3)) // dup id 4 dropped
  }

  test("encodeToIds prices symbols through the vocab; unknown symbols raise loudly") {
    val docs = Seq((1L, "ab ab ba")).toDF("doc_id", "text")
    val merges = mergesDf("a" -> "b")
    val voc = BpeTrainer.vocab(docs, "text", merges)
    val ids = BpeTrainer.encodeToIds(docs, "text", merges, voc)
      .collect()(0).getSeq[Int](2)
    // pre-tokens "ab", " ab", " ba" -> [ab], [' ', ab], [' ', b, a]
    assert(ids === Seq(3, 0, 3, 0, 2, 1))
    val alien = Seq((1L, "zz")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      BpeTrainer.encodeToIds(alien, "text", merges, voc).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.toString +: chain(e.getCause))
    assert(chain(ex).exists(_.contains("not in the")), chain(ex).mkString("\n"))
    // opt-in graceful degradation: unknown symbols map to the sentinel,
    // known symbols keep their exact ids
    val mixed = Seq((1L, "ab zq")).toDF("doc_id", "text")
    val ids2 = BpeTrainer.encodeToIds(mixed, "text", merges, voc, oovId = Some(-2))
      .collect()(0).getSeq[Int](2)
    assert(ids2 === Seq(3, 0, -2, -2)) // "ab" -> 3; " zq" -> [' '=0, z=-2, q=-2]
  }

  test("encode null contract: null text yields null tokens, not a crash") {
    val docs = Seq((1L, "ab"), (2L, null)).toDF("doc_id", "text")
    val out = BpeTrainer.encode(docs, "text", mergesDf("a" -> "b"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](2) === Seq("ab"))
    assert(out(1).isNullAt(2))
  }

  test("real token ids flow into SequencePacking: budget respected on encoded lengths") {
    val docs = (1L to 40L).map(i => (i, ("ab " * i.toInt).trim)).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", rounds = 2)
    val voc = BpeTrainer.vocab(docs, "text", merges)
    val withIds = BpeTrainer.encodeToIds(docs, "text", merges, voc)
      .select($"doc_id", size($"token_ids").cast("long").as("n_tokens"))
    val packed = SequencePacking.packSequences(withIds, "doc_id", "n_tokens",
      budget = 64L, nShards = 4)
    val sizes = packed.join(withIds, "doc_id")
      .groupBy("shard", "pack").agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .collect()
    // every multi-doc pack fits the budget; oversized docs sit alone
    sizes.foreach { r =>
      assert(r.getLong(2) <= 64L || r.getLong(3) === 1L, r.toString)
    }
    assert(sizes.exists(_.getLong(3) > 1L), "packing should combine small docs")
  }

  // ── byte-level mode (GPT-2 convention — no OOV by construction) ───────────

  test("byteLevel training is isomorphic to code-point training on ASCII text") {
    import graft.expressions.ByteRemap
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran the mat")).toDF("doc_id", "text")
    val charM = BpeTrainer.collectMerges(
      BpeTrainer.trainMerges(docs, "text", rounds = 3))
    val byteM = BpeTrainer.collectMerges(
      BpeTrainer.trainMerges(docs, "text", rounds = 3, byteLevel = true))
    // ASCII pre-tokens remap char-for-char, so each merge is the remapped
    // twin of the code-point merge WHILE argmaxes are unique (the remap
    // preserves binary order within visible ASCII; count TIES can diverge
    // because space remaps ABOVE letters — rounds 1–3 here are tie-free,
    // round 4 is exactly such a tie, deliberately excluded)
    assert(byteM.map(_.toSeq).toSeq ===
      charM.map(_.map(ByteRemap.remapString).toSeq).toSeq)
  }

  test("byteLevel encode is lossless on adversarial UTF-8 (emoji, CJK, controls)") {
    import graft.expressions.ByteRemap
    val docs = Seq(
      (1L, "plain ascii text."),
      (2L, "café déjà vu — naïve"),
      (3L, "日本語のテキスト 🙂🤖"),
      (4L, "mixed: Straße 中文 and\ttabs"),
      (5L, "")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(docs, "text", rounds = 5, byteLevel = true)
    val got = BpeTrainer.encode(docs, "text", merges, byteLevel = true)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2).mkString).toMap
    val want = docs.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    want.foreach { case (id, text) =>
      assert(ByteRemap.unremapString(got(id)) === text,
        s"byte-level round-trip broke on doc $id")
    }
  }

  test("byteLevel vocab has the full 256-symbol base: NO text can be OOV") {
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val merges = BpeTrainer.trainMerges(train, "text", rounds = 3, byteLevel = true)
    val voc = BpeTrainer.vocab(train, "text", merges, byteLevel = true)
    val base = voc.filter($"id" < 256).count()
    assert(base === 256L, "base alphabet must be the fixed byte table")
    assert(voc.filter($"id" >= 256).count() === 3L, "merge products after the base")
    // text with symbols NEVER seen at train time — emoji, CJK, Greek,
    // control chars — encodes WITHOUT raising and without any sentinel:
    // the property the code-point path needs an opt-in oovId for
    val alien = Seq((9L, "Ω≈ç 中文 🙂 ")).toDF("doc_id", "text")
    val ids = BpeTrainer.encodeToIds(alien, "text", merges, voc, byteLevel = true)
      .collect()(0).getSeq[Int](2)
    assert(ids.nonEmpty && ids.forall(i => i >= 0 && i < 259))
    // and the code-point path on the same input DOES raise (the contrast
    // that makes byte-level the structural fix)
    val charMerges = BpeTrainer.trainMerges(train, "text", rounds = 3)
    val charVoc = BpeTrainer.vocab(train, "text", charMerges)
    intercept[Exception] {
      BpeTrainer.encodeToIds(alien, "text", charMerges, charVoc).collect()
    }
  }
}
