package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication at training-data scale: exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard.
  *
  * Scale shapes (the point of each design):
  *   - signatures (MinHash, SimHash) are PER-ROW higher-order-function folds over
  *     the document's own shingles/tokens — zero shuffle, computed during the scan;
  *   - candidate generation shuffles only (id, band/block) pairs — bytes per doc,
  *     not the documents themselves;
  *   - candidate verification joins are equi-joins on band/block keys, never a
  *     cross join; pair output is bounded by bucket collisions (tunable bands);
  *   - exact dedup is one hash aggregate on a 16-byte digest.
  */
object DedupSuite {

  // ── exact ──────────────────────────────────────────────────────────────────

  /** Exact dedup: group by content digest, keep the minimum id as canonical.
    * Output: (digest, canonical_id, n_dups). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  // ── MinHash + LSH ──────────────────────────────────────────────────────────

  /** Seeded shingle hash used by the MinHash signature. `md5` keeps the oracle
    * SQL-expressible; swap for an xxhash64-based fn in production for speed. */
  def md5SeededHash(shingle: Column, seed: Int): Column =
    md5(concat(lit(seed + ":"), shingle))

  /** Per-row MinHash signature: array of `numHashes` minima over the document's
    * shingles under independent seeded hashes. No shuffle. */
  def minHashSignature(shingles: Column, numHashes: Int,
                       hashFn: (Column, Int) => Column = md5SeededHash): Column =
    array((0 until numHashes).map(i => array_min(transform(shingles, s => hashFn(s, i)))): _*)

  /** LSH banding: split the signature into `bands` equal groups; band key = md5 of
    * the concatenated group. Docs sharing ANY band key become candidate pairs. */
  def lshBands(signature: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by bands $bands")
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => element_at(signature, b * rows + r + 1)): _*))
    }: _*)
  }

  /** Candidate near-duplicate pairs via MinHash LSH over word shingles.
    * Output: (id_a, id_b) with id_a < id_b, distinct.
    *
    * Shape: explode shingles → hash-aggregate `numHashes` minima per doc (map-side
    * partial agg; shuffles only (id, shingle-hash) bytes) → band keys from the
    * signature attributes → equi-join on (band_idx, band_key). The per-row-HOF
    * alternative re-evaluates the tokenizer inside every lambda element
    * (interpreted, O(shingles × tokens) per seed per row) — measurably pathological
    * even at 5k docs, hence the explicit staging here. */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 3, numHashes: Int = 8, bands: Int = 4,
                      hashFn: (Column, Int) => Column = md5SeededHash): DataFrame = {
    require(numHashes % bands == 0, s"numHashes $numHashes not divisible by bands $bands")
    val rows = numHashes / bands
    val sh = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), explode(TextFunctions.wordShinglesOf(col("toks"), shingleSize)).as("s"))
    val aggs = (0 until numHashes).map(i => min(hashFn(col("s"), i)).as(s"h$i"))
    val sig = sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    // Band key: 8-byte xxhash64 of the band's signature slice. Only band-key
    // EQUALITY matters (keys never reach the output), so this produces the same
    // pair set as the oracle's md5-hex band keys while shuffling 8 bytes/band
    // instead of 32-char strings and skipping an md5+concat per band.
    val bandArr = array((0 until bands).map { b =>
      xxhash64((0 until rows).map(r => col(s"h${b * rows + r}")): _*)
    }: _*)
    val banded = sig.select(col("id"), posexplode(bandArr))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    val l = banded.select(col("band_idx"), col("band_key"), col("id").as("id_a"))
    val r = banded.select(col("band_idx"), col("band_key"), col("id").as("id_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  // ── SimHash ────────────────────────────────────────────────────────────────

  /** md5-derived bit function: parity of the ASCII code of hex char `b+1` of the
    * token digest — SQL-expressible in the oracle. Returns 0/1 int. */
  def md5ParityBit(token: Column, b: Int): Column =
    digestParityBit(md5(token), b)

  /** Bit `b` of an ALREADY-COMPUTED md5 hex digest. Staging the digest once and
    * deriving all `bits` votes from it beats calling [[md5ParityBit]] per bit,
    * which would evaluate the md5 up to `bits` times per token (whole-stage-codegen
    * subexpression elimination does not reach across aggregate buffers). */
  def digestParityBit(digest: Column, b: Int): Column =
    ascii(substring(digest, b + 1, 1)) % 2

  /** Per-row SimHash fingerprint as a '0'/'1' string of length `bits` (string form
    * keeps the oracle trivial; production would pack into a long). Per-bit signed
    * token votes folded per row — no shuffle. Tokens are md5-hashed ONCE (inner
    * transform), then all `bits` contributions read the staged digest. */
  def simHash(text: Column, bits: Int = 16): Column = {
    val digests = transform(TextFunctions.tokens(text), t => md5(t))
    val contrib = transform(digests, d =>
      array((0 until bits).map(b => (digestParityBit(d, b) * 2 - 1).cast("long")): _*))
    val sums = aggregate(contrib,
      array(Seq.fill(bits)(lit(0L)): _*),
      (acc, v) => zip_with(acc, v, (a, x) => a + x))
    concat((0 until bits).map(b =>
      when(element_at(sums, b + 1) > 0L, "1").otherwise("0")): _*)
  }

  /** Hamming distance between two equal-length '0'/'1' fingerprint strings. */
  def hammingStr(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(substring(a, i + 1, 1) === substring(b, i + 1, 1), 0L).otherwise(1L))
      .reduce(_ + _)

  /** Per-doc signed vote sums s0…s(bits-1): explode tokens, md5 each token ONCE,
    * then `bits` sum aggregates read hex chars of the staged digest (map-side
    * partial agg; shuffles one row of longs per doc). Staging matters: putting
    * `md5(t)` inside each aggregate would evaluate it `bits` times per token —
    * codegen subexpression elimination does not span aggregate functions. */
  private def simHashVotes(df: DataFrame, idCol: String, textCol: String,
                           bits: Int): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), md5(col("t")).as("d"))
    val votes = (0 until bits).map(b =>
      sum((digestParityBit(col("d"), b) * 2 - 1).cast("long")).as(s"s$b"))
    tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
  }

  /** SimHash fingerprints as '0'/'1' strings (human-readable form).
    * Same values as the per-row [[simHash]] fold. */
  def simHashFingerprints(df: DataFrame, idCol: String, textCol: String,
                          bits: Int): DataFrame =
    simHashVotes(df, idCol, textCol, bits)
      .select(col("id"), concat((0 until bits).map(b =>
        when(col(s"s$b") > 0L, "1").otherwise("0")): _*).as("fp"))

  /** SimHash fingerprints packed into a long, MSB-first so bit (bits-1-b) set ⇔
    * string form has '1' at position b — hamming distances are identical to
    * [[hammingStr]] over the string form but cost one xor+popcount instead of
    * 2×bits substring compares per pair. Requires bits <= 63. */
  def simHashFingerprintsPacked(df: DataFrame, idCol: String, textCol: String,
                                bits: Int): DataFrame = {
    require(bits <= 63, s"packed fingerprint needs bits <= 63, got $bits")
    simHashVotes(df, idCol, textCol, bits)
      .select(col("id"), (0 until bits).map(b =>
        when(col(s"s$b") > 0L, lit(1L << (bits - 1 - b))).otherwise(lit(0L)))
        .reduce(_ + _).as("fp"))
  }

  /** SimHash near-duplicate pairs: block on `bands` fingerprint segments
    * (pigeonhole: hamming <= maxHamming pairs share >= 1 of maxHamming+1 segments),
    * verify exact hamming on candidates. Output (id_a, id_b, hamming), distinct.
    *
    * Verification runs on packed-long fingerprints — one xor+popcount per
    * candidate pair (the candidate set is O(collisions), orders of magnitude
    * larger than the output, so per-pair cost dominates). Block keys are the
    * numeric segment values (bijective with the string form's substrings). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = 32, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0, s"bits $bits not divisible by bands $bands")
    val seg = bits / bands
    val segMask = (1L << seg) - 1
    val fp = simHashFingerprintsPacked(df, idCol, textCol, bits)
    val banded = fp.select(col("id"), col("fp"), posexplode(
      array((0 until bands).map(b =>
        shiftrightunsigned(col("fp"), (bands - 1 - b) * seg).bitwiseAND(lit(segMask))): _*)))
      .withColumnRenamed("pos", "block_idx").withColumnRenamed("col", "block_key")
    val l = banded.select(col("block_idx"), col("block_key"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val r = banded.select(col("block_idx"), col("block_key"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, Seq("block_idx", "block_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ── n-gram Jaccard ─────────────────────────────────────────────────────────

  /** Jaccard similarity over distinct word n-grams, blocked by `blockCol` (only
    * same-block pairs are compared — at scale the block is an LSH bucket or a
    * cheap partition key; a cross join is never formed).
    * Output: (id_a, id_b, inter, size_a, size_b, jaccard) filtered to >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                        n: Int = 1, threshold: Double = 0.8): DataFrame = {
    val gramArr = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      array_distinct(
        if (n == 1) TextFunctions.tokens(col(textCol))
        else TextFunctions.wordShingles(col(textCol), n)).as("garr"))
    // |distinct grams| is a per-row scalar — computing it from `garr` avoids the
    // explode + groupBy(id).count() shuffle an aggregate formulation would cost.
    val sizes = gramArr.select(col("id"), size(col("garr")).cast("long").as("sz"))
    // Join candidates on the 8-byte xxhash64 of the gram, not the gram string:
    // shuffle width per row drops to (block, long, id) and the equi-join compares
    // longs. A cross-doc hash collision would need two DIFFERENT grams in the
    // same block to collide in 64 bits (~n²/2⁶⁵) — negligible against the
    // corpus sizes this targets, and it only perturbs one `inter` count by 1.
    val grams = gramArr.select(col("id"), col("block"),
      explode(transform(col("garr"), g => xxhash64(g))).as("gh"))
    val l = grams.select(col("block"), col("gh"), col("id").as("id_a"))
    val r = grams.select(col("block"), col("gh"), col("id").as("id_b"))
    val inter = l.join(r, Seq("block", "gh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("size_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("size_a"), col("size_b"),
        col("jaccard"))
  }
}
