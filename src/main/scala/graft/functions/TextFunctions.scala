package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines: tokenization,
  * language-ID heuristics, quality scoring, fingerprinting, shingling.
  *
  * All pure column expressions (whole-stage codegen, no UDFs); per-document
  * computations use higher-order functions so they need NO shuffle — at 100 TB each
  * document is scored in place during the scan.
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** UTF-8 unsigned byte order — the engines' binary string order
    * (UTF8String.compareTo / DuckDB's default collation). The one shared
    * comparator behind every driver-side tie-break that must match an
    * `array_sort` / `ORDER BY` replay. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Token count (long). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Number of regex hits in the text (long) — e.g. punctuation or stopword counts. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** GPT-2-style pre-tokenizer pattern (public BPE convention: contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation runs,
    * residual whitespace). Restricted to constructs both java.util.regex and
    * RE2 support — no lookahead — so engine and oracle tokenize identically. */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-style subword pre-tokens of the raw text (NOT lower-cased: BPE vocabs
    * are case-sensitive). The real merge table lives in the tokenizer model;
    * pre-tokenization is the part that determines token COUNT scaling. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** BPE pre-token count — the practical "how many tokens is this corpus"
    * estimator at 100 TB (pure scan-side expression, no shuffle). */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Default English stopword alternation used by the language-ID heuristic. */
  val EnglishStopwords = "\\b(the|a|an|of|to|and|in|is|was|for|on|with|that)\\b"

  /** Stopword-density language ID: fraction of tokens that are common-English
    * stopwords; >= `threshold` classifies as `en`. A cheap n-gram-free heuristic
    * in the spirit of fastText-style frequency features. */
  def langIdEn(text: Column, threshold: Double = 0.05): Column = {
    val hits = matchCount(lower(text), EnglishStopwords).cast("double")
    val toks = tokenCount(text).cast("double")
    when(toks > 0 && hits / toks >= threshold, "en").otherwise("unknown")
  }

  /** Per-language stopword profiles for multilingual language ID. Small
    * closed-class word lists (the standard n-gram/stopword-profile heuristic à
    * la textcat): function words are the highest-frequency, most
    * language-exclusive tokens, so a dozen per language separates these four
    * reliably. Order = tie-break priority. */
  val LanguageProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "for", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "mit", "ein", "auf"),
    "fr" -> Seq("le", "les", "et", "est", "je", "ne", "pas", "pour", "dans", "une"),
    "es" -> Seq("el", "los", "y", "es", "no", "que", "para", "con", "por", "una"))

  /** Number of tokens of `toks` found in `profile` (occurrences, not distinct
    * membership — repeated stopwords are evidence too). Pure scan-side HOF. */
  def profileHits(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => t.isin(profile.map(_.asInstanceOf[Any]): _*))).cast("long")

  /** First-max argmax over (label, score) pairs in list order — deterministic
    * tie-break; an all-zero row falls back to the first label. Pass STAGED
    * score columns (not inline [[profileHits]] calls) so each score is
    * evaluated once. */
  def langArgmax(scores: Seq[(String, Column)]): Column =
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) { case (((lang, sc), i), elseCol) =>
      val laterMax = scores.drop(i + 1).map(_._2).reduce((a, b) => greatest(a, b))
      when(sc >= laterMax, lang).otherwise(elseCol)
    }

  /** Multilingual language ID over staged tokens: per-profile hit counts with
    * first-max argmax in [[LanguageProfiles]] order. Zero shuffle. */
  def langIdMulti(toks: Column): Column =
    langArgmax(LanguageProfiles.map { case (lang, prof) => lang -> profileHits(toks, prof) })

  /** Linear text-classifier inference over hashed bag-of-words features
    * (the fastText-style quality-classifier shape: score = Σ w[h(token)]).
    * The weight table is DERIVED, not stored: w(t) = (first-32-md5-bits(t) mod
    * 1001) − 500 ∈ [−500, 500] — a deterministic stand-in for trained weights
    * that keeps the inference path (hash → lookup → sum) real and the oracle
    * SQL-expressible; swap the affine map for a broadcast weight array lookup
    * to serve a trained model. Integer lanes: the per-doc sum is a LONG fold
    * (order-independent, exact), normalized by one double division at the end.
    * Pure scan-side HOF — classifying 100 TB shuffles nothing. */
  def hashedFeatureScore(toks: Column): Column =
    aggregate(
      transform(toks, t =>
        conv(substring(md5(t), 1, 8), 16, 10).cast("long") % 1001 - 500),
      lit(0L), (acc, x) => acc + x)

  /** Composite quality score in [0,1]: penalizes extreme length, high punctuation
    * density, and low alphabetic density. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val punct = matchCount(text, "[.,!?;:]").cast("double")
    val alpha = matchCount(text, "[a-zA-Z]").cast("double")
    val lengthOk = when(chars >= 50.0 && chars <= 5000.0, 1.0).otherwise(0.5)
    val punctOk = when(chars > 0, lit(1.0) - least(punct / chars * 10.0, lit(1.0)))
      .otherwise(lit(0.0))
    val alphaDen = when(chars > 0, alpha / chars).otherwise(lit(0.0))
    (lengthOk * 0.2 + punctOk * 0.3 + alphaDen * 0.5)
  }

  /** Content fingerprint: md5 of the whitespace-normalized lower-cased text.
    * Stable under leading/trailing/internal whitespace differences. */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Order-sensitive rolling token hash: left fold of `xxhash64(acc, token)` —
    * a per-row chain hash, no shuffle, overflow-free under ANSI mode (a naive
    * `acc*31 + h` polynomial throws ARITHMETIC_OVERFLOW in Spark 4). */
  def rollingTokenHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Deterministic split assignment for train/val/test partitioning: bucket =
    * first 32 md5 bits of the KEY (id or content fingerprint) modulo `buckets`.
    * Hash-based splits are the only kind that survive corpus regeneration —
    * row order and sampling seeds do not — and hashing the CONTENT fingerprint
    * instead of the id keeps duplicate texts in the same split (no
    * train/test leakage through near-identical rows). md5 keeps the oracle
    * SQL-expressible; the arithmetic is engine-identical. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    md5Bits32(key) % buckets
  }

  /** First 32 md5 bits of the stringified key as a non-negative long — THE
    * shared deterministic-hash primitive behind split assignment, shard
    * dealing, rejection-sampling draws and span-mask decisions. One definition
    * keeps every operator in sync with its oracle twin
    * (`('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT`). */
  def md5Bits32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Named split from bucket thresholds: bucket < trainUpTo → "train",
    * < valUpTo → "val", else "test" (out of `buckets`). */
  def splitAssign(key: Column, buckets: Int, trainUpTo: Int, valUpTo: Int): Column = {
    require(0 < trainUpTo && trainUpTo < valUpTo && valUpTo <= buckets,
      s"need 0 < trainUpTo($trainUpTo) < valUpTo($valUpTo) <= buckets($buckets)")
    val b = hashBucket(key, buckets)
    when(b < trainUpTo, "train").when(b < valUpTo, "val").otherwise("test")
  }

  /** Longest run of equal adjacent elements in an ALREADY-SORTED array (long; 0
    * for empty). On a sorted array this is the maximum element frequency — the
    * zero-shuffle way to get "count of the most frequent n-gram" per document:
    * sort in place, fold once. O(n log n) per row, whole-stage codegen, no
    * explode/groupBy. The accumulator is a (prev, run, best) struct; the first
    * element starts a run of 1 via the null-safe `<=>` (null prev ≠ any value). */
  def maxRunLength(sortedArr: Column): Column =
    aggregate(sortedArr,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition signal: fraction of the document's n-grams taken by
    * its single most frequent n-gram (double in (0,1]). High values flag
    * boilerplate/spam. `grams` must be an attribute reference (see
    * [[wordShinglesOf]] on HOF re-evaluation). */
  def topGramFraction(grams: Column): Column =
    maxRunLength(array_sort(grams)).cast("double") / size(grams).cast("double")

  /** Vocabulary-richness signal: distinct tokens / total tokens (double). Low
    * values flag repetitive documents (the complement of [[topGramFraction]] at
    * the unigram level). */
  def distinctTokenFraction(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  // ─── PII scrubbing ─────────────────────────────────────────────────────────
  // Patterns restricted to constructs java.util.regex and RE2 share (no
  // lookaround, no backrefs) so the engine and the DuckDB oracle match the
  // exact same spans. Redaction is a per-row regexp_replace chain — pure
  // column expressions, zero shuffle, applied in-scan at any corpus size.

  /** RFC-5322-lite email address. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded so version strings like 1.2.3.4.5 in a
    * longer dotted run still match their first four octets only). */
  val Ipv4Pattern = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** International-prefixed dashed phone number: +CC then 2–3 dash-separated
    * groups of 2–4 digits (+1-555-0042, +44-20-7946-0958). */
  val PhonePattern = "\\+[0-9]{1,2}(-[0-9]{2,4}){2,3}"

  /** Redact emails, phones, and IPv4s to <EMAIL>/<PHONE>/<IP> placeholders.
    * Email first (its local part may contain digits and dots), then phone
    * (anchored by '+', cannot overlap dotted quads), then IP. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }

  /** (n_emails, n_phones, n_ips) hit counts for the PII report — counted on the
    * progressively-redacted text exactly as [[redactPii]] consumes it, so a
    * span can never be double-counted by two patterns. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    (matchCount(text, EmailPattern),
      matchCount(noEmail, PhonePattern),
      matchCount(noPhone, Ipv4Pattern))
  }

  // ─── URL hygiene ───────────────────────────────────────────────────────────

  /** Host of a URL, lower-cased, port and leading `www.` stripped — the
    * blocklist join key for domain-level corpus filtering. Pure regex (not
    * parse_url) so the oracle evaluates the identical extraction. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":[0-9]+$", "")

  /** Last two labels of a host ("a.b.c.co.uk" → "co.uk") — the crude
    * registrable-domain key used for per-site aggregation when no public-suffix
    * list is available. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "[^.]+\\.[^.]+$", 0)

  /** Canonical form of a URL — the dedup key for URL-level corpus dedup
    * (crawl pipelines fetch the same page under fragment/tracking/case/port
    * variants; CCNet & friends dedup on a normalized URL before content dedup):
    *
    *  1. fragment dropped;
    *  2. tracking params removed (`utm_*`, `gclid`, `fbclid`) — anchored on a
    *     preceding `?`/`&` so a param or path segment merely CONTAINING one of
    *     those names is untouched; separators re-normalized, trailing `?`/`&`
    *     dropped;
    *  3. scheme and host lower-cased (path/query stay case-sensitive),
    *     leading `www.` and default ports `:80`/`:443` stripped;
    *  4. trailing `/` removed.
    *
    * Pure regex pipeline in the java/RE2 shared subset — the oracle runs the
    * identical steps (with the `g` flag and `\1` backreferences; Spark's
    * regexp_replace is global by default and uses `$1`). Malformed URLs (no
    * `scheme://`) canonicalize to the same cleaned string on both engines
    * rather than erroring. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noFrag,
          "([?&])(?:utm_[A-Za-z0-9]+|gclid|fbclid)=[^&]*", "$1"),
        "([?&])&+", "$1"),
      "[?&]$", "")
    val scheme = lower(regexp_extract(noTrack, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noTrack, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(regexp_replace(hostPort, "^www\\.", ""), ":(80|443)$", "")
    val rest = regexp_replace(
      regexp_extract(noTrack, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
      "/$", "")
    when(scheme === "", noTrack).otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** Word n-gram shingles from an ALREADY-BOUND tokens column (e.g. n=3 →
    * "w1 w2 w3" strings). Pass an attribute reference, not a raw `tokens(text)`
    * expression: higher-order lambdas re-evaluate their child tree per element, so
    * an inlined split() turns O(n) shingling into O(n²) re-tokenization. */
  def wordShinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))

  /** Word n-gram shingles of raw text — convenience form; stage `tokens` into a
    * column first (see [[wordShinglesOf]]) when used inside further HOFs. */
  def wordShingles(text: Column, n: Int): Column = wordShinglesOf(tokens(text), n)

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    when(length(norm) >= n,
      transform(sequence(lit(1), length(norm) - (n - 1)), i => substring(norm, i, lit(n))))
      .otherwise(array(norm))
  }
}
