package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the FIRST stage of a web-scale corpus
  * pipeline (C4/CCNet shape: crawled pages arrive as markup; everything
  * downstream assumes cleaned text). Three steps, all pure column
  * expressions (whole-stage codegen, scan-side, no shuffle — at 100 TB every
  * page cleans in place during the scan):
  *
  *   1. markup strip: comments, then <script>/<style> blocks (content and
  *      all), then block-level closers + <br> → newline (line structure is
  *      what the line rules act on), then every remaining tag;
  *   2. entity decode AFTER tag stripping (so literal `&lt;tag&gt;` text
  *      survives as text, the standard order): the named core + `&#39;`,
  *      with `&amp;` decoded LAST (single-pass, no double-decode);
  *   3. C4-style line rules (Raffel et al. 2020 §2.2): per line — trim +
  *      whitespace squeeze, keep only lines with >= `minWords` words that end
  *      in terminal punctuation and contain no banned fragment (javascript /
  *      lorem ipsum / curly brace — the boilerplate tells).
  *
  * Every regex sticks to the java.util.regex ∩ RE2 subset (inline (?is)
  * flags, lazy quantifiers, NO backreferences), so the DuckDB oracle replays
  * the identical chain character-for-character.
  */
object HtmlExtract {

  /** Ordered (pattern → replacement) markup-strip chain. */
  private val StripChain: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> "",
    "(?is)<script[^>]*>.*?</script\\s*>" -> "",
    "(?is)<style[^>]*>.*?</style\\s*>" -> "",
    ("(?i)<br\\s*/?>|</p\\s*>|</div\\s*>|</li\\s*>|</h[1-6]\\s*>|" +
      "</tr\\s*>|</title\\s*>") -> "\n",
    "(?s)<[^>]*>" -> "")

  /** Named entity decodes (the `&amp;` family is handled LAST, separately —
    * see [[AmpPattern]]). `&#39;` is covered by the numeric table. */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&apos;" -> "'", "&nbsp;" -> " ")

  /** Curated numeric character references (code point → decoded text): the
    * Windows-1252/General-Punctuation set real web text is full of — smart
    * quotes, dashes, ellipsis, bullet, ©/®/™ — plus the ASCII quote/angle
    * refs. Each decodes from BOTH its decimal and hex forms with optional
    * leading zeros and either-case hex ([[numRefPattern]]); 160 (nbsp)
    * decodes to a plain space like `&nbsp;`. References OUTSIDE this table
    * survive as literal text — the decode is deliberately BOUNDED (a fixed
    * regex chain both engines replay identically) rather than a general
    * chr() evaluator, and this table is what poisons line rules and dedup
    * fingerprints in practice. 38/x26 (`&`) is excluded here: it folds into
    * [[AmpPattern]] so `&#038;lt;` yields literal `&lt;` text, never a
    * double decode. */
  val NumericRefs: Seq[(Int, String)] = Seq(
    160 -> " ", 169 -> "©", 174 -> "®",
    8211 -> "–", 8212 -> "—",
    8216 -> "‘", 8217 -> "’",
    8220 -> "“", 8221 -> "”",
    8226 -> "•", 8230 -> "…", 8482 -> "™",
    34 -> "\"", 39 -> "'", 60 -> "<", 62 -> ">")

  /** Pattern matching code point `cp`'s decimal AND hex reference forms:
    * `&#0*NNN;` / `&#[xX]0*HH;` (leading zeros bounded at 6, hex digits
    * either case) — java.util.regex ∩ RE2, no backreferences. */
  def numRefPattern(cp: Int): String = {
    val hexPat = cp.toHexString.map { c =>
      if (c.isLetter) s"[$c${c.toUpper}]" else c.toString
    }.mkString
    s"&#(?:0{0,6}$cp|[xX]0{0,6}$hexPat);"
  }

  /** The `&` decodes, LAST by construction (single-pass, no double-decode):
    * named `&amp;` plus its numeric forms. */
  val AmpPattern: String = "&amp;|&#0{0,6}38;|&#[xX]0{0,6}26;"

  /** Raw text of an HTML column: markup stripped (block boundaries become
    * newlines), entities decoded — named, then the bounded numeric table,
    * then the `&` family last. No line filtering — [[c4Lines]] is the
    * quality pass. */
  def htmlToText(html: Column): Column = {
    val stripped = StripChain.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val named = Entities.foldLeft(stripped) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    val numeric = NumericRefs.foldLeft(named) { case (c, (cp, r)) =>
      regexp_replace(c, numRefPattern(cp), r)
    }
    regexp_replace(numeric, AmpPattern, "&")
  }

  /** Default banned fragments (lower-cased substring match). */
  val DefaultBanned: Seq[String] = Seq("javascript", "lorem ipsum", "{")

  /** C4-style kept lines of an extracted-text column: array<string> of
    * trimmed, space-squeezed lines with >= `minWords` words, terminal
    * punctuation ([.!?]$ when `requireTerminalPunct`), and no banned
    * fragment. */
  def c4Lines(text: Column, minWords: Int = 3,
              requireTerminalPunct: Boolean = true,
              banned: Seq[String] = DefaultBanned): Column = {
    require(minWords >= 1, s"minWords must be >= 1: $minWords")
    val cleaned = transform(split(text, "\n"),
      l => trim(regexp_replace(l, "\\s+", " ")))
    filter(cleaned, { l =>
      val base = size(split(l, " ")) >= minWords
      val punct = if (requireTerminalPunct) l.rlike("[.!?]$") else lit(true)
      val clean = banned.map(b => !contains(lower(l), lit(b)))
        .foldLeft(lit(true))(_ && _)
      base && punct && clean
    })
  }

  /** Full extraction stage: (idCol, text, n_lines) — kept lines re-joined
    * with newlines, ready for [[CurationPipeline.curateForTraining]] (pass
    * `htmlInput = true` there to run this as the pipeline's first stage).
    * Pages where no line survives come out with empty text (callers filter
    * or let the downstream quality gate drop them). */
  def extract(docs: DataFrame, idCol: String, htmlCol: String,
              minWords: Int = 3, requireTerminalPunct: Boolean = true,
              banned: Seq[String] = DefaultBanned,
              keepCols: Seq[String] = Nil): DataFrame = {
    val lines = c4Lines(htmlToText(col(htmlCol)), minWords,
      requireTerminalPunct, banned)
    docs.withColumn("_kept", lines)
      .select(col(idCol) +: array_join(col("_kept"), "\n").as("text") +:
        size(col("_kept")).cast("long").as("n_lines") +: keepCols.map(col): _*)
  }
}
