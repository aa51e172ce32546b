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

  /** Ordered entity decodes — `&amp;` last by construction. */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Raw text of an HTML column: markup stripped (block boundaries become
    * newlines), entities decoded. No line filtering — [[c4Lines]] is the
    * quality pass. */
  def htmlToText(html: Column): Column = {
    val stripped = StripChain.foldLeft(html) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }
    Entities.foldLeft(stripped) { case (c, (p, r)) => regexp_replace(c, p, r) }
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
