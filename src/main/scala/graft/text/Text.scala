package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives (Spark side + the exactly-equivalent DuckDB SQL
  * fragments used by the oracles). Everything is built-in-function based —
  * whole-stage-codegen'd, no UDFs, embarrassingly parallel per row.
  */
object Text {
  /** English-ish stop-word list used across ops (kept tiny + fixed so the
    * oracle can inline it). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  val StopwordsSqlList: String = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Unicode scripts written WITHOUT word delimiters (r15 — r14 VERDICT
    * #3): a `[\p{L}\p{N}]+` run over Han/Kana/Thai/Lao/Khmer/Myanmar
    * text is a whole CLAUSE, so BPE's word-keyed vocab treats each
    * distinct sentence as a distinct word (vocab explosion at scale)
    * and shingle/BM25/stopword semantics degrade to near-document
    * granularity. The engine's segmentation rule for these scripts is
    * the per-CODEPOINT fallback byte/char-level tokenizers ship —
    * each such codepoint is its own token; dictionary segmentation
    * stays out of scope (SURVEY §7). ONE list, three spellings: the
    * native scan tests `Character.UnicodeScript.of`, the Java regex
    * twin spells `\p{IsHan}`, the RE2 oracle `\p{Han}` — all three
    * read the same Unicode script data (the q198 precedent). */
  val UnsegmentedScripts: Seq[String] =
    Seq("Han", "Hiragana", "Katakana", "Thai", "Lao", "Khmer", "Myanmar")

  /** Java-regex class of the unsegmented scripts, capturing. */
  val UnsegmentedClassJava: String =
    UnsegmentedScripts.map(s => s"\\p{Is$s}").mkString("([", "", "])")

  /** RE2 twin (DuckDB oracle spelling). */
  val UnsegmentedClassRe2: String =
    UnsegmentedScripts.map(s => s"\\p{$s}").mkString("([", "", "])")

  /** Lowered text with every unsegmented-script codepoint spaced out —
    * the declarative twin of the native scan's segmentation rule
    * (PropertySpec fuzzes [[tokens]] against extract-over-this), and
    * the preprocessing the BPE class counter shares. */
  def segSpaced(text: Column): Column =
    regexp_replace(lower(text), UnsegmentedClassJava, " $1 ")

  def segSpacedSql(c: String): String =
    s"regexp_replace(lower($c), '$UnsegmentedClassRe2', ' \\1 ', 'g')"

  /** Tokenize: lowercase, Unicode letter/number runs — `[\p{L}\p{N}]+`
    * on lowered text (r14: Unicode-capable; ASCII-only inputs tokenize
    * bit-identically to the pre-r14 `[a-z0-9]+` class — AsciiSpec) —
    * except codepoints of [[UnsegmentedScripts]], each of which is its
    * OWN token (r15: the per-codepoint fallback for scripts with no
    * word delimiters — CJK/Thai clauses stop tokenizing as one giant
    * "word"). Native byte-scan tokenizer
    * ([[graft.expressions.TokensOf]]) — provably ≡
    * `regexp_extract_all(segSpaced(text), "[\\p{L}\\p{N}]+")` (the form
    * the DuckDB oracle replays, [[toksSql]]; RE2 and Java share the
    * category AND script tables) without the regex engine on the
    * library's hottest primitive. Cross-engine case-mapping edges
    * (final Σ, Turkish İ) documented at [[graft.expressions.TokensOf]]. */
  def tokens(text: Column): Column =
    graft.expressions.TokensOf.tokens(text)

  /** The oracle-side tokenizer over an arbitrary column expression. */
  def toksSqlOf(c: String): String =
    s"regexp_extract_all(${segSpacedSql(c)}, '[\\p{L}\\p{N}]+')"

  val toksSql: String = toksSqlOf("text")

  /** BPE-ish token classes (letter runs / digit runs / single symbols) —
    * the ONE definition q46/q83/q114 share on both engines; editing it
    * in one consumer must not diverge the others' Spark↔oracle parity.
    * r14: Unicode like [[tokens]] — `\p{L}+|\p{N}+` runs plus one token
    * per non-letter/number/whitespace codepoint; on ASCII input the
    * classes are byte-identical to the pre-r14 ASCII form, so every
    * committed oracle hash over the shipped corpus is unchanged.
    * r15: the whitespace class is spelled EXPLICITLY (r14 ADVICE #1 —
    * Java's `\s` includes vertical tab U+000B, RE2's does not; on
    * input containing U+000B the two engines would silently diverge,
    * so both now carry the Java set ` \t\n\x0B\f\r` literally), and
    * counts run over [[segSpaced]] text so unsegmented-script
    * codepoints price one unit each, exactly like [[tokens]].
    * Cross-engine Unicode proof: q195's `n_bpe` column. */
  val BpeTokenRegex = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(segSpaced(text), lit(BpeTokenRegex), lit(0)))
      .cast("long")

  /** Same class set over an arbitrary column expression, single-quoted
    * for DuckDB (`\p`/`\t`/`\x` stay literal for RE2). */
  def bpeCountSqlOf(c: String): String =
    s"len(regexp_extract_all(${segSpacedSql(c)}, " +
      "'\\p{L}+|\\p{N}+|[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]'))"

  val bpeCountSql: String = bpeCountSqlOf("text")

  /** Letter/number codepoint count of the lowered text — the q45
    * quality family's alnum mass. r14: Unicode (`[^\p{L}\p{N}]`
    * stripped — same category tables on both engines), so the
    * non-alnum ratio stops mis-scoring every non-Latin document as
    * pure punctuation; byte-identical to the old `[^a-z0-9]` form on
    * ASCII input (oracle hashes unchanged over the shipped corpus). */
  def alnumLen(text: Column): Column =
    length(regexp_replace(lower(text), "[^\\p{L}\\p{N}]", ""))

  def alnumLenSql(c: String): String =
    s"LENGTH(regexp_replace(lower($c), '[^\\p{L}\\p{N}]', '', 'g'))"

  /** Word k-shingles of a token array (k ≥ 2), joined with single spaces.
    *
    * Implemented as `arrays_zip` over k shifted slices + filter + join,
    * NOT as `transform(sequence(...), i => element_at(toks, i+j)...)`:
    * higher-order functions are interpreted (no codegen, no common-
    * subexpression elimination), so a `toks` reference INSIDE the lambda
    * re-evaluates the whole upstream expression (the tokenizer regex!) per
    * element — O(k·len) tokenizations per row, measured 40× slower. Here
    * `toks` is referenced k times per ROW, once per slice. */
  def shingles(toks: Column, k: Int): Column = {
    // NB: slice length must not overflow (start+len is computed in int —
    // Int.MaxValue yields NULL arrays), so bound it by the array size
    val shifted = (0 until k).map(j =>
      (if (j == 0) toks else slice(toks, lit(j + 1), size(toks))).as(s"t$j"))
    val z = arrays_zip(shifted: _*)
    transform(
      filter(z, s => s.getField(s"t${k - 1}").isNotNull),
      s => concat_ws(" ", (0 until k).map(j => s.getField(s"t$j")): _*))
  }

  /** DuckDB fragment equivalent to [[shingles]] over list column `toks`. */
  def shinglesSql(toksExpr: String, k: Int): String = {
    val concat = (0 until k).map(j => s"$toksExpr[i + $j]").mkString(" || ' ' || ")
    s"[$concat FOR i IN range(1, greatest(len($toksExpr) - ${k - 2}, 1))]"
  }

  /** Deterministic position in [0, 100) from the md5 of a key — the
    * q82-family subset/fold rule (q146's nested training fractions,
    * q150's split folds). ONE definition + its SQL twin so the curve's
    * subset rule and the split's fold rule can never silently diverge
    * (r9 review). The 15-hex-char (60-bit) prefix never goes negative
    * in int64 on either engine. */
  def md5Pos100(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long") % 100

  def md5Pos100Sql(x: String): String =
    s"CAST(('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** Smoothed IDF, scikit-learn semantics: ln((1+N)/(1+df)) + 1. */
  def idf(nDocs: Column, df: Column): Column =
    log((lit(1) + nDocs).cast("double") / (lit(1) + df)) + lit(1.0)

  def idfSql(n: String, df: String): String =
    s"ln((1 + $n) / CAST(1 + $df AS DOUBLE)) + 1"
}
