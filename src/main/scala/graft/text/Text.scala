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

  /** Tokenize: lowercase, alnum runs. `[a-z0-9]+` on lowered text. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  val toksSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** Word k-shingles of a token array (k ≥ 2), joined with single spaces.
    * Guarded: Spark's `sequence(1, 0)` would count DOWN, so short docs get
    * an explicit empty array. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => (0 until k).map(j => element_at(toks, i + j))
          .reduce((a, b) => concat(a, lit(" "), b))))

  /** DuckDB fragment equivalent to [[shingles]] over list column `toks`. */
  def shinglesSql(toksExpr: String, k: Int): String = {
    val concat = (0 until k).map(j => s"$toksExpr[i + $j]").mkString(" || ' ' || ")
    s"[$concat FOR i IN range(1, greatest(len($toksExpr) - ${k - 2}, 1))]"
  }

  /** Smoothed IDF, scikit-learn semantics: ln((1+N)/(1+df)) + 1. */
  def idf(nDocs: Column, df: Column): Column =
    log((lit(1) + nDocs).cast("double") / (lit(1) + df)) + lit(1.0)

  def idfSql(n: String, df: String): String =
    s"ln((1 + $n) / CAST(1 + $df AS DOUBLE)) + 1"
}
