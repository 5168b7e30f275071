package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Op

/** The composed training-data selection pipeline (SURVEY §2 row 77) —
  * what a 100 TB corpus run actually executes end-to-end: language gate
  * (q44's marker-word ID), quality gate (q45's length/symbol metrics),
  * near-dup keeper gate (q70's connected-component representative), one
  * decision row per document with each gate's verdict.
  *
  * Plan shape: three per-doc relations, each one corpus-linear pass,
  * equi-joined on doc_id (shuffle on the key or broadcast at dim sizes —
  * Catalyst's choice under AQE); the gates themselves are codegen'd
  * boolean expressions. Nothing quadratic, nothing collected.
  */
object PipelineOps {

  def q77(s: SparkSession, dir: String): DataFrame = {
    val lang = TextOps.q44(s, dir).select(col("doc_id"), col("pred_lang"))
    val qual = TextOps.q45(s, dir)
      .select(col("doc_id").as("d2"), col("n_toks"), col("non_alnum_ratio"))
    val keep = DedupOps.q70(s, dir)
      .select(col("doc_id").as("d3"), col("is_keeper"))
    lang
      .join(qual, col("doc_id") === col("d2"))
      .join(keep, col("doc_id") === col("d3"))
      .select(col("doc_id"),
        (col("pred_lang") === "en").cast("int").as("is_en"),
        (col("n_toks") >= 10 && col("non_alnum_ratio") <= 0.5)
          .cast("int").as("quality_ok"),
        col("is_keeper"),
        (col("pred_lang") === "en" &&
          col("n_toks") >= 10 && col("non_alnum_ratio") <= 0.5 &&
          col("is_keeper") === 1).cast("int").as("selected"))
      .orderBy(col("doc_id"))
  }

  private lazy val q44Body: String =
    TextOps.q44Sql.split("\nORDER BY")(0)
  private lazy val q45Body: String =
    TextOps.q45Sql.split("\nORDER BY")(0)

  lazy val q77Sql: String =
    s"""WITH RECURSIVE ${DedupOps.q49CcCtesSql},
       |lang AS (SELECT doc_id, pred_lang FROM ($q44Body) _l),
       |qual AS (SELECT doc_id, n_toks, non_alnum_ratio FROM ($q45Body) _q)
       |SELECT l.doc_id,
       |  CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END AS is_en,
       |  CASE WHEN n_toks >= 10 AND non_alnum_ratio <= 0.5 THEN 1 ELSE 0 END AS quality_ok,
       |  CASE WHEN r.doc_id = r.root THEN 1 ELSE 0 END AS is_keeper,
       |  CASE WHEN pred_lang = 'en' AND n_toks >= 10 AND non_alnum_ratio <= 0.5
       |    AND r.doc_id = r.root THEN 1 ELSE 0 END AS selected
       |FROM lang l
       |JOIN qual q ON l.doc_id = q.doc_id
       |JOIN roots r ON l.doc_id = r.doc_id
       |ORDER BY l.doc_id""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q77_corpus_select", q77, Some(q77Sql)),
  )
}
