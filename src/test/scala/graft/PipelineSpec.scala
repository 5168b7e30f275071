package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, PipelineOps, TextOps}

class PipelineSpec extends AnyFunSuite with SharedSpark {

  test("q77 gates compose consistently with their source operators") {
    val rows = PipelineOps.q77(spark, SF).collect()
    assert(rows.length === Tables.documents(spark, SF).count())
    // selected is exactly the conjunction of the three gates
    rows.foreach { r =>
      val conj = r.getAs[Int]("is_en") * r.getAs[Int]("quality_ok") *
        r.getAs[Int]("is_keeper")
      assert(r.getAs[Int]("selected") === conj)
    }
    // gate columns agree with the operators they come from
    val en = TextOps.q44(spark, SF).collect()
      .filter(_.getAs[String]("pred_lang") == "en").map(_.getLong(0)).toSet
    assert(rows.filter(_.getAs[Int]("is_en") == 1).map(_.getLong(0)).toSet === en)
    val keepers = DedupOps.q70(spark, SF).collect()
      .filter(_.getAs[Int]("is_keeper") == 1).map(_.getLong(0)).toSet
    assert(rows.filter(_.getAs[Int]("is_keeper") == 1).map(_.getLong(0)).toSet
      === keepers)
    // the pipeline actually selects a non-trivial, non-total subset
    val nSel = rows.count(_.getAs[Int]("selected") == 1)
    assert(nSel > 0 && nSel < rows.length)
  }
}
