package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupOps

class DedupCorpusSpec extends AnyFunSuite with SharedSpark {

  test("q70 components are consistent with the q49 edge set") {
    val rows = DedupOps.q70(spark, SF).collect()
    val root = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total: every doc labeled
    assert(rows.length === Tables.documents(spark, SF).count())
    // root is a fixpoint representative: root(root(x)) == root(x), root <= x
    root.foreach { case (d, r) =>
      assert(r <= d)
      assert(root(r) === r, s"root of $d is $r but root($r)=${root(r)}")
    }
    // every edge joins two docs of the same component
    DedupOps.q49(spark, SF).collect().foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      assert(root(a) === root(b), s"edge ($a,$b) spans components")
    }
    // keeper flags mark exactly the component representatives
    val keepers = rows.filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    assert(keepers === root.values.toSet)
  }

  test("q70 lineage is truncated by per-round checkpoints") {
    // without localCheckpoint each round stacks a join-select layer on the
    // previous one, so the final plan embeds the whole q49 pipeline times
    // the round count; with eager checkpoints the returned plan is just
    // scan-of-blocks -> project -> sort, regardless of iterations
    val plan = DedupOps.q70(spark, SF).queryExecution.optimizedPlan
    val depth = plan.numberedTreeString.linesIterator.size
    assert(depth <= 12, s"q70 lineage unexpectedly deep ($depth nodes):\n$plan")
    assert(plan.collectFirst {
      case l if l.getClass.getSimpleName == "LogicalRDD" => l }.isDefined,
      s"expected checkpointed scan at the leaves:\n$plan")
  }
}
