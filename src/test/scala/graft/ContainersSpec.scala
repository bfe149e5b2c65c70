package graft

import graft.operators.Containers

/** Semantic invariants of the SCM-derived container operators (value-level
  * equality is the DuckDB oracle's job; these pin the rule/plan semantics).
  */
class ContainersSpec extends SparkSpec {

  test("safemode status reports the four SCM exit rules with verdicts") {
    val rows = Containers.ctSafemodeStatus(spark, sf).collect()
    val rules = rows.map(_.getString(0)).toSeq
    assert(rules == Seq("CONTAINER", "DATANODE", "HEALTHY_PIPELINE",
      "ONE_REPLICA_PIPELINE"))
    rows.foreach { r =>
      val (obs, req, passed) = (r.getLong(1), r.getLong(2), r.getBoolean(4))
      assert(passed == (obs >= req), s"verdict mismatch for ${r.getString(0)}")
    }
    // Every reported pipeline has >= 1 replica by construction.
    val oneReplica = rows.find(_.getString(0) == "ONE_REPLICA_PIPELINE").get
    assert(oneReplica.getLong(1) == 1000000L && oneReplica.getBoolean(4))
  }

  test("balancer moves go from over- to under-utilized nodes, largest first") {
    val moves = Containers.ctBalancerMoves(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getAs[Number](4).longValue))
    assert(moves.nonEmpty)
    // move_id is a gapless 1..n ranking.
    assert(moves.map(_._1).toSeq == (1L to moves.length).toSeq)
    assert(moves.forall(m => m._3 != m._4), "self-move")
    assert(moves.forall(_._5 > 0), "empty move")
    // Within a donor node, moves are ordered largest-bytes first.
    moves.groupBy(_._3).foreach { case (_, ms) =>
      val bytes = ms.sortBy(_._1).map(_._5).toSeq
      assert(bytes == bytes.sortBy(-_), "donor not draining largest first")
    }
    // Donor and receiver sets are disjoint.
    assert(moves.map(_._3).toSet.intersect(moves.map(_._4).toSet).isEmpty)
  }
}
