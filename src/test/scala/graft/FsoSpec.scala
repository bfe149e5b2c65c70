package graft

import graft.operators.Fso
import org.apache.spark.sql.functions._

/** FSO parent-pointer path resolution (operators/Fso.scala): the iterative
  * pointer-jumping walk reconstructs absolute paths from (obj_id,
  * parent_id, name) rows alone — deep chains, multiple buckets, name
  * reuse across buckets, and broken pointers.
  */
class FsoSpec extends SparkSpec {
  import spark.implicits._

  private def dirs(rows: (String, String, Long, Long, String)*) =
    rows.toDF("volume", "bucket", "obj_id", "parent_id", "name")

  test("deep chains resolve to full paths with segment depth") {
    val d = dirs(
      ("v", "b", 1L, 0L, "a"),
      ("v", "b", 2L, 1L, "bb"),
      ("v", "b", 3L, 2L, "ccc"),
      ("v", "b", 4L, 3L, "dddd"),
      ("v", "b", 5L, 4L, "eeeee"))
    val got = Fso.resolvePaths(d)
      .select("obj_id", "abs_path", "depth").as[(Long, String, Int)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, "a", 1), (2L, "a/bb", 2), (3L, "a/bb/ccc", 3),
      (4L, "a/bb/ccc/dddd", 4), (5L, "a/bb/ccc/dddd/eeeee", 5)))
  }

  test("same names in different buckets resolve independently") {
    val d = dirs(
      ("v", "b1", 10L, 0L, "data"),
      ("v", "b1", 11L, 10L, "x"),
      ("v", "b2", 10L, 0L, "data"),
      ("v", "b2", 11L, 10L, "y"))
    val got = Fso.resolvePaths(d)
      .select("bucket", "abs_path").as[(String, String)].collect().toSet
    assert(got === Set(("b1", "data"), ("b1", "data/x"),
      ("b2", "data"), ("b2", "data/y")))
  }

  test("a dir whose pointer chain never reaches a root is dropped") {
    val d = dirs(
      ("v", "b", 1L, 0L, "ok"),
      ("v", "b", 7L, 99L, "orphan")) // parent 99 doesn't exist
    val got = Fso.resolvePaths(d).select("abs_path").as[String].collect()
    assert(got.toSeq === Seq("ok"))
  }

  test("derived dirTable paths are exactly the distinct key prefixes") {
    val resolved = Fso.resolvePaths(ObjectStoreView.dirTable(spark, sf))
      .select(col("volume"), col("bucket"), col("abs_path")).distinct()
    val expected = ObjectStoreView.keys(spark, sf)
      .select(col("volume"), col("bucket"),
        explode(array(
          substring_index(col("key"), "/", 1),
          substring_index(col("key"), "/", 2),
          substring_index(col("key"), "/", 3))).as("abs_path"))
      .distinct()
    assert(resolved.exceptAll(expected).isEmpty &&
      expected.exceptAll(resolved).isEmpty)
    // Every resolved dir carries the right depth.
    val badDepth = Fso.resolvePaths(ObjectStoreView.dirTable(spark, sf))
      .filter(col("depth") =!=
        size(split(col("abs_path"), "/"))).count()
    assert(badDepth === 0)
  }

  test("fso du: depth-1 subtree totals cover every key exactly once") {
    val du = Fso.nsFsoDu(spark, sf)
    val roots = du.filter(col("depth") === 1)
      .agg(sum("subtree_files"), sum("subtree_bytes"))
      .as[(Long, Long)].head()
    val keys = ObjectStoreView.keys(spark, sf)
      .agg(count(lit(1)), sum("size")).as[(Long, Long)].head()
    assert(roots === keys, "depth-1 dirs partition the key space")
    // A child subtree never exceeds its parent's.
    val parentOf = du.select(col("volume"), col("bucket"),
      col("abs_path").as("p_path"), col("subtree_bytes").as("p_bytes"))
    val violations = du
      .filter(col("depth") > 1)
      .withColumn("p_path", regexp_replace(col("abs_path"), "/[^/]*$", ""))
      .join(parentOf, Seq("volume", "bucket", "p_path"))
      .filter(col("subtree_bytes") > col("p_bytes"))
      .count()
    assert(violations === 0)
  }

  test("placement violations partition all containers and spot-check racks") {
    val st = operators.Containers.ctPlacementViolations(spark, sf)
      .select("placement_state", "n_containers").as[(String, Long)]
      .collect().toMap
    val nContainers = ObjectStoreView.containerKeys(spark, sf)
      .select("container_id").distinct().count()
    assert(st.values.sum === nContainers, "states partition the containers")
    // Fixed arithmetic: container 1 has (1*31+7)%5 = 3 replicas on nodes
    // (1*31+r*17)%20 for r=1..3 = {8,5,2} -> racks {0,1,2} -> COMPLIANT.
    assert(st.contains("COMPLIANT"))
  }

  test("decommission impact counts only hosted containers and risk is monotone") {
    val impact = operators.Containers.ctDecommissionImpact(spark, sf)
    val rows = impact.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, under, missing) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(missing <= under, "missing-after is a subset of under-after")
      assert(under <= n, "at-risk containers are a subset of hosted")
    }
  }
}
