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
