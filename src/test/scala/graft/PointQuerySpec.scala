package graft

import org.apache.spark.sql.functions._
import graft.operators.{Containers, Entities, Namespace}

/** The parameterized point-query APIs (VERDICT r10 #8): the registered
  * queries bind one oracle-derivable identity, but the PUBLIC shapes must
  * be callable with ANY probe identity — these tests call them with
  * non-default bindings and pin the semantics.
  */
class PointQuerySpec extends SparkSpec {

  test("containerBlocks is callable with any container id") {
    val other = Containers.containerBlocks(spark, sf, 7L).collect()
    assert(other.nonEmpty)
    assert(other.forall(_.getLong(0) == 7L),
      "drill-down leaked rows from other containers")
    // The registered query IS the bound example.
    val bound = Containers.ctContainerBlocks(spark, sf).collect()
    assert(bound.forall(_.getLong(0) == Containers.FsckContainer))
    assert(other.map(_.getLong(0)).toSet != bound.map(_.getLong(0)).toSet)
  }

  test("lookupKeyAt resolves an explicit key identically to the min-key binding") {
    val keys = ObjectStoreView.keys(spark, sf)
    val ck = ObjectStoreView.containerKeys(spark, sf)
    // The key the registered binding resolves implicitly, fetched here.
    val probe = keys.filter(col("volume") === "vol1" && col("bucket") === "b2")
      .agg(min(col("key"))).collect().head.getString(0)
    val explicit = Namespace.lookupKeyAt(keys, ck, "vol1", "b2", probe)
      .collect().map(_.toSeq).toSeq
    val implicit_ = Namespace.lookupKey(keys, ck, "vol1", "b2")
      .collect().map(_.toSeq).toSeq
    assert(explicit.nonEmpty && explicit == implicit_,
      "explicit-key lookup must equal the min-key binding on the same key")
    assert(explicit.forall(_(2) == probe))
    // And an absent key returns an empty (not failing) frame.
    assert(Namespace.lookupKeyAt(keys, ck, "vol1", "b2", "no/such.obj").isEmpty)
  }

  test("checkAccess grants the owner every right and is callable per identity") {
    val owner = Entities.checkAccess(spark, sf, "u1", "vol1").collect()
    assert(owner.length == 3 && owner.forall(_.getAs[Boolean]("allowed")),
      "vol1's owner u1 must hold READ/WRITE/LIST via the owner bypass")
    assert(owner.forall(_.getAs[String]("user") == "u1"))
    // The registered query IS the bound (non-owner) example.
    val bound = Entities.nsCheckAccess(spark, sf).collect()
    val param = Entities.checkAccess(spark, sf,
      Entities.AccessUser, Entities.AccessVolume).collect()
    assert(bound.map(_.toSeq).toSeq == param.map(_.toSeq).toSeq)
  }
}
