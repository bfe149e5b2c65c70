package graft.operators

import graft.ObjectStoreView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FSO (FILE_SYSTEM_OPTIMIZED) namespace resolution (SURVEY §2.A).
  *
  * The reference's FSO bucket layout stores directories as parent-pointer
  * rows — OmDirectoryInfo carries only (name, objectID, parentObjectID),
  * never the absolute path (common/.../om/helpers/OmDirectoryInfo.java:
  * 63-68) — and every path operation resolves by walking the dirTable
  * (ozone-manager/.../om/request/file/OMFileRequest.java). Recon's
  * NSSummary tree does the same walk in bulk. This operator is that walk as
  * a distributed plan: absolute paths for ALL directories at once.
  *
  * Algorithm: iterative pointer-jumping — round k joins every unresolved
  * directory (one whose walk hasn't reached a bucket root, parent_id 0) to
  * the dir table on its current ancestor id and prepends that ancestor's
  * name. Each round is one hash join on an 8-byte id keyed both sides, so
  * round cost is O(unresolved dirs), and the number of rounds is the tree
  * DEPTH, not the tree size — at 100 TB a namespace is millions of dirs
  * but ~10 levels deep, so ~10 shuffles of shrinking frames. Resolved rows
  * leave the loop immediately (they stop paying join cost), and each
  * round's frontier is localCheckpoint'ed so round N plans against a
  * materialized N-1 (same Pregel discipline as Dedup.componentLabels).
  * The convergence probe is an isEmpty on the checkpointed frontier.
  */
object Fso {

  /** Absolute path + depth for every directory in a parent-pointer dir
    * table (volume, bucket, obj_id, parent_id, name). Dirs whose pointer
    * chain doesn't reach a root (corrupt table) are dropped by the inner
    * join, mirroring the reference's OM_DIRECTORY_NOT_FOUND on a broken
    * walk; the MaxDepth guard bounds the loop against pointer cycles.
    */
  private val MaxDepth = 50

  def resolvePaths(dirsIn: DataFrame): DataFrame = {
    // The dir table is joined once per depth level — checkpoint it so the
    // derivation (whatever produced it) runs once, not once per round.
    val dirs = dirsIn.localCheckpoint()
    val parents = dirs.select(col("volume").as("p_volume"),
      col("bucket").as("p_bucket"),
      col("obj_id").as("p_id"), col("name").as("p_name"),
      col("parent_id").as("p_parent"))

    val start = dirs.select(col("volume"), col("bucket"), col("obj_id"),
      col("name").as("abs_path"), col("parent_id").as("cur"),
      lit(1).as("depth"))
    var resolved = start.filter(col("cur") === 0L)
    var pending = start.filter(col("cur") =!= 0L).localCheckpoint()
    var rounds = 0
    while (rounds < MaxDepth && !pending.isEmpty) {
      val stepped = pending
        .join(parents, pending("volume") === parents("p_volume") &&
          pending("bucket") === parents("p_bucket") &&
          pending("cur") === parents("p_id"))
        .select(pending("volume"), pending("bucket"), col("obj_id"),
          concat(col("p_name"), lit("/"), col("abs_path")).as("abs_path"),
          col("p_parent").as("cur"), (col("depth") + 1).as("depth"))
      resolved = resolved.union(stepped.filter(col("cur") === 0L))
      pending = stepped.filter(col("cur") =!= 0L).localCheckpoint()
      rounds += 1
    }
    resolved.select(col("volume"), col("bucket"), col("obj_id"),
      col("abs_path"), col("depth"))
  }

  def nsFsoPaths(spark: SparkSession, dir: String): DataFrame =
    resolvePaths(ObjectStoreView.dirTable(spark, dir))
      .orderBy(col("volume").asc, col("bucket").asc, col("abs_path").asc)

  /** Oracle: the same walk as a recursive CTE over the same dirTable. */
  val nsFsoPathsSql: String =
    s"""WITH RECURSIVE ${ObjectStoreView.dirTableSql}, walk AS (
       |  SELECT volume, bucket, obj_id, name AS abs_path,
       |    parent_id AS cur, 1 AS depth
       |  FROM dirs
       |  UNION ALL
       |  SELECT w.volume, w.bucket, w.obj_id,
       |    d.name || '/' || w.abs_path, d.parent_id, w.depth + 1
       |  FROM walk w JOIN dirs d
       |    ON w.volume = d.volume AND w.bucket = d.bucket AND w.cur = d.obj_id
       |)
       |SELECT volume, bucket, obj_id, abs_path, CAST(depth AS INT) AS depth
       |FROM walk WHERE cur = 0
       |ORDER BY volume ASC, bucket ASC, abs_path ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_fso_paths" -> nsFsoPaths)

  val oracles: Map[String, String] = Map(
    "ns_fso_paths" -> nsFsoPathsSql)
}
