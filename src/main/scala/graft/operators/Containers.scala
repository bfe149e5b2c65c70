package graft.operators

import graft.ObjectStoreView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-container & cluster-state analytics (SURVEY §2.A extension) —
  * the reference's Recon container surface re-expressed as DataFrame plans
  * over the container→key mapping:
  *
  *  - keys per container — recon/.../api/ContainerEndpoint.java:140
  *    (`/{id}/keys`), built by tasks/ContainerKeyMapperTask.java;
  *  - missing containers and the keys they strand —
  *    ContainerEndpoint.java:241 (`/missing`);
  *  - unhealthy-by-state rollup — ContainerEndpoint.java:285
  *    (`/unhealthy/{state}`), SCM ReplicationManager health states;
  *  - cluster state totals — recon/.../api/ClusterStateEndpoint.java:79;
  *  - per-datanode hosting report — recon/.../api/NodeEndpoint.java:84,
  *    replica placement derived with fixed arithmetic.
  *
  * Scale notes (SURVEY §5): every rollup is one scan of the container-key
  * map + one shuffle on its grouping key with map-side partial aggregation;
  * the per-container rollup feeds the health/missing/node reports, and the
  * replica explode is bounded (≤ 4 rows per container).
  */
object Containers {

  private val cks = ObjectStoreView.containerKeysSql
  private def repl(e: String) = ObjectStoreView.containerReplicasSql(e)
  private val Target = 3

  /** Per-container rollup with derived replica count. */
  private def containerStats(spark: SparkSession, dir: String): DataFrame =
    ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_keys"), sum(col("size")).as("total_bytes"))
      .withColumn("replicas",
        ObjectStoreView.containerReplicas(col("container_id")))

  private val containerStatsSql: String =
    s"""container_keys AS ($cks), cont AS (
       |  SELECT container_id, COUNT(*) AS n_keys,
       |    CAST(SUM(size) AS BIGINT) AS total_bytes,
       |    ${repl("container_id")} AS replicas
       |  FROM container_keys GROUP BY container_id
       |)""".stripMargin

  // --- ct_keys_per_container: the ContainerKeyMapper inverse map ----------
  def ctKeysPerContainer(spark: SparkSession, dir: String): DataFrame =
    ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_keys"), sum(col("size")).as("total_bytes"),
        countDistinct(col("volume"), col("bucket")).as("n_buckets"))
      .orderBy(col("container_id").asc)

  val ctKeysPerContainerSql: String =
    s"""WITH container_keys AS ($cks)
       |SELECT container_id, COUNT(*) AS n_keys,
       |  CAST(SUM(size) AS BIGINT) AS total_bytes,
       |  COUNT(DISTINCT volume || '/' || bucket) AS n_buckets
       |FROM container_keys GROUP BY container_id
       |ORDER BY container_id ASC""".stripMargin

  // --- ct_missing_container_keys: keys stranded in 0-replica containers --
  /** "Which keys live in this missing container" — Recon's flagship ops
    * question (ContainerEndpoint `/missing` + `/{id}/keys`).
    */
  def ctMissingContainerKeys(spark: SparkSession, dir: String): DataFrame =
    ObjectStoreView.containerKeys(spark, dir)
      .filter(ObjectStoreView.containerReplicas(col("container_id")) === 0)
      .select("container_id", "volume", "bucket", "key", "size")
      .orderBy(col("container_id").asc, col("volume").asc, col("bucket").asc,
        col("key").asc)

  val ctMissingContainerKeysSql: String =
    s"""WITH container_keys AS ($cks)
       |SELECT container_id, volume, bucket, key, size FROM container_keys
       |WHERE ${repl("container_id")} = 0
       |ORDER BY container_id ASC, volume ASC, bucket ASC, key ASC""".stripMargin

  // --- ct_unhealthy_containers: health-state rollup -----------------------
  def ctUnhealthyContainers(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .withColumn("health",
        when(col("replicas") === 0, "MISSING")
          .when(col("replicas") < Target, "UNDER_REPLICATED")
          .when(col("replicas") === Target, "HEALTHY")
          .otherwise("OVER_REPLICATED"))
      .groupBy(col("health"))
      .agg(count(lit(1)).as("n_containers"),
        sum(col("n_keys")).as("n_keys"),
        sum(col("total_bytes")).as("total_bytes"))
      .orderBy(col("health").asc)

  val ctUnhealthyContainersSql: String =
    s"""WITH $containerStatsSql
       |SELECT CASE WHEN replicas = 0 THEN 'MISSING'
       |  WHEN replicas < $Target THEN 'UNDER_REPLICATED'
       |  WHEN replicas = $Target THEN 'HEALTHY'
       |  ELSE 'OVER_REPLICATED' END AS health,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes
       |FROM cont GROUP BY health ORDER BY health ASC""".stripMargin

  // --- ct_repair_priority: the under-replication repair queue -------------
  /** The ranked repair queue SCM's ReplicationManager works through: every
    * container below the replication target, ordered by urgency — missing
    * replica count first (0 live replicas = potential data loss at the
    * head), then bytes at risk (missing × stored bytes, exact integer),
    * container id as the deterministic tie-break. Top-20 via TakeOrdered —
    * the queue head, never a global sort of the container set.
    * Reference: SCM ReplicationManager under/mis-replication handling
    * (hdds/server-scm/.../container/replication/ReplicationManager.java,
    * UnderReplicatedProcessor).
    */
  def ctRepairPriority(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .filter(col("replicas") < Target)
      .withColumn("missing_replicas", lit(Target) - col("replicas"))
      .withColumn("risk_bytes", col("missing_replicas") * col("total_bytes"))
      .withColumn("health",
        when(col("replicas") === 0, "MISSING").otherwise("UNDER_REPLICATED"))
      .select("container_id", "health", "replicas", "missing_replicas",
        "n_keys", "total_bytes", "risk_bytes")
      .orderBy(col("missing_replicas").desc, col("total_bytes").desc,
        col("container_id").asc)
      .limit(20)

  val ctRepairPrioritySql: String =
    s"""WITH $containerStatsSql
       |SELECT container_id,
       |  CASE WHEN replicas = 0 THEN 'MISSING'
       |    ELSE 'UNDER_REPLICATED' END AS health,
       |  replicas, $Target - replicas AS missing_replicas,
       |  n_keys, total_bytes,
       |  CAST(($Target - replicas) * total_bytes AS BIGINT) AS risk_bytes
       |FROM cont WHERE replicas < $Target
       |ORDER BY missing_replicas DESC, total_bytes DESC, container_id ASC
       |LIMIT 20""".stripMargin

  // --- ct_cluster_state: one-row cluster totals ---------------------------
  /** Single scan of the container-key map (it carries volume/bucket/state
    * alongside container_id, so no join is needed for the rollup).
    */
  def ctClusterState(spark: SparkSession, dir: String): DataFrame =
    ObjectStoreView.containerKeys(spark, dir)
      .agg(
        countDistinct(col("volume")).as("n_volumes"),
        countDistinct(col("volume"), col("bucket")).as("n_buckets"),
        count(lit(1)).as("n_keys"),
        sum(col("size")).as("total_bytes"),
        sum(when(col("state") === "OPEN", 1L).otherwise(0L)).as("n_open_keys"),
        countDistinct(col("container_id")).as("n_containers"),
        countDistinct(
          when(ObjectStoreView.containerReplicas(col("container_id")) === 0,
            col("container_id"))).as("n_missing_containers"))

  val ctClusterStateSql: String =
    s"""WITH container_keys AS ($cks)
       |SELECT
       |  COUNT(DISTINCT volume) AS n_volumes,
       |  COUNT(DISTINCT volume || '/' || bucket) AS n_buckets,
       |  COUNT(*) AS n_keys,
       |  CAST(SUM(size) AS BIGINT) AS total_bytes,
       |  CAST(SUM(CASE WHEN state = 'OPEN' THEN 1 ELSE 0 END) AS BIGINT) AS n_open_keys,
       |  COUNT(DISTINCT container_id) AS n_containers,
       |  COUNT(DISTINCT CASE WHEN ${repl("container_id")} = 0
       |    THEN container_id END) AS n_missing_containers
       |FROM container_keys""".stripMargin

  // --- ct_node_report: per-datanode hosted replicas -----------------------
  /** Replica r of container c lives on node (c*31 + r*17) % 20 — fixed
    * arithmetic placement (the reference tracks real datanode reports;
    * NodeEndpoint.java:84). Bounded explode: ≤ 4 replica rows/container.
    */
  def ctNodeReport(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("n_keys"), col("total_bytes"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_container_replicas"),
        sum(col("total_bytes")).as("hosted_bytes"))
      .orderBy(col("node_id").asc)

  val ctNodeReportSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT (cont.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    cont.total_bytes
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |)
       |SELECT node_id, COUNT(*) AS n_container_replicas,
       |  CAST(SUM(total_bytes) AS BIGINT) AS hosted_bytes
       |FROM placed GROUP BY node_id ORDER BY node_id ASC""".stripMargin

  // --- ct_rack_report: per-rack utilization rollup -------------------------
  /** Per-rack capacity view over the same arithmetic placement as
    * [[ctNodeReport]] / [[ctPlacementViolations]] (rack = node % 4, 5
    * nodes per rack): distinct datanodes seen, hosted container replicas,
    * replica bytes and each rack's byte share in exact ppm — what a
    * rack-aware balancer reads before choosing move targets
    * (ContainerBalancer + SCMContainerPlacementRackAware semantics).
    * Bounded replica explode → one rack rollup; the share window runs
    * over the 4-row rack frame.
    */
  def ctRackReport(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("total_bytes"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .withColumn("rack", col("node_id") % 4)
      .groupBy(col("rack"))
      .agg(countDistinct(col("node_id")).as("n_nodes"),
        count(lit(1)).as("n_replicas"),
        sum(col("total_bytes")).as("replica_bytes"))
      .withColumn("bytes_ppm", expr(graft.functions.Codes.sharePpmExpr(
        "replica_bytes", "sum(replica_bytes) OVER ()")))
      .select("rack", "n_nodes", "n_replicas", "replica_bytes", "bytes_ppm")
      .orderBy(col("rack").asc)

  val ctRackReportSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT (cont.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    cont.total_bytes
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), racks AS (
       |  SELECT node_id % 4 AS rack, COUNT(DISTINCT node_id) AS n_nodes,
       |    COUNT(*) AS n_replicas,
       |    CAST(SUM(total_bytes) AS BIGINT) AS replica_bytes
       |  FROM placed GROUP BY rack
       |)
       |SELECT rack, n_nodes, n_replicas, replica_bytes,
       |  CAST(${graft.functions.Codes.sharePpmSql("replica_bytes",
               "SUM(replica_bytes) OVER ()")} AS BIGINT) AS bytes_ppm
       |FROM racks ORDER BY rack ASC""".stripMargin

  // --- ct_cold_containers: access-tier / archival planning -----------------
  /** Storage-tiering report: containers classed HOT (< 30 days since their
    * newest key), WARM (< 365) or COLD by whole days between each
    * container's latest key mtime and the namespace's latest activity
    * (integer-µs arithmetic — the archival-candidate sweep an
    * object-store lifecycle policy runs before moving cold containers to
    * dense storage). Per tier: containers, keys, bytes, and the exact
    * age-day range. One container aggregate + a 1-row broadcast maximum;
    * the tier rollup runs over the container frame.
    */
  def ctColdContainers(spark: SparkSession, dir: String): DataFrame = {
    val per = ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_keys"), sum(col("size")).as("total_bytes"),
        // mtime reads as TIMESTAMP_NTZ from the native-µs parquet; the
        // cast reinterprets the same wall-clock micros under the UTC
        // session, matching DuckDB's epoch_us of its naive read.
        max(unix_micros(col("mtime").cast("timestamp"))).as("last_us"))
    val tot = per.agg(max(col("last_us")).as("now_us"))
    per.crossJoin(broadcast(tot))
      .withColumn("age_days", expr("(now_us - last_us) DIV 86400000000"))
      .withColumn("tier",
        when(col("age_days") < 30, "HOT")
          .when(col("age_days") < 365, "WARM")
          .otherwise("COLD"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_containers"), sum(col("n_keys")).as("n_keys"),
        sum(col("total_bytes")).as("total_bytes"),
        min(col("age_days")).as("min_age_days"),
        max(col("age_days")).as("max_age_days"))
      .orderBy(col("tier").asc)
  }

  val ctColdContainersSql: String =
    s"""WITH container_keys AS ($cks), per AS (
       |  SELECT container_id, COUNT(*) AS n_keys,
       |    CAST(SUM(size) AS BIGINT) AS total_bytes,
       |    MAX(epoch_us(mtime)) AS last_us
       |  FROM container_keys GROUP BY container_id
       |), tot AS (
       |  SELECT MAX(last_us) AS now_us FROM per
       |), aged AS (
       |  SELECT n_keys, total_bytes,
       |    (now_us - last_us) // 86400000000 AS age_days
       |  FROM per, tot
       |)
       |SELECT CASE WHEN age_days < 30 THEN 'HOT'
       |    WHEN age_days < 365 THEN 'WARM' ELSE 'COLD' END AS tier,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes,
       |  CAST(MIN(age_days) AS BIGINT) AS min_age_days,
       |  CAST(MAX(age_days) AS BIGINT) AS max_age_days
       |FROM aged GROUP BY tier ORDER BY tier ASC""".stripMargin

  // --- ct_pipeline_report: write-pipeline rollup ---------------------------
  /** Containers with replicas ≥ 1 write through pipeline container_id % 30
    * (fixed-arithmetic placement; the reference tracks Raft pipelines in
    * SCM — recon/.../api/PipelineEndpoint.java:74 serves this rollup).
    * A pipeline is healthy when every container on it has ≥ target
    * replicas.
    */
  def ctPipelineReport(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .withColumn("pipeline_id", col("container_id") % 30)
      .groupBy(col("pipeline_id"))
      .agg(
        count(lit(1)).as("n_containers"),
        sum(col("n_keys")).as("n_keys"),
        sum(col("total_bytes")).as("total_bytes"),
        min(col("replicas")).as("min_replicas"),
        when(min(col("replicas")) >= Target, "HEALTHY")
          .otherwise("DEGRADED").as("pipeline_health"))
      .orderBy(col("pipeline_id").asc)

  val ctPipelineReportSql: String =
    s"""WITH $containerStatsSql
       |SELECT container_id % 30 AS pipeline_id,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes,
       |  MIN(replicas) AS min_replicas,
       |  CASE WHEN MIN(replicas) >= $Target THEN 'HEALTHY'
       |    ELSE 'DEGRADED' END AS pipeline_health
       |FROM cont WHERE replicas >= 1
       |GROUP BY pipeline_id ORDER BY pipeline_id ASC""".stripMargin

  // --- ct_balancer_report: datanode utilization vs cluster mean -----------
  /** Per-node utilization deviation — the input SCM's ContainerBalancer
    * works from (hdds-server-scm/.../container/balancer/
    * ContainerBalancerTask: over/under-utilized nodes vs cluster average
    * utilization ± threshold). Reuses the node placement of
    * [[ctNodeReport]]; the cluster mean is a window over the 20-row node
    * rollup (a per-node aggregate at real scale — thousands of rows, still
    * tiny). Threshold ±10%, the balancer's default shape.
    */
  def ctBalancerReport(spark: SparkSession, dir: String): DataFrame = {
    val perNode = containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("total_bytes"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .groupBy(col("node_id"))
      .agg(sum(col("total_bytes")).as("hosted_bytes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    perNode
      .withColumn("cluster_avg_bytes",
        (sum(col("hosted_bytes")).over(w) / count(lit(1)).over(w))
          .cast("double"))
      .withColumn("utilization_ratio",
        round(col("hosted_bytes").cast("double") / col("cluster_avg_bytes"), 6))
      .withColumn("balance_state",
        when(col("utilization_ratio") > 1.1, "OVER_UTILIZED")
          .when(col("utilization_ratio") < 0.9, "UNDER_UTILIZED")
          .otherwise("WITHIN_THRESHOLD"))
      .select(col("node_id"), col("hosted_bytes"),
        round(col("cluster_avg_bytes"), 6).as("cluster_avg_bytes"),
        col("utilization_ratio"), col("balance_state"))
      .orderBy(col("node_id").asc)
  }

  val ctBalancerReportSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT (cont.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    cont.total_bytes
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), pernode AS (
       |  SELECT node_id, CAST(SUM(total_bytes) AS BIGINT) AS hosted_bytes
       |  FROM placed GROUP BY node_id
       |), stats AS (
       |  SELECT node_id, hosted_bytes,
       |    CAST(SUM(hosted_bytes) OVER () AS DOUBLE) / COUNT(*) OVER () AS avg_b
       |  FROM pernode
       |)
       |SELECT node_id, hosted_bytes,
       |  round(avg_b, 6) AS cluster_avg_bytes,
       |  round(CAST(hosted_bytes AS DOUBLE) / avg_b, 6) AS utilization_ratio,
       |  CASE WHEN round(CAST(hosted_bytes AS DOUBLE) / avg_b, 6) > 1.1 THEN 'OVER_UTILIZED'
       |    WHEN round(CAST(hosted_bytes AS DOUBLE) / avg_b, 6) < 0.9 THEN 'UNDER_UTILIZED'
       |    ELSE 'WITHIN_THRESHOLD' END AS balance_state
       |FROM stats ORDER BY node_id ASC""".stripMargin

  // --- ct_decommission_impact: per-node decommission safety report -------
  /** For every datanode: what decommissioning it would do to the containers
    * it hosts — which would drop below the replication target and which
    * would go missing outright (their only replica), plus the key/byte
    * blast radius. This is the question SCM's decommission monitor answers
    * before letting a node leave (reference: NodeDecommissionManager and
    * DatanodeAdminMonitorImpl.java:275-297, which counts
    * sufficientlyReplicated vs underReplicated containers per
    * decommissioning node).
    *
    * Plan shape: the per-container rollup (one scan + one shuffle) explodes
    * to ≤ 4 replica placements per container and re-aggregates per node —
    * the same bounded expand as [[ctNodeReport]]; no joins.
    */
  def ctDecommissionImpact(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("n_keys"), col("total_bytes"),
        col("replicas"), explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .withColumn("under_after", col("replicas") - 1 < Target)
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_containers"),
        sum(when(col("under_after"), 1L).otherwise(0L)).as("n_under_after"),
        sum(when(col("replicas") === 1, 1L).otherwise(0L)).as("n_missing_after"),
        sum(when(col("under_after"), col("n_keys")).otherwise(0L)).as("at_risk_keys"),
        sum(when(col("under_after"), col("total_bytes")).otherwise(0L)).as("at_risk_bytes"))
      .orderBy(col("node_id").asc)

  val ctDecommissionImpactSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT (cont.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    cont.replicas, cont.n_keys, cont.total_bytes
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |)
       |SELECT node_id, COUNT(*) AS n_containers,
       |  CAST(SUM(CASE WHEN replicas - 1 < $Target THEN 1 ELSE 0 END) AS BIGINT) AS n_under_after,
       |  CAST(SUM(CASE WHEN replicas = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_after,
       |  CAST(SUM(CASE WHEN replicas - 1 < $Target THEN n_keys ELSE 0 END) AS BIGINT) AS at_risk_keys,
       |  CAST(SUM(CASE WHEN replicas - 1 < $Target THEN total_bytes ELSE 0 END) AS BIGINT) AS at_risk_bytes
       |FROM placed GROUP BY node_id ORDER BY node_id ASC""".stripMargin

  // --- ct_size_histogram: container size distribution ----------------------
  /** Containers bucketed by power-of-2 upper bound of their stored bytes —
    * the container twin of [[Namespace.fileSizeHistogram]] (Recon's
    * utilization surface serves both: recon/.../api/UtilizationEndpoint.java
    * with FileSizeCountTask; the container-size distribution panel applies
    * the same binning to container totals). Plan: the per-container rollup
    * (one scan + one shuffle) re-aggregates over 64 histogram cells — the
    * second shuffle moves one row per cell.
    */
  def ctSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .withColumn("bucket_exp",
        when(col("total_bytes") <= 1, 0)
          .otherwise(length(bin(col("total_bytes") - 1))))
      .groupBy(col("bucket_exp"))
      .agg(count(lit(1)).as("n_containers"),
        sum(col("n_keys")).as("n_keys"),
        sum(col("total_bytes")).as("total_bytes"))
      .orderBy(col("bucket_exp").asc)

  val ctSizeHistogramSql: String =
    s"""WITH $containerStatsSql
       |SELECT CASE WHEN total_bytes <= 1 THEN 0
       |    ELSE length(bin(total_bytes - 1)) END AS bucket_exp,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes
       |FROM cont GROUP BY bucket_exp ORDER BY bucket_exp ASC""".stripMargin

  // --- ct_placement_violations: rack-awareness placement audit -------------
  /** Rack-aware placement validation: SCM's rack-aware policy requires the
    * replicas of a container to span at least two racks (reference:
    * hadoop-hdds SCMContainerPlacementRackAware — fallback logic picks a
    * second rack; ReplicationManager treats single-rack placement as
    * mis-replicated). Racks derive from the node placement of
    * [[ctNodeReport]] with rack = node % 4 (5 nodes per rack). Per
    * placement state: container/key/byte totals.
    *
    * Plan: bounded replica explode (≤ 4 rows per container) → per-container
    * distinct-rack count (re-group on the partitioning already keyed by
    * container_id) → 4-row state rollup.
    */
  def ctPlacementViolations(spark: SparkSession, dir: String): DataFrame =
    containerStats(spark, dir)
      .select(col("container_id"), col("n_keys"), col("total_bytes"),
        col("replicas"),
        explode(sequence(lit(0), col("replicas"))).as("r"))
      // r = 0 is a sentinel keeping 0-replica containers in the frame (a
      // real replica row for r >= 1); countDistinct skips its NULL rack.
      .withColumn("rack",
        when(col("r") >= 1,
          ((col("container_id") * 31 + col("r") * 17) % 20) % 4))
      .groupBy(col("container_id"), col("n_keys"), col("total_bytes"),
        col("replicas"))
      .agg(countDistinct(col("rack")).as("n_racks"))
      .withColumn("placement_state",
        when(col("replicas") === 0, "MISSING")
          .when(col("replicas") === 1, "SINGLE_REPLICA")
          .when(col("n_racks") === 1, "SINGLE_RACK_VIOLATION")
          .otherwise("COMPLIANT"))
      .groupBy(col("placement_state"))
      .agg(count(lit(1)).as("n_containers"),
        sum(col("n_keys")).as("n_keys"),
        sum(col("total_bytes")).as("total_bytes"))
      .orderBy(col("placement_state").asc)

  val ctPlacementViolationsSql: String =
    s"""WITH $containerStatsSql, racks AS (
       |  SELECT cont.container_id, cont.n_keys, cont.total_bytes,
       |    cont.replicas,
       |    COUNT(DISTINCT ((cont.container_id * 31 + u.r * 17) % 20) % 4)
       |      AS n_racks
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  GROUP BY cont.container_id, cont.n_keys, cont.total_bytes,
       |    cont.replicas
       |  UNION ALL
       |  SELECT container_id, n_keys, total_bytes, replicas, 0 AS n_racks
       |  FROM cont WHERE replicas = 0
       |)
       |SELECT CASE WHEN replicas = 0 THEN 'MISSING'
       |    WHEN replicas = 1 THEN 'SINGLE_REPLICA'
       |    WHEN n_racks = 1 THEN 'SINGLE_RACK_VIOLATION'
       |    ELSE 'COMPLIANT' END AS placement_state,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(total_bytes) AS BIGINT) AS total_bytes
       |FROM racks GROUP BY placement_state
       |ORDER BY placement_state ASC""".stripMargin

  // --- ct_deleted_blocks_backlog: pending block-deletion work per node ----
  /** The SCM deleted-block log viewed per datanode: trash keys awaiting
    * purge become deletion transactions on their containers, and every
    * replica-hosting node owes one delete per transaction (reference:
    * hadoop-hdds/server-scm/.../block/DeletedBlockLogImpl.java — txns keyed
    * by containerID fan out to the container's datanodes via
    * DatanodeDeletedBlockTransactions; SCMBlockDeletingService drains
    * them). Transactions on 0-replica containers have no node to serve
    * them — surfaced as the node_id = -1 row (the stuck-deletes signal an
    * operator needs before force-purging).
    *
    * Plan: trash scan → per-container rollup (one shuffle) → bounded
    * replica explode (≤ 4) → per-node rollup.
    */
  def ctDeletedBlocksBacklog(spark: SparkSession, dir: String): DataFrame = {
    val perContainer = ObjectStoreView.trashContainerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_txns"), sum(col("size")).as("bytes"))
      .withColumn("replicas",
        ObjectStoreView.containerReplicas(col("container_id")))
    perContainer
      .select(col("container_id"), col("n_txns"), col("bytes"),
        explode(when(col("replicas") === 0, array(lit(-1L)))
          .otherwise(sequence(lit(1L), col("replicas")))).as("r"))
      .withColumn("node_id",
        when(col("r") === -1L, -1L)
          .otherwise((col("container_id") * 31 + col("r") * 17) % 20))
      .groupBy(col("node_id"))
      .agg(countDistinct(col("container_id")).as("n_containers"),
        sum(col("n_txns")).as("n_txns"),
        sum(col("bytes")).as("pending_bytes"))
      .orderBy(col("node_id").asc)
  }

  val ctDeletedBlocksBacklogSql: String =
    s"""WITH trash_ck AS (${ObjectStoreView.trashContainerKeysSql}), tc AS (
       |  SELECT container_id, COUNT(*) AS n_txns,
       |    CAST(SUM(size) AS BIGINT) AS bytes,
       |    ${repl("container_id")} AS replicas
       |  FROM trash_ck GROUP BY container_id
       |), placed AS (
       |  SELECT (tc.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    tc.container_id, tc.n_txns, tc.bytes
       |  FROM tc, UNNEST(range(1, tc.replicas + 1)) AS u(r)
       |  WHERE tc.replicas >= 1
       |  UNION ALL
       |  SELECT -1 AS node_id, container_id, n_txns, bytes
       |  FROM tc WHERE replicas = 0
       |)
       |SELECT node_id, COUNT(DISTINCT container_id) AS n_containers,
       |  CAST(SUM(n_txns) AS BIGINT) AS n_txns,
       |  CAST(SUM(bytes) AS BIGINT) AS pending_bytes
       |FROM placed GROUP BY node_id ORDER BY node_id ASC""".stripMargin

  // --- ct_safemode_status: SCM safe-mode exit rules -----------------------
  /** The four safe-mode exit rules SCM evaluates before serving writes
    * (reference: hadoop-hdds/server-scm/.../scm/safemode/
    * SCMSafeModeManager.java and its rules — ContainerSafeModeRule (≥ 99%
    * of containers have a reported replica), DataNodeSafeModeRule
    * (registered datanode count), HealthyPipelineSafeModeRule (≥ 10% of
    * pipelines fully healthy), OneReplicaPipelineSafeModeRule (≥ 90% of
    * pipelines with at least one live member)). One row per rule with the
    * observed value, the exit threshold, and the pass verdict; ratios in
    * exact integer ppm (floor division — both engines).
    *
    * Plan shape: the per-container rollup is computed once (one scan + one
    * shuffle); the three 1-row aggregates derived from it are crossed (1×1
    * joins, no shuffle of base data) and unpivoted to the 4 rule rows.
    */
  def ctSafemodeStatus(spark: SparkSession, dir: String): DataFrame = {
    val cont = containerStats(spark, dir)
    val contAgg = cont.agg(
      count(lit(1)).as("n_cont"),
      sum(when(col("replicas") >= 1, 1L).otherwise(0L)).as("n_reported"))
    val nodeAgg = cont.filter(col("replicas") >= 1)
      .select(col("container_id"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .select(((col("container_id") * 31 + col("r") * 17) % 20).as("node_id"))
      .agg(countDistinct(col("node_id")).as("n_nodes"))
    val pipeAgg = cont.filter(col("replicas") >= 1)
      .withColumn("pipeline_id", col("container_id") % 30)
      .groupBy(col("pipeline_id")).agg(min(col("replicas")).as("min_r"))
      .agg(count(lit(1)).as("n_pipes"),
        sum(when(col("min_r") >= Target, 1L).otherwise(0L)).as("n_healthy"),
        sum(when(col("min_r") >= 1, 1L).otherwise(0L)).as("n_one"))
    contAgg.crossJoin(nodeAgg).crossJoin(pipeAgg)
      .select(explode(array(
        struct(lit("CONTAINER").as("rule"),
          expr("n_reported * 1000000 DIV n_cont").as("observed"),
          lit(990000L).as("required"), lit("ppm").as("unit")),
        struct(lit("DATANODE").as("rule"), col("n_nodes").as("observed"),
          lit(20L).as("required"), lit("nodes").as("unit")),
        struct(lit("HEALTHY_PIPELINE").as("rule"),
          expr("n_healthy * 1000000 DIV n_pipes").as("observed"),
          lit(100000L).as("required"), lit("ppm").as("unit")),
        struct(lit("ONE_REPLICA_PIPELINE").as("rule"),
          expr("n_one * 1000000 DIV n_pipes").as("observed"),
          lit(900000L).as("required"), lit("ppm").as("unit")))).as("s"))
      .select(col("s.rule").as("rule"), col("s.observed").as("observed"),
        col("s.required").as("required"), col("s.unit").as("unit"))
      .withColumn("passed", col("observed") >= col("required"))
      .orderBy(col("rule").asc)
  }

  val ctSafemodeStatusSql: String =
    s"""WITH $containerStatsSql, cagg AS (
       |  SELECT COUNT(*) AS n_cont,
       |    CAST(SUM(CASE WHEN replicas >= 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_reported
       |  FROM cont
       |), nagg AS (
       |  SELECT COUNT(DISTINCT (cont.container_id * 31 + u.r * 17) % 20)
       |    AS n_nodes
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), pipes AS (
       |  SELECT container_id % 30 AS pipeline_id, MIN(replicas) AS min_r
       |  FROM cont WHERE replicas >= 1 GROUP BY pipeline_id
       |), pagg AS (
       |  SELECT COUNT(*) AS n_pipes,
       |    CAST(SUM(CASE WHEN min_r >= $Target THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_healthy,
       |    CAST(SUM(CASE WHEN min_r >= 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_one
       |  FROM pipes
       |), rules AS (
       |  SELECT 'CONTAINER' AS rule,
       |    CAST(n_reported * 1000000 // n_cont AS BIGINT) AS observed,
       |    CAST(990000 AS BIGINT) AS required, 'ppm' AS unit
       |  FROM cagg
       |  UNION ALL
       |  SELECT 'DATANODE', n_nodes, 20, 'nodes' FROM nagg
       |  UNION ALL
       |  SELECT 'HEALTHY_PIPELINE',
       |    CAST(n_healthy * 1000000 // n_pipes AS BIGINT), 100000, 'ppm'
       |  FROM pagg
       |  UNION ALL
       |  SELECT 'ONE_REPLICA_PIPELINE',
       |    CAST(n_one * 1000000 // n_pipes AS BIGINT), 900000, 'ppm'
       |  FROM pagg
       |)
       |SELECT rule, observed, required, unit, observed >= required AS passed
       |FROM rules ORDER BY rule ASC""".stripMargin

  // --- ct_balancer_moves: greedy container move plan ----------------------
  /** The move plan SCM's ContainerBalancer would produce for one iteration
    * (reference: hadoop-hdds/server-scm/.../container/balancer/
    * ContainerBalancer.java — over-utilized nodes donate container
    * replicas to under-utilized ones until each re-enters the ±10%
    * utilization band). Deterministic declarative form:
    *
    *  - upper/lower bounds are exact integer floor-divisions of the
    *    cluster total (no double ratios in the selection predicate);
    *  - each over-utilized node donates its largest-bytes replicas first
    *    (container_id tie-break) while the running donated total stays
    *    below its surplus — a per-node window cumsum, no iteration;
    *  - donated replicas are assigned round-robin over the under-utilized
    *    nodes ranked by deficit (deepest deficit first).
    *
    * Plan shape: the bounded replica explode (≤ 4/container) re-aggregates
    * per node; over/under node frames are per-node aggregates (thousands
    * of rows at real scale) so the round-robin assignment join broadcasts.
    * The global move ranking is a single-partition window over the
    * candidate-move list only — bounded by the balancer's per-iteration
    * move budget, never corpus-sized.
    */
  def ctBalancerMoves(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val placed = containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("total_bytes"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
    val perNode = placed.groupBy(col("node_id"))
      .agg(sum(col("total_bytes")).as("hosted"))
      .withColumn("tot", sum(col("hosted")).over(Window.partitionBy(lit(1))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("upper", expr("(tot * 101) DIV (n * 100)"))
      .withColumn("lower", expr("(tot * 99) DIV (n * 100)"))
    val over = perNode.filter(col("hosted") > col("upper"))
      .select(col("node_id"), (col("hosted") - col("upper")).as("surplus"))
    val under = perNode.filter(col("hosted") < col("lower"))
      .select(col("node_id").as("to_node"),
        (col("lower") - col("hosted")).as("deficit"))
      .withColumn("tgt_rank", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(col("deficit").desc, col("to_node").asc)))
      .withColumn("n_under", count(lit(1)).over(Window.partitionBy(lit(1))))
    val wNode = Window.partitionBy(col("node_id"))
      .orderBy(col("total_bytes").desc, col("container_id").asc)
    val moves = placed.join(over, "node_id")
      .withColumn("cum", sum(col("total_bytes")).over(
        wNode.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") - col("total_bytes") < col("surplus"))
      .withColumn("move_id", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("node_id").asc,
          col("total_bytes").desc, col("container_id").asc)))
    // n_under is a 1-row scalar; attaching it to the move list first keeps
    // the round-robin assignment an equi-join on tgt_rank (broadcast hash),
    // not a nested-loop over a mixed-side modulo predicate.
    val nUnder = under.agg(max(col("n_under")).as("n_under"))
    moves
      .crossJoin(broadcast(nUnder))
      .withColumn("tgt", pmod(col("move_id") - 1, col("n_under")) + 1)
      .join(broadcast(under.drop("n_under")),
        col("tgt") === col("tgt_rank"))
      .select(col("move_id"), col("container_id"),
        col("node_id").as("from_node"), col("to_node"),
        col("total_bytes").as("bytes_moved"))
      .orderBy(col("move_id").asc)
  }

  val ctBalancerMovesSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT cont.container_id, cont.total_bytes,
       |    (cont.container_id * 31 + u.r * 17) % 20 AS node_id
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), pernode AS (
       |  SELECT node_id, CAST(SUM(total_bytes) AS BIGINT) AS hosted,
       |    CAST(SUM(SUM(total_bytes)) OVER () AS BIGINT) AS tot,
       |    COUNT(*) OVER () AS n
       |  FROM placed GROUP BY node_id
       |), bounds AS (
       |  SELECT node_id, hosted,
       |    CAST((tot * 101) // (n * 100) AS BIGINT) AS upper_b,
       |    CAST((tot * 99) // (n * 100) AS BIGINT) AS lower_b
       |  FROM pernode
       |), over_n AS (
       |  SELECT node_id, hosted - upper_b AS surplus FROM bounds
       |  WHERE hosted > upper_b
       |), under_n AS (
       |  SELECT node_id AS to_node, lower_b - hosted AS deficit,
       |    ROW_NUMBER() OVER (ORDER BY lower_b - hosted DESC, node_id ASC)
       |      AS tgt_rank,
       |    COUNT(*) OVER () AS n_under
       |  FROM bounds WHERE hosted < lower_b
       |), cand AS (
       |  SELECT p.node_id, p.container_id, p.total_bytes, o.surplus,
       |    SUM(p.total_bytes) OVER (PARTITION BY p.node_id
       |      ORDER BY p.total_bytes DESC, p.container_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM placed p JOIN over_n o ON p.node_id = o.node_id
       |), moves AS (
       |  SELECT node_id, container_id, total_bytes,
       |    ROW_NUMBER() OVER (ORDER BY node_id ASC, total_bytes DESC,
       |      container_id ASC) AS move_id
       |  FROM cand WHERE cum - total_bytes < surplus
       |)
       |SELECT m.move_id, m.container_id, m.node_id AS from_node,
       |  u.to_node, m.total_bytes AS bytes_moved
       |FROM moves m JOIN under_n u
       |  ON (m.move_id - 1) % u.n_under + 1 = u.tgt_rank
       |ORDER BY m.move_id ASC""".stripMargin

  // --- ct_ec_storage_overhead: replication-config storage accounting ------
  /** Physical-vs-logical storage accounting per replication config — the
    * reference supports both Ratis replication and erasure coding
    * (hadoop-hdds/common/.../ECReplicationConfig.java: rs-3-2-1024k,
    * rs-6-3-1024k; ReplicationConfig.java for RATIS/ONE|THREE), and
    * Recon's storage report distinguishes raw vs replicated bytes. Config
    * is derived per container with fixed arithmetic (container_id % 10:
    * 0-5 RATIS/THREE, 6 RATIS/ONE, 7-8 EC/rs-3-2, 9 EC/rs-6-3 — majority
    * Ratis-3, the common deployment mix).
    *
    * Physical bytes are exact integer math per container — logical ×
    * (data+parity) DIV data, floored per container THEN summed (sum of
    * floors, the order a per-container accountant produces) — and the
    * savings column prices each config against the Ratis-3 default. One
    * keys scan → per-container rollup → 4-row config rollup; both
    * shuffles key on container/config ids, never keys.
    */
  def ctEcStorageOverhead(spark: SparkSession, dir: String): DataFrame = {
    val conf = ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_keys"), sum(col("size")).as("logical"))
      .withColumn("m", col("container_id") % 10)
      .withColumn("replication_config",
        when(col("m") <= 5, "RATIS/THREE")
          .when(col("m") === 6, "RATIS/ONE")
          .when(col("m") <= 8, "EC/rs-3-2-1024k")
          .otherwise("EC/rs-6-3-1024k"))
      .withColumn("data_units",
        when(col("m") <= 6, 1L).when(col("m") <= 8, 3L).otherwise(6L))
      .withColumn("total_units",
        when(col("m") <= 5, 3L).when(col("m") === 6, 1L)
          .when(col("m") <= 8, 5L).otherwise(9L))
      .withColumn("physical", expr("logical * total_units DIV data_units"))
    conf.groupBy(col("replication_config"), col("data_units"),
        col("total_units"))
      .agg(count(lit(1)).as("n_containers"),
        sum(col("n_keys")).as("n_keys"),
        sum(col("logical")).as("logical_bytes"),
        sum(col("physical")).as("physical_bytes"))
      .withColumn("overhead_ppm",
        expr(graft.functions.Codes.sharePpmExpr(
          "physical_bytes - logical_bytes", "logical_bytes")))
      .withColumn("savings_vs_ratis3_bytes",
        col("logical_bytes") * 3L - col("physical_bytes"))
      .orderBy(col("replication_config").asc)
  }

  val ctEcStorageOverheadSql: String =
    s"""WITH container_keys AS ($cks), per_ct AS (
       |  SELECT container_id, COUNT(*) AS n_keys,
       |    CAST(SUM(size) AS BIGINT) AS logical,
       |    container_id % 10 AS m
       |  FROM container_keys GROUP BY container_id
       |), conf AS (
       |  SELECT *,
       |    CASE WHEN m <= 5 THEN 'RATIS/THREE'
       |         WHEN m = 6 THEN 'RATIS/ONE'
       |         WHEN m <= 8 THEN 'EC/rs-3-2-1024k'
       |         ELSE 'EC/rs-6-3-1024k' END AS replication_config,
       |    CASE WHEN m <= 6 THEN 1 WHEN m <= 8 THEN 3 ELSE 6 END
       |      AS data_units,
       |    CASE WHEN m <= 5 THEN 3 WHEN m = 6 THEN 1 WHEN m <= 8 THEN 5
       |         ELSE 9 END AS total_units,
       |    CASE WHEN m <= 5 THEN logical * 3 WHEN m = 6 THEN logical
       |         WHEN m <= 8 THEN logical * 5 // 3
       |         ELSE logical * 9 // 6 END AS physical
       |  FROM per_ct
       |)
       |SELECT replication_config, CAST(data_units AS BIGINT) AS data_units,
       |  CAST(total_units AS BIGINT) AS total_units,
       |  COUNT(*) AS n_containers,
       |  CAST(SUM(n_keys) AS BIGINT) AS n_keys,
       |  CAST(SUM(logical) AS BIGINT) AS logical_bytes,
       |  CAST(SUM(physical) AS BIGINT) AS physical_bytes,
       |  CAST(${graft.functions.Codes.sharePpmSql(
               "SUM(physical) - SUM(logical)", "SUM(logical)")}
       |    AS BIGINT) AS overhead_ppm,
       |  CAST(SUM(logical) * 3 - SUM(physical) AS BIGINT)
       |    AS savings_vs_ratis3_bytes
       |FROM conf
       |GROUP BY replication_config, data_units, total_units
       |ORDER BY replication_config ASC""".stripMargin

  // --- ct_task_status: Recon derived-view freshness ------------------------
  /** Freshness of every Recon-style derived view: per task, the timestamp
    * of the newest source row it has incorporated and the source sequence
    * number it has consumed up to — the reference's `GET /task/status`
    * (recon/.../api/TaskStatusService.java:47-49: each ReconTaskStatus row
    * is (taskName, lastUpdatedTimestamp, lastUpdatedSeqNumber)). The
    * RocksDB sequence number is modeled as the count of source mutations
    * in the task's processed slice; the binding gives each task a distinct
    * slice so staleness is visible: the delta consumer and the
    * container-key mapper are at the head (all rows), the deleted-table
    * insight watches only the trash slice, and the file-size counter last
    * ran before the 1998 keys landed.
    *
    * ONE scan: all four (timestamp, seq) pairs are conditional aggregates
    * of the same key-version frame (the [[Namespace.snapshotSpace]]
    * single-scan pattern); the unpivot explodes a 4-element struct array
    * of the 1-row aggregate.
    */
  def ctTaskStatus(spark: SparkSession, dir: String): DataFrame = {
    val fscCutoff = lit("1998-01-01").cast("timestamp")
    val g = ObjectStoreView.keysWithFlag(spark, dir).agg(
      max(col("mtime")).as("t_head"),
      count(lit(1)).as("s_head"),
      max(when(col("rflag") === "R", col("mtime"))).as("t_trash"),
      sum(when(col("rflag") === "R", 1L).otherwise(0L)).as("s_trash"),
      max(when(col("mtime") < fscCutoff, col("mtime"))).as("t_fsc"),
      sum(when(col("mtime") < fscCutoff, 1L).otherwise(0L)).as("s_fsc"))
    g.select(explode(array(
        struct(lit("ContainerKeyMapperTask").as("task_name"),
          col("t_head").as("last_updated"), col("s_head").as("last_seq")),
        struct(lit("FileSizeCountTask").as("task_name"),
          col("t_fsc").as("last_updated"), col("s_fsc").as("last_seq")),
        struct(lit("OmDeltaRequest").as("task_name"),
          col("t_head").as("last_updated"), col("s_head").as("last_seq")),
        struct(lit("OmTableInsightTask").as("task_name"),
          col("t_trash").as("last_updated"), col("s_trash").as("last_seq"))))
        .as("t"))
      .select(col("t.task_name").as("task_name"),
        col("t.last_updated").as("last_updated"),
        col("t.last_seq").as("last_seq"))
      .orderBy(col("task_name").asc)
  }

  val ctTaskStatusSql: String =
    s"""WITH base AS (${ObjectStoreView.keysWithFlagSql}), g AS (
       |  SELECT MAX(mtime) AS t_head, COUNT(*) AS s_head,
       |    MAX(CASE WHEN rflag = 'R' THEN mtime END) AS t_trash,
       |    CAST(SUM(CASE WHEN rflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS s_trash,
       |    MAX(CASE WHEN mtime < TIMESTAMP '1998-01-01' THEN mtime END)
       |      AS t_fsc,
       |    CAST(SUM(CASE WHEN mtime < TIMESTAMP '1998-01-01' THEN 1 ELSE 0
       |      END) AS BIGINT) AS s_fsc
       |  FROM base
       |)
       |SELECT 'ContainerKeyMapperTask' AS task_name, t_head AS last_updated,
       |  s_head AS last_seq FROM g
       |UNION ALL SELECT 'FileSizeCountTask', t_fsc, s_fsc FROM g
       |UNION ALL SELECT 'OmDeltaRequest', t_head, s_head FROM g
       |UNION ALL SELECT 'OmTableInsightTask', t_trash, s_trash FROM g
       |ORDER BY task_name ASC""".stripMargin

  // --- ct_service_list: cluster service-role inventory ---------------------
  /** Every service role in the cluster with its address — the reference's
    * `getServiceList` (common/.../om/protocol/OzoneManagerProtocol.java,
    * served as JSON by ozone-manager/.../om/ServiceListJSONServlet.java:
    * ServiceInfo rows of (nodeType, hostname, ports)). Fixed roles (OM,
    * SCM, RECON) are constant rows; the datanode inventory derives from
    * the same replica placement as [[ctNodeReport]], carrying each node's
    * hosted-replica count (NULL for non-datanode roles, which host no
    * container replicas). The datanode rollup is the bounded replica
    * explode + one shuffle on node_id; the three constant rows union on
    * top.
    */
  def ctServiceList(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dn = containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_container_replicas"))
      .select(lit("DATANODE").as("node_type"),
        concat(lit("dn"), col("node_id").cast("string")).as("host"),
        lit(9858).as("rpc_port"),
        col("n_container_replicas"))
    val fixed = Seq(("OM", "om1", 9862), ("SCM", "scm1", 9860),
        ("RECON", "recon1", 9888))
      .toDF("node_type", "host", "rpc_port")
      .withColumn("n_container_replicas", lit(null).cast("bigint"))
    dn.unionByName(fixed)
      .orderBy(col("node_type").asc, col("host").asc)
  }

  val ctServiceListSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT (cont.container_id * 31 + u.r * 17) % 20 AS node_id
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), dn AS (
       |  SELECT 'DATANODE' AS node_type,
       |    'dn' || CAST(node_id AS VARCHAR) AS host,
       |    9858 AS rpc_port, COUNT(*) AS n_container_replicas
       |  FROM placed GROUP BY node_id
       |)
       |SELECT * FROM (
       |  SELECT * FROM dn
       |  UNION ALL SELECT 'OM', 'om1', 9862, NULL
       |  UNION ALL SELECT 'SCM', 'scm1', 9860, NULL
       |  UNION ALL SELECT 'RECON', 'recon1', 9888, NULL
       |) t ORDER BY node_type ASC, host ASC""".stripMargin

  // --- ct_replica_history: per-container replica timeline ------------------
  /** The replica timeline Recon serves from `/containers/{id}/replicaHistory`
    * (recon/.../api/ContainerEndpoint.java:226-231, getAllContainerHistory):
    * for every (container, datanode) pair that ever reported a replica —
    * first_seen, last_seen, report count (recon/.../persistence/
    * ContainerHistory.java fields: containerId, datanodeUuid, datanodeHost,
    * firstSeenTime, lastSeenTime). `currently_hosted` marks whether the
    * replica slot is still live under the CURRENT replica count — a row
    * with currently_hosted=false and an old last_seen is the "which
    * datanode last held this missing container" answer this endpoint is
    * opened for. Over-replication's 4th replica shows up in the current
    * reports (ct_node_report), not in the 3-slot target history.
    *
    * Scale: one scan of the report stream → one shuffle keyed
    * (container_id, replica_index) with map-side partial min/max/count —
    * never the report rows themselves past the exchange. Timeline order
    * (container, first_seen, replica_index) is pinned by spec.
    */
  def ctReplicaHistory(spark: SparkSession, dir: String): DataFrame =
    ObjectStoreView.replicaReports(spark, dir)
      .groupBy(col("container_id"), col("replica_index"), col("node_id"))
      .agg(min(col("report_time")).as("first_seen"),
        max(col("report_time")).as("last_seen"),
        count(lit(1)).as("n_reports"))
      .withColumn("datanode_host",
        concat(lit("dn-"), col("node_id").cast("string")))
      .withColumn("currently_hosted",
        col("replica_index") <=
          ObjectStoreView.containerReplicas(col("container_id")))
      .select("container_id", "replica_index", "node_id", "datanode_host",
        "first_seen", "last_seen", "n_reports", "currently_hosted")
      .orderBy(col("container_id").asc, col("first_seen").asc,
        col("replica_index").asc)

  val ctReplicaHistorySql: String =
    s"""WITH reports AS (${ObjectStoreView.replicaReportsSql}), hist AS (
       |  SELECT container_id, replica_index, node_id,
       |    MIN(report_time) AS first_seen, MAX(report_time) AS last_seen,
       |    COUNT(*) AS n_reports
       |  FROM reports GROUP BY container_id, replica_index, node_id
       |)
       |SELECT container_id, replica_index, node_id,
       |  'dn-' || CAST(node_id AS VARCHAR) AS datanode_host,
       |  first_seen, last_seen, n_reports,
       |  replica_index <= ${repl("container_id")} AS currently_hosted
       |FROM hist
       |ORDER BY container_id ASC, first_seen ASC, replica_index ASC""".stripMargin

  // --- ins_scm_metrics: SCM-side insight metric groups ---------------------
  /** The SCM insight points' metric inventories as long-format (metric,
    * value) rows — the `ozone insight metrics scm.node-manager` /
    * `scm.replica-manager` displays (insight/.../scm/NodeManagerInsight
    * .java:50-67: healthy/dead node counters + HB processing stats;
    * insight/.../scm/ReplicaManagerInsight.java:30-60: the replication
    * manager's internal state). Live deployments read JMX; the analytics
    * twin derives the same inventory from durable evidence: node counters
    * from the placement arithmetic (a node is HEALTHY iff it currently
    * hosts ≥ 1 replica of the 20-node fleet), heartbeat counters from the
    * replica-report stream (processed = all reports; failed = reports for
    * containers whose current replica count is 0 — reports SCM could not
    * match to a live replica set), and the replication-manager gauges from
    * the container health states ct_unhealthy_containers rolls up.
    *
    * Scale: three independent aggregates (placement, report stream,
    * per-container rollup), each collapsing to ≤ 20 rows before the
    * 10-row union. All map-side combinable.
    */
  def insScmMetrics(spark: SparkSession, dir: String): DataFrame = {
    val hosted = containerStats(spark, dir)
      .filter(col("replicas") >= 1)
      .select(col("container_id"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .agg(countDistinct(col("node_id")).as("healthy"))
      .select(explode(array(
        struct(lit("scm_node_manager_healthy_nodes").as("metric"),
          col("healthy").as("value")),
        struct(lit("scm_node_manager_dead_nodes").as("metric"),
          (lit(20L) - col("healthy")).as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
    val hb = ObjectStoreView.replicaReports(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(ObjectStoreView.containerReplicas(col("container_id")) === 0,
          1L).otherwise(0L)).as("nf"))
      .select(explode(array(
        struct(lit("scm_node_manager_num_hb_processed").as("metric"),
          col("n").as("value")),
        struct(lit("scm_node_manager_num_hb_processing_failed").as("metric"),
          col("nf").as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
    val rm = containerStats(spark, dir)
      .agg(
        sum(when(col("replicas") === 0, 1L).otherwise(0L)).as("missing"),
        sum(when(col("replicas") > 0 && col("replicas") < Target, 1L)
          .otherwise(0L)).as("under"),
        sum(when(col("replicas") > Target, 1L).otherwise(0L)).as("over"),
        sum(when(col("replicas") === Target, 1L).otherwise(0L)).as("healthy"))
      .select(explode(array(
        struct(lit("scm_replica_manager_missing_containers").as("metric"),
          col("missing").as("value")),
        struct(lit("scm_replica_manager_under_replicated_containers")
          .as("metric"), col("under").as("value")),
        struct(lit("scm_replica_manager_over_replicated_containers")
          .as("metric"), col("over").as("value")),
        struct(lit("scm_replica_manager_healthy_containers").as("metric"),
          col("healthy").as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
    hosted.unionByName(hb).unionByName(rm).orderBy(col("metric").asc)
  }

  val insScmMetricsSql: String =
    s"""WITH $containerStatsSql, placed AS (
       |  SELECT DISTINCT (cont.container_id * 31 + u.r * 17) % 20 AS node_id
       |  FROM cont, UNNEST(range(1, cont.replicas + 1)) AS u(r)
       |  WHERE cont.replicas >= 1
       |), reports AS (${ObjectStoreView.replicaReportsSql})
       |SELECT metric, value FROM (
       |  SELECT 'scm_node_manager_healthy_nodes' AS metric,
       |    CAST(COUNT(*) AS BIGINT) AS value FROM placed
       |  UNION ALL
       |  SELECT 'scm_node_manager_dead_nodes',
       |    CAST(20 - COUNT(*) AS BIGINT) FROM placed
       |  UNION ALL
       |  SELECT 'scm_node_manager_num_hb_processed',
       |    CAST(COUNT(*) AS BIGINT) FROM reports
       |  UNION ALL
       |  SELECT 'scm_node_manager_num_hb_processing_failed',
       |    CAST(SUM(CASE WHEN ${repl("container_id")} = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM reports
       |  UNION ALL
       |  SELECT 'scm_replica_manager_missing_containers',
       |    CAST(SUM(CASE WHEN replicas = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM cont
       |  UNION ALL
       |  SELECT 'scm_replica_manager_under_replicated_containers',
       |    CAST(SUM(CASE WHEN replicas > 0 AND replicas < $Target
       |      THEN 1 ELSE 0 END) AS BIGINT) FROM cont
       |  UNION ALL
       |  SELECT 'scm_replica_manager_over_replicated_containers',
       |    CAST(SUM(CASE WHEN replicas > $Target THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM cont
       |  UNION ALL
       |  SELECT 'scm_replica_manager_healthy_containers',
       |    CAST(SUM(CASE WHEN replicas = $Target THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM cont
       |) t ORDER BY metric ASC""".stripMargin

  // --- ct_block_report: the fsck container→block sweep rollup --------------
  /** Per-container block accounting — the summary the fsck ContainerMapper
    * sweep produces before anyone drills in (tools/.../fsck/
    * ContainerMapper.java builds containerID → block list from every
    * key's location list): keys, blocks and bytes per container.
    *
    * Scale: the block COUNT per key is pure arithmetic
    * (ceil(size / 1 MiB)), so this aggregates the key scan directly — the
    * per-block explode of [[ObjectStoreView.keyBlocks]] never runs here.
    * One scan, one shuffle on container_id with map-side partials.
    */
  def ctBlockReport(spark: SparkSession, dir: String): DataFrame = {
    val b = ObjectStoreView.BlockBytes
    ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(count(lit(1)).as("n_keys"),
        sum(expr(s"(size + ${b - 1}) DIV $b")).as("n_blocks"),
        sum(col("size")).as("total_bytes"))
      .orderBy(col("container_id").asc)
  }

  val ctBlockReportSql: String = {
    val b = ObjectStoreView.BlockBytes
    s"""WITH container_keys AS ($cks)
       |SELECT container_id, COUNT(*) AS n_keys,
       |  CAST(SUM((size + ${b - 1}) // $b) AS BIGINT) AS n_blocks,
       |  CAST(SUM(size) AS BIGINT) AS total_bytes
       |FROM container_keys GROUP BY container_id
       |ORDER BY container_id ASC""".stripMargin
  }

  // --- ct_container_blocks: fsck point drill-down for one container --------
  /** The registered binding's probe container (the oracle twin
    * interpolates the same constant; any other id goes through
    * [[containerBlocks]]).
    */
  val FsckContainer = 42L

  /** The fsck drill-down itself: every block the chosen container holds,
    * with its local block id and owning (volume, bucket, key) — exactly
    * the per-container entry of ContainerMapper's output map
    * (containerID → [blockID → BlockIdDetails{volume, bucket, key}]).
    * The PUBLIC parameterized shape (VERDICT r10 #8): callable with any
    * container id; the registered ct_container_blocks binds
    * [[FsckContainer]] so the DuckDB oracle needs no side channel.
    *
    * Scale: the container filter prunes the key scan BEFORE the bounded
    * (≤ 11 rows/key) block explode, so the expansion runs over one
    * container's keys — the same point-lookup shape as ns_lookup_key.
    */
  def containerBlocks(spark: SparkSession, dir: String,
      containerId: Long): DataFrame =
    ObjectStoreView.keyBlocks(spark, dir)
      .filter(col("container_id") === containerId)
      .select("container_id", "block_local_id", "block_seq", "volume",
        "bucket", "key", "block_bytes")
      .orderBy(col("block_local_id").asc)

  def ctContainerBlocks(spark: SparkSession, dir: String): DataFrame =
    containerBlocks(spark, dir, FsckContainer)

  val ctContainerBlocksSql: String =
    s"""WITH key_blocks AS (${ObjectStoreView.keyBlocksSql})
       |SELECT container_id, block_local_id, block_seq, volume, bucket, key,
       |  block_bytes
       |FROM key_blocks WHERE container_id = $FsckContainer
       |ORDER BY block_local_id ASC""".stripMargin

  // --- ct_scrub_report: datanode data-scanner sweep -----------------------
  /** The container data scanner as analytics (VERDICT r10 #3 — the last
    * health surface with durable evidence): each datanode's scrubber
    * thread walks every container replica it hosts, re-verifying chunk
    * checksums under an I/O throttle, and marks corrupt containers
    * unhealthy (hadoop-hdds/container-service/.../ozoneimpl/
    * ContainerDataScanner.java:96 `runIteration` — scanData under
    * HddsDataTransferThrottler, incNumUnHealthyContainers +
    * markContainerUnhealthy on failure). Per datanode: replicas scanned,
    * bytes verified, corruption found, the iteration's duration at the
    * configured bandwidth budget and its utilization of the minimum scan
    * interval (ContainerScrubberConfiguration defaults:
    * volume.bytes.per.second = 1 MiB, data.scan.interval = 1m —
    * util > 1e6 ppm means the node cannot complete an iteration inside
    * the interval, the capacity signal an operator plans throttles by).
    *
    * Corruption binding: a container is corrupt when it holds a key whose
    * size is divisible by [[CorruptSizeModulus]] — a DATA-derived
    * checksum-mismatch stand-in (≈1 in 10⁴ keys), so the spec can inject
    * a corrupt container by writing a key and prove the sweep detects it
    * (the q_integrity_audit pattern), and every replica of a corrupt
    * container reports it (write-path corruption reaches all copies).
    *
    * Scale: per-container rollup (one corpus shuffle, map-side partials)
    * → bounded replica explode (≤ 4) → per-node rollup over the ≤ 1024×4
    * placement frame — node report is fleet-sized regardless of keys.
    */
  private val CorruptSizeModulus = 9973L
  private val ScrubBandwidthBytesPerSec = 1048576L
  private val ScrubIntervalSec = 60L

  def ctScrubReport(spark: SparkSession, dir: String): DataFrame = {
    val perContainer = ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"))
      .agg(sum(col("size")).as("bytes"),
        max(when(col("size") % CorruptSizeModulus === 0, 1L).otherwise(0L))
          .as("corrupt"))
      .withColumn("replicas",
        ObjectStoreView.containerReplicas(col("container_id")))
    perContainer.filter(col("replicas") >= 1)
      .select(col("container_id"), col("bytes"), col("corrupt"),
        explode(sequence(lit(1L), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_containers_scanned"),
        sum(col("bytes")).as("bytes_verified"),
        sum(col("corrupt")).as("n_corrupt_found"))
      .withColumn("scan_seconds",
        expr(s"(bytes_verified + ${ScrubBandwidthBytesPerSec - 1})" +
          s" DIV $ScrubBandwidthBytesPerSec"))
      .withColumn("interval_util_ppm",
        expr(s"scan_seconds * 1000000 DIV $ScrubIntervalSec"))
      .orderBy(col("node_id").asc)
  }

  val ctScrubReportSql: String =
    s"""WITH container_keys AS ($cks), sc AS (
       |  SELECT container_id, CAST(SUM(size) AS BIGINT) AS bytes,
       |    MAX(CASE WHEN size % $CorruptSizeModulus = 0 THEN 1 ELSE 0 END)
       |      AS corrupt,
       |    ${repl("container_id")} AS replicas
       |  FROM container_keys GROUP BY container_id
       |), placed AS (
       |  SELECT (sc.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    sc.bytes, sc.corrupt
       |  FROM sc, UNNEST(range(1, sc.replicas + 1)) AS u(r)
       |  WHERE sc.replicas >= 1
       |)
       |SELECT node_id, COUNT(*) AS n_containers_scanned,
       |  CAST(SUM(bytes) AS BIGINT) AS bytes_verified,
       |  CAST(SUM(corrupt) AS BIGINT) AS n_corrupt_found,
       |  CAST((SUM(bytes) + ${ScrubBandwidthBytesPerSec - 1})
       |    // $ScrubBandwidthBytesPerSec AS BIGINT) AS scan_seconds,
       |  CAST(((SUM(bytes) + ${ScrubBandwidthBytesPerSec - 1})
       |    // $ScrubBandwidthBytesPerSec) * 1000000 // $ScrubIntervalSec
       |    AS BIGINT) AS interval_util_ppm
       |FROM placed GROUP BY node_id ORDER BY node_id ASC""".stripMargin

  // --- ins_scm_protocol: SCM block-location protocol counters -------------
  /** ScmProtocolBlockLocationInsight's per-protobuf-message counter
    * display (insight/.../scm/ScmProtocolBlockLocationInsight.java:53-61
    * — `addProtocolMessageMetrics` over ScmBlockLocationProtocolProtos
    * .Type: AllocateScmBlock / DeleteScmKeyBlocks / GetScmInfo, plus the
    * server's processed-request total), derived from durable evidence
    * (VERDICT r10 #4): every stored block is one AllocateScmBlock
    * (ceil(size / 1 MiB) per key, counted arithmetically — no explode),
    * every key in the deletedTable is one DeleteScmKeyBlocks transaction
    * on the deleted-block log, and every datanode that has ever filed a
    * replica report performed the GetScmInfo handshake at registration.
    * The remaining insight points (datanode dispatcher, Ratis,
    * event-queue) have no durable evidence in the data model and are
    * documented out of scope in SURVEY §2.
    *
    * Scale: two 1-row corpus aggregates + a fleet-sized distinct, all
    * map-side combinable; the total row re-aggregates the 3-row frame.
    */
  def insScmProtocol(spark: SparkSession, dir: String): DataFrame = {
    val base = ObjectStoreView.keysWithFlag(spark, dir)
      .agg(
        coalesce(sum(expr(s"(size + ${ObjectStoreView.BlockBytes - 1})" +
          s" DIV ${ObjectStoreView.BlockBytes}")), lit(0L)).as("a"),
        coalesce(sum(when(col("rflag") === "R", 1L).otherwise(0L)), lit(0L))
          .as("d"))
      .select(explode(array(
        struct(lit("scm_block_location_protocol_AllocateScmBlock")
          .as("metric"), col("a").as("value")),
        struct(lit("scm_block_location_protocol_DeleteScmKeyBlocks")
          .as("metric"), col("d").as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
    val handshakes = ObjectStoreView.replicaReports(spark, dir)
      .agg(countDistinct(col("node_id")).as("value"))
      .select(lit("scm_block_location_protocol_GetScmInfo").as("metric"),
        col("value"))
    val counters = base.unionByName(handshakes)
    val total = counters.agg(sum(col("value")).as("value"))
      .select(lit("scm_rpc_processed_requests").as("metric"), col("value"))
    counters.unionByName(total).orderBy(col("metric").asc)
  }

  val insScmProtocolSql: String = {
    val bb = ObjectStoreView.BlockBytes
    s"""WITH kf AS (${ObjectStoreView.keysWithFlagSql}),
       |reports AS (${ObjectStoreView.replicaReportsSql}), c AS (
       |  SELECT COALESCE(CAST(SUM((size + ${bb - 1}) // $bb) AS BIGINT), 0)
       |      AS a,
       |    COALESCE(CAST(SUM(CASE WHEN rflag = 'R' THEN 1 ELSE 0 END)
       |      AS BIGINT), 0) AS d
       |  FROM kf
       |), g AS (
       |  SELECT CAST(COUNT(DISTINCT node_id) AS BIGINT) AS g FROM reports
       |)
       |SELECT metric, value FROM (
       |  SELECT 'scm_block_location_protocol_AllocateScmBlock' AS metric,
       |    a AS value FROM c
       |  UNION ALL
       |  SELECT 'scm_block_location_protocol_DeleteScmKeyBlocks', d FROM c
       |  UNION ALL
       |  SELECT 'scm_block_location_protocol_GetScmInfo', g.g FROM g
       |  UNION ALL
       |  SELECT 'scm_rpc_processed_requests', c.a + c.d + g.g FROM c, g
       |) t ORDER BY metric ASC""".stripMargin
  }

  // --- ins_scm_container_protocol: SCM container-location RPC counters ---
  /** ScmProtocolContainerLocationInsight's per-protobuf-message counter
    * display (insight/.../scm/ScmProtocolContainerLocationInsight.java:53-66
    * — `addProtocolMessageMetrics` over
    * StorageContainerLocationProtocolProtos.Type, the container-location
    * sibling of [[insScmProtocol]]'s block-location point), derived from
    * durable evidence like the block twin (VERDICT r13 #2):
    * every container that exists in the container→key map was one
    * AllocateContainer RPC (interface-admin/.../ScmAdminProtocol.proto:133);
    * a container whose entire key set sits in the deletedTable is one
    * DeleteContainer (proto:137 — SCM removes a container only once its
    * last block is purged); and every successful-or-failed key read in the
    * audit stream resolved its container's pipeline with one
    * GetContainerWithPipeline (proto:135 — the read path's locate call).
    * The processed-request total mirrors the server's RPC counter. The
    * remaining protocol points (ScmProtocolDatanodeInsight,
    * ScmProtocolSecurityInsight) have no durable evidence in the data
    * model — named out of scope in SURVEY §2.A.
    *
    * Scale: one container-frame rollup (map-side combinable, 1024-row
    * result), one audit-stream count — both 1-row aggregates after the
    * shuffle; the total re-aggregates the 3-row counter frame.
    */
  def insScmContainerProtocol(spark: SparkSession, dir: String): DataFrame = {
    val l = graft.Tables.lineitem(spark, dir)
    val perContainer = l.select(
        ((col("l_orderkey") * 7 + col("l_linenumber")) % 1024)
          .cast("bigint").as("container_id"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("del"))
      .groupBy(col("container_id"))
      .agg(min(col("del")).as("all_deleted"))
    val containerSide = perContainer
      .agg(count(lit(1)).as("a"),
        coalesce(sum(col("all_deleted").cast("long")), lit(0L)).as("d"))
      .select(explode(array(
        struct(lit("scm_container_location_protocol_AllocateContainer")
          .as("metric"), col("a").as("value")),
        struct(lit("scm_container_location_protocol_DeleteContainer")
          .as("metric"), col("d").as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
    val gets = Audit.auditLog(spark, dir)
      .filter(col("op") === "READ_KEY")
      .agg(count(lit(1)).as("value"))
      .select(
        lit("scm_container_location_protocol_GetContainerWithPipeline")
          .as("metric"), col("value"))
    val counters = containerSide.unionByName(gets)
    val total = counters.agg(sum(col("value")).as("value"))
      .select(lit("scm_rpc_processed_requests").as("metric"), col("value"))
    counters.unionByName(total).orderBy(col("metric").asc)
  }

  val insScmContainerProtocolSql: String =
    s"""WITH audit AS (${Audit.auditLogSql}), pc AS (
       |  SELECT (l_orderkey * 7 + l_linenumber) % 1024 AS container_id,
       |    MIN(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS all_deleted
       |  FROM lineitem GROUP BY container_id
       |), c AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS a,
       |    COALESCE(CAST(SUM(all_deleted) AS BIGINT), 0) AS d
       |  FROM pc
       |), g AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS g FROM audit
       |  WHERE op = 'READ_KEY'
       |)
       |SELECT metric, value FROM (
       |  SELECT 'scm_container_location_protocol_AllocateContainer' AS metric,
       |    a AS value FROM c
       |  UNION ALL
       |  SELECT 'scm_container_location_protocol_DeleteContainer', d FROM c
       |  UNION ALL
       |  SELECT 'scm_container_location_protocol_GetContainerWithPipeline',
       |    g.g FROM g
       |  UNION ALL
       |  SELECT 'scm_rpc_processed_requests', c.a + c.d + g.g FROM c, g
       |) t ORDER BY metric ASC""".stripMargin

  // --- ct_read_load: per-datanode read-traffic exposure --------------------
  /** Which datanodes absorb the read traffic: READ_KEY audit entries
    * (by calendar-month prefix — the audit stream and the namespace carry
    * disjoint year ranges in the test binding, so month-of-year is the
    * seasonal join key) joined to the container→key map, attributed to
    * every replica node of every container holding keys under the read
    * prefix. read_exposure = Σ reads(v, b, month) × hosted keys — the
    * exact integer load proxy a balancer compares BEFORE moving a hot
    * container onto an already-hot node (SCM ContainerBalancer picks by
    * bytes; this is the IO-side counterpart ct_node_report's byte view
    * cannot see).
    *
    * Scale: the read rollup is a ≤|vol×bucket×12|-row broadcast; the
    * container-side aggregate partial-combines map-side before the join;
    * replica fan-out is the bounded ≤4-slot explode; the share window
    * runs over the 20-node frame. One corpus-sized exchange total.
    */
  def ctReadLoad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // month derives from the TIMESTAMP columns directly — it equals
    // substring(prefix/key, 11, 2) by construction (both embed
    // lpad(month)), but grouping on the substring forces the full
    // key-path concat to be built per row just to slice two chars back
    // out; this form lets column pruning drop the string synthesis
    // from both scans entirely (18.9 → ~7 s at sf1).
    val reads = Audit.auditLog(spark, dir)
      .filter(col("op") === "READ_KEY")
      .groupBy(col("volume"), col("bucket"),
        lpad(month(col("ts_minute")).cast("string"), 2, "0").as("month"))
      .agg(count(lit(1)).as("n_reads"))
    val ck = ObjectStoreView.containerKeys(spark, dir)
      .groupBy(col("container_id"), col("volume"), col("bucket"),
        lpad(month(col("mtime")).cast("string"), 2, "0").as("month"))
      .agg(count(lit(1)).as("n_keys"))
    // Wide product AND wide sum (the nsChargeback discipline): at 100 TB
    // a (reads ≈ 5e9) × (keys ≈ 3e6) cell already sits at 1.5e16 and the
    // per-node rollup of ~50 containers × 180 months crosses int64.
    val perNode = ck.join(broadcast(reads), Seq("volume", "bucket", "month"))
      .groupBy(col("container_id"))
      .agg(sum(col("n_reads").cast("decimal(38,0)") * col("n_keys"))
        .as("exposure"))
      .withColumn("replicas",
        ObjectStoreView.containerReplicas(col("container_id")))
      .filter(col("replicas") >= 1)
      .select(col("container_id"), col("exposure"),
        explode(sequence(lit(1), col("replicas"))).as("r"))
      .withColumn("node_id", (col("container_id") * 31 + col("r") * 17) % 20)
      .groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_container_replicas"),
        sum(col("exposure")).as("read_exposure"))
    perNode
      .withColumn("tot",
        sum(col("read_exposure")).over(Window.partitionBy(lit(1))))
      .withColumn("share_ppm",
        expr(graft.functions.Codes.sharePpmExpr("read_exposure", "tot"))
          .cast("bigint"))
      // Accumulate wide, REPORT as BIGINT (the nsChargeback emit rule).
      .select(col("node_id"), col("n_container_replicas"),
        col("read_exposure").cast("bigint").as("read_exposure"),
        col("share_ppm"))
      .orderBy(col("node_id").asc)
  }

  val ctReadLoadSql: String =
    s"""WITH audit AS (${Audit.auditLogSql}), reads AS (
       |  SELECT volume, bucket,
       |    lpad(CAST(month(ts_minute) AS VARCHAR), 2, '0') AS month,
       |    COUNT(*) AS n_reads
       |  FROM audit WHERE op = 'READ_KEY' GROUP BY volume, bucket, month
       |), ck AS (${ObjectStoreView.containerKeysSql}), ckm AS (
       |  SELECT container_id, volume, bucket,
       |    lpad(CAST(month(mtime) AS VARCHAR), 2, '0') AS month,
       |    COUNT(*) AS n_keys
       |  FROM ck GROUP BY container_id, volume, bucket, month
       |), expo AS (
       |  SELECT ckm.container_id,
       |    SUM(CAST(reads.n_reads AS HUGEINT) * ckm.n_keys) AS exposure
       |  FROM ckm JOIN reads USING (volume, bucket, month)
       |  GROUP BY ckm.container_id
       |), per_node AS (
       |  SELECT (e.container_id * 31 + u.r * 17) % 20 AS node_id,
       |    COUNT(*) AS n_container_replicas,
       |    SUM(e.exposure) AS exposure_wide
       |  FROM expo e, UNNEST(range(1,
       |    ${ObjectStoreView.containerReplicasSql("e.container_id")} + 1))
       |    AS u(r)
       |  WHERE ${ObjectStoreView.containerReplicasSql("e.container_id")} >= 1
       |  GROUP BY node_id
       |)
       |SELECT node_id, n_container_replicas,
       |  CAST(exposure_wide AS BIGINT) AS read_exposure,
       |  CAST(${graft.functions.Codes.sharePpmSql("exposure_wide",
              "SUM(exposure_wide) OVER ()")} AS BIGINT) AS share_ppm
       |FROM per_node ORDER BY node_id ASC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ct_read_load" -> ctReadLoad,
    "ct_scrub_report" -> ctScrubReport,
    "ins_scm_protocol" -> insScmProtocol,
    "ins_scm_container_protocol" -> insScmContainerProtocol,
    "ct_block_report" -> ctBlockReport,
    "ct_container_blocks" -> ctContainerBlocks,
    "ct_replica_history" -> ctReplicaHistory,
    "ins_scm_metrics" -> insScmMetrics,
    "ct_cold_containers" -> ctColdContainers,
    "ct_rack_report" -> ctRackReport,
    "ct_task_status" -> ctTaskStatus,
    "ct_service_list" -> ctServiceList,
    "ct_ec_storage_overhead" -> ctEcStorageOverhead,
    "ct_safemode_status" -> ctSafemodeStatus,
    "ct_balancer_moves" -> ctBalancerMoves,
    "ct_deleted_blocks_backlog" -> ctDeletedBlocksBacklog,
    "ct_balancer_report" -> ctBalancerReport,
    "ct_decommission_impact" -> ctDecommissionImpact,
    "ct_size_histogram" -> ctSizeHistogram,
    "ct_placement_violations" -> ctPlacementViolations,
    "ct_keys_per_container" -> ctKeysPerContainer,
    "ct_missing_container_keys" -> ctMissingContainerKeys,
    "ct_unhealthy_containers" -> ctUnhealthyContainers,
    "ct_repair_priority" -> ctRepairPriority,
    "ct_cluster_state" -> ctClusterState,
    "ct_node_report" -> ctNodeReport,
    "ct_pipeline_report" -> ctPipelineReport)

  val oracles: Map[String, String] = Map(
    "ct_read_load" -> ctReadLoadSql,
    "ct_scrub_report" -> ctScrubReportSql,
    "ins_scm_protocol" -> insScmProtocolSql,
    "ins_scm_container_protocol" -> insScmContainerProtocolSql,
    "ct_block_report" -> ctBlockReportSql,
    "ct_container_blocks" -> ctContainerBlocksSql,
    "ct_replica_history" -> ctReplicaHistorySql,
    "ins_scm_metrics" -> insScmMetricsSql,
    "ct_cold_containers" -> ctColdContainersSql,
    "ct_rack_report" -> ctRackReportSql,
    "ct_task_status" -> ctTaskStatusSql,
    "ct_service_list" -> ctServiceListSql,
    "ct_ec_storage_overhead" -> ctEcStorageOverheadSql,
    "ct_safemode_status" -> ctSafemodeStatusSql,
    "ct_balancer_moves" -> ctBalancerMovesSql,
    "ct_deleted_blocks_backlog" -> ctDeletedBlocksBacklogSql,
    "ct_balancer_report" -> ctBalancerReportSql,
    "ct_decommission_impact" -> ctDecommissionImpactSql,
    "ct_size_histogram" -> ctSizeHistogramSql,
    "ct_placement_violations" -> ctPlacementViolationsSql,
    "ct_keys_per_container" -> ctKeysPerContainerSql,
    "ct_missing_container_keys" -> ctMissingContainerKeysSql,
    "ct_unhealthy_containers" -> ctUnhealthyContainersSql,
    "ct_repair_priority" -> ctRepairPrioritySql,
    "ct_cluster_state" -> ctClusterStateSql,
    "ct_node_report" -> ctNodeReportSql,
    "ct_pipeline_report" -> ctPipelineReportSql)
}
