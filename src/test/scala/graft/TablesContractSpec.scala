package graft

import org.apache.spark.sql.types._

/** Data-contract gate for the driver-generated tables: every column a graft
  * operator or oracle relies on must exist with an ACCEPTED dtype, asserted
  * per table so a driver-side regeneration fails as one readable message
  * here ("events.ts: timestamp_ntz not in accepted {bigint}") instead of as
  * dozens of broken downstream queries (the r7/r8 events.ts drift failure
  * mode). Columns may legitimately carry more than one encoding across
  * generator versions — those list every accepted dtype, mirroring the
  * adaptive loaders (Tables.normalizeTs).
  */
class TablesContractSpec extends SparkSpec {

  // Accepted dtypes per (table, column). TimestampNTZType and TimestampType
  // both appear because parquet timestamps read as NTZ while in-session
  // derivations produce TIMESTAMP — operators normalize via cast.
  private val ts: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  // Either integer width is fine — Spark promotes in arithmetic and joins.
  private val i: Set[DataType] = Set(IntegerType, LongType)
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> i, "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> i, "n_name" -> Set(StringType),
      "n_regionkey" -> i),
    "customer" -> Map("c_custkey" -> i,
      "c_mktsegment" -> Set(StringType), "c_nationkey" -> i,
      "c_acctbal" -> Set(DoubleType)),
    "supplier" -> Map("s_suppkey" -> i, "s_name" -> Set(StringType),
      "s_nationkey" -> i),
    "part" -> Map("p_partkey" -> i, "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType), "p_size" -> i,
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> i, "o_custkey" -> i,
      "o_orderdate" -> ts, "o_totalprice" -> Set(DoubleType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> i,
      "l_partkey" -> i, "l_suppkey" -> i,
      "l_linenumber" -> i, "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType), "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType), "l_shipdate" -> ts),
    "events" -> Map("event_id" -> i, "ts" -> ts,
      "user_id" -> i, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> i, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> i,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> i))

  contract.foreach { case (table, cols) =>
    test(s"$table carries the contracted columns and dtypes") {
      val schema = Tables.load(spark, sf, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val problems = cols.flatMap { case (c, accepted) =>
        byName.get(c) match {
          case None => Some(s"$table.$c: MISSING (have ${byName.keys.mkString(", ")})")
          case Some(dt) if !accepted.contains(dt) =>
            Some(s"$table.$c: ${dt.simpleString} not in accepted " +
              accepted.map(_.simpleString).mkString("{", ", ", "}"))
          case _ => None
        }
      }
      assert(problems.isEmpty, problems.mkString("; "))
    }
  }
}
