package graft

import org.apache.spark.sql.SparkSession

/** Preflight guard against driver-testdata schema drift.
  *
  * Round 7 burned entirely because the driver regenerated
  * events.parquet with `ts` as TIMESTAMP(MICROS) (was
  * TIMESTAMP(NANOS) → int64 under nanosAsLong) and the drift
  * surfaced as 26 scattered analysis failures instead of one clear
  * message. This canary asserts each table's SCANNED Spark schema
  * (i.e. post-session-conf, what the loaders actually see) matches
  * the loaders' expectations and names the drifted column and both
  * types on mismatch. Multiple allowed types per column = known
  * physical vintages the loader adapts to ([[Tables.events]]).
  */
object SchemaCanary {
  private val ts = Set("timestamp", "timestamp_ntz")

  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"),
      "l_partkey" -> Set("bigint"), "l_suppkey" -> Set("bigint"),
      "l_linenumber" -> Set("int"), "l_quantity" -> Set("double"),
      "l_extendedprice" -> Set("double"), "l_discount" -> Set("double"),
      "l_tax" -> Set("double"), "l_returnflag" -> Set("string"),
      "l_linestatus" -> Set("string"), "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> Set("bigint"),
      // bigint = the TIMESTAMP(NANOS)+nanosAsLong vintage
      "ts" -> (ts + "bigint"), "user_id" -> Set("bigint"),
      "event_type" -> Set("string"), "value" -> Set("double"),
      "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int"))
  )

  /** Human-readable drift report; empty = every table matches. */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (tbl, cols) =>
      try {
        val schema = spark.read.parquet(s"$dir/$tbl.parquet").schema
        val have = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
        cols.flatMap { case (c, allowed) =>
          have.get(c) match {
            case None =>
              Some(s"$tbl.$c: MISSING (present: ${schema.fieldNames.mkString(", ")})")
            case Some(t) if !allowed(t) =>
              Some(s"$tbl.$c: scanned as $t, loader expects ${allowed.mkString(" or ")}")
            case _ => None
          }
        }
      } catch {
        case e: Throwable => Seq(s"$tbl: unreadable (${e.getMessage})")
      }
    }
}
