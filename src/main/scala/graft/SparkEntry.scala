package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))

  /** Query batch = first 5 vectors, mirroring the reference's /search
    * request carrying a query vector (test/filter_upsert/search_*.json).
    */
  private def qset(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def batchQset(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Knn.topK(emb(spark, dir), qset(spark, dir), 10, Knn.Metric.L2)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vdb_knn_flat_l2" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.L2)),
    "vdb_knn_flat_ip" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.IP)),
    "vdb_knn_cosine" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.Cosine)),
    "vdb_knn_filtered_eq" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label") === 5)),
    "vdb_knn_filtered_ne" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label") =!= 5)),
    "vdb_batch_knn" -> ((s, d) =>
      Knn.topK(emb(s, d), batchQset(s, d), 5, Knn.Metric.Cosine)),
    "vdb_query_by_id" -> ((s, d) =>
      ScalarOps.pointLookup(Tables.embeddings(s, d), "vec_id", Seq(3L, 17L, 42L))
        .select(col("vec_id"),
          col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"),
          round(graft.functions.VectorFunctions.l2Norm(
            graft.functions.VectorFunctions.vecD(col("embedding"))), 4).as("norm"))
        .orderBy("vec_id")),
    "vdb_upsert" -> ((s, d) => {
      val e = emb(s, d)
      val base = e.select(col("id"), col("label").cast("long").as("label"),
        lit(1L).as("version"))
      val upd = e.where(col("id") % 7 === 0)
        .select(col("id"), (col("label") + 100).cast("long").as("label"),
          lit(2L).as("version"))
      Upsert.lastWriterWins(base.unionByName(upd), "id", "version")
        .orderBy("id")
    }),
    "vdb_filter_index_build" -> ((s, d) =>
      ScalarOps.filterIndexBuild(
        Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"), col("vec_id")),
        "label", "vec_id")),
    "vdb_snapshot_replay" -> ((s, d) =>
      WalReplay.replayComposed(Tables.events(s, d), 500L)),
    "q1_agg" -> Analytics.q1PricingSummary _,
    "q3_join" -> Analytics.q3ShippingPriority _,
    "q5_join" -> Analytics.q5LocalSupplierVolume _,
    "q_window_topn" -> ((s, d) => Analytics.windowTopOrders(s, d)),
    "events_tumbling" -> Analytics.eventsTumbling _,
    "events_sessionize" -> ((s, d) => Analytics.eventsSessionize(s, d)),
  )

  private val knnOracle: String => String = metric => {
    // metric: expr over (e.embedding::DOUBLE[], q.qv) + sort direction
    val (expr, ord) = metric match {
      case "l2" => ("list_distance(e.embedding::DOUBLE[], q.qv)", "ASC")
      case "ip" => ("list_inner_product(e.embedding::DOUBLE[], q.qv)", "DESC")
      case "cos" => ("list_cosine_similarity(e.embedding::DOUBLE[], q.qv)", "DESC")
    }
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |d AS (SELECT q.qid, e.vec_id AS nn_id, $expr AS s
       |      FROM embeddings e CROSS JOIN q),
       |r AS (SELECT qid, nn_id, s,
       |             row_number() OVER (PARTITION BY qid ORDER BY s $ord, nn_id) AS rk
       |      FROM d)
       |SELECT qid, rk, nn_id, round(s, 4) AS score
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "vdb_knn_flat_l2" -> knnOracle("l2"),
    "vdb_knn_flat_ip" -> knnOracle("ip"),
    "vdb_knn_cosine" -> knnOracle("cos"),
    "vdb_knn_filtered_eq" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label = 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_ne" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label <> 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_batch_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 25 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "vdb_query_by_id" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_inner_product(embedding::DOUBLE[],
        |                                     embedding::DOUBLE[])), 4) AS norm
        |FROM embeddings WHERE vec_id IN (3, 17, 42) ORDER BY vec_id""".stripMargin,
    "vdb_upsert" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0),
        |r AS (SELECT id, label, version,
        |             row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r WHERE rk = 1 ORDER BY id""".stripMargin,
    "vdb_filter_index_build" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS card,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin,
    "vdb_snapshot_replay" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, value FROM (
        |    SELECT user_id, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT agg.user_id, agg.n_events, agg.sum_value,
        |       round(l.value, 4) AS last_value
        |FROM agg JOIN l USING (user_id) ORDER BY user_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "events_tumbling" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
  )
}
