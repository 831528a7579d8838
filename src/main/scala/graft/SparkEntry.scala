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
  )
}
