package graft.operators

import graft.Tables
import graft.functions.{Quantize, VectorDistance}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQ8-quantized brute-force search: train per-dimension ranges,
  * scan 1-byte-per-dim codes for a shortlist, rerank the shortlist
  * with the exact float kernel. The 100 TB rationale: the brute-force
  * scan is bandwidth-bound, so 4× smaller vectors are ~4× less scan
  * (FAISS's ScalarQuantizer SQ8 plays the same role under its FLAT
  * and IVF indexes); the shortlist rerank touches only
  * rerank·k·|queries| float vectors, so precision loss from the 8-bit
  * grid is confined to candidates near the boundary.
  */
object Quant {

  /** Per-dimension (min, max) over the corpus: ONE pass — posexplode
    * into (dim, x), partial-aggregating min/max per dim (the shuffle
    * carries dims × partitions rows), dim-many results collected —
    * driver-held training constants, like IVF centroids.
    */
  def trainMinMax(emb: DataFrame): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** Quantized scan → shortlist of `rerank·k` per query (code-space
    * L2 heap) → exact float L2 rerank to k. Output shape matches
    * [[Knn.topK]] with Metric.L2.
    */
  def sq8Search(emb: DataFrame, queries: DataFrame, k: Int,
                rerank: Int = 4): DataFrame = {
    val (mins, maxs) = trainMinMax(emb)
    val codes = emb.select(col("id"),
      Quantize.encode(col("vec"), mins, maxs).as("code"))
    val qcodes = broadcast(queries.select(col("qid"),
      Quantize.encode(col("qvec"), mins, maxs).as("qcode")))
    val scored = codes.crossJoin(qcodes)
      .select(col("qid"),
        Quantize.l2(col("code"), col("qcode"), mins, maxs).as("key"),
        col("id"))
      .where(col("key").isNotNull)
    val shortlist = TopKAgg.shortlist(scored, k * rerank)
    // exact rerank touches only the shortlist's float vectors
    val rescored = shortlist
      .join(emb, "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"),
        VectorDistance.l2(col("vec"), col("qvec")).as("key"), col("id"))
      .where(col("key").isNotNull)
    val fin = TopKAgg.topK(k)
    rescored.groupBy("qid")
      .agg(fin(col("key"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top.items")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col.id").as("nn_id"), round(col("col.key"), 4).as("score"))
      .orderBy("qid", "rk")
  }

  def sq8Query(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    sq8Search(e, q, k = 10)
  }
}
