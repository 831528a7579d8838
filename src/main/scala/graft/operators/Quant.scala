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

  /** Left-to-right cosine fold over two double-array columns, STAGED
    * (each fold evaluated once — the zero-norm CASE guard would
    * otherwise repeat the big aggregate lambdas, which whole-stage
    * codegen does not CSE; measured 3.6s vs 1.6s on the bench):
    * textually the same dot/(√·√) the DuckDB mirror's
    * list_cosine_similarity evaluates, so per-row values are
    * bit-identical across engines. NULL when either side is
    * zero-norm (a degenerate vector has no cosine — the r12 fuzz's
    * planted zero vector hit ANSI DIVIDE_BY_ZERO here); the report
    * filters those rows on both engines.
    */
  private def cosMicro(src: DataFrame, a: String, bExpr: String): DataFrame = {
    def ss(v: String) =
      s"aggregate(zip_with($v, $v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    src.select(col(a).as("va"), expr(bExpr).as("vb"))
      .select(expr(s"${ss("va")}").as("na"), expr(s"${ss("vb")}").as("nb"),
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, " +
          "(acc, x) -> acc + x)").as("dot"))
      .select(expr("CASE WHEN na * nb = 0D THEN CAST(NULL AS BIGINT) " +
        "ELSE CAST(round(dot / (sqrt(na) * sqrt(nb)) * 10000) AS BIGINT) " +
        "END").as("micro"))
  }

  /** QUANTIZATION-LADDER FIDELITY REPORT — one row per codec (bq /
    * pq / sq8): corpus-average cosine between each vector and its
    * reconstruction, the table that justifies picking a rung of the
    * ladder (how much geometry does 1 bit / 4 bits / 8 bits per
    * value keep?). Per-row cosines are 4dp-quantized to integer
    * MICRO-UNITS before the corpus sum (the embed_cluster_stats
    * rule) — an average of floats would depend on aggregation order
    * and no oracle could reproduce it. Reconstructions: SQ8 decodes
    * through the min/max grid; PQ concatenates trained codewords
    * (the oracle's `prec` mirror); BQ is the ±1 sign vector around
    * the per-dim mean. Training constants are driver-held (the IVF-
    * centroid pattern); all per-row work is one projection.
    */
  def quantErrorReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val (mns, mxs) = trainMinMax(e0)
    val mus = BinQuant.trainMeans(e0)
    val cb = Pq.trainCodebook(e0)
    def arr(a: Seq[Double]) = s"array(${a.mkString(", ")})"
    val e = e0.withColumn("vd", col("vec").cast("array<double>"))

    val mnsA = arr(mns.toIndexedSeq)
    val mxsA = arr(mxs.toIndexedSeq)
    val sqRecon =
      s"transform(sequence(1, 64), i -> element_at($mnsA, i) + " +
        s"(CASE WHEN element_at($mxsA, i) - element_at($mnsA, i) <= 0 " +
        s"THEN 0.0 ELSE least(255.0, greatest(0.0, " +
        s"round((element_at(vd, i) - element_at($mnsA, i)) / " +
        s"(element_at($mxsA, i) - element_at($mnsA, i)) * 255.0))) END) " +
        s"* (element_at($mxsA, i) - element_at($mnsA, i)) / 255.0)"
    val sq8 = cosMicro(e, "vd", sqRecon)
      .where(col("micro").isNotNull)
      .agg(count(lit(1)).as("n_vecs"), sum("micro").as("ms"))
      .select(lit("sq8").as("method"), col("n_vecs"), col("ms"))

    val musA = arr(mus.toIndexedSeq)
    val bqRecon =
      s"transform(sequence(1, 64), i -> CASE WHEN element_at(vd, i) > " +
        s"element_at($musA, i) THEN 1.0 ELSE -1.0 END)"
    val bq = cosMicro(e, "vd", bqRecon)
      .where(col("micro").isNotNull)
      .agg(count(lit(1)).as("n_vecs"), sum("micro").as("ms"))
      .select(lit("bq").as("method"), col("n_vecs"), col("ms"))

    // PQ: codes → codeword concat, relationally (mirrors `prec`)
    val codes = e.select(col("id"), col("vd"),
        graft.functions.PqCodec.encode(col("vec"), cb,
          Pq.M, Pq.DSUB, Pq.KSUB).as("code"))
      .select(col("id"), col("vd"), posexplode(col("code"))
        .as(Seq("sub", "cid")))
    val cbRows = for {
      sub <- 0 until Pq.M; cid <- 0 until Pq.KSUB
    } yield (sub, cid,
      (0 until Pq.DSUB).map(j => cb((sub * Pq.KSUB + cid) * Pq.DSUB + j)))
    val cbDf = broadcast(cbRows.toDF("sub", "cid", "cw"))
    val prec = codes.join(cbDf, Seq("sub", "cid"))
      .groupBy("id")
      .agg(first("vd").as("vd"),
        flatten(expr("transform(array_sort(collect_list(" +
          "struct(sub, cw))), x -> x.cw)")).as("rv"))
    val pq = cosMicro(prec, "vd", "rv")
      .where(col("micro").isNotNull)
      .agg(count(lit(1)).as("n_vecs"), sum("micro").as("ms"))
      .select(lit("pq").as("method"), col("n_vecs"), col("ms"))

    bq.unionByName(pq).unionByName(sq8)
      .select(col("method"), col("n_vecs"),
        round(col("ms").cast("double") / col("n_vecs") / 10000.0, 6)
          .as("avg_cosine"))
      .orderBy("method")
  }
}
