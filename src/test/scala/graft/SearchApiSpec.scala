package graft

import graft.operators.{Knn, SearchApi}
import org.apache.spark.sql.functions._

class SearchApiSpec extends SparkSuite {

  private def data = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("label"))
  private def qs = Tables.embeddings(spark, sf).where(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("homogeneous batches collapse to the per-query operators") {
    // all-L2 with '=5' filter ≡ Knn.topKFiltered(label === 5)
    val eqReqs = qs.select(col("qid"), col("qvec"), lit(10L).as("k"),
      lit("L2").as("metric"), lit("=").as("fop"), lit(5L).as("fval"))
    val viaApi = SearchApi.searchRequests(data, eqReqs, 10)
      .collect().toSeq
    val direct = Knn.topKFiltered(data, qs, 10, Knn.Metric.L2,
      col("label") === 5).collect().toSeq
    assert(viaApi == direct && viaApi.nonEmpty)

    // all-IP unfiltered ≡ Knn.topK(IP)
    val ipReqs = qs.select(col("qid"), col("qvec"), lit(10L).as("k"),
      lit("IP").as("metric"),
      lit(null).cast("string").as("fop"), lit(0L).as("fval"))
    val viaApiIp = SearchApi.searchRequests(data, ipReqs, 10)
      .collect().toSeq
    val directIp = Knn.topK(data, qs, 10, Knn.Metric.IP)
      .collect().toSeq
    assert(viaApiIp == directIp && viaApiIp.nonEmpty)
  }

  test("mixed batch honors each request's own filter") {
    val labelOf = data.select("id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val rows = SearchApi.searchRequestsQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nn) =>
      if (qid % 3 == 0)
        assert(labelOf(nn) == 5L, s"request $qid (=5) got label ${labelOf(nn)}")
      if (qid % 3 == 1)
        assert(labelOf(nn) != 5L, s"request $qid (!=5) got label 5")
    }
    // per-request k honored: even qids asked for 10, odd for 5
    val sizes = rows.groupBy(_._1).map { case (q, rs) => q -> rs.length }
    sizes.foreach { case (q, n) =>
      assert(n == (if (q % 2 == 0) 10 else 5), s"request $q returned $n rows")
    }
  }

  test("routed batch: FLAT requests match the exact leg, IVF, HNSW " +
    "and HNSW_HIER requests match direct index calls") {
    val q8 = Tables.embeddings(spark, sf).where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val rows = SearchApi.searchRoutedQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_._1)
    // the batch covers all four legs and honors per-request k
    assert(byQ.keySet == (0L to 7L).toSet)
    assert(byQ(0L).length == 10 && byQ(3L).length == 10 &&
      byQ(6L).length == 10)
    Seq(1L, 2L, 4L, 5L, 7L).foreach(q => assert(byQ(q).length == 5))
    // approximate requests return EXACTLY what direct index queries
    // return — routing must not change an answer
    val ivfDirect = graft.operators.Ann.ivfSearchCached(spark, sf,
        q8.where(col("qid") % 4 === 1), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .filter { case (qid, rk, _, _) => rk <= (if (qid % 3 == 0) 10 else 5) }
      .toSet
    assert(rows.filter(_._1 % 4 == 1).toSet == ivfDirect)
    val nswDirect = graft.operators.Ann.nswSearch(spark, sf,
        q8.where(col("qid") === 3), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .filter { case (qid, rk, _, _) => rk <= (if (qid % 3 == 0) 10 else 5) }
      .toSet
    assert(rows.filter(_._1 == 3).toSet == nswDirect)
    val hierDirect = graft.operators.Ann.hnswSearch(spark, sf,
        q8.where(col("qid") === 7), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .filter { case (qid, rk, _, _) => rk <= (if (qid % 3 == 0) 10 else 5) }
      .toSet
    assert(rows.filter(_._1 == 7).toSet == hierDirect,
      "HNSW_HIER routing changed the hierarchy's answer")
    // FLAT requests match the unrouted batch API on the same requests
    val flatReqs = Tables.embeddings(spark, sf)
      .where(col("vec_id") < 8 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        when(col("vec_id") % 3 === 0, 10L).otherwise(5L).as("k"),
        when(col("vec_id") % 4 === 2, "IP").otherwise("L2").as("metric"),
        when(col("vec_id") === 4, "=")
          .when(col("vec_id") === 2, "!=")
          .otherwise(lit(null).cast("string")).as("fop"),
        lit(5L).as("fval"))
    val flatDirect = SearchApi.searchRequests(data, flatReqs, 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows.filter(_._1 % 2 == 0).toSet == flatDirect)
  }

  test("leg parity: an all-FLAT batch never builds the approximate " +
    "legs; an all-HNSW batch is exactly the graph leg") {
    // fresh dir = fresh ByproductCache key space, so graph
    // materialization is observable
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "routedleg")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "embeddings.parquet"),
      tmp.resolve("embeddings.parquet"))
    val dirS = tmp.toString
    try {
      val d = Tables.embeddings(spark, dirS)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      val q = Tables.embeddings(spark, dirS).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      def reqs(t: String) = q.select(col("qid"), col("qvec"),
        lit(t).as("index_type"), lit(5L).as("k"), lit("L2").as("metric"),
        lit(null).cast("string").as("fop"), lit(5L).as("fval"))
      val appId = spark.sparkContext.applicationId
      val flatOut = SearchApi.searchRouted(spark, dirS, d, reqs("FLAT"), 10)
      assert(flatOut.count() > 0)
      // the expensive NSW dependency was never touched: no kNN graph
      // (nor symmetrized edge table) materialized for this dir
      assert(!ByproductCache.cached(appId, s"knngraph|$dirS|8|2"),
        "all-FLAT batch materialized the kNN graph")
      assert(!ByproductCache.cached(appId, s"nswedges|$dirS|8"),
        "all-FLAT batch built the NSW edge table")
      // and the plan carries no checkpoint-RDD scan (the graph leg's
      // signature operator)
      assert(!flatOut.queryExecution.executedPlan.toString
        .contains("ExistingRDD"),
        "all-FLAT plan contains an approximate-leg scan")
      // vice versa: an all-HNSW batch IS the graph leg — its rows
      // equal the direct nswSearch call exactly (an exact-leg union
      // branch would add rows and break equality), and now the graph
      // byproduct exists
      val hnswOut = SearchApi.searchRouted(spark, dirS, d, reqs("HNSW"), 10)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val direct = graft.operators.Ann.nswSearch(spark, dirS, q, k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .filter(_._2 <= 5).toSet
      assert(hnswOut == direct && hnswOut.nonEmpty,
        "all-HNSW batch is not exactly the graph leg")
      assert(ByproductCache.cached(appId, s"knngraph|$dirS|8|2"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("k > maxK fails loudly on EVERY routed leg, not just FLAT") {
    // r13 (ADVICE r12): the loud-failure contract formerly ran only
    // inside searchRequests on the FLAT sub-batch — an approximate
    // request with k > maxK was silently truncated by the k=maxK
    // legs. Now the whole-batch max(k) is validated before splitting.
    def reqs(t: String) = qs.select(col("qid"), col("qvec"),
      lit(t).as("index_type"), lit(20L).as("k"), lit("L2").as("metric"),
      lit(null).cast("string").as("fop"), lit(5L).as("fval"),
      lit(48L).as("ef"))
    val eHnsw = intercept[IllegalArgumentException] {
      SearchApi.searchRouted(spark, sf, data, reqs("HNSW"), maxK = 10)
    }
    assert(eHnsw.getMessage.contains("maxK=10"))
    val eIvf = intercept[IllegalArgumentException] {
      SearchApi.searchRouted(spark, sf, data, reqs("IVF"), maxK = 10)
    }
    assert(eIvf.getMessage.contains("k=20"))
    val eEf = intercept[IllegalArgumentException] {
      SearchApi.searchRoutedEf(spark, sf, data, reqs("HNSW"), maxK = 10)
    }
    assert(eEf.getMessage.contains("maxK=10"))
    // legal batches still flow on both surfaces
    assert(SearchApi.searchRouted(spark, sf, data,
      reqs("FLAT").withColumn("k", lit(10L)), maxK = 10).count() > 0)
    assert(SearchApi.searchRoutedEf(spark, sf, data,
      reqs("HNSW").withColumn("k", lit(10L)), maxK = 10).count() > 0)
  }

  test("count batch: per-request filters agree with direct counts; " +
    "unmatched requests zero-anchor; one partial-aggregated pass") {
    import spark.implicits._
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("label"))
    val reqs = Seq(
      (0L, Option("="), 5L), (1L, Option("!="), 5L),
      (2L, Option.empty[String], 0L), (3L, Option("="), 9999L))
      .toDF("qid", "fop", "fval")
    val got = SearchApi.countRequests(data, reqs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = data.count()
    val eq5 = data.where(col("label") === 5).count()
    assert(got == Map(0L -> eq5, 1L -> (n - eq5), 2L -> n, 3L -> 0L))
    // the qid-keyed count partial-aggregates before the exchange: the
    // shuffle carries request-sized partials, never corpus rows
    val plan = SearchApi.countRequests(data, reqs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"no map-side partial aggregation in:\n$plan")
  }
}
