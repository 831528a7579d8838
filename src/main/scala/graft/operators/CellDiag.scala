package graft.operators

import org.apache.spark.sql.functions._

/** Diagnostic main (not a driver surface): cell-composition stats for
  * the IVF/SemDeDup blocking under a scale-replica dir — cell-size
  * distribution, Σ n_c² (the in-cell pair-work proxy), and
  * cross-replica mixing (how many cells hold vectors from more than
  * one replica band). Exists to attribute scale-leg slopes: if the
  * per-cell pair work stops tracking ~(mean cell)·n, the number that
  * moved shows up here.
  */
object CellDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SCALE_FACTOR=n: diagnose the n× replica dir (and
    // materialize it if absent) instead of a plain sf dir
    val dir = sys.env.get("SPARK_GRAFT_SCALE_FACTOR") match {
      case Some(f) =>
        graft.ScaleStress.materialize(spark, sys.env("SPARK_GRAFT_SF_DIR"), f.toInt)
      case None => sys.env("SPARK_GRAFT_SF_DIR")
    }
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = Ann.cachedCentroids(spark, dir)
    println(s"[celldiag] dir=$dir centroids=${cents.length}")
    val a = Ann.assignTo(e, cents)
      .select(col("id"), col("cell"), (col("id") / 10000000L).cast("long").as("rep"))
    val byCell = a.groupBy("cell")
      .agg(count(lit(1)).as("n"), countDistinct(col("rep")).as("reps"))
    val stats = byCell.agg(
      count(lit(1)).as("cells"),
      sum(col("n")).as("rows"),
      max(col("n")).as("max_cell"),
      round(avg(col("n")), 1).as("mean_cell"),
      sum(col("n") * col("n")).as("sum_n2"),
      sum(when(col("reps") > 1, 1L).otherwise(0L)).as("mixed_cells"),
      round(avg(col("reps")), 2).as("mean_reps_per_cell"))
      .collect()(0)
    println(s"[celldiag] $stats")
    // the discriminating number for SemDeDup slope attribution: how
    // many in-cell pairs SURVIVE the τ=0.35 bar, and whether the
    // survivors cross replica bands (cell mixing alone is benign —
    // an isotropic union mixes trivially; cliques are pairs that
    // both mix AND survive)
    val av = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val aa = Ann.assignTo(av, cents)
      .select(col("id"), col("vec"), col("cell"),
        (col("id") / 10000000L).cast("long").as("rep"))
    val bb = aa.select(col("id").as("id2"), col("vec").as("v2"),
      col("cell"), col("rep").as("rep2"))
    val pairs = aa.join(bb, Seq("cell")).where(col("id") < col("id2"))
      .select(col("rep"), col("rep2"),
        graft.functions.VectorDistance.cosine(col("vec"), col("v2")).as("s"))
      .where(col("s") >= 0.35)
    val ps = pairs.agg(
      count(lit(1)).as("surviving_pairs"),
      sum(when(col("rep") === col("rep2"), 1L).otherwise(0L)).as("intra_rep"),
      sum(when(col("rep") =!= col("rep2"), 1L).otherwise(0L)).as("cross_rep"),
      round(avg(col("s")), 3).as("mean_cos"))
      .collect()(0)
    println(s"[celldiag] pairs(tau=0.35) $ps")
    spark.stop()
  }
}
