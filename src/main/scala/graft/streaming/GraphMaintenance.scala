package graft.streaming

import graft.operators.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The kNN GRAPH maintained LIVE — fourth of the maintained-structure
  * family (13h vector index, 13k postings, 13m table layout): the
  * WAL's upsert stream keeps both the persisted IVF index AND its
  * kNN graph current via [[Ann.knnGraphUpsert]], whose affected-set
  * recomputation is provably equal to a rebuild (see its doc).
  * Exactly-once from the same two facts as the siblings: batches
  * arrive in log order, and the bucket-wise dynamic partition
  * overwrite is idempotent per batch — a replayed batch recomputes
  * the same affected set against the same index state and rewrites
  * identical buckets.
  */
object GraphMaintenance {

  /** Attach to a WAL line stream over an existing index + graph pair
    * (bootstrap = batch [[Ann.ivfBuildIndex]] + [[Ann.knnGraphBuild]]
    * of the snapshot). Per micro-batch: LWW-collapse to one winner
    * per id, then index upsert + graph repair in one call.
    */
  def attach(lines: DataFrame, indexPath: String, graphPath: String,
             checkpoint: String): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val upserts = IndexMaintenance.parseVectors(batch)
          .groupBy("id")
          .agg(max_by(struct(col("vec"), col("version")),
            struct(col("version"), col("log_id"))).as("w"))
          .select(col("id"), col("w.vec").as("vec"),
            col("w.version").as("version"))
        if (!upserts.isEmpty)
          Ann.knnGraphUpsert(batch.sparkSession, indexPath, graphPath,
            upserts)
      }
      .start()
}
