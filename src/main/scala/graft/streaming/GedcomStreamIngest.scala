package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.gedcom.GedcomGraph

/** Streaming GEDCOM ingestion — the Spark-native form of the reference's
  * unbounded pipe (`gedcom.pipe(csvs)`, index.js:77): a watched directory
  * of arriving `.ged` files, each processed as a complete unit.
  *
  * `maxFilesPerTrigger = 1` makes every micro-batch exactly one whole file,
  * so record boundaries never straddle batches; inside the batch the
  * regular (shuffle-free) assembly runs via `foreachBatch` and appends to
  * parquet node/edge tables. Checkpointing gives exactly-once per file —
  * a restart neither drops nor re-processes arrivals.
  */
object GedcomStreamIngest {

  /** Start the ingestion query. Output layout: `<outDir>/nodes` and
    * `<outDir>/edges` parquet tables, `<outDir>/ckpt` checkpoint. */
  def start(spark: SparkSession, watchDir: String, outDir: String): StreamingQuery =
    spark.readStream
      .option("maxFilesPerTrigger", "1")
      .option("wholetext", "true") // one row per complete file
      .text(watchDir)
      .writeStream
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // keep the file's natural line order — a repartition here would
          // shuffle lines and break record contiguity
          val g = GedcomGraph.fromTextRdd(batch.sparkSession,
            batch.rdd.flatMap(_.getString(0).split("\n", -1)))
          g.nodes.write.mode("append").parquet(s"$outDir/nodes")
          g.edges.write.mode("append").parquet(s"$outDir/edges")
        }
      }
      .start()
}
