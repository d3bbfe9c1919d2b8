package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler — round 11 edition: decomposes the scale
  * probe's q_dedup_clusters headline into stages on the SAME plan at
  * three scales. The 1× vs 8× prefix-path ratio (~17) straddles the
  * DESIGNED broadcast→shuffle transition of the verify rejoins (5k
  * docs' token arrays broadcast; 40k docs' don't — the scaladoc's
  * stated at-scale behavior), so the ×2 leg sits PAST the step and
  * the ×2→×8 ratio reads the true curve. Not part of the driver
  * contract.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val d1 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d2 = if (args.length > 1) args(1) else "/tmp/graft_scale2"
    val d8 = if (args.length > 2) args(2) else "/tmp/graft_scale8"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    ScaleProbe.buildStressed(spark, d1, d2, 2)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (dir <- Seq(d1, d2, d8)) {
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      docs.persist().count()
      val pairs = time(s"$dir prefix jaccard pairs") {
        val p = graft.ops.Dedup
          .ngramJaccardPrefix(docs, 0.8, "doc_id", "text")
          .localCheckpoint()
        println(s"[prof]   pairs = ${p.count()}")
        p
      }
      time(s"$dir connected components") {
        val c = graft.ops.Dedup.connectedComponents(pairs, docs)
        println(s"[prof]   clusters rows = ${c.count()}")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
