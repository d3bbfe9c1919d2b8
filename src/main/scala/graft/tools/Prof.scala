package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times the expensive sub-stages of the heavy
  * bench queries separately so optimization targets the real cost, not
  * the aggregate number. Not part of the driver contract.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, dir)
    docs.persist().count()

    // --- ngramJaccard internals ---
    val pairs = graft.ops.Dedup.ngramJaccard(docs, 0.8)
    time("ngramJaccard full (noop)")(noop(pairs))
    time("ngramJaccard count only")(println("  pairs=" + pairs.count()))

    val masked = docs.select(col("doc_id"),
      graft.ops.Dedup.tokenSet(col("text")).as("ts"))
    time("tokenSet only")(noop(masked))

    // --- connected components over the verified pairs ---
    val p2 = graft.ops.Dedup.ngramJaccard(docs, 0.8)
    time("connectedComponents total")(
      noop(graft.ops.Dedup.connectedComponents(p2, docs)))

    // --- minhash ---
    val mh = graft.ops.Dedup.minhashLsh(docs)
    time("minhashLsh full (noop)")(noop(mh))
    val bands = graft.ops.Dedup.minhashBands(docs)
    time("minhash bands (noop)")(noop(bands))
    val l = bands.alias("l")
    val r = bands.withColumnRenamed("doc_id", "doc_b_").alias("r")
    val raw = l.join(r,
      col("l.band_key") === col("r.band_key") &&
        col("l.b") === col("r.b") &&
        col("l.doc_id") < col("r.doc_b_"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_b_").as("doc_b"))
    time("minhash raw band join count")(println("  raw=" + raw.count()))
    time("minhash raw join (noop)")(noop(raw))

    // --- ngram stats ---
    time("topNgrams (noop)")(
      noop(graft.ops.TextStats.topNgrams(docs, 3, 50)))

    spark.stop()
  }
}
