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
      .config("spark.driver.memory", "16g")
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

    // --- CC internals (mirrors Dedup.connectedComponents stages) ---
    {
      val p = graft.ops.Dedup.ngramJaccard(docs, 0.8)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
      time("cc: materialize pairs")(p.count())
      val m = p.groupBy(col("src").as("id")).agg(min(col("dst")).as("mn"))
        .unionByName(p.groupBy(col("dst").as("id")).agg(min(col("src")).as("mn")))
        .groupBy("id").agg(min(col("mn")).as("mn"))
        .select(col("id"), least(col("id"), col("mn")).as("m"))
        .persist()
      time("cc: min-neighbor m")(m.count())
      val contractedDir = p
        .join(m.select(col("id").as("src"), col("m").as("msrc")), Seq("src"))
        .join(m.select(col("id").as("dst"), col("m").as("mdst")), Seq("dst"))
        .select(col("msrc").as("src"), col("mdst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val contracted = contractedDir
        .unionByName(contractedDir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().persist()
      time("cc: contract edges")(println("  contracted=" + contracted.count()))
      var labels = contracted.select(col("src").as("id"))
        .unionByName(contracted.select(col("dst").as("id")))
        .distinct().withColumn("label", col("id"))
      labels = time("cc: labels init ckpt")(labels.localCheckpoint())
      var rounds = 0
      var converged = false
      while (!converged && rounds < 25) {
        val nl = contracted.join(labels, contracted("dst") === labels("id"))
          .select(col("src").as("id"), col("label"))
        val next = time(s"cc: round $rounds ckpt")(
          labels.unionByName(nl).groupBy("id").agg(min(col("label")).as("label"))
            .localCheckpoint())
        val changed = time(s"cc: round $rounds changed")(
          next.join(labels.withColumnRenamed("label", "prev"), Seq("id"))
            .filter(col("label") < col("prev")).limit(1).count())
        labels = next; converged = changed == 0; rounds += 1
      }
      val rootLabel = labels.withColumnRenamed("id", "m")
      val viaRoot = m.join(rootLabel, Seq("m"), "left")
        .select(col("id"), coalesce(col("label"), col("m")).as("cluster_id"))
      val out = docs.select(col("doc_id").as("id")).distinct()
        .join(viaRoot, Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      val ckpt = time("cc: final join + ckpt")(out.localCheckpoint())
      time("cc: final noop")(noop(ckpt))
      p.unpersist(); m.unpersist(); contracted.unpersist()
    }

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
