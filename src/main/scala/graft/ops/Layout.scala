package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout — the file-clustering story behind
  * the reference's "sync to Hadoop for analytics" target
  * (`README.md:20-27`): once the audit lake is parquet, WHICH rows
  * share a file decides how much a point/range query must read.
  * Z-ordering (Morton-interleaving two clustering dimensions, the
  * public technique behind Delta Lake's OPTIMIZE ZORDER BY and
  * Databricks' 2018 engineering write-ups, originally Morton 1966)
  * makes file-level min/max stats tight on BOTH dimensions at once,
  * so either dimension's predicate prunes most files at the scan —
  * the single biggest lever a 100 TB scan has.
  *
  * Everything here is exact BIGINT arithmetic (`div`, shifts, masks)
  * so the layout decision — and its DuckDB oracle — is deterministic
  * across engines.
  */
object Layout {

  /** Morton/Z-order interleave of the low `bits` bits of two
    * non-negative long columns: bit i of `a` lands at position 2i+1,
    * bit i of `b` at 2i. A pure codegen-able shift/mask/or chain —
    * 2*`bits` terms folded by Catalyst, no UDF.
    */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write-side Z-clustering: return `df` re-laid-out so each of the
    * `nFiles` output partitions holds one contiguous Z-key range —
    * `write.parquet` on the result IS the clustered lake
    * ([[zorderReport]] audits the effect). `repartitionByRange` on
    * the Z-key gives equal-population files even under skew (range
    * boundaries come from sampling, the same mechanism as a global
    * sort), and the within-partition sort makes row-group stats tight
    * too. Payload columns ride along untouched; the helper columns
    * are dropped before return.
    */
  def clusterByZ(df: DataFrame, aCol: String, bCol: String,
                 bits: Int = 16, nFiles: Int = 64): DataFrame = {
    val g = df.agg(
      min(col(aCol)).as("__amin"), max(col(aCol)).as("__amax"),
      min(col(bCol)).as("__bmin"), max(col(bCol)).as("__bmax"))
    val grid = (1L << bits) - 1
    def scaled(c: String, lo: String, hi: String): Column =
      when(col(hi) === col(lo), lit(0L))
        .otherwise(expr(s"(($c - $lo) * $grid) div ($hi - $lo)"))
    df.join(broadcast(g))
      .withColumn("__z", zorderKey(scaled(aCol, "__amin", "__amax"),
        scaled(bCol, "__bmin", "__bmax"), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
  }

  /** Z-order clustering report: scale both dimensions onto a 2^`bits`
    * grid (exact integer min-max scaling), interleave, assign each row
    * to one of `nFiles` files by Z-key prefix, and report each file's
    * row count plus its min/max ENVELOPE on both raw dimensions with
    * exact ppm span fractions — the numbers a scan planner reads to
    * decide pruning. Tight spans on both dims (≪ 1e6 ppm) are the
    * whole point of Z-ordering; a single-dimension sort would show
    * ~1e6 ppm spans on the other dim.
    *
    * Scale shape: one 4-scalar global agg broadcast onto the scan (the
    * watermark pattern — no driver collect), one projection, one
    * hash-aggregate on the file id. At write time the same Z-key is a
    * `repartitionByRange(z)` clause; this report is its effectiveness
    * audit.
    */
  def zorderReport(df: DataFrame, aCol: String, bCol: String,
                   bits: Int = 16, nFiles: Int = 64): DataFrame =
    curveReport(df, aCol, bCol, bits, nFiles,
      (a, b) => zorderKey(a, b, bits), keyBits = 2 * bits)

  /** Hilbert-curve clustering report — [[zorderReport]] with the
    * Morton key replaced by the native [[graft.functions.HilbertKey]]
    * kernel (order-`bits` curve, one O(bits) generated loop — see the
    * kernel's scaladoc for why this cannot be a composed Column
    * expression). Hilbert's unit-step locality (no Morton diagonal
    * jumps) tightens the same per-file min/max envelopes the scan
    * planner prunes on; emitting the identical report shape makes the
    * two layouts directly comparable file by file.
    */
  def hilbertReport(df: DataFrame, aCol: String, bCol: String,
                    bits: Int = 8, nFiles: Int = 64): DataFrame =
    curveReport(df, aCol, bCol, bits, nFiles,
      (a, b) => graft.functions.HilbertKey(a, b, bits), keyBits = 2 * bits)

  /** Shared report body: scale both dimensions onto the 2^`bits`
    * grid (exact integer min-max scaling), key each row with the
    * given curve, assign files by key prefix, and report each file's
    * row count plus min/max envelope on both raw dimensions with
    * exact ppm spans — the numbers a scan planner reads to decide
    * pruning. One 4-scalar global agg broadcast onto the scan (the
    * watermark pattern), one projection, one hash-agg on the file id.
    */
  private def curveReport(df: DataFrame, aCol: String, bCol: String,
                          bits: Int, nFiles: Int,
                          key: (Column, Column) => Column,
                          keyBits: Int): DataFrame = {
    require(nFiles >= 2 && (nFiles & (nFiles - 1)) == 0,
      s"nFiles=$nFiles must be a power of two")
    val fileBits = 31 - Integer.numberOfLeadingZeros(nFiles)
    require(fileBits <= keyBits, "more files than curve-key prefixes")
    val g = df.agg(
      min(col(aCol)).as("__amin"), max(col(aCol)).as("__amax"),
      min(col(bCol)).as("__bmin"), max(col(bCol)).as("__bmax"))
    val grid = (1L << bits) - 1
    def scaled(c: String, lo: String, hi: String): Column =
      when(col(hi) === col(lo), lit(0L))
        .otherwise(expr(s"(($c - $lo) * $grid) div ($hi - $lo)"))
    val k = key(scaled(aCol, "__amin", "__amax"),
      scaled(bCol, "__bmin", "__bmax"))
    def span(mn: String, mx: String, lo: String, hi: String): Column =
      when(col(hi) === col(lo), lit(0L))
        .otherwise(expr(s"(($mx - $mn) * 1000000) div ($hi - $lo)"))
    df.join(broadcast(g))
      .withColumn("file_id", shiftright(k, keyBits - fileBits))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(aCol)).as("a_min"), max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"), max(col(bCol)).as("b_max"),
        max(col("__amin")).as("__amin"), max(col("__amax")).as("__amax"),
        max(col("__bmin")).as("__bmin"), max(col("__bmax")).as("__bmax"))
      .select(col("file_id"), col("n_rows"),
        col("a_min"), col("a_max"), col("b_min"), col("b_max"),
        span("a_min", "a_max", "__amin", "__amax").as("a_span_ppm"),
        span("b_min", "b_max", "__bmin", "__bmax").as("b_span_ppm"))
  }
}
