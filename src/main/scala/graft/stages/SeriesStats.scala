package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-series statistical diagnostics beyond the M3QL/PromQL surface. */
object SeriesStats {

  private val Dec = DecimalType(38, 9)
  private def dSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** AUTOCORRELATION at lags 1..`maxLag` over an integer-period series
    * (seasonality/burstiness diagnostic): for each key,
    * r_k = Σ (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)², the numerator over
    * the (t, t+k) pairs where BOTH periods exist (holes pair with
    * nothing), the denominator and mean over every present period.
    * Every cross-row sum quantizes addends through DECIMAL(38,9) and the
    * final ratio is quantized, so values replay cross-engine.
    *
    * Distributed shape: one mean/denominator aggregate per key, one
    * key-and-period equi-join per lag on the (small) per-period frame, one
    * final reduction — no window over the raw events, no per-lag scan of
    * the corpus. Input must be one row per (key, period). */
  def autocorrelation(series: DataFrame, maxLag: Int,
                      keyCol: String = "user_id",
                      tCol: String = "t",
                      vCol: String = "x"): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val stats = series.groupBy(col(keyCol))
      .agg((dSum(col(vCol)) / count(col(vCol))).as("_mean"))
    val centered = series.join(stats, Seq(keyCol))
      .select(col(keyCol), col(tCol).as("_t"),
        (col(vCol) - col("_mean")).as("_c"))
    val denom = centered.groupBy(col(keyCol))
      .agg(dSum(col("_c") * col("_c")).as("_ss"))
    val lags = (1 to maxLag).map { k =>
      val lead = centered.select(col(keyCol), (col("_t") - k).as("_t"),
        col("_c").as("_cl"))
      centered.join(lead, Seq(keyCol, "_t"))
        .groupBy(col(keyCol))
        .agg(dSum(col("_c") * col("_cl")).as("_num"))
        .withColumn("lag", lit(k))
    }
    lags.reduce(_ unionByName _)
      .join(denom, Seq(keyCol))
      .select(col(keyCol), col("lag"),
        (col("_num") / col("_ss")).cast(Dec).cast(DoubleType).as("acf"))
  }
}
