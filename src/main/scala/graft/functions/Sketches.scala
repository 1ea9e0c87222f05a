package graft.functions

import org.apache.spark.sql.SparkSession

/** Registry wiring for Spark's built-in Bloom sketch expressions —
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the codegen'd
  * internals behind runtime row-level filtering, not exposed as SQL
  * functions by default. Registering them gives the pipeline operators a
  * fully DISTRIBUTED Bloom build (partial sketches merged by the aggregate
  * — never a driver-side `stat.bloomFilter` collect) and a codegen'd
  * membership probe, both over xxhash64 values. */
object Sketches {
  /** Register `bloom_agg(xxhash64_col, estimatedItems, numBits)` and
    * `bloom_might_contain(filter_binary, xxhash64_col)`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}
