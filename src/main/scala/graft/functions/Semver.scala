package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Semantic-version comparison (ref: lang/m3/common/SemanticVersionComparator.java).
  * Implemented as a sortable fixed-width key built from builtin functions
  * (codegen'd — no UDF): each of the first 4 dot-separated numeric components
  * is zero-padded to 10 digits; non-numeric/missing components sort as 0.
  */
object Semver {
  def sortKey(v: Column): Column = {
    def part(i: Int): Column = {
      val p = split(v, "\\.").getItem(i)
      val digits = regexp_extract(p, "^(\\d+)", 1)
      lpad(when(digits === "", "0").otherwise(digits), 10, "0")
    }
    concat(part(0), part(1), part(2), part(3))
  }
}
