package graft.stages

import graft.core.TsSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label / metadata manipulation stages (ref: lang/m3/stage/ classes). All pure
  * map-column rewrites — no shuffle, fully codegen'd. `series_id` is recomputed
  * whenever the label set changes so downstream grouping stays correct.
  */
object LabelOps {
  private val S = TsSchema

  private def rehash(df: DataFrame): DataFrame =
    df.withColumn(S.SeriesId, TsSchema.seriesId(col(S.LabelsCol)))

  /** `alias "name"` — set display alias; `{{.tag}}` interpolation
    * (ref: AliasStage.java:25-30). */
  def alias(df: DataFrame, name: String): DataFrame = {
    // interpolate {{.tag}} occurrences from the label map
    val parts = "\\{\\{\\.([A-Za-z0-9_]+)\\}\\}".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var idx = 0
    for (m <- parts.findAllMatchIn(name)) {
      if (m.start > idx) pieces += lit(name.substring(idx, m.start))
      pieces += coalesce(col(S.LabelsCol).getItem(m.group(1)), lit(""))
      idx = m.end
    }
    if (idx < name.length) pieces += lit(name.substring(idx))
    val aliasCol = if (pieces.isEmpty) lit(name) else concat(pieces.toSeq: _*)
    df.withColumn("alias", aliasCol)
  }

  /** `aliasByTags t1 t2…` — alias = space-join of tag values, missing skipped
    * (ref: AliasByTagsStage.java:25-30). */
  def aliasByTags(df: DataFrame, tags: Seq[String]): DataFrame =
    df.withColumn("alias", concat_ws(" ", tags.map(t => col(S.LabelsCol).getItem(t)): _*))

  /** `showTags [includeKeys] [tags…]` — alias from tags as `k:v` or `v`;
    * default all tags sorted (ref: ShowTagsStage.java:25-36). */
  def showTags(df: DataFrame, includeKeys: Boolean, tags: Seq[String] = Nil): DataFrame = {
    val aliasCol: Column =
      if (tags.isEmpty) {
        val entries = array_sort(map_entries(col(S.LabelsCol)))
        if (includeKeys)
          concat_ws(",", transform(entries, e => concat(e.getField("key"), lit(":"), e.getField("value"))))
        else
          concat_ws(",", transform(entries, e => e.getField("value")))
      } else {
        val cols = tags.map { t =>
          val v = col(S.LabelsCol).getItem(t)
          if (includeKeys) when(v.isNotNull, concat(lit(t + ":"), v)) else v
        }
        concat_ws(",", cols: _*)
      }
    df.withColumn("alias", aliasCol)
  }

  /** `mapKey old new` — rename a tag key (ref: MapKeyStage.java:27-33). */
  def mapKey(df: DataFrame, oldKey: String, newKey: String): DataFrame = {
    val m = col(S.LabelsCol)
    val renamed = when(m.getItem(oldKey).isNotNull,
        map_concat(map_filter(m, (k, _) => k =!= oldKey && k =!= newKey),
                   map(lit(newKey), m.getItem(oldKey))))
      .otherwise(m)
    rehash(df.withColumn(S.LabelsCol, renamed))
  }

  /** `tagSub tag re repl` — regex substitution on a tag value, `$1` backrefs
    * (ref: TagSubStage.java:27-33). */
  def tagSub(df: DataFrame, tag: String, re: String, repl: String): DataFrame = {
    val m = col(S.LabelsCol)
    val newVal = regexp_replace(m.getItem(tag), re, repl)
    val rebuilt = when(m.getItem(tag).isNotNull,
        map_concat(map_filter(m, (k, _) => k =!= tag), map(lit(tag), newVal)))
      .otherwise(m)
    rehash(df.withColumn(S.LabelsCol, rebuilt))
  }
}
