package graft

import graft.core.QueryGrid
import graft.lang.m3.M3QL
import graft.yaml.MiniYaml
import graft.yaml.MiniYaml.{Y, YMap, YNum}
import org.apache.spark.sql.Row

/** Conformance against the reference's OWN golden corpus: loads
  * golden_dataset_rest_it.yaml from the read-only reference checkout at test
  * time (never copied into this repo), replays each fixture onto the canonical
  * samples schema, runs each m3ql query through our parse→compile→execute
  * path, and compares positional values on the query grid.
  *
  * Reference format: src/javaRestTest/resources/test_cases/
  * golden_dataset_rest_it.yaml; loader framework YamlLoader.java.
  */
class GoldenCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/golden_dataset_rest_it.yaml")

class FunctionalCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/functional_correctness_rest_it.yaml")

class E2eCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/e2e_m3ql_query_execution_rest_it.yaml")

class MockFetchCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/mockfetch_test_it.yaml")

/** Multi-index corpora: indices collapse into the single samples table (the
  * union IS the multi-index read; overlapping windows dedup on (series, ts)
  * — SURVEY.md §3.4: federation reduces to reading both partitions + dedup). */
class OverlappingWindowsCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/multi_index_overlapping_windows_rest_it.yaml")

class DataMigrationCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/multi_index_data_migration_rest_it.yaml")

class PushdownComparisonCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/multi_index_pushdown_comparison_rest_it.yaml")

class RestExampleCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/tsdb_rest_it_example.yaml")

/** Cluster-mode corpora (internalClusterTest): shard/node distribution is
  * physical in the reference; in Spark the same property is partitioning
  * invariance (DifferentialSpec), so these reduce to the same query-over-
  * fixture replay. Cross-cluster queries select specific indices — the loader
  * filters the fixture rows to the query's index list. */
class ClusterExampleCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/internalClusterTest/resources/test_cases/example_tsdb_cluster_it.yaml")

class MultiShardCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/internalClusterTest/resources/test_cases/multi_shard_multi_node_tsdb_it.yaml")

class CrossClusterCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/internalClusterTest/resources/test_cases/example_cross_cluster_search_it.yaml")

/** Step-size corpus: queries whose grid step differs from the data's native
  * interval — validates the fetch unfold's last-wins bucket alignment
  * (TimeSeriesUnfoldAggregator:305-320). The per-index default_step_size
  * setting itself maps to serve.QueryParams defaults; each case's
  * time_config carries the resolved step. */
class StepSizeCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/m3ql_step_size_from_index_settings_rest_it.yaml")

/** resolved_partitions parsing corpus: the partition-ID formats are REST
  * plumbing (federation resolution), but every query's SEMANTICS replay
  * against the fixture — metric names are index-unique, and the unknown-index
  * fallback mirrors resolved_partitions taking precedence over the URL
  * `indices` param (its test 4). */
class ResolvedPartitionsCorpusSpec extends GoldenCorpusBase(
  "/root/reference/src/javaRestTest/resources/test_cases/m3ql_resolved_partitions_index_parsing_rest_it.yaml")

abstract class GoldenCorpusBase(yamlPath: String) extends SparkTestBase {

  /** Queries exercising semantics we intentionally don't reproduce; empty
    * since round 5 (the storage-catalog 404 case now replays through
    * Federation.requirePartitions). */
  private val excluded: Map[String, String] = Map.empty

  /** Fixed reference instant for corpora using relative time expressions
    * ("now-50m"); any aligned value works since data layout and query grids
    * derive from the same expressions. 2024-01-01T00:00:00Z. */
  private val nowMs = 1704067200000L

  private def isoToMs(s: String): Long =
    if (s.startsWith("now")) graft.serve.DateMath.parse(s, nowMs)
    else java.time.Instant.parse(s).toEpochMilli

  private lazy val root: Y = MiniYaml.parseFile(yamlPath)

  private def parseLabels(s: String): Map[String, String] =
    s.split(",").map { kv => val Array(k, v) = kv.split(":", 2); k -> v }.toMap

  /** Fixture rows tagged with their source index name, so index-selective
    * queries (cross-cluster: `indices: "cluster_a:remote_metrics_a"`) can
    * replay against exactly the named subset. */
  private lazy val fixtureRows: Seq[(String, Row)] = {
    val inputs = root("test_case")("input_data_list").list
    inputs.flatMap { in =>
      val idx = in.get("index_name").map(_.str).getOrElse("")
      val rows = in.get("regular_metrics") match {
        case Some(rm) =>
          // FIXED_INTERVAL: values positional on the input grid
          val tc = in("time_config")
          val start = isoToMs(tc("min_timestamp").str)
          val step = graft.lang.m3.Duration.parse(tc("step").str).get
          rm.list.flatMap { m =>
            val labels = parseLabels(m("labels").str)
            m("values").list.zipWithIndex.collect {
              case (YNum(v), i) => Row(labels, start + i * step, v)
            }
          }
        case None =>
          // GENERIC: explicit (timestamp, value) data points
          in("metrics").list.flatMap { m =>
            val labels = parseLabels(m("labels").str)
            m("data_points").list.map { dp =>
              Row(labels, isoToMs(dp("timestamp").str), dp("value").num)
            }
          }
      }
      rows.map(idx -> _)
    }
  }

  private lazy val knownIndices: Set[String] = fixtureRows.map(_._1).toSet

  /** The samples DF a query reads: all rows, or — when every name in the
    * query's `indices` list resolves to a loaded index (cluster prefixes
    * stripped) — only those indices' rows. Alias names like "golden_all" that
    * match nothing fall back to the full fixture, the pre-cross-cluster
    * behavior. Multi-index overlap: first occurrence per (series, ts) wins. */
  private def fixtureFor(q: Y): org.apache.spark.sql.DataFrame = {
    val wanted = q.get("indices").map(_.str.split(",").toSeq
      .map(_.trim.split(":").last)).getOrElse(Nil)
    val rows =
      if (wanted.nonEmpty && wanted.forall(knownIndices)) {
        val w = wanted.toSet
        fixtureRows.collect { case (idx, r) if w(idx) => r }
      } else fixtureRows.map(_._2)
    samplesDF(rows).dropDuplicates("series_id", "timestamp")
  }

  private def runCase(q: Y): Unit = {
    val name = q("name").str
    val tc = q("time_config")
    val grid = QueryGrid(
      isoToMs(tc("min_timestamp").str),
      isoToMs(tc("max_timestamp").str),
      graft.lang.m3.Duration.parse(tc("step").str).get)
    // resolved_partitions with ONE fetch entry spanning several known-index
    // windows routes through the federation evaluator (pushdown when the
    // windows are disjoint — serve.Federation); per-fetch entries (one window
    // each) and unknown partition formats keep the global path, which is also
    // what the reference does for a single partition
    val fedParts: Seq[(graft.serve.Federation.PartitionWindow, org.apache.spark.sql.DataFrame)] =
      q.get("resolved_partitions").map(_.list) match {
        case Some(Seq(entry)) =>
          val ws = entry.get("windows").map(_.list).getOrElse(Nil).map { w =>
            (w("partition").str.split(":").last, isoToMs(w("start").str), isoToMs(w("end").str))
          }
          if (ws.sizeIs > 1 && ws.forall(w => knownIndices(w._1)))
            ws.map { case (p, s, e) =>
              graft.serve.Federation.PartitionWindow(p, s, e) ->
                samplesDF(fixtureRows.collect { case (idx, r) if idx == p => r })
            }
          else Nil
        case _ => Nil
      }
    val result =
      if (fedParts.nonEmpty) graft.serve.Federation.query(spark, fedParts, grid, q("query").str)
      else M3QL.query(spark, fixtureFor(q), grid, q("query").str)
    // position-based collect: index = (ts - start)/step, allowing points past
    // the aligned end (mockFetch series extend to their own last value)
    val rows = result.select(
        graft.core.TsSchema.seriesKey(org.apache.spark.sql.functions.col("labels")).as("sk"),
        org.apache.spark.sql.functions.col("timestamp"),
        org.apache.spark.sql.functions.col("value"))
      .collect()
    val got: Map[String, Seq[Option[Double]]] = rows.groupBy(_.getString(0)).map {
      case (sk, rs) =>
        val byPos = rs.map(r => ((r.getLong(1) - grid.startMs) / grid.stepMs).toInt ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
        val maxPos = math.max(grid.numPoints.toInt - 1,
          if (byPos.isEmpty) 0 else byPos.keys.max)
        sk -> (0 to maxPos).map(i => byPos.getOrElse(i, None))
    }
    val expected = q("expected")("data").list.map { d =>
      val metric = d("metric").asInstanceOf[YMap].m.map { case (k, v) => s"$k:${v.str}" }
        .toSeq.sorted.mkString(",")
      val values = d("values").list.map {
        case YNum(v)                      => Some(v)
        case MiniYaml.YStr("NaN")         => Some(Double.NaN)
        case _                            => None
      }
      metric -> values
    }
    assert(got.keySet == expected.map(_._1).toSet,
      s"$name: series mismatch got=${got.keySet} want=${expected.map(_._1).toSet}")
    for ((sk, want) <- expected) {
      val have = got(sk)
      // expected arrays may carry trailing nulls beyond the query grid
      want.drop(have.length).zipWithIndex.foreach { case (w, i) =>
        assert(w.isEmpty, s"$name/$sk[${have.length + i}]: expected $w beyond grid")
      }
      want.take(have.length).zipWithIndex.foreach { case (w, i) =>
        (have(i), w) match {
          case (Some(h), Some(x)) =>
            assert((h.isNaN && x.isNaN) ||
              math.abs(h - x) <= 1e-6 * math.max(1.0, math.abs(x)),
              s"$name/$sk[$i]: $h != $x")
          case (None, None) =>
          case (h, x) => fail(s"$name/$sk[$i]: $h vs $x")
        }
      }
      // grid points beyond the expected list must be absent
      have.drop(want.length).zipWithIndex.foreach { case (h, i) =>
        assert(h.isEmpty, s"$name/$sk[${want.length + i}]: unexpected point $h")
      }
    }
  }

  // materialize test cases at class-construction time
  {
    val qs =
      try root("test_case")("queries").list
      catch { case e: Throwable =>
        System.err.println(s"[golden] corpus load failed: $e")
        e.getStackTrace.take(5).foreach(f => System.err.println(s"  at $f"))
        Nil
      }
    if (qs.isEmpty) {
      test("golden corpus loads") {
        cancel(s"reference corpus not available at $yamlPath")
      }
    } else {
      qs.foreach { q =>
        val name = q("name").str
        val expectedStatus = q("expected").get("status").map(_.str).getOrElse("success")
        excluded.get(name) match {
          case Some(reason) =>
            ignore(s"golden: $name") {}
          case None if expectedStatus != "success" =>
            test(s"golden: $name (expected failure)") {
              // the catalog existence check runs before planning, exactly
              // like the reference's 404 on an unknown resolved partition
              val requested = q.get("resolved_partitions").map(_.list).getOrElse(Nil)
                .flatMap(_.get("windows").map(_.list).getOrElse(Nil))
                .map(w => w("partition").str.split(":").last)
              if (requested.exists(!knownIndices(_))) {
                // a 404 case must fail with the catalog error specifically —
                // a query-semantics raise here would mean the 404 path broke
                intercept[graft.serve.Federation.PartitionNotFoundException] {
                  graft.serve.Federation.requirePartitions(knownIndices, requested)
                }
              } else {
                // all partitions known: the failure must come from the QUERY,
                // never masked by an (impossible here) catalog error
                graft.serve.Federation.requirePartitions(knownIndices, requested)
                intercept[Exception] {
                  M3QL.query(spark, fixtureFor(q),
                    QueryGrid(0, 60000, 60000), q("query").str).collect()
                }
              }
            }
          case None =>
            test(s"golden: $name") { runCase(q) }
        }
      }
    }
  }
}
