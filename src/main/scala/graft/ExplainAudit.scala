package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps `explain(formatted)` for EVERY registered batch
  * query so plan quality (pushdown, pruning, broadcast selection, codegen
  * spans) is inspectable — the "is this the plan you'd want at 100 TB"
  * loop. The hand-annotated representative set leads the file (each with
  * the property its plan must exhibit); the remaining registry follows in
  * name order. Streaming-backed queries (`SparkEntry.streamingQueries`,
  * flagged at the registration site) are excluded: their registered
  * functions EXECUTE a micro-batch query at construction, so the
  * interesting plan is the streaming one inside (audited by their
  * specs), not the final batch read-back. Note the audit is not entirely
  * side-effect-free either: constructing `sim_knn_ivf`/`sim_knn_ivf_i8`
  * runs `ivfBuildIfAbsent` (k-means fit + index parquet writes into the
  * session tmpdir) before returning the lazy probe plan — the dumped
  * plan is the real serve-time plan, the build cost lands here.
  *
  * Usage: runMain graft.ExplainAudit [sfDir] [outFile]
  */
object ExplainAudit {
  private val Audited = Seq(
    "scan_parquet",     // PushedFilters/ReadSchema: pruning must reach parquet
    "filter_predicate", // predicate pushdown
    "agg_groupby",      // partial agg before shuffle
    "join_inner",       // big-big join strategy
    "join_broadcast",   // BroadcastHashJoin expected
    "topk",             // TakeOrderedAndProject expected
    "win_rank",         // single shuffle + sort for windows
    "sim_knn",          // codegen'd vec_cosine in the loop
    "join_asof_custom", // custom AsofJoinExec: one exchange+sort per side
    "dedup_minhash",    // LSH banding: no all-pairs product anywhere
    "profile_table",    // melt + two-level HashAggregate (no SortAggregate)
    "docs_pipeline",    // composed prep: one window shuffle only
    "sim_knn_topk",     // ObjectHashAggregate w/ bounded top-k buffer, partial map-side
    "ts_gapfill",       // grid generate + left join + one window sort
    "wx_wow_record",    // flagship: windows + scalar derivations fused
    "emb_normalize",    // scan -> per-row codegen'd vector math, no shuffle
    "sim_knn_i8",       // quantize + broadcast + codegen'd integer cosine
    "docs_decontam",    // benchmark shingle set broadcast, no self-join
    "docs_decontam_bloom", // bloom probe in scan, shuffled-hash exact join
    "dedup_incremental",// batch->corpus probe + WindowGroupLimit top-1
    "text_unigram_nll", // census fit + broadcast apply-back + decimal sum
    "emb_kmeans")       // final-assignment pass: scan vs centroid literals

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/explain_audit.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      // production registration path — the registry includes sql_surface,
      // which resolves only under the injected functions (see Bench)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // pinned at session build (Tables.events requires it): driver
      // corpora have stored events.ts as parquet TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rest = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.streamingQueries).filterNot(Audited.contains)
    val sb = new StringBuilder("# Plan audit\n")
    sb.append(s"\nAnnotated representative set first, then the remaining " +
      s"registry (${Audited.length} + ${rest.length} batch queries; " +
      "streaming-backed queries excluded — they execute at construction).\n")
    (Audited ++ rest).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
