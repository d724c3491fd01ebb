package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every corpus query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Self-diagnosing against shared-host noise (identical code has benched
  * anywhere between 25 s and 103 s here depending on EXTERNAL load): runs
  * TWO full passes and reports the per-query MIN — the best observable
  * proxy for quiet-host cost — plus both pass totals and /proc/loadavg
  * at start and end, so a recorded artifact carries its own evidence of
  * whether a slow number is the code or the host.
  */
object Bench {
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  /** The 37 round-1 baseline queries (BENCH_r01.json's key set) — run
    * once as an in-artifact HOST-SPEED PROBE before the timed passes.
    * This workload is frozen: it never grows with the corpus, so the
    * probe subtotal is a constant-work yardstick and cross-round
    * comparison becomes a division inside each artifact
    * (corpus_total / host_probe_sec) instead of a same-host A/B rerun
    * of an old tree (the r12→r14 drift-control exercise).
    */
  private val HostProbeQueries: Seq[String] = Seq(
    "q01_flagship", "q02_pricing_summary", "q03_global_agg",
    "q04_watermark_filter", "q05_inlist_filter", "q06_outer_join_agg",
    "q07_semi_join", "q08_anti_join", "q09_window_rank",
    "q10_window_running", "q11_topk", "q12_setops", "q13_distinct",
    "q14_string_funcs", "q15_date_funcs", "q16_math_funcs",
    "q17_json_extract", "q18_rollup", "q19_cube", "q20_merge_upsert",
    "q21_time_buckets", "q22_recon_counts", "q23_dedup_exact",
    "q24_dedup_ngram_jaccard", "q25_dedup_minhash_lsh",
    "q26_dedup_simhash", "q27_knn_cosine", "q28_ann_lsh",
    "q29_text_stats", "q30_langid", "q31_quality_score",
    "q32_fingerprint", "q33_embedding_neardup", "q34_asof_join",
    "q35_sessionize", "q36_subword_count", "q37_percentiles")

  /** Probe self-protection at scale-up SFs (the r15 isolation-run
    * footgun): the probe deliberately ignores SPARK_GRAFT_ONLY — an
    * isolation artifact needs the host yardstick most — but an
    * isolation run that omitted the documented SKIP set then ran the
    * deliberately-quadratic q24/q25 INSIDE the probe at 100×, burning
    * 740–840 s and recording a probe failure. The recorded sf ≥ 1 skip
    * set's probe members are baked in here and applied to the probe
    * whenever the SF dir's scale factor is ≥ 1, independent of
    * SKIP/ONLY — so every sf ≥ 1 artifact (full-corpus or isolation)
    * probes the same 35-query set and their probe subtotals compare
    * directly; at sf < 1 the probe runs all 37 (host_probe_n records
    * which set an artifact used — 37 vs 35 subtotals are NOT directly
    * comparable). An UNPARSABLE dir basename (anything not of the
    * exact form `sf<number>`, e.g. a copied `/tmp/sf10_run2`) is loud:
    * it falls back to small-SF (probe everything) but prints a
    * warning, because silently probing the deliberately-quadratic
    * q24/q25 at 100× is the exact footgun this skip set closes.
    */
  private val ScaleUpProbeSkips: Set[String] =
    Set("q24_dedup_ngram_jaccard", "q25_dedup_minhash_lsh")

  private[graft] def probeSkipsFor(sfDir: String): Set[String] = {
    val base = sfDir.stripSuffix("/").split('/').last
    val sf = "^sf([0-9]+(?:\\.[0-9]+)?)$".r
    base match {
      case sf(v) if v.toDouble >= 1.0 => ScaleUpProbeSkips
      case sf(_) => Set.empty
      case _ =>
        System.err.println(
          s"[bench] WARNING: SF dir basename '$base' is not of the form " +
            "sf<number>; treating it as small-SF — the host probe will run " +
            "the quadratic q24/q25. Rename the dir (e.g. sf10) or set " +
            "SPARK_GRAFT_SKIP if this is a scale-up run.")
        Set.empty
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        // shuffle/spill files are reclaimed by the ContextCleaner only
        // when the referencing exchange objects are GC'd; a 100-query
        // pass at a scale-up SF otherwise accumulates every query's
        // shuffle dirs in local storage until the DISK (not memory)
        // fills mid-pass. Forcing a periodic driver GC bounds local
        // storage at roughly the live queries' working set.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()
    val loadStart = loadavg()
    // Untimed warmup: JVM/codegen/shuffle-machinery startup isn't query
    // cost. A small read+join+agg touches the main execution paths.
    try {
      val w = spark.read.parquet(s"$sfDir/nation.parquet")
      w.join(w.selectExpr("n_nationkey AS k"), w("n_nationkey") === org.apache.spark.sql.functions.col("k"))
        .groupBy("n_name").count().count()
    } catch { case _: Throwable => () }
    // A failing query must not masquerade as a fast one: a pass that
    // throws records its time-to-failure, which is NOT an execution cost —
    // the headline min considers only SUCCESSFUL passes, and a query lands
    // in "errors" only if no pass succeeded.
    // SPARK_GRAFT_SKIP: comma-separated query names to exclude — for
    // scale-up runs that must not pay a deliberately-uncapped oracle
    // query (q24 is the ground-truth pair generator; its fan-out is
    // quadratic per shared shingle BY DESIGN and stays out of any
    // above-sf0.1 bench)
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // fail fast on a misspelled skip name: silently ignoring it would run
    // the very query (e.g. the quadratic q24 generator) the skip list
    // exists to avoid
    val unknownSkips = skip -- SparkEntry.queries.keySet
    require(unknownSkips.isEmpty,
      s"SPARK_GRAFT_SKIP names not in the corpus: ${unknownSkips.toSeq.sorted.mkString(",")}")
    // SPARK_GRAFT_ONLY: comma-separated allow-list for ISOLATION runs —
    // timing one suspect query on a quiet host without the rest of the
    // corpus competing for cache/disk (the r11-verdict isolation ask).
    // Composes with SKIP (skip wins).
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknownOnly = only -- SparkEntry.queries.keySet
    require(unknownOnly.isEmpty,
      s"SPARK_GRAFT_ONLY names not in the corpus: ${unknownOnly.toSeq.sorted.mkString(",")}")
    // host-speed probe: the frozen 37-query r1 workload, one timed
    // pass, BEFORE the corpus passes (so it measures the host, not the
    // page cache the corpus warms). Respects SKIP, auto-applies the
    // recorded scale-up probe skips (see ScaleUpProbeSkips — q24/q25
    // stay out of sf ≥ 1 probes even when the caller forgot SKIP), but
    // ignores ONLY — an isolation artifact needs the host yardstick
    // most. SPARK_GRAFT_NO_PROBE=1 disables.
    val probeNames = HostProbeQueries
      .filter(SparkEntry.queries.contains)
      .filterNot((skip ++ probeSkipsFor(sfDir)).contains)
    val runProbe = !sys.env.get("SPARK_GRAFT_NO_PROBE").exists(_ == "1")
    var probeFailures = 0
    val hostProbeSec =
      if (!runProbe) -1.0
      else {
        val t0 = System.nanoTime()
        probeNames.foreach { n =>
          if (spark.sparkContext.isStopped) spark = newSession()
          try { SparkEntry.queries(n)(spark, sfDir).count(); () }
          catch { case _: Throwable => probeFailures += 1 }
        }
        (System.nanoTime() - t0) / 1e9
      }
    val failMsgs = scala.collection.mutable.LinkedHashMap[String, String]()
    def onePass(): Seq[(String, Double, Boolean)] = SparkEntry.queries.toSeq
      .filter(q => only.isEmpty || only.contains(q._1))
      .filterNot(q => skip.contains(q._1)).map {
      case (name, fn) =>
        // one query's fatal failure (e.g. an executor OOM at a scale-up
        // SF stopping the local SparkContext) must not poison the rest
        // of the pass: revive the session BEFORE the timer so the next
        // query measures its own cost, and only the culprit records an
        // error
        if (spark.sparkContext.isStopped) spark = newSession()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case e: Throwable =>
              if (!failMsgs.contains(name))
                failMsgs(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val pass1 = onePass()
    val pass2 = onePass()
    val loadEnd = loadavg()
    val best = pass1.zip(pass2).map { case ((n, a, okA), (_, b, okB)) =>
      val t =
        if (okA && okB) math.min(a, b)
        else if (okA) a
        else if (okB) b
        else math.min(a, b) // both failed: time-to-failure, flagged in errors
      n -> t
    }
    val errors = failMsgs.filter { case (n, _) =>
      !pass1.exists(p => p._1 == n && p._3) && !pass2.exists(p => p._1 == n && p._3)
    }
    // Millisecond precision keeps the whole line under the harness's
    // output-tail capture window (~4 KB): 80+ queries at full double
    // precision overflow it and the recorded artifact starts mid-line.
    // Locale.ROOT: a comma decimal separator would corrupt the JSON.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = best.map { case (k, v) => JsonUtil.quote(k) + ":" + r3(v) }
      .mkString("{", ",", "}")
    val errJson = errors
      .map { case (k, v) => JsonUtil.quote(k) + ":" + JsonUtil.quote(v) }
      .mkString("{", ",", "}")
    val total = best.map(_._2).sum
    val t1 = pass1.map(_._2).sum
    val t2 = pass2.map(_._2).sum
    // a skip-run's totals are not comparable to a full run's: record the
    // skip set so the artifact carries that evidence itself
    val skipJson = skip.toSeq.sorted.map(JsonUtil.quote).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_errors":${errors.size},"skipped":$skipJson,"pass1_total":${r3(t1)},"pass2_total":${r3(t2)},"host_probe_sec":${r3(hostProbeSec)},"host_probe_n":${probeNames.size},"host_probe_failures":$probeFailures,"loadavg_start":${JsonUtil.quote(loadStart)},"loadavg_end":${JsonUtil.quote(loadEnd)},"sf":"$sfDir"}"""
    println(line)
    // stdout tails get truncated by capture windows once the corpus is
    // large (r11's driver artifact kept only 69/117 per-query numbers):
    // also write the full line to a file so every recorded artifact is
    // machine-readable end to end. SPARK_GRAFT_BENCH_OUT overrides the
    // default ./bench_out.json.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full JSON written to $outPath")
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // FINAL line: a compact self-contained summary that is GUARANTEED
    // to fit the driver's artifact capture. The driver keeps only the
    // last ~2000 chars of output, which the full per-query map outgrew
    // at ~80 queries (BENCH_r13..r16 all recorded "parsed": null with
    // the big line chopped mid-map) — so the last thing printed is a
    // regexable `BENCH_JSON {...}` line under ~700 bytes carrying the
    // headline totals, error census, probe yardstick and a pointer to
    // the full per-query JSON written above.
    // the first few error NAMES ride the compact line (bounded size) so
    // a failing run's artifact can be triaged without the full JSON
    val errNames = errors.keys.take(3).toSeq.map(JsonUtil.quote).mkString("[", ",", "]")
    val compact =
      s"""BENCH_JSON {"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${best.size},"n_errors":${errors.size},"error_names":$errNames,"skipped_n":${skip.size},"pass1_total":${r3(t1)},"pass2_total":${r3(t2)},"host_probe_sec":${r3(hostProbeSec)},"host_probe_n":${probeNames.size},"host_probe_failures":$probeFailures,"loadavg_start":${JsonUtil.quote(loadStart)},"loadavg_end":${JsonUtil.quote(loadEnd)},"sf":${JsonUtil.quote(sfDir)},"queries_file":${JsonUtil.quote(outPath)}}"""
    println(compact)
    spark.stop()
  }
}
