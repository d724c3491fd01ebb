package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("partitioned write enables partition pruning on read") {
    val dir = Files.createTempDirectory("part").toString + "/t"
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
    Scale.writePartitioned(df, dir, Seq("status"))
    val pruned = spark.read.parquet(dir).where(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan.take(500))
    assert(pruned.count() > 0)
    // only the status=F directory exists under the F partition path
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/status=F")))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables across JVMs but warehouse files
    // persist; clear stale locations so CREATE TABLE AS doesn't refuse
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    Scale.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "b_orders", "o_custkey", 4)
    Scale.writeBucketed(
      spark.read.parquet(s"$sf/customer.parquet").withColumn("o_custkey", col("c_custkey")),
      "b_customer", "o_custkey", 4)
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    assert(joined.count() == spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("salted join returns exactly the plain-join result") {
    val skewed = (1 to 500).map(i => (if (i % 5 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val dim = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val plain = skewed.join(dim, skewed("k") === dim("dk")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedEquiJoin(skewed, dim, "k", "dk").select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salt fans a pre-clustered hot key across multiple salts") {
    // one partition, every row the same key — a partition-id- or
    // key-derived salt would collapse to a single value here
    val hot = (1 to 1000).map(i => (42L, i)).toDF("k", "v").repartition(1)
    val nSalts = hot.withColumn("_salt", Scale.saltColumn(hot, 8))
      .select("_salt").distinct().count()
    assert(nSalts > 1, s"hot key mapped to $nSalts salt(s); skew not split")
    // deterministic: recomputation yields identical salts
    val s1 = hot.withColumn("_salt", Scale.saltColumn(hot, 8)).collect().map(_.getInt(2)).toSeq
    val s2 = hot.withColumn("_salt", Scale.saltColumn(hot, 8)).collect().map(_.getInt(2)).toSeq
    assert(s1 == s2)
  }

  test("salted join rejects right/full outer join types") {
    val a = Seq((1L, 1)).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      Scale.saltedEquiJoin(a, b, "k", "dk", joinType = "full_outer")
    }
    // left join keeps unmatched skewed rows exactly once
    val skewed = Seq((1L, 1), (9L, 2)).toDF("k", "v")
    val out = Scale.saltedEquiJoin(skewed, b, "k", "dk", joinType = "left")
    assert(out.count() == 2 && out.where(col("name").isNull).count() == 1)
  }

  test("skew-aware join salts a measured 30%-hot key and matches the plain join") {
    // 30% of rows share key 1; the rest spread over 700 keys
    val skewed = (1 to 1000)
      .map(i => (if (i <= 300) 1L else (i % 700).toLong + 2L, i))
      .toDF("k", "v")
    val dim = (1 to 800).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val aware = Scale.joinSkewAware(skewed, dim, "k", "dk", saltThreshold = 0.2)
    // the measured 0.3 share must engage the salted plan: the other side
    // is replicated via explode, which a plain equi-join never has
    assert(aware.queryExecution.executedPlan.toString.toLowerCase.contains("explode"),
      "30% hot key did not engage salting")
    val plain = skewed.join(dim, skewed("k") === dim("dk")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    assert(aware.select("k", "v", "name").collect().map(_.toSeq).toSet == plain)
  }

  test("skew-aware join rejects outer join types up front, not at threshold-crossing time") {
    val a = Seq((1L, 1)).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      Scale.joinSkewAware(a, b, "k", "dk", joinType = "full_outer")
    }
  }

  test("skew-aware inner join ignores NULL keys in the probe (they never match)") {
    // 30% NULL keys, otherwise uniform: an inner join drops the nulls
    // before the shuffle, so salting would pay replication for nothing
    val withNulls = (1 to 1000)
      .map(i => (if (i <= 300) None else Some((i % 500).toLong), i))
      .toDF("k", "v")
    val dim = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val aware = Scale.joinSkewAware(withNulls, dim, "k", "dk", saltThreshold = 0.2)
    assert(!aware.queryExecution.executedPlan.toString.toLowerCase.contains("explode"),
      "null keys engaged salting on an inner join")
    assert(aware.count() ==
      withNulls.join(dim, withNulls("k") === dim("dk")).count())
  }

  test("skew-aware join leaves a near-uniform key to the plain/AQE path") {
    val uniform = (1 to 1000).map(i => ((i % 500).toLong, i)).toDF("k", "v")
    val dim = (1 to 500).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val aware = Scale.joinSkewAware(uniform, dim, "k", "dk", saltThreshold = 0.2)
    assert(!aware.queryExecution.executedPlan.toString.toLowerCase.contains("explode"),
      "uniform keys must not pay the salt replication")
    assert(aware.count() == uniform.join(dim, uniform("k") === dim("dk")).count())
  }

  test("bloom prefilter: no false negatives, real volume reduction, exact after join") {
    val probe = (1L to 10000L).map(k => (k, s"p$k")).toDF("k", "v")
    val build = Seq(3L, 500L, 9999L).map(k => (k, "d")).toDF("bk", "d")

    val filtered = Scale.bloomPrefilter(probe, build, "k", "bk", expectedBuildKeys = 10L)
    val kept = filtered.select("k").as[Long].collect().toSet
    // NO false negatives: every genuinely matching key survives
    assert(Set(3L, 500L, 9999L).subsetOf(kept))
    // real reduction: false positives are rare at this fpp
    assert(kept.size < 200, s"expected a sliver, kept ${kept.size}")
    // the actual join on the filtered probe equals the join on the full probe
    val full = probe.join(build, probe("k") === build("bk")).select("k").as[Long].collect().toSet
    val viaFilter = filtered.join(build, filtered("k") === build("bk"))
      .select("k").as[Long].collect().toSet
    assert(viaFilter == full)

    // empty build side → empty probe (nothing can match)
    assert(Scale.bloomPrefilter(probe, build.where(lit(false)), "k", "bk").count() == 0)
    // mismatched key types would hash differently pre-coercion and drop
    // genuine matches — rejected loudly
    val intBuild = Seq((3, "d")).toDF("bk", "d")
    val typeErr = intercept[IllegalArgumentException] {
      Scale.bloomPrefilter(probe, intBuild, "k", "bk")
    }
    assert(typeErr.getMessage.contains("key types must match"))
    // over-sized filters would be silently clamped (and saturate) — rejected
    intercept[IllegalArgumentException] {
      Scale.bloomPrefilter(probe, build, "k", "bk", expectedBuildKeys = 100000000L)
    }
    // NULL probe keys are dropped like the equi-join would drop them
    val withNull = Seq((Some(3L), "a"), (None: Option[Long], "b")).toDF("k", "v")
    assert(Scale.bloomPrefilter(withNull, build, "k", "bk").count() == 1)
  }

  test("z-ordered write clusters BOTH dimensions; 1-D range-cluster only one") {
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")

    def perFileSpans(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("x"), col("y"))
        .groupBy("f")
        .agg(
          (max("x") - min("x")).as("sx"),
          (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

    val zdir = Files.createTempDirectory("zord").toString + "/t"
    Scale.writeZOrdered(df, zdir, "x", "y", partitions = 16)
    val zSpans = perFileSpans(zdir)
    // every file covers a small rectangle: both dimension spans bounded
    // well under the global span of 63 → min/max stats prune on EITHER col
    assert(zSpans.forall { case (sx, sy) => sx <= 31 && sy <= 31 },
      s"z-order must bound both dims per file, got $zSpans")

    val rdir = Files.createTempDirectory("zord1d").toString + "/t"
    Scale.writeRangeClustered(df, rdir, "x", partitions = 16)
    val rSpans = perFileSpans(rdir)
    // the 1-D cluster leaves the OTHER dimension unclustered (full span)
    assert(rSpans.forall { case (_, sy) => sy == 63 },
      s"1-D clustering should leave y at full span, got $rSpans")

    // out-of-range dimension values fail loudly instead of folding together
    val e = intercept[Exception] {
      Scale.writeZOrdered(
        Seq((-1L, 1L)).toDF("x", "y"),
        Files.createTempDirectory("zbad").toString + "/t", "x", "y", 1)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out of [0, 2^31) range")), e.toString)

    // the raw expression rejects non-BIGINT inputs at analysis time
    // (interpreted vs codegen would otherwise disagree on int children)
    val typeErr = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(graft.functions.ScaleExpressions.zorder2(col("a"), col("b")))
        .collect()
    }
    assert(messages(typeErr).exists(_.contains("zorder2 requires BIGINT")), typeErr.toString)
  }

  test("range-clustered write produces sorted, range-partitioned files") {
    val dir = Files.createTempDirectory("range").toString + "/t"
    Scale.writeRangeClustered(spark.read.parquet(s"$sf/orders.parquet"), dir, "o_orderkey", 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == spark.read.parquet(s"$sf/orders.parquet").count())
    // row-group pruning: a tight range predicate must not scan everything —
    // verified structurally: each output file covers a disjoint key range
    val perFile = back.select(input_file_name().as("f"), col("o_orderkey"))
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("globalDenseRank matches a global sort, ranks dense, no single-partition funnel") {
    val df = spark.range(10000).select((col("id") * 2654435761L % 100003L).as("k"))
    val ranked = Scale.globalDenseRank(df, Seq(col("k").asc), "rk", partitions = 7)
    val got = ranked.orderBy("rk").select("k").as[Long].collect().toSeq
    val want = df.select("k").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(ranked.select("rk").as[Long].collect().sorted.toSeq == (1L to 10000L))
    // zipWithIndex shape: positions come from one mapPartitions walk over
    // the checkpointed range partitions — no window operator at all (a
    // global row_number window would be the single-task funnel; a
    // pid-partitioned one would shuffle the corpus a second time), and no
    // exchange either (the one shuffle is paid inside the checkpoint)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan.take(1200))
    assert(!plan.contains("windowspecdefinition"), plan.take(1200))
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("trainingShuffle: deterministic, seed-sensitive, partition-invariant permutation") {
    val df = spark.range(5000).toDF("id")
    val a = Scale.trainingShuffle(df, Seq("id"), "s1", partitions = 7)
    // bijective: positions are exactly 1..n
    assert(a.select("train_pos").as[Long].collect().sorted.toSeq == (1L to 5000L))
    val byId = a.orderBy("id").select("train_pos").as[Long].collect().toSeq
    // re-running reproduces the identical permutation; so does a
    // DIFFERENT partition count (any range partitioning of the same
    // total order assigns the same global positions)
    assert(Scale.trainingShuffle(df, Seq("id"), "s1", partitions = 7)
      .orderBy("id").select("train_pos").as[Long].collect().toSeq == byId)
    assert(Scale.trainingShuffle(df, Seq("id"), "s1", partitions = 3)
      .orderBy("id").select("train_pos").as[Long].collect().toSeq == byId)
    // a different seed yields an unrelated permutation
    assert(Scale.trainingShuffle(df, Seq("id"), "s2", partitions = 7)
      .orderBy("id").select("train_pos").as[Long].collect().toSeq != byId)
    // positions realize exactly the md5(seed|id) sort order
    val wantOrder = df
      .withColumn("k", md5(concat_ws("|", lit("s1"), col("id"))))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val gotOrder = a.orderBy("train_pos").select("id").as[Long].collect().toSeq
    assert(gotOrder == wantOrder)
    // inherits globalDenseRank's no-funnel zipWithIndex shape: no
    // window operator anywhere in the plan
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition"), plan.take(1200))
  }

  test("k-way Morton interleave: bit layout + exact 2-dim equivalence") {
    import graft.functions.ScaleOps
    // dimension d's bit i lands at position i*k + d
    assert(ScaleOps.interleaveK(Array(1L, 0L, 0L), 20) == 1L)
    assert(ScaleOps.interleaveK(Array(0L, 1L, 0L), 20) == 2L)
    assert(ScaleOps.interleaveK(Array(0L, 0L, 1L), 20) == 4L)
    assert(ScaleOps.interleaveK(Array(2L, 0L, 0L), 20) == 8L)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong() & ((1L << 31) - 1)
      val b = rnd.nextLong() & ((1L << 31) - 1)
      assert(ScaleOps.interleaveK(Array(a, b), 31) == ScaleOps.interleaveBits(a, b))
    }
  }

  test("3-dim z-ordered write clusters EVERY dimension (span rectangles)") {
    val dir = Files.createTempDirectory("zn").toString + "/t"
    val n = 16
    val rows = (for { x <- 0 until n; y <- 0 until n; z <- 0 until n }
      yield (x.toLong, y.toLong, z.toLong)).toDF("x", "y", "z")
    Scale.writeZOrderedN(rows, dir, Seq("x", "y", "z"), partitions = 8)
    val spans = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(
        (max("x") - min("x")).as("sx"),
        (max("y") - min("y")).as("sy"),
        (max("z") - min("z")).as("sz"))
      .collect()
    assert(spans.length >= 4)
    // each file covers a small box in ALL THREE dims (global span is 15;
    // perfect octants would be ~8 — range-boundary sampling lets a file
    // straddle two octants, so assert clearly-below-global, not perfect)
    Seq("sx", "sy", "sz").foreach { c =>
      val vals = spans.map(_.getAs[Long](c).toDouble)
      val mean = vals.sum / vals.length
      assert(mean <= 12.5, s"$c mean file span $mean of 15 — not clustered")
    }
    // control: a 1-D range-cluster on x leaves y essentially unclustered
    val dir1 = Files.createTempDirectory("zn1").toString + "/t"
    Scale.writeRangeClustered(rows, dir1, "x", 8)
    val spans1 = spark.read.parquet(dir1)
      .withColumn("f", input_file_name())
      .groupBy("f").agg((max("y") - min("y")).as("sy"))
      .collect().map(_.getAs[Long]("sy").toDouble)
    assert(spans1.sum / spans1.length >= 14.0)
  }

  test("globalRunningSum matches the single-window answer, partition-invariantly") {
    val rows = (1 to 1000).map(i => (i.toLong, (i * 7 % 13).toLong)).toDF("id", "v")
    def run(partitions: Int): Seq[(Long, Long)] =
      Scale.globalRunningSum(rows, Seq(col("id").asc), col("v"), "cum", partitions)
        .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = run(7)
    // driver-side replay of sum() OVER (ORDER BY id)
    var acc = 0L
    val expect = (1 to 1000).map { i => acc += i * 7 % 13; (i.toLong, acc) }
    assert(got == expect)
    assert(run(3) == expect && run(32) == expect,
      "running totals must not depend on the partition count")
    // zipWithIndex shape: one mapPartitions accumulator walk, no window
    // operator, no exchange (the one shuffle is inside the checkpoint)
    val plan = Scale.globalRunningSum(rows, Seq(col("id").asc), col("v"), "cum")
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan.take(1200))
    assert(!plan.contains("windowspecdefinition"), plan.take(1200))
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("budgetSelect keeps exactly the prefix that fits the budget") {
    val rows = (1 to 100).map(i => (i.toLong, 10L)).toDF("id", "cost")
    val kept = graft.operators.Curation
      .budgetSelect(rows, Seq(col("id").asc), col("cost"), budget = 255L)
      .select("id").as[Long].collect().sorted.toSeq
    // inclusive running totals 10, 20, ... 250 fit 255; row 26 (260) not
    assert(kept == (1L to 25L).toSeq)
    val none = graft.operators.Curation
      .budgetSelect(rows, Seq(col("id").asc), col("cost"), budget = 9L)
    assert(none.count() == 0L, "a budget below the first row keeps nothing")
  }

  test("stratifiedSplit: exact per-stratum proportions, even for a hot stratum") {
    // one hot stratum (9000 rows) + two small ones (37, 3)
    val rows = ((0 until 9000).map(i => (i.toLong, "hot")) ++
      (9000 until 9037).map(i => (i.toLong, "small")) ++
      (9037 until 9040).map(i => (i.toLong, "tiny"))).toDF("id", "g")
    val out = Scale.stratifiedSplit(rows, "g", Seq("id"), "seedA", trainPermille = 800)
    val counts = out.groupBy("g", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (g, s, n) => (g, s) -> n }.toMap
    // floor(n * 800 / 1000), exactly
    assert(counts(("hot", "train")) == 7200L && counts(("hot", "val")) == 1800L)
    assert(counts(("small", "train")) == 29L && counts(("small", "val")) == 8L)
    assert(counts(("tiny", "train")) == 2L && counts(("tiny", "val")) == 1L)
  }

  test("stratifiedSplit: partition-invariant, seed-sensitive, never a stratum window") {
    val rows = (0 until 500).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    def assignment(partitions: Int, seed: String): Map[Long, String] =
      Scale.stratifiedSplit(rows, "g", Seq("id"), seed, 800, partitions = partitions)
        .select("id", "split").as[(Long, String)].collect().toMap
    val a = assignment(2, "seedA")
    assert(assignment(13, "seedA") == a, "split must not depend on partitioning")
    assert(assignment(2, "seedB") != a, "a different seed must reshuffle the split")
    // the plan must not contain a window partitioned by the stratum —
    // that shape funnels a hot stratum into one task (lineDedup lesson)
    val plan = Scale.stratifiedSplit(rows, "g", Seq("id"), "seedA", 800)
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Window.*partitionBy.*\\bg\\b.*"), plan.take(300))
    assert(!plan.contains("windowspecdefinition(g#"), plan.take(300))
  }

  test("kmvDistinct: below-k groups are exact, above-k groups estimate within KMV error") {
    val rows = ((0 until 10).map(i => (s"v$i", "small")) ++
      (0 until 2000).map(i => (s"x$i", "big")) ++
      // duplicates must not move either group (sketch sees distinct values)
      (0 until 10).map(i => (s"v$i", "small"))).toDF("v", "g")
    val got = Scale.kmvDistinct(rows, "g", col("v"), k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got("small") == ((10L, 10L)), "below k: exact count")
    val (nKept, est) = got("big")
    assert(nKept == 64L)
    // KMV relative stderr is 1/sqrt(k−2) ≈ 12.7% at k=64; 4σ bound
    assert(est > 1000 && est < 3000, s"estimate $est implausible for 2000 distinct")
  }

  test("kmvDistinct: partitioning-independent, duplicate-union-invariant, window-skew-free") {
    val rows = (0 until 500).map(i => (s"t$i", s"g${i % 3}")).toDF("v", "g")
    val kmv = Scale.kmvDistinct(rows, "g", col("v"), k = 16)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(Scale.kmvDistinct(rows.repartition(11), "g", col("v"), k = 16)
      .orderBy("g").collect().map(_.toSeq).toSeq == kmv)
    // the mergeability property that makes the sketch a sketch:
    // re-feeding the same values cannot change the k smallest hashes
    assert(Scale.kmvDistinct(rows.union(rows), "g", col("v"), k = 16)
      .orderBy("g").collect().map(_.toSeq).toSeq == kmv)
    // the k-smallest cut must be the bounded-buffer sketch AGGREGATE
    // (map-side partial_kmv_sketch before the exchange), not a distinct
    // + top-k over the full distinct-value set
    val plan = Scale.kmvDistinct(rows, "g", col("v"), k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"),
      s"expected a map-side partial sketch aggregate:\n${plan.take(400)}")
    assert(!plan.contains("Window"), s"sketch must not need a window:\n${plan.take(400)}")
    val e = intercept[IllegalArgumentException] {
      Scale.kmvDistinct(rows.withColumnRenamed("v", "kth_hash"), "g", col("kth_hash"), 16)
    }
    assert(e.getMessage.contains("reserved working column"), e.getMessage)
  }

  test("md5Prefix52 expression is value-identical to the oracle's SQL formulation") {
    import graft.functions.ScaleExpressions
    val strs: Seq[Option[String]] =
      (0 until 400).map(i => Some(s"doc $i " + ("xé中文 " * (i % 9)))) ++
        Seq(Some(""), Some(" "), Some("::"), Some("\n"), Some("0"), None)
    val df = strs.toDF("s")
    val cmp = df.select(
      ScaleExpressions.md5Prefix52($"s").as("fast"),
      expr("CAST(conv(substring(md5(s), 1, 13), 16, 10) AS BIGINT)").as("sql"))
    assert(cmp.where(
      ($"fast" =!= $"sql") || ($"fast".isNull =!= $"sql".isNull)).count() == 0)
    // non-string input is an analysis error, not a runtime surprise
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").select(ScaleExpressions.md5Prefix52($"v")).collect()
    }
  }

  test("kmvOverlap: identical, disjoint and overlapping pairs from sketches alone") {
    // a == b (identical content), c disjoint from both, d = half of a
    val va = (0 until 30).map(i => s"t$i")
    val rows = (va.map(v => (v, "a")) ++ va.map(v => (v, "b")) ++
      (0 until 30).map(i => (s"z$i", "c")) ++
      va.take(15).map(v => (v, "d"))).toDF("v", "g")
    val sk = Scale.kmvSketch(rows, Seq("g"), col("v"), k = 64)
    val got = Scale.kmvOverlap(sk, "g", "kmv_sketch", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // everything is below k = 64, so every number is EXACT
    assert(got(("a", "b")) == ((30L, 30L, 30L, 1000000L)))
    assert(got(("a", "c")) == ((0L, 60L, 0L, 0L)))
    assert(got(("a", "d")) == ((15L, 30L, 15L, 500000L)))
    assert(got(("b", "c"))._1 == 0L && got(("c", "d"))._1 == 0L)
    assert(got.size == 6) // 4 groups → 6 unordered pairs
  }

  test("kmvOverlap: above-k estimates within KMV error, sketch-only input") {
    val rows = ((0 until 2000).map(i => (s"s$i", "a")) ++
      (1000 until 3000).map(i => (s"s$i", "b"))).toDF("v", "g")
    val sk = Scale.kmvSketch(rows, Seq("g"), col("v"), k = 256)
    val r = Scale.kmvOverlap(sk, "g", "kmv_sketch", k = 256).collect().head
    val (union, inter, jacc) = (r.getLong(3), r.getLong(4), r.getLong(5))
    // truth: |A ∪ B| = 3000, |A ∩ B| = 1000, J = 1/3; stderr ~ 1/√254
    assert(union > 2400 && union < 3600, s"union_est $union implausible")
    assert(inter > 600 && inter < 1500, s"inter_est $inter implausible")
    assert(jacc > 230000 && jacc < 440000, s"jaccard_micro $jacc implausible")
    intercept[IllegalArgumentException](
      Scale.kmvOverlap(sk, "g", "kmv_sketch", k = 1))
  }

  test("topKPerGroup: equals row_number() <= k, window-free, map-side-capped") {
    val rows = (0 until 600)
      .map(i => (s"g${i % 5}", (i * 37 % 250).toLong, i.toLong))
      .toDF("g", "score", "id")
    val got = Scale.topKPerGroup(rows, "g", col("score"), col("id"), k = 7,
      ordName = "score", tagName = "id")
    val ref = rows
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("score").desc, col("id"))).cast("long"))
      .where(col("rank") <= 7)
      .select("g", "rank", "score", "id")
    assert(got.orderBy("g", "rank").collect().map(_.toSeq).toSeq ==
      ref.orderBy("g", "rank").collect().map(_.toSeq).toSeq)
    // partitioning-independent
    assert(Scale.topKPerGroup(rows.repartition(13), "g", col("score"), col("id"), 7,
        "score", "id").orderBy("g", "rank").collect().map(_.toSeq).toSeq ==
      got.orderBy("g", "rank").collect().map(_.toSeq).toSeq)
    // the plan must be the bounded aggregate, not a window sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"),
      s"expected a map-side partial topk aggregate:\n${plan.take(400)}")
    assert(!plan.contains("Window"), s"top-k must not need a window:\n${plan.take(400)}")
  }

  test("topKPerGroup: contract guards") {
    val rows = Seq(("a", 1L, 1L)).toDF("g", "score", "id")
    val clash = intercept[IllegalArgumentException] {
      Scale.topKPerGroup(rows, "g", col("score"), col("id"), 3,
        ordName = "g", tagName = "id")
    }
    assert(clash.getMessage.contains("distinct"), clash.getMessage)
    val reserved = intercept[IllegalArgumentException] {
      Scale.topKPerGroup(rows.withColumnRenamed("score", "_tk"), "g",
        col("_tk"), col("id"), 3)
    }
    assert(reserved.getMessage.contains("reserved working column"), reserved.getMessage)
    // non-integral ord/tag would cast to null and silently drop rows
    val frac = intercept[IllegalArgumentException] {
      Scale.topKPerGroup(rows, "g", col("score").cast("double"), col("id"), 3)
    }
    assert(frac.getMessage.contains("integral type"), frac.getMessage)
    val strTag = intercept[IllegalArgumentException] {
      Scale.topKPerGroup(rows, "g", col("score"), col("id").cast("string"), 3)
    }
    assert(strTag.getMessage.contains("integral type"), strTag.getMessage)
    assert(intercept[IllegalArgumentException] {
      Scale.topKPerGroup(rows, "g", col("score"), col("id"), 0)
    }.getMessage.contains("[1, 65536]"))
  }

  test("groupSample: k-per-group, reproducible, seed-sensitive, window-free") {
    val rows = (0 until 400).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")
    val a = Scale.groupSample(rows, "g", col("id"), k = 5, seed = "sA")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    // exactly k per group (every group has >= k rows), ids drawn from the group
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("g0" -> 5, "g1" -> 5, "g2" -> 5, "g3" -> 5))
    a.foreach { case (g, _, id) => assert(s"g${id % 4}" == g) }
    // rerun is identical; a different seed is a different permutation
    assert(Scale.groupSample(rows, "g", col("id"), 5, "sA")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq == a)
    assert(Scale.groupSample(rows, "g", col("id"), 5, "sB")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq != a)
    // below-k groups return the whole group
    val tiny = Seq(("g", 1L), ("g", 2L)).toDF("g", "id")
    assert(Scale.groupSample(tiny, "g", col("id"), 5, "sA").count() == 2)
    // same bounded-aggregate plan as topKPerGroup
    val plan = Scale.groupSample(rows, "g", col("id"), 5, "sA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs") && !plan.contains("Window"),
      plan.take(400))
  }

  test("weightedGroupSample: weight-biased, deterministic, zero-weight excluded") {
    // one heavy row (weight 100000) among 99 light rows (weight 1):
    // priority q = w/u with u uniform on (0,1] — the heavy row misses a
    // k=5 sample only if 5 light rows draw u below ~5e-5, so across 40
    // seeds it must essentially always be kept; exact misses are
    // deterministic per seed, so this is a fixed check, not a flake
    val rows = ((0 until 99).map(i => ("g", i.toLong, 1L)) :+ ("g", 999L, 100000L))
      .toDF("g", "id", "w")
    val kept = (0 until 40).count { s =>
      Scale.weightedGroupSample(rows, "g", col("id"), "w", k = 5, seed = s"seed$s")
        .collect().exists(_.getLong(3) == 999L)
    }
    assert(kept >= 38, s"heavy row kept in only $kept/40 samples")
    // deterministic rerun; zero/negative weights never sampled
    val zw = rows.withColumn("w", when(col("id") < 50, lit(0L)).otherwise(col("w")))
    val got = Scale.weightedGroupSample(zw, "g", col("id"), "w", 5, "sA")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(Scale.weightedGroupSample(zw, "g", col("id"), "w", 5, "sA")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq == got)
    got.foreach { case (_, id) => assert(id >= 50) }
    // bounded-aggregate plan; reserved-column guard
    val plan = Scale.weightedGroupSample(rows, "g", col("id"), "w", 5, "sA")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs") && !plan.contains("Window"),
      plan.take(400))
    assert(intercept[IllegalArgumentException] {
      Scale.weightedGroupSample(rows.withColumn("_h", lit(1)), "g", col("id"), "w", 5, "sA")
    }.getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException] {
      Scale.weightedGroupSample(rows, "g", col("id"), "nope", 5, "sA")
    }.getMessage.contains("not found"))
    // weights at or above 2^31 would overflow silently — must raise
    val big = Seq(("g", 1L, 3000000000L)).toDF("g", "id", "w")
    val e = intercept[Exception] {
      Scale.weightedGroupSample(big, "g", col("id"), "w", 1, "sA").collect()
    }
    assert(e.getMessage.contains("weight must be below 2^31"), e.getMessage)
  }

  test("kmvSketch + kmvMerge: sharded rollup equals the direct sketch exactly") {
    val rows = (0 until 800).map(i => (s"v${i % 331}", s"g${i % 3}", i % 7)).toDF("v", "g", "shard")
    val direct = Scale.kmvDistinct(rows, "g", col("v"), k = 16)
      .orderBy("g").collect().map(_.toSeq).toSeq
    // the union property: any global k-smallest hash is in its shard's
    // k smallest, so union + re-cut loses nothing — row-identical output
    val merged = Scale.kmvMerge(
      Scale.kmvSketch(rows, Seq("g", "shard"), col("v"), 16), "g", "kmv_sketch", 16)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(merged == direct)
    // a different sharding cannot change the answer either
    val reshard = Scale.kmvMerge(
      Scale.kmvSketch(rows.withColumn("shard", pmod(crc32(col("v")), lit(5))),
        Seq("g", "shard"), col("v"), 16), "g", "kmv_sketch", 16)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(reshard == direct)
    // the merge input is sketch rows, not the corpus; re-cut is the
    // same bounded aggregate
    val plan = Scale.kmvMerge(
      Scale.kmvSketch(rows, Seq("g", "shard"), col("v"), 16), "g", "kmv_sketch", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch") && !plan.contains("Window"), plan.take(400))
    assert(intercept[IllegalArgumentException] {
      Scale.kmvMerge(rows.withColumnRenamed("v", "kth_hash"), "g", "kmv_sketch", 16)
    }.getMessage.contains("reserved"))
  }

  test("freqItemsPerGroup: equals the exact GROUP BY top-k, bounded-map plan") {
    val rows = (0 until 900)
      .map(i => (s"g${i % 3}", s"t${i % (7 + i % 3)}"))
      .toDF("g", "item_s")
    val got = Scale.freqItemsPerGroup(rows, "g", col("item_s"), k = 4,
      capacity = 64, itemName = "term")
    val ref = rows.groupBy("g", "item_s").agg(count(lit(1)).as("cnt"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("cnt").desc, col("item_s"))).cast("long"))
      .where(col("rank") <= 4)
      .select(col("g"), col("rank"), col("item_s").as("term"), col("cnt"),
        lit(0L).as("err"))
    assert(got.orderBy("g", "rank").collect().map(_.toSeq).toSeq ==
      ref.orderBy("g", "rank").collect().map(_.toSeq).toSeq)
    // partitioning-independent in the exact regime
    assert(Scale.freqItemsPerGroup(rows.repartition(13), "g", col("item_s"), 4, 64,
        "term").orderBy("g", "rank").collect().map(_.toSeq).toSeq ==
      got.orderBy("g", "rank").collect().map(_.toSeq).toSeq)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("partial_freq_items"),
      s"expected a map-side partial sketch aggregate:\n${plan.take(400)}")
    assert(!plan.contains("Window"), plan.take(400))
    assert(intercept[IllegalArgumentException] {
      Scale.freqItemsPerGroup(rows, "g", col("item_s"), k = 10, capacity = 4)
    }.getMessage.contains("k <= capacity"))
  }

  test("countMin: exact at generous width, one-sided overestimate at narrow width") {
    val freq = Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "dd" -> 5L, "ee" -> 2L)
    val items = freq.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("i", "k")
    val probes = freq.keys.toSeq.toDF("k")
    // generous width: 5 keys into 2^20 buckets x 4 rows — collisions
    // are (md5-uniformly) absent, estimates are exact
    val wide = Scale.countMinBuild(items, col("k"), depth = 4, width = 1L << 20)
    val wideEst = Scale.countMinEstimate(probes, col("k"), wide, 4, 1L << 20)
      .as[(String, Long)].collect().toMap
    assert(wideEst == freq)
    // deliberately colliding width: never undercounts (the CM guarantee)
    val narrow = Scale.countMinBuild(items, col("k"), depth = 2, width = 3L)
    val narrowEst = Scale.countMinEstimate(probes, col("k"), narrow, 2, 3L)
      .as[(String, Long)].collect().toMap
    assert(freq.forall { case (k, n) => narrowEst(k) >= n },
      s"undercount: $narrowEst vs $freq")
    // total mass conservation per row: each row's cells sum to N
    val rowSums = narrow.groupBy("row_idx").agg(sum("cnt").as("s"))
      .select("s").as[Long].collect().toSeq
    assert(rowSums == Seq(18L, 18L))
  }

  test("countMin: merge of shard sketches equals the sketch of the concatenation") {
    val xs = (0 until 200).map(i => (i.toLong, s"k${i % 13}")).toDF("i", "k")
    val full = Scale.countMinBuild(xs, col("k"), depth = 3, width = 8L)
    val merged = Scale.countMinMerge(
      Scale.countMinBuild(xs.where(col("i") % 2 === 0), col("k"), 3, 8L),
      Scale.countMinBuild(xs.where(col("i") % 2 =!= 0), col("k"), 3, 8L))
    val f = full.as[(Int, Long, Long)].collect().toSet
    val m = merged.as[(Int, Long, Long)].collect().toSet
    assert(f == m)
    // a second merge keeps summing (associativity in use)
    val twice = Scale.countMinMerge(full, merged).as[(Int, Long, Long)].collect().toSet
    assert(twice == f.map { case (r, b, c) => (r, b, 2 * c) })
  }

  /** Sequential replay of the HLL recipe: same md5 split, same
    * bit-length rank, same scaled-integer estimator — the
    * [[GraphSpec]] reference-implementation discipline.
    */
  private def refHll(values: Seq[String], m: Int): (Long, Long, Long) = {
    val logM = Integer.numberOfTrailingZeros(m)
    val zeroRank = 53 - logM
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    values.foreach { s =>
      md.reset()
      val hex = md.digest(s"hll:$s".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(13)
      val h = java.lang.Long.parseLong(hex, 16)
      val (bucket, w) = (h % m, h / m)
      val rank = if (w == 0L) zeroRank else zeroRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(bucket) = math.max(regs.getOrElse(bucket, 0), rank)
    }
    val vZero = m - regs.size
    val sScaled = regs.values.map(r => 1L << (zeroRank - r)).sum + vZero.toLong * (1L << zeroRank)
    val raw = Scale.hllAlphaM2(m) * (1L << zeroRank) / sScaled
    val est =
      if (raw <= 5L * m / 2 && vZero > 0) math.round(m.toDouble * math.log(m.toDouble / vZero))
      else raw
    (vZero.toLong, sScaled, est)
  }

  test("hll: matches the sequential replay on both estimator branches; within error") {
    // small set → linear-counting branch; large set → raw harmonic branch
    for ((n, m) <- Seq((30, 64), (5000, 64), (700, 16))) {
      val vals = (0 until n).map(i => s"item$i")
      val df = vals.toDF("v")
      val got = Scale.hllEstimate(
        Scale.hllSketch(df.withColumn("g", lit("x")), Seq("g"), col("v"), m), Seq("g"), m)
        .select("v_zero", "s_scaled", "est_distinct")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq(refHll(vals, m)), s"n=$n m=$m")
      // the estimate is an estimate of n — sanity-bound it at 4 standard
      // errors (1.04/sqrt(m)); md5 is fixed so this never flakes
      val est = got.head._3.toDouble
      assert(math.abs(est - n) <= 4 * 1.04 / math.sqrt(m.toDouble) * n + 3,
        s"n=$n m=$m est=$est")
    }
  }

  test("hll: shard rollup equals the direct sketch; duplicate shards are no-ops; guards") {
    val xs = (0 until 400).map(i => ("g" + (i % 3), s"v${i % 97}")).toDF("g", "v")
    val full = Scale.hllSketch(xs, Seq("g"), col("v"), 64)
    val halves = Scale.hllSketch(xs.where($"v" < "v5"), Seq("g"), col("v"), 64)
      .unionByName(Scale.hllSketch(xs.where($"v" >= "v5"), Seq("g"), col("v"), 64))
    val rolled = Scale.hllRollup(halves, Seq("g"))
    val f = full.as[(String, Long, Long)].collect().toSet
    assert(rolled.as[(String, Long, Long)].collect().toSet == f)
    // max is idempotent: stacking a shard twice changes nothing
    assert(Scale.hllRollup(halves.unionByName(full), Seq("g"))
      .as[(String, Long, Long)].collect().toSet == f)
    intercept[IllegalArgumentException](Scale.hllSketch(xs, Seq("g"), col("v"), 63))
    intercept[IllegalArgumentException](Scale.hllSketch(xs, Seq("g"), col("v"), 8))
    intercept[IllegalArgumentException](Scale.hllEstimate(full, Seq("g"), 2048))
  }

  test("countMin: window rollup over day shards equals the sketch of exactly the window's rows") {
    val xs = (0 until 300).map(i => (s"d${i % 5}", s"k${i % 11}")).toDF("day", "k")
    val shards = Scale.countMinSharded(xs, col("day"), "day", col("k"), depth = 3, width = 16L)
    // shards carry the day key; each day's rows equal that day's direct build
    val d2 = shards.where(col("day") === "d2").select("row_idx", "bucket", "cnt")
    val d2direct = Scale.countMinBuild(xs.where(col("day") === "d2"), col("k"), 3, 16L)
    assert(d2.as[(Int, Long, Long)].collect().toSet ==
      d2direct.as[(Int, Long, Long)].collect().toSet)
    // the window rollup equals the sketch built over the window directly
    val win = Scale.countMinWindow(shards, col("day") >= "d3")
    val direct = Scale.countMinBuild(xs.where(col("day") >= "d3"), col("k"), 3, 16L)
    assert(win.as[(Int, Long, Long)].collect().toSet ==
      direct.as[(Int, Long, Long)].collect().toSet)
    // the all-days window equals the unsharded build (concat property)
    val all = Scale.countMinWindow(shards, lit(true))
    val full = Scale.countMinBuild(xs, col("k"), 3, 16L)
    assert(all.as[(Int, Long, Long)].collect().toSet ==
      full.as[(Int, Long, Long)].collect().toSet)
    // window estimates never undercount window counts (one-sided CM)
    val probes = (0 until 11).map(i => s"k$i").toDF("k")
    val est = Scale.countMinEstimate(probes, col("k"), win, 3, 16L)
      .as[(String, Long)].collect().toMap
    val tru = xs.where(col("day") >= "d3").groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(tru.forall { case (k, n) => est(k) >= n }, s"undercount: $est vs $tru")
  }

  test("countMin/hll: estimate catches build-knob drift; shuffle fallback matches broadcast") {
    val xs = (0 until 120).map(i => (i.toLong, s"k${i % 7}")).toDF("i", "k")
    val probes = (0 until 7).map(i => s"k$i").toDF("k")
    val sk = Scale.countMinBuild(xs, col("k"), depth = 4, width = 64L)
    val bc = Scale.countMinEstimate(probes, col("k"), sk, 4, 64L)
      .as[(String, Long)].collect().toMap
    // claiming a smaller depth/width than the build is caught by the
    // LAZY per-row guard at execution (fused into the probe join's own
    // pass — the one-sided direction the cells can witness); walk the
    // cause chain because the raise_error surfaces wrapped in the
    // job/broadcast failure
    def causeMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")).mkString("\n")
    assert(causeMsgs(intercept[Exception](
      Scale.countMinEstimate(probes, col("k"), sk, 2, 64L).collect()))
      .contains("row_idx"))
    assert(causeMsgs(intercept[Exception](
      Scale.countMinEstimate(probes, col("k"), sk, 4, 8L).collect()))
      .contains("bucket"))
    // a sketch past the broadcast gate estimates identically through
    // the shuffle-join fallback
    val sh = Scale.countMinEstimate(probes, col("k"), sk, 4, 64L, maxBroadcastCells = 0L)
      .as[(String, Long)].collect().toMap
    assert(sh == bc)
    // hll: estimating under a smaller m than the build is caught by the
    // bucket range (same lazy guard); register bound catches larger-m
    // builds
    val hsk = Scale.hllSketch(xs.withColumn("g", lit("x")), Seq("g"), col("k"), 64)
    assert(causeMsgs(intercept[Exception](
      Scale.hllEstimate(hsk, Seq("g"), 16).collect())).contains("bucket"))
  }

  test("countMin: sketch build is map-side partial-aggregated; guards") {
    val xs = (0 until 50).map(i => (i.toLong, s"k${i % 5}")).toDF("i", "k")
    val plan = Scale.countMinBuild(xs, col("k"), 4, 64L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"expected a partial aggregate before the shuffle:\n${plan.take(600)}")
    intercept[IllegalArgumentException](Scale.countMinBuild(xs, col("k"), 0, 64L))
    // sharded build: reserved working-column collisions are loud
    intercept[IllegalArgumentException](
      Scale.countMinSharded(xs, col("k"), "bucket", col("k"), 3, 16L))
    intercept[IllegalArgumentException](
      Scale.countMinSharded(xs.withColumnRenamed("i", "cnt"),
        col("k"), "day", col("k"), 3, 16L))
    intercept[IllegalArgumentException](Scale.countMinBuild(xs, col("k"), 4, 1L))
    intercept[IllegalArgumentException](Scale.countMinBuild(xs, col("k"), 4, 1L << 43))
    intercept[IllegalArgumentException](Scale.countMinEstimate(xs, col("k"), xs, 17, 64L))
  }
}
