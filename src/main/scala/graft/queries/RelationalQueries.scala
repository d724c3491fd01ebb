package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Incremental

/** The relational operator corpus (SURVEY.md §2 + §7 step 7): each entry is
  * a Spark-first implementation paired with ANSI SQL the DuckDB oracle runs
  * over the same parquet tables.
  *
  * Determinism rules (the driver hash-compares values):
  *  - every query ends in a total ORDER BY (unique tie-break);
  *  - no raw TIMESTAMP columns in outputs (parquet ns vs µs differ between
  *    engines) — always date_trunc + format to string, or extract fields;
  *  - aggregated doubles are rounded; integer-ish computed columns are cast
  *    to BIGINT on both sides; raw column passthroughs stay untouched.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped with either TIMESTAMP(NANOS) or
    * TIMESTAMP(MICROS) physical precision depending on the generator run,
    * so the loader adapts to what the footer declares rather than assuming
    * one. Nanos are rejected by Spark's reader by default: read them as
    * long (legacy conf) and rebuild a microsecond timestamp — integer
    * `DIV`, not double division, since epoch-nanos exceed double's 2^53
    * integer range. Micros (and millis) read natively as timestamps and
    * pass through untouched, keeping one `ts` type downstream either way.
    */
  private[queries] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** The same events table as a STREAMING source (file-source replay of
    * the parquet), with the identical `ts` normalization — the physical
    * precision adaptation is schema-driven, so it applies to a
    * streaming DataFrame unchanged.
    */
  private[queries] def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    // the file-stream source requires a DIRECTORY; the testdata table is
    // a single parquet file, so expose it through a temp dir (symlink —
    // zero copy; fall back to a copy if the temp fs refuses links)
    val streamDir =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path))) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
        val link = d.resolve("events.parquet")
        try java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            java.nio.file.Files.copy(java.nio.file.Paths.get(path), link)
        }
        d.toString
      }
    normalizeEventTs(s.readStream.schema(s.read.parquet(path).schema).parquet(streamDir))
  }

  private def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // re-tag as session-tz timestamp: the session runs UTC (Verify/
        // Bench set it), so the wall-clock value is unchanged and the
        // column regains epoch arithmetic (NTZ refuses CAST AS BIGINT)
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  /** Flagship (E2, `table_jobs/nis_policies.py:21-32`): two-hop inner
    * equi-join + 60-ish-element IN-list + aliased star projection, executed
    * as SQL over temp views exactly like the reference's filtration stage.
    */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "customer").createOrReplaceTempView("v_customer")
    t(s, dir, "nation").createOrReplaceTempView("v_nation")
    val out = s.sql(
      """SELECT ord.*
        |FROM v_orders ord
        |JOIN v_customer c ON c.c_custkey = ord.o_custkey
        |JOIN v_nation n ON n.n_nationkey = c.c_nationkey
        |WHERE n.n_nationkey IN (0, 3, 5, 7, 11, 13, 17, 19, 23)
        |ORDER BY ord.o_orderkey""".stripMargin
    )
    Seq("v_orders", "v_customer", "v_nation").foreach(s.catalog.dropTempView(_))
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flagship" -> ((s, dir) => flagship(s, dir)),

    // A-series: aggregation (grouped + global, §2.5)
    "q02_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q03_global_agg" -> { (s, dir) =>
      t(s, dir, "orders").agg(
        max(col("o_orderkey")).as("max_key"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_cust")
      )
    },

    // P-series: predicates / incremental watermark (§2.3)
    "q04_watermark_filter" -> { (s, dir) =>
      val ev = events(s, dir)
      val mx = ev.agg(max(col("event_id"))).head().getLong(0)
      val hw = math.floor(mx * 0.8).toLong
      ev.where(col("event_id") > hw)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },
    "q05_inlist_filter" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_suppkey").isin(1, 2, 3, 5, 8, 13, 21, 34) && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice")
    },

    // J-series: join flavors (§2.4 + mandated outer/semi/anti)
    "q06_outer_join_agg" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(cust("c_custkey").as("c_custkey"))
        .agg(
          count(ord("o_orderkey")).as("n_orders"),
          round(sum(coalesce(ord("o_totalprice"), lit(0.0))), 2).as("total_spend")
        )
        .orderBy("c_custkey")
    },
    "q07_semi_join" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    "q08_anti_join" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders").where(col("o_orderstatus") === "P")
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // W-series: window functions (§2.6 extension)
    "q09_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_mktsegment"),
          col("c_custkey"),
          col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk")
        )
        .where(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    },
    "q10_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          round(
            sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2
          ).as("run_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price")
        )
        .orderBy("o_custkey", "o_orderkey")
    },

    // sort / limit / set ops / distinct (§2.6 extension)
    "q11_topk" -> { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },
    "q12_setops" -> { (s, dir) =>
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
      val both = cn.intersect(sn).withColumn("op", lit("both"))
      val custOnly = cn.except(sn).withColumn("op", lit("cust_only"))
      both.unionByName(custOnly).select("op", "k").orderBy("op", "k")
    },
    "q13_distinct" -> { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // F-series: scalar functions (§2.7 + extensions)
    "q14_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_type"), 1, 6).as("type_pre"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          translate(col("p_name"), "aeiou", "AEIOU").as("name_tr")
        )
        .orderBy("p_partkey")
    },
    "q15_date_funcs" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m")
        )
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("y", "m")
    },
    "q16_math_funcs" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(pow(col("l_discount") + 1, 2), 6).as("pow_disc"),
          floor(col("l_quantity")).cast("long").as("floor_qty"),
          ceil(col("l_quantity")).cast("long").as("ceil_qty"),
          round(abs(col("l_discount") - 0.05), 6).as("abs_disc"),
          (col("l_orderkey") % 7).cast("long").as("mod_key")
        )
        .orderBy("l_orderkey", "l_linenumber", "sqrt_price", "pow_disc", "floor_qty")
    },
    "q17_json_extract" -> { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
          count(lit(1)).as("n_events")
        )
        .orderBy("event_type")
    },

    // grouping sets (§2.5 extension)
    "q18_rollup" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      // grouping() distinguishes the subtotal rows from a genuine NULL
      // (or literal 'ALL') group value — coalesce alone would collide
      // them into identical ORDER BY keys with engine-dependent order
      cust
        .join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .join(reg, nat("n_regionkey") === reg("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("acctbal_sum"),
          grouping(col("r_name")).as("g_r"),
          grouping(col("n_name")).as("g_n"))
        .select(
          when(col("g_r") === 1, "ALL")
            .otherwise(coalesce(col("r_name"), lit("<null>"))).as("region_name"),
          when(col("g_n") === 1, "ALL")
            .otherwise(coalesce(col("n_name"), lit("<null>"))).as("nation_name"),
          col("n_cust"),
          col("acctbal_sum")
        )
        .orderBy("region_name", "nation_name")
    },
    "q19_cube" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          grouping(col("o_orderstatus")).as("g_s"),
          grouping(col("o_orderpriority")).as("g_p"))
        .select(
          when(col("g_s") === 1, "ALL")
            .otherwise(coalesce(col("o_orderstatus"), lit("<null>"))).as("status"),
          when(col("g_p") === 1, "ALL")
            .otherwise(coalesce(col("o_orderpriority"), lit("<null>"))).as("priority"),
          col("n"),
          col("total")
        )
        .orderBy("status", "priority")
    },

    // explicit GROUPING SETS (beyond rollup/cube)
    "q59_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("v_gs_orders")
      val out = s.sql(
        """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
          |            ELSE coalesce(o_orderstatus, '<null>') END AS status,
          |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
          |            ELSE coalesce(o_orderpriority, '<null>') END AS priority,
          |       count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM v_gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
      s.catalog.dropTempView("v_gs_orders")
      out
    },

    // NULL semantics: null-safe equality join (<=> / IS NOT DISTINCT
    // FROM) with a NULL join key group
    "q60_null_semantics" -> { (s, dir) =>
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").as("k"), expr("nullif(n_regionkey, 0)").as("r"))
      val a = n.as("a")
      val b = n.as("b")
      a.join(b, col("a.r") <=> col("b.r") && col("a.k") < col("b.k"))
        .groupBy(coalesce(col("a.r").cast("string"), lit("<null>")).as("region"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("region")
    },

    // K4 — PK-keyed upsert semantics through the merge fallback
    "q20_merge_upsert" -> { (s, dir) =>
      val ev = events(s, dir).select("event_id", "user_id", "event_type", "value")
      val mx = ev.agg(max(col("event_id"))).head().getLong(0)
      val hi = math.floor(mx * 0.8).toLong
      val lo = math.floor(mx * 0.6).toLong
      val target = ev.where(col("event_id") < hi)
      val source = ev.where(col("event_id") >= lo).withColumn("value", round(col("value") + 1, 2))
      Incremental.merge(target, source, "event_id").orderBy("event_id")
    },

    // time bucketing over the event stream table
    "q21_time_buckets" -> { (s, dir) =>
      events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_s"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy("hour_s")
    },

    // as-of (point-in-time) join: each event paired with its user's
    // latest prior order — union + windowed last, not a range join
    "q34_asof_join" -> { (s, dir) =>
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      val ord = t(s, dir, "orders")
      graft.operators.AsOf
        .joinBackward(
          ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          tieBreakCols = Seq("o_orderdate", "o_orderkey"),
          inner = true
        )
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id")
    },

    // forward as-of: each order paired with its customer's FIRST event
    // at/after the order date (orders predate the event stream, so the
    // forward direction is the populated one on this data)
    "q51_asof_forward" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      val ev = events(s, dir).select("event_id", "user_id", "ts", "value")
      graft.operators.AsOf
        .joinForward(
          ord, ev,
          leftKey = "o_custkey", rightKey = "user_id",
          leftTime = "o_orderdate", rightTime = "ts",
          payloadCols = Seq("event_id", "value"),
          tieBreakCols = Seq("event_id"),
          inner = true
        )
        .select(
          col("o_orderkey"), col("o_custkey"), col("event_id"),
          round(col("value"), 2).as("value"))
        .orderBy("o_orderkey")
    },

    // gap-based sessionization over the event stream (6 h gap)
    "q35_sessionize" -> { (s, dir) =>
      graft.operators.Sessions.byGap(events(s, dir), "user_id", "ts", "event_id", "value", 21600L)
    },

    // exact interpolated percentiles (same definition as quantile_cont)
    "q37_percentiles" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, array(0.25, 0.75))[1] - percentile(l_extendedprice, array(0.25, 0.75))[0]"), 4).as("iqr")
        )
        .orderBy("l_returnflag")
    },

    // column-level profiling: one aggregation over one scan for every
    // column's stats, stack-unpivoted to a row per column
    "q52_column_profile" -> { (s, dir) =>
      graft.plans.Profile.columnStats(
        t(s, dir, "lineitem"), Seq("l_quantity", "l_extendedprice", "l_discount"))
    },

    // pivot (explicit value list → deterministic columns)
    "q53_pivot" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    },

    // multiset set operations (INTERSECT ALL / EXCEPT ALL)
    "q54_setops_all" -> { (s, dir) =>
      val x = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val y = t(s, dir, "orders").where(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      x.exceptAll(y).withColumn("op", lit("except_all"))
        .unionByName(x.intersectAll(y).withColumn("op", lit("intersect_all")))
        .groupBy("op", "k")
        .agg(count(lit(1)).as("n"))
        .orderBy("op", "k")
    },

    // time-series resample + forward-fill: hourly grid per user over the
    // user's own span, gaps carried forward; values in integer cents so
    // the filled sum is exact on both engines
    "q55_resample_ffill" -> { (s, dir) =>
      val filled = graft.operators.TimeSeries.resampleForwardFill(
        events(s, dir), "user_id", "ts",
        round(sum(col("value")) * 100).cast("long"))
      filled
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_slots"),
          count(col("v")).as("n_observed"),
          sum("v_ff").as("ff_cents"))
        .orderBy("user_id")
    },

    // window-function completeness: ntile / percent_rank / cume_dist /
    // first_value / nth_value over one partition-ordered window
    "q56_window_rank_funcs" -> { (s, dir) =>
      val w = Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(
          col("c_mktsegment"),
          col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("c_custkey")).over(w).as("top_cust"),
          nth_value(col("c_custkey"), 2).over(w).as("second_cust")
        )
        .orderBy("c_mktsegment", "c_custkey")
    },

    // O7 — recon count parity as a query: one distributed union-aggregate
    // job, not N driver-side count() actions
    "q22_recon_counts" -> { (s, dir) =>
      Seq("customer", "lineitem", "nation", "orders", "region", "supplier")
        .map(n => t(s, dir, n).select(lit(n).as("table_name")))
        .reduce(_ unionByName _)
        .groupBy("table_name")
        .agg(count(lit(1)).as("row_cnt"))
        .orderBy("table_name")
    },
    // Bloom semi-join reduction exercised end-to-end: the lineitem probe
    // is pre-shrunk by a bloom of one nation's supplier keys BEFORE the
    // join shuffles. The post-join result is EXACT (false positives wash
    // out in the real join), so the probabilistic pre-filter still gets a
    // full hash-checked oracle.
    "q70_bloom_join" -> { (s, dir) =>
      val build = t(s, dir, "supplier").where(col("s_nationkey") === 3)
      val probe = graft.operators.Scale.bloomPrefilter(
        t(s, dir, "lineitem"), build, "l_suppkey", "s_suppkey", expectedBuildKeys = 1000L)
      probe
        .join(broadcast(build), probe("l_suppkey") === build("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("s_suppkey")
    },
    // Rule-based data-quality validation (pre-publish expectation gate):
    // every rule evaluated in ONE aggregation over one scan, fail-closed
    // on NULLs, stack-unpivoted to (rule, n_violations, first_violation)
    "q94_validate_rules" -> { (s, dir) =>
      graft.plans.Validate.report(
        t(s, dir, "orders"),
        "o_orderkey",
        Seq(
          "custkey_not_div7" -> (col("o_custkey") % 7 =!= 0),
          "date_modern" -> (year(col("o_orderdate")) >= 1993),
          "price_below_cap" -> (col("o_totalprice") < 300000.0),
          "price_positive" -> (col("o_totalprice") > 0.0),
          "priority_present" -> col("o_orderpriority").isNotNull))
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_flagship" ->
      """SELECT o.*
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE n.n_nationkey IN (0, 3, 5, 7, 11, 13, 17, 19, 23)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_global_agg" ->
      """SELECT max(o_orderkey) AS max_key, count(*) AS n_rows,
        |  count(DISTINCT o_custkey) AS n_cust FROM orders""".stripMargin,
    "q04_watermark_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_id > (SELECT CAST(FLOOR(max(event_id) * 0.8) AS BIGINT) FROM events)
        |ORDER BY event_id""".stripMargin,
    "q05_inlist_filter" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_suppkey IN (1, 2, 3, 5, 8, 13, 21, 34) AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_extendedprice""".stripMargin,
    "q06_outer_join_agg" ->
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
        |  round(sum(coalesce(o.o_totalprice, 0)), 2) AS total_spend
        |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q09_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn, rnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |    rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) x
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q11_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "q12_setops" ->
      """SELECT 'both' AS op, k FROM (
        |  SELECT DISTINCT c_nationkey AS k FROM customer
        |  INTERSECT SELECT DISTINCT s_nationkey AS k FROM supplier) x
        |UNION ALL
        |SELECT 'cust_only' AS op, k FROM (
        |  SELECT DISTINCT c_nationkey AS k FROM customer
        |  EXCEPT SELECT DISTINCT s_nationkey AS k FROM supplier) y
        |ORDER BY op, k""".stripMargin,
    "q13_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q14_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lc,
        |  upper(p_brand) AS brand_uc,
        |  substring(p_type, 1, 6) AS type_pre,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || ':' || p_type AS brand_type,
        |  replace(p_type, ' ', '_') AS type_us,
        |  translate(p_name, 'aeiou', 'AEIOU') AS name_tr
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q16_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(power(l_discount + 1, 2), 6) AS pow_disc,
        |  CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
        |  round(abs(l_discount - 0.05), 6) AS abs_disc,
        |  CAST(l_orderkey % 7 AS BIGINT) AS mod_key
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, sqrt_price, pow_disc, floor_qty""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_rollup" ->
      """SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL'
        |            ELSE coalesce(r_name, '<null>') END AS region_name,
        |  CASE WHEN GROUPING(n_name) = 1 THEN 'ALL'
        |       ELSE coalesce(n_name, '<null>') END AS nation_name,
        |  count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer c
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q19_cube" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |            ELSE coalesce(o_orderstatus, '<null>') END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE coalesce(o_orderpriority, '<null>') END AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q59_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |            ELSE coalesce(o_orderstatus, '<null>') END AS status,
        |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |            ELSE coalesce(o_orderpriority, '<null>') END AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q60_null_semantics" ->
      """WITH n AS (SELECT n_nationkey AS k, NULLIF(n_regionkey, 0) AS r FROM nation)
        |SELECT coalesce(CAST(a.r AS VARCHAR), '<null>') AS region, count(*) AS n_pairs
        |FROM n a JOIN n b ON a.r IS NOT DISTINCT FROM b.r AND a.k < b.k
        |GROUP BY 1 ORDER BY region""".stripMargin,
    "q20_merge_upsert" ->
      """WITH m AS (SELECT CAST(FLOOR(max(event_id) * 0.8) AS BIGINT) AS hi,
        |                  CAST(FLOOR(max(event_id) * 0.6) AS BIGINT) AS lo FROM events),
        |t AS (SELECT event_id, user_id, event_type, value FROM events, m WHERE event_id < m.hi),
        |s AS (SELECT event_id, user_id, event_type, round(value + 1, 2) AS value
        |      FROM events, m WHERE event_id >= m.lo)
        |SELECT coalesce(s.event_id, t.event_id) AS event_id,
        |       CASE WHEN s.event_id IS NOT NULL THEN s.user_id ELSE t.user_id END AS user_id,
        |       CASE WHEN s.event_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
        |       CASE WHEN s.event_id IS NOT NULL THEN s.value ELSE t.value END AS value
        |FROM t FULL OUTER JOIN s ON t.event_id = s.event_id
        |ORDER BY event_id""".stripMargin,
    "q21_time_buckets" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_s,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1 ORDER BY hour_s""".stripMargin,
    "q34_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey, o_totalprice FROM j
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q51_asof_forward" ->
      """WITH j AS (
        |  SELECT o.o_orderkey, o.o_custkey, e.event_id, e.value,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |                       ORDER BY e.ts ASC, e.event_id DESC) AS rn
        |  FROM orders o
        |  JOIN events e ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
        |SELECT o_orderkey, o_custkey, event_id, round(value, 2) AS value FROM j
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q35_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events),
        |f AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
        |                       OR sec - lag(sec) OVER w > 21600 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |      FROM f)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  max(sec) - min(sec) AS duration_sec, round(sum(value), 2) AS value_sum
        |FROM g GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q37_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25), 4) AS iqr
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q55_resample_ffill" ->
      """WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS slot,
        |                  CAST(round(sum(value) * 100) AS BIGINT) AS v
        |                FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(slot) AS s0, max(slot) AS s1 FROM hourly GROUP BY user_id),
        |slots AS (SELECT user_id, unnest(generate_series(s0, s1, INTERVAL 1 HOUR)) AS slot
        |          FROM spans),
        |j AS (SELECT s.user_id, s.slot, h.v FROM slots s
        |      LEFT JOIN hourly h ON h.user_id = s.user_id AND h.slot = s.slot),
        |f AS (SELECT user_id, v,
        |        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY slot
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        |      FROM j)
        |SELECT user_id, count(*) AS n_slots, count(v) AS n_observed,
        |  CAST(sum(v_ff) AS BIGINT) AS ff_cents
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q56_window_rank_funcs" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  first_value(c_custkey) OVER w AS top_cust,
        |  nth_value(c_custkey, 2) OVER w AS second_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q52_column_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count($c) AS n,
           |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
           |  round(CAST(min($c) AS DOUBLE), 6) AS vmin,
           |  round(CAST(max($c) AS DOUBLE), 6) AS vmax,
           |  round(sum(CAST($c AS DOUBLE)), 2) AS vsum
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q53_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q54_setops_all" ->
      """WITH x AS (SELECT o_custkey AS k FROM orders),
        |y AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |u AS (SELECT 'except_all' AS op, k FROM (SELECT k FROM x EXCEPT ALL SELECT k FROM y) a
        |      UNION ALL
        |      SELECT 'intersect_all' AS op, k
        |      FROM (SELECT k FROM x INTERSECT ALL SELECT k FROM y) b)
        |SELECT op, k, count(*) AS n FROM u GROUP BY op, k ORDER BY op, k""".stripMargin,
    "q22_recon_counts" ->
      """SELECT 'customer' AS table_name, count(*) AS row_cnt FROM customer
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'region', count(*) FROM region
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |ORDER BY table_name""".stripMargin,
    "q70_bloom_join" ->
      """SELECT s_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q94_validate_rules" -> {
      // one UNION ALL branch per rule, identical fail-closed NULL
      // handling to Validate.report (NOT coalesce(pred, FALSE))
      def one(name: String, pred: String) =
        s"""SELECT '$name' AS rule,
           |  CAST(sum(CASE WHEN NOT coalesce($pred, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           |  min(CASE WHEN NOT coalesce($pred, FALSE) THEN o_orderkey END) AS first_violation
           |FROM orders""".stripMargin
      Seq(
        "custkey_not_div7" -> "o_custkey % 7 <> 0",
        "date_modern" -> "year(o_orderdate) >= 1993",
        "price_below_cap" -> "o_totalprice < 300000.0",
        "price_positive" -> "o_totalprice > 0.0",
        "priority_present" -> "o_orderpriority IS NOT NULL"
      ).map { case (n, p) => one(n, p) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY rule")
    }
  )
}
