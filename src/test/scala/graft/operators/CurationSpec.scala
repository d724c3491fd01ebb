package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("decontamination: full overlap flags, disjoint text scores zero") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // identical → ratio 1.0
      (2L, "zeta eta theta iota kappa lambda"), // disjoint → 0.0
      (3L, "alpha beta gamma nu xi omicron") // shares 1 of 4 trigrams
    ).toDF("doc_id", "text")
    val out = Curation
      .decontaminationReport(train, bench, "doc_id", "text", 3, flagThreshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) == ((1.0, true)))
    assert(out(2L) == ((0.0, false)))
    assert(out(3L)._1 == 0.25 && !out(3L)._2)
  }

  test("capPerGroup keeps exactly k rows per group, preferring the rank order") {
    val df = (1 to 30).map(i => (i.toLong, s"g${i % 3}", i * 10L)).toDF("id", "g", "score")
    val out = Curation.capPerGroup(df, "g", Seq(col("score").desc, col("id")), 4)
    val byGroup = out.as[(Long, String, Long)].collect().groupBy(_._2)
    assert(byGroup.values.forall(_.length == 4))
    // keeps the TOP scores of each group
    assert(byGroup("g0").map(_._3).sorted.toSeq == Seq(240L, 270L, 300L).prepended(210L))
    // the two-phase (partition-local then candidate) cap is exact: the
    // result is invariant to how the input is partitioned, including
    // the one-hot-group case the naive window concentrates into 1 task
    val hot = (1 to 500).map(i => (i.toLong, "hot", (i * 37 % 101).toLong))
      .toDF("id", "g", "score")
    def capped(d: org.apache.spark.sql.DataFrame) =
      Curation.capPerGroup(d, "g", Seq(col("score").desc, col("id")), 7)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val want = capped(hot.coalesce(1))
    assert(capped(hot.repartition(13)) == want)
    assert(capped(hot.repartition(32)) == want)
    assert(want.length == 7)
  }

  test("buildVocab: dense ids in (count desc, token) order, minCount enforced") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d")
    ).toDF("doc_id", "text")
    val v = Curation.buildVocab(docs, "text", minCount = 2L)
      .as[(String, Long, Long)].collect().toSeq
    // a:4, b:3, c:2; d dropped (1 < 2)
    assert(v == Seq(("a", 4L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }

  test("bpeMergePairs counts adjacent character pairs and ranks them") {
    val docs = Seq((1L, "aba ab x"), (2L, "ba")).toDF("doc_id", "text")
    // "aba" → ab, ba; "ab" → ab; "ba" → ba; "x" → nothing ⇒ ab:2, ba:2
    val out = Curation
      .bpeMergePairs(docs, "text", minCount = 1L)
      .as[(String, Long, Long)]
      .collect()
      .toSeq
    assert(out == Seq(("ab", 2L, 1L), ("ba", 2L, 2L)))
    // single-character tokens contribute no pairs
    assert(
      Curation.bpeMergePairs(Seq((1L, "a b c")).toDF("doc_id", "text"), "text", 1L).count() == 0L)
  }

  test("vocab ranking never funnels the data through one ordered partition") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val plan = Curation.buildVocab(docs, "text", 1L).queryExecution.executedPlan.toString
    // ranks come from globalDenseRank's zipWithIndex walk over the
    // checkpointed range partitions — no window operator may appear
    // anywhere (a row_number window would be the single-task funnel;
    // a pid-partitioned one would be the deleted second shuffle)
    assert(plan.contains("MapPartitions"), plan.take(1200))
    assert(!plan.contains("windowspecdefinition"), plan.take(1200))
  }

  test("repetitionScore: repeated trigram dominates; short docs omitted") {
    val docs = Seq(
      (1L, "x y z x y z x y z"), // 7 trigrams, 'x y z' ×3 → 3/7
      (2L, "all distinct words here now"), // 3 trigrams, max 1 → 1/3
      (3L, "too short") // < 3 tokens: no row
    ).toDF("doc_id", "text")
    val out = Curation.repetitionScore(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 7L && out(1L)._2 == 3L)
    assert(math.abs(out(1L)._3 - 3.0 / 7.0) < 1e-5)
    assert(out(2L) == ((3L, 1L, 0.333333)))
    assert(!out.contains(3L))
  }

  test("lmBigramScore: exact scaled conditionals, sub-2-token docs omitted") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b", "b a", "a b"
      (2L, "a b c"), //   bigrams: "a b", "b c"
      (3L, "solo") //     1 token: no row
    ).toDF("doc_id", "text")
    // corpus model: c2("a b")=3, c2("b a")=1, c2("b c")=1; c1(a)=3, c1(b)=2
    // p_scaled: "a b" → 3e6 div 3 = 1000000; "b a"/"b c" → 1e6 div 2 = 500000
    val out = Curation.lmBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 2500000L, 500000L)))
    assert(out(2L) == ((2L, 1500000L, 500000L)))
    assert(!out.contains(3L))
  }

  test("lmBigramScore: every w1's conditional distribution sums to scale") {
    val docs = Seq((1L, "u v u w u v"), (2L, "v u w w u")).toDF("doc_id", "text")
    // for each first-word w1, summing p_scaled over its DISTINCT bigrams
    // (each counted once) must give ~scale (floor division loses < #w2
    // per group)
    val grams = docs.select(explode(
      graft.functions.TextExpressions.word_shingles_all(col("text"), 2)).as("bg"))
    val c2 = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val sums = c2
      .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
      .select(col("w1"), expr("(c2 * 1000000) DIV c1").as("p"))
      .groupBy("w1").agg(sum("p").as("s"), count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    sums.foreach { case (w1, s, k) =>
      assert(s <= 1000000L && s > 1000000L - k, s"w1=$w1 sum=$s k=$k")
    }
  }

  test("temperatureMixtureSqrt flattens toward small sources and hits the target") {
    // 900 big-source docs vs 100 small-source docs, distinct texts
    val docs = (0 until 1000)
      .map(i => (i.toLong, if (i < 900) "big" else "small", s"document text number $i"))
      .toDF("doc_id", "source", "text")
    val kept = Curation.temperatureMixtureSqrt(docs, "source", "text", 0.4)
    val bySource = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    val keptBig = bySource.getOrElse("big", 0L).toDouble / 900
    val keptSmall = bySource.getOrElse("small", 0L).toDouble / 100
    // alpha = 1/2: the small source's keep RATE must exceed the big
    // source's by ~sqrt(900/100) = 3 (hash noise aside)
    assert(keptSmall > 2 * keptBig, s"small $keptSmall vs big $keptBig")
    // overall target: 40% of 1000 docs, within hash-noise tolerance
    val total = bySource.values.sum
    assert(total > 300 && total < 500, s"kept $total of 1000 at tf=0.4")
    // deterministic: the same inputs keep the same ids
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Curation.temperatureMixtureSqrt(docs, "source", "text", 0.4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("temperatureMixtureSqrt: NULL-source docs form their own group and get a rate") {
    // NULL sources contribute to N and S in the counts aggregation, so
    // they must also be joined a rate — a plain equi-join would drop
    // them all while deflating every other source's realized keep rate
    val docs = ((0 until 600).map(i => (i.toLong, "big", s"document text number $i")) ++
      (600 until 1000).map(i => (i.toLong, null: String, s"unsourced text item $i")))
      .toDF("doc_id", "source", "text")
    val kept = Curation.temperatureMixtureSqrt(docs, "source", "text", 0.5)
    val bySource = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    val keptNull = bySource.getOrElse(null, 0L)
    assert(keptNull > 0L, "NULL-source group was silently dropped")
    // overall target still honored: 50% of 1000, hash-noise tolerance
    val total = bySource.values.sum
    assert(total > 400 && total < 600, s"kept $total of 1000 at tf=0.5")
  }

  test("temperatureMixtureSqrt clamps tiny-source rates at 1 (keeps every doc)") {
    val docs = ((0 until 995).map(i => (i.toLong, "big", s"filler text item $i")) ++
      (995 until 1000).map(i => (i.toLong, "tiny", s"rare text item $i")))
      .toDF("doc_id", "source", "text")
    // tf = 0.5: r_tiny = 0.5 * 1000 * 5^-0.5 / (sqrt(995)+sqrt(5)) ≈ 6.6 → 1
    val kept = Curation.temperatureMixtureSqrt(docs, "source", "text", 0.5)
      .where(col("source") === "tiny")
    assert(kept.count() == 5L, "a clamped rate must keep the whole tiny source")
  }

  test("pseudoLn tracks ln within 0.2% on [1/8, 8] and is monotone") {
    val xs = (1 to 200).map(i => math.exp(-math.log(8) + i * (2 * math.log(8) / 200)))
    val got = xs.toDF("x").select(Curation.pseudoLn(col("x")).as("p"))
      .as[Double].collect().toSeq
    xs.zip(got).foreach { case (x, p) =>
      val t = math.log(x)
      assert(math.abs(p - t) <= math.abs(t) * 0.002 + 1e-9, s"pseudoLn($x)=$p vs ln=$t")
    }
    assert(got == got.sorted, "pseudoLn must be monotone over an increasing grid")
  }

  test("importanceResample ranks target-vocabulary docs first, deterministically") {
    // two disjoint vocabularies; is-English plays the target role
    val tgt = (0 until 5).map(i =>
      (i.toLong, "en", s"math proof lemma theorem corollary axiom item$i"))
    val oth = (5 until 10).map(i =>
      (i.toLong, "de", s"kuchen strasse bahnhof blume fenster garten wort$i"))
    val docs = (tgt ++ oth).toDF("doc_id", "lang", "text")
    val out = Curation.importanceResample(
      docs, "doc_id", "text", col("lang") === "en", numBuckets = 64, keep = 5)
    assert(out.columns.toSeq == Seq("doc_id", "score", "n_grams"))
    val top = out.select("doc_id").as[Long].collect().toSeq
    assert(top.toSet == (0L until 5L).toSet,
      s"target-vocabulary docs must fill the top-k, got $top")
    // scores separate the two vocabularies with a positive/negative gap
    val all = Curation.importanceResample(
      docs, "doc_id", "text", col("lang") === "en", numBuckets = 64, keep = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert((0L until 5L).map(all).min > (5L until 10L).map(all).max)
    // bit-deterministic across runs
    val rerun = Curation.importanceResample(
      docs, "doc_id", "text", col("lang") === "en", numBuckets = 64, keep = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rerun == out.as[(Long, Long, Long)].collect().toSeq)
  }

  test("importanceResample: top-k is a TakeOrdered, empty docs are omitted") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "   "), // no tokens -> no evidence -> omitted
      (3L, "de", "delta epsilon zeta")
    ).toDF("doc_id", "lang", "text")
    val out = Curation.importanceResample(
      docs, "doc_id", "text", col("lang") === "en", numBuckets = 16, keep = 10)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // the final selection must be TakeOrdered(k), never a global sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("heavyHitters equals the exact full-vocabulary ranking") {
    // skewed synthetic corpus: token t<i> appears ~i times, spread
    // across many docs so no partition sees the whole distribution
    val docs = (1 to 40)
      .flatMap(i => Seq.fill(i)(s"t$i"))
      .grouped(7)
      .zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq
      .toDF("doc_id", "text")
      .repartition(8)
    val got = Curation
      .heavyHitters(docs, "text", k = 10, capacity = 64)
      .as[(String, Long, Long)]
      .collect()
      .toSeq
    val exact = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(10)
      .as[(String, Long)]
      .collect()
      .toSeq
      .zipWithIndex
      .map { case ((t, n), i) => (t, n, i + 1L) }
    assert(got == exact)
  }

  test("heavyHitters: Misra-Gries candidates cover every token above N/(cap+1)") {
    // capacity 4 on a 5-distinct-token stream forces evictions; the top
    // token (frequency way above N/5) must still surface with its EXACT
    // count — the recount pass repairs whatever the sketch undercounted
    val words = Seq.fill(60)("hot") ++ Seq("a", "b", "c", "d", "e").flatMap(Seq.fill(3)(_))
    val docs = new scala.util.Random(7).shuffle(words).grouped(5).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(4)
    val got = Curation.heavyHitters(docs, "text", k = 1, capacity = 4)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("hot", 60L, 1L)))
  }

  private def bucketFixture = {
    val r = new scala.util.Random(11)
    (0L until 40L).map { i =>
      val lang = if (i % 3 == 0) "aa" else "bb"
      // varied bigram structure: repeated pairs boost a doc's mean
      val words = Seq.fill(3 + r.nextInt(6))(s"w${r.nextInt(5)}")
      (i, lang, words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  test("lmPerplexityBuckets matches the declarative window labeling") {
    val out = Curation.lmPerplexityBuckets(bucketFixture, "doc_id", "text", "lang", nBuckets = 3)
    val w = org.apache.spark.sql.expressions.Window
    val ref = out
      .withColumn("rn", row_number().over(
        w.partitionBy("lang").orderBy(col("mean_p_scaled").desc, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w.partitionBy("lang")))
      .withColumn("expected", expr("((3 * (rn - 1)) DIV n) + 1").cast("int"))
    assert(ref.where(col("bucket") =!= col("expected")).isEmpty,
      "distributed rank labeling diverged from the window reference")
    // equal-frequency cut: within a language, bucket sizes differ by <= 1
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
    assert(sizes.where(col("spread") > 1).isEmpty)
  }

  test("lmPerplexityBuckets is invariant to input partitioning") {
    val a = Curation.lmPerplexityBuckets(bucketFixture, "doc_id", "text", "lang", 3)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.lmPerplexityBuckets(bucketFixture.repartition(13), "doc_id", "text", "lang", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("domainShift: outlier domains score high, mixture-like domains near zero") {
    // two sources that ARE the corpus mixture (identical distributions)
    // and one source of pure out-of-mixture boilerplate
    val mix = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, "a", mix), (2L, "a", mix), (3L, "a", mix),
      (4L, "b", mix), (5L, "b", mix), (6L, "b", mix),
      (7L, "spam", "click here click here click here buy now buy now")
    ).toDF("doc_id", "source", "text")
    val rows = Curation.domainShift(df, "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("a", "b", "spam"))
    val (nA, termsA, klA) = rows("a")
    assert(nA == 18L && termsA == 6L)
    assert(rows("a") == rows("b")) // identical sources score identically
    val (nSpam, _, klSpam) = rows("spam")
    // spam's tokens appear ONLY in spam: every term is over-represented
    // by the full corpus/spam ratio, so its PER-TOKEN divergence tops
    // the mixture sources by a wide margin (the mixture sources are
    // positive too — spam's presence shifts the corpus away from them,
    // a property of KL against the realized mixture, not a bug)
    assert(klSpam > 0 && klA > 0)
    assert(klSpam.toDouble / nSpam > 4.0 * (klA.toDouble / nA),
      s"spam=$klSpam/$nSpam a=$klA/$nA")
    // partition-count invariance: exact integer math end to end
    val rep = Curation.domainShift(df.repartition(7), "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep == rows)
  }

  test("tokenEntropy: zero for constant docs, ~ln(n) for all-distinct, deterministic") {
    val df = Seq(
      (1L, "spam spam spam spam"),            // one token type -> H = 0 exactly
      (2L, "a b c d e f g h"),                // 8 distinct -> H = ln(8)
      (3L, "x x y y"),                        // H = ln(2)
      (4L, "")                                // no tokens -> omitted
    ).toDF("doc_id", "text")
    val rows = Curation.tokenEntropy(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!rows.contains(4L))
    assert(rows(1L) == ((4L, 1L, 0L))) // pseudoLn(1) = 0 exactly
    // entropy in nats = num / (n * scale); pseudoLn is within 0.1% of
    // ln on (1/8, 1]
    val h2 = rows(2L)._3.toDouble / (8L * 1000000L)
    assert(math.abs(h2 - math.log(8.0)) < 0.01, s"h2=$h2")
    val h3 = rows(3L)._3.toDouble / (4L * 1000000L)
    assert(math.abs(h3 - math.log(2.0)) < 0.01, s"h3=$h3")
    // exact-integer determinism under repartitioning
    val rep = Curation.tokenEntropy(df.repartition(5), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep == rows)
  }

  test("negativeSamples: ring walk, positive exclusion, determinism") {
    val docs = (0L until 10L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val excl = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = Curation.negativeSamples(docs, "doc_id", k = 3, excl).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // every anchor appears; at most k slots each; negatives never the
    // anchor itself and never an excluded positive (either direction)
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == (0L until 10L).toSet)
    byAnchor.values.foreach { s =>
      assert(s.size <= 3)
      assert(s.map(_._3).distinct.size == s.size) // negatives distinct per anchor
    }
    got.foreach { case (a, _, n) =>
      assert(a != n)
      assert(!(Set((a, n), (n, a)).contains((1L, 2L))))
    }
    // with one excluded pair, exactly the slots that landed on the
    // positive disappear: total rows = 10*3 minus the excluded hits
    assert(got.size >= 28 && got.size <= 30)
    // deterministic under repartitioning (the rank is range-partitioned,
    // not partition-dependent)
    val rep = Curation.negativeSamples(docs.repartition(7), "doc_id", k = 3, excl).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rep.sorted == got.sorted)
    // a different salt redraws the permutation
    val other = Curation.negativeSamples(docs, "doc_id", k = 3, excl, salt = "neg2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(other.sorted != got.sorted)
  }

  test("negativeSamples: k >= n clamps to n-1 steps — no lapped duplicate negatives") {
    val docs = (0L until 4L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    // k = 9 over a 4-id ring: an unclamped walk would lap the ring twice
    // and emit each neg_id at three different slots per anchor
    val got = Curation.negativeSamples(docs, "doc_id", k = 9, none).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byAnchor = got.groupBy(_._1)
    assert(byAnchor.keySet == (0L until 4L).toSet)
    byAnchor.foreach { case (a, rows) =>
      assert(rows.size == 3, s"anchor $a: expected n-1 = 3 slots, got ${rows.size}")
      assert(rows.map(_._3).distinct.size == 3, s"anchor $a emitted a duplicate negative")
      assert(rows.map(_._3).toSet == (0L until 4L).toSet - a,
        s"anchor $a should see every other id exactly once")
    }
  }

  test("pmiCollocations: true-log accuracy, exact counts, collocation ranks first") {
    // "new york" always adjacent (8×); "of" and "the" frequent but never
    // adjacent to each other; filler tokens pad the distributions
    val docs = (
      (1 to 8).map(i => (i.toLong, "new york of kappa the lambda")) ++
        (9 to 12).map(i => (i.toLong, "of kappa the lambda mu nu"))
    ).toDF("doc_id", "text")
    val out = Curation.pmiCollocations(docs, "text", minCount = 4L, k = 50)
    assert(out.columns.toSeq ==
      Seq("tok_a", "tok_b", "c_ab", "c_a", "c_b", "pmi_scaled"))
    val rows = out.collect()
    // PMI prefers rarer perfectly-associated pairs: mu/nu (4 of 4
    // occurrences adjacent, rarest) over new/york (8 of 8) over
    // of/kappa (always adjacent but the most frequent tokens)
    val pos = rows.zipWithIndex.map { case (r, i) =>
      (r.getString(0), r.getString(1)) -> i
    }.toMap
    assert(pos(("mu", "nu")) < pos(("new", "york")))
    assert(pos(("new", "york")) < pos(("of", "kappa")))
    // every returned bigram respects minCount
    assert(rows.forall(_.getLong(2) >= 4L))
    // the quantized score IS floor(1e6 * true PMI) from the exact
    // counts: lnOfCount is a real log to ~1e-9, so re-deriving with
    // math.log lands within one quantum of every row
    val toks = docs.collect().flatMap(_.getString(1).split("\\s+")).toSeq
    val n = toks.size.toDouble
    val uni = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val bigrams = docs.collect().flatMap { r =>
      val w = r.getString(1).split("\\s+"); w.zip(w.tail)
    }.toSeq
    val b = bigrams.size.toDouble
    rows.foreach { r =>
      val (a2, b2) = (r.getString(0), r.getString(1))
      val cab = bigrams.count(p => p._1 == a2 && p._2 == b2).toDouble
      assert(r.getLong(2) == cab.toLong)
      assert(r.getLong(3) == uni(a2) && r.getLong(4) == uni(b2))
      val pmi = math.log(cab / b / ((uni(a2) / n) * (uni(b2) / n)))
      assert(math.abs(r.getLong(5) - math.floor(pmi * 1e6)) <= 1,
        s"($a2,$b2): got ${r.getLong(5)}, true ${math.floor(pmi * 1e6)}")
    }
    // scale shape: no window anywhere in the plan, top-k is TakeOrdered
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "pmiCollocations must stay window-free")
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k should be a TakeOrdered, not a full sort")
  }

  test("curationMix: gate precedence, fail-closed missing signals, shuffle fallback") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // 1 passes everything; 2 fails survivor AND quality (precedence →
    // duplicate); 3 low quality; 4 shallow core; 5 weak community;
    // 6 untrusted; 7 absent from EVERY signal table (fail-closed →
    // the first gate, duplicate)
    val surv = Seq(1L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val qual = Seq((1L, 0.9), (2L, 0.1), (3L, 0.2), (4L, 0.9), (5L, 0.9), (6L, 0.9))
      .toDF("doc_id", "quality")
    val cores = Seq((1L, 3L), (2L, 5L), (3L, 5L), (4L, 2L), (5L, 4L), (6L, 3L))
      .toDF("doc_id", "core")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 20L), (6L, 10L))
      .toDF("doc_id", "label")
    val mod = Seq((10L, 50L), (20L, -3L)).toDF("label", "q_num")
    val ppr = Seq((1L, 5000L), (2L, 5000L), (3L, 5000L), (4L, 5000L), (5L, 5000L), (6L, 10L))
      .toDF("doc_id", "rank_micro")
    def run(maxBc: Long) = Curation.curationMix(
      docs, "doc_id", surv, qual, cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L,
      maxBroadcastCommunities = maxBc)
      .as[(Long, Boolean, String)].collect().sortBy(_._1).toSeq
    val expected = Seq(
      (1L, true, "kept"), (2L, false, "duplicate"), (3L, false, "low_quality"),
      (4L, false, "shallow_core"), (5L, false, "weak_community"),
      (6L, false, "untrusted"), (7L, false, "duplicate"))
    assert(run(1000000L) == expected)
    // community join forced onto the shuffle path is value-identical
    assert(run(0L) == expected)
    // a surviving doc whose QUALITY row is missing fails closed at that gate
    val got2 = Curation.curationMix(
      docs.where(col("doc_id") === 1L), "doc_id", surv,
      qual.where(col("doc_id") =!= 1L), cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L)
      .as[(Long, Boolean, String)].collect().toSeq
    assert(got2 == Seq((1L, false, "low_quality")))
    // a mis-shaped signal frame fails loudly, not silently empty
    val err = intercept[IllegalArgumentException](Curation.curationMix(
      docs, "doc_id", surv, qual, cores, labels,
      Seq((1L, 1L)).toDF("labelx", "q_num"), ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L))
    assert(err.getMessage.contains("modularity"), err.getMessage)
  }

  test("curationMix: optional freshness gate — overexposed cap, fail-closed absent row, guards") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val all = Seq(1L, 2L, 3L).toDF("doc_id")
    val qual = Seq((1L, 0.9), (2L, 0.9), (3L, 0.9)).toDF("doc_id", "quality")
    val cores = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("doc_id", "core")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("doc_id", "label")
    val mod = Seq((10L, 50L)).toDF("label", "q_num")
    val ppr = Seq((1L, 5000L), (2L, 5000L), (3L, 5000L)).toDF("doc_id", "rank_micro")
    // 1 under the cap → kept; 2 at the cap → overexposed; 3 has NO
    // freshness row → fail-closed overexposed (no witness)
    val fresh = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "fresh_cnt")
    val got = Curation.curationMix(
      docs, "doc_id", all, qual, cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L,
      freshness = Some(fresh), maxFreshCount = 2L)
      .as[(Long, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, true, "kept"), (2L, false, "overexposed"), (3L, false, "overexposed")))
    // without the signal the gate does not exist: same inputs, all kept
    val base = Curation.curationMix(
      docs, "doc_id", all, qual, cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L)
      .as[(Long, Boolean, String)].collect().sortBy(_._1).toSeq
    assert(base.forall(_._2), base.toString)
    // guards: freshness without a cap, and a mis-shaped freshness frame
    assert(intercept[IllegalArgumentException](Curation.curationMix(
      docs, "doc_id", all, qual, cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L,
      freshness = Some(fresh))).getMessage.contains("maxFreshCount"))
    assert(intercept[IllegalArgumentException](Curation.curationMix(
      docs, "doc_id", all, qual, cores, labels, mod, ppr,
      minQuality = 0.5, minCore = 3L, minRankMicro = 1000L,
      freshness = Some(Seq((1L, 1L)).toDF("doc_id", "cnt")),
      maxFreshCount = 2L)).getMessage.contains("fresh_cnt"))
  }
}
