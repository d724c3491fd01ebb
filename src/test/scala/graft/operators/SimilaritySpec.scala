package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("dot/cosine column math matches a driver-side computation") {
    val df = Seq((1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("id", "a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
    val cos = df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(cos - expected) < 1e-12)
  }

  test("brute-force top-k: scores descend, k rows, query excluded") {
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("ANN results are a subset of brute-force ranking with identical scores") {
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val (id, sim) = (r.getLong(0), r.getDouble(1))
      assert(brute.contains(id) && math.abs(brute(id) - sim) < 1e-9)
    }
  }

  test("blocked near-dup pairs: within-block only, ordered ids, threshold respected") {
    val pairs = Similarity.blockedNearDupPairs(emb, "vec_id", "embedding", "label", 0.3).collect()
    assert(pairs.nonEmpty)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { r =>
      val (a, b, cs) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b && labels(a) == labels(b) && cs >= 0.3)
    }
  }

  test("triangle-join decomposition: identical pairs for every subBlocks setting") {
    def run(s: Int) = Similarity
      .blockedNearDupPairs(emb, "vec_id", "embedding", "label", 0.3, subBlocks = s)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = run(1)
    assert(plain.nonEmpty)
    assert(run(3) == plain)
    assert(run(8) == plain)
  }

  test("LSH-blocked near-dup pairs: exact scores, no duplicate pairs, exact-dup recall") {
    // an identical copy of vector 0 lands in every one of vector 0's
    // buckets in every table — the pair MUST be recalled at cos_sim 1.0
    val clone = emb.where(col("vec_id") === 0L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = emb.select("vec_id", "embedding").union(clone)
    val got = Similarity.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size)
    assert(got.exists(p => p._1 == 0L && p._2 == 100000L && p._3 == 1.0))
    // every reported pair is within-threshold with the exact brute-force
    // cosine (LSH affects WHICH pairs are candidates, never their score)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      (0 until x.length).foreach { i =>
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    got.foreach { case (a, b, cs) =>
      assert(a < b && cs >= 0.9)
      assert(math.abs(cs - cos(vecs(a), vecs(b))) < 1e-6)
    }
  }

  test("deterministic hyperplanes are reproducible and table-distinct") {
    val p1 = Similarity.deterministicPlanes(4, 8)
    val p2 = Similarity.deterministicPlanes(4, 8)
    assert(p1.flatten == p2.flatten)
    assert(p1.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("IVF with a full probe equals brute force; assignment is total over non-degenerate vectors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.where(org.apache.spark.sql.functions.col("vec_id") < 16)
    // probing every centroid bucket must reduce to the exact scan
    val full = Similarity
      .ivfTopK(emb, "vec_id", "embedding", cents, "vec_id", "embedding", 0L, 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute)
    // every vector lands in exactly one bucket
    val n = emb.count()
    val asg = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "vec_id", "embedding")
    assert(asg.count() == n && asg.select("vec_id").distinct().count() == n)
    // a narrow probe returns at most k rows drawn from its own buckets
    val narrow = Similarity
      .ivfTopK(emb, "vec_id", "embedding", cents, "vec_id", "embedding", 0L, 10, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(narrow.size <= 10 && !narrow.contains(0L))
  }

  test("zero-norm vectors never top the ranking (NaN guard)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f), "a"),
      (1L, Array(0.9f, 0.1f), "a"),
      (2L, Array(0f, 0f), "a") // corrupt: zero norm -> NaN cosine
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 2).collect()
    assert(top.head.getLong(0) == 1L, "real neighbor must rank first")
    assert(!top.map(_.getLong(0)).contains(2L), "NaN row must be excluded")
  }

  test("semDedup: within-cluster near-dups drop the higher id; cross-cluster twins survive") {
    import spark.implicits._
    val cents = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Array(1f, 0.01f)),   // cluster 0, representative (min id)
      (11L, Array(0.99f, 0f)),   // cluster 0, cos(10,11) ≈ 0.99995 → dropped
      (12L, Array(0f, 1f)),      // cluster 1, representative
      (13L, Array(0.01f, 1f)),   // cluster 1, near-dup of 12 → dropped
      (14L, Array(0.7f, 0.7f))   // centroid tie → lowest id (0); far from 10/11 → kept
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .semDedup(vecs, "vec_id", "embedding", cents, "vec_id", "embedding", threshold = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out == Map(
      10L -> ((0L, true)),
      11L -> ((0L, false)),
      12L -> ((1L, true)),
      13L -> ((1L, false)),
      14L -> ((0L, true))))
  }

  test("semDedup survivors are pairwise below threshold inside every cluster") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.semDedup(
      emb, "vec_id", "embedding",
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 16),
      "vec_id", "embedding", threshold = 0.45)
    assert(out.count() == emb.count(), "one verdict per vector")
    val survivors = out.where(org.apache.spark.sql.functions.col("kept"))
      .join(emb, "vec_id")
      .select("vec_id", "embedding", "centroid_id")
    // re-running the pair search over survivors only must find nothing
    val residual = Similarity.blockedNearDupPairs(
      survivors, "vec_id", "embedding", "centroid_id", 0.45)
    assert(residual.isEmpty, "surviving set still contains a near-dup pair")
    assert(out.where(!org.apache.spark.sql.functions.col("kept")).count() > 0,
      "fixture corpus should exercise at least one drop")
  }

  test("native quantize matches the arithmetic contract, HALF_UP ties included") {
    val df = Seq(
      (1L, Array(0f, 1f, 2f)), // scale 2 at levels=2: x = 0, 0.5, 1 -> tie rounds UP
      (2L, Array(7f, 7f, 7f)), // constant -> all-0
      (3L, Array(-1f, 0f, 3f))
    ).toDF("id", "v")
    val got = df
      .select(col("id"), Similarity.quantizeCodes(col("v"), levels = 2).as("c"))
      .as[(Long, Array[Long])].collect().toMap
    assert(got(1L).toSeq == Seq(0L, 1L, 1L), "0.5 must round HALF_UP to 1")
    assert(got(2L).toSeq == Seq(0L, 0L, 0L))
    assert(got(3L).toSeq == Seq(0L, 0L, 1L)) // x = 0, 0.25, 1 at levels=2
    // on real data the native pass agrees with an explicit BigDecimal
    // HALF_UP replay of the Column formulation it replaced
    val real = emb.select(col("vec_id"), col("embedding"),
      Similarity.quantizeCodes(col("embedding")).as("c"))
      .as[(Long, Array[Float], Array[Long])].collect()
    real.take(50).foreach { case (id, v, c) =>
      val d = v.map(_.toDouble)
      val mn = d.min; val mx = d.max
      val expect =
        if (mx == mn) Array.fill(d.length)(0L)
        else d.map(x => java.math.BigDecimal
          .valueOf((x - mn) / ((mx - mn) / 255.0))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      assert(c.toSeq == expect.toSeq, s"quantize mismatch for vec $id")
    }
  }

  test("signed projection matches a driver-side replay and never shuffles") {
    val proj = Similarity.randomProjectSigned(emb, "vec_id", "embedding", 64, 16)
    // scan-side only: no Exchange anywhere in the physical plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    val signs = Similarity.md5Signs(64, 16)
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    val got = proj.as[(Long, Array[Long])].collect()
    assert(got.length == vecs.size)
    got.take(50).foreach { case (id, p) =>
      val v = vecs(id).map(_.toDouble)
      val mn = v.min; val mx = v.max
      val codes =
        if (mx == mn) Array.fill(v.length)(0L)
        else v.map(x => math.round((x - mn) / ((mx - mn) / 255.0)))
      val expect = Array.tabulate(16) { j =>
        (0 until 64).map(i => (2L * codes(i) - 255L) * signs(j * 64 + i)).sum
      }
      assert(p.toSeq == expect.toSeq, s"projection mismatch for vec $id")
    }
  }

  test("md5Signs is deterministic, ±1-valued, and roughly balanced") {
    val a = Similarity.md5Signs(64, 16)
    val b = Similarity.md5Signs(64, 16)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s == 1 || s == -1))
    val pos = a.count(_ == 1)
    // md5 parity over 1024 entries: a grossly unbalanced matrix would
    // mean the hash-derivation is broken, not bad luck
    assert(pos > 410 && pos < 614, s"$pos of ${a.length} positive")
  }

  test("projected cosine ranks approximate full-space ranks (JL sanity)") {
    val k = 20
    val full = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, k)
      .collect().map(_.getLong(0)).toSet
    val prj = Similarity.projectedCosineTopK(emb, "vec_id", "embedding", 0L, k, 64, 16)
      .collect()
    assert(prj.length == k)
    val sims = prj.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    // the fixture's embeddings are unstructured (pairwise cosines are
    // near-tied around 0.25-0.33), so exact rank preservation at 16 of
    // 64 dims is impossible for ANY projection; the meaningful check is
    // overlap well above the 20*20/500 ~ 0.8 chance level. Everything
    // here is md5/fixture-deterministic — the observed overlap is 5.
    val overlap = prj.map(_.getLong(0)).count(full.contains)
    assert(overlap >= 3, s"projected top-$k kept only $overlap of the true top-$k")
    // the real JL property — inner-product (cosine) VALUES preserved
    // within the 1/sqrt(outDim) noise floor: mean |proj_cos - true_cos|
    // over the top candidates stays well under the 0.25 estimator std
    val trueCos = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prjAll = Similarity
      .projectedCosineTopK(emb, "vec_id", "embedding", 0L, 499, 64, 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val errs = trueCos.keys.toSeq.flatMap(id => prjAll.get(id).map(p => math.abs(p - trueCos(id))))
    assert(errs.nonEmpty)
    val mae = errs.sum / errs.size
    assert(mae < 0.25, s"mean |proj_cos - true_cos| = $mae")
  }

  // --- product quantization ---

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def refL2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  /** Sequential replay of pqBuild: same seeds, tie-breaks, round-6 state. */
  private def refPqBuild(
      vecs: Map[Long, Seq[Double]], m: Int, k: Int, iters: Int
  ): Map[(Int, Long), Seq[Double]] = {
    val d = vecs.head._2.size / m
    val subs = for (((id, v), s) <- vecs.toSeq.flatMap(e => (0 until m).map((e, _))))
      yield (s, id, v.slice(s * d, s * d + d))
    var cents: Map[(Int, Long), Seq[Double]] =
      vecs.keys.toSeq.sorted.take(k).zipWithIndex.flatMap { case (id, i) =>
        (0 until m).map(s => (s, i.toLong) -> vecs(id).slice(s * d, s * d + d))
      }.toMap
    for (_ <- 1 to iters) {
      val asg = subs.map { case (s, id, sv) =>
        val cid = cents.collect { case ((cs, c), cv) if cs == s => (refL2sq(sv, cv), c) }
          .min._2
        (s, cid, sv)
      }
      cents = asg.groupBy(t => (t._1, t._2)).map { case (key, rows) =>
        val svs = rows.map(_._3)
        key -> (0 until d).map(p => round6(svs.map(_(p)).sum / svs.size))
      }
    }
    cents
  }

  test("pqBuild/pqCodes/pqAdcTopK: match the sequential replay") {
    val rnd = new scala.util.Random(21)
    // floats first: the engine casts FLOAT→DOUBLE, so the reference must
    // replay exactly the float-rounded values
    val fvecs: Map[Long, Seq[Float]] =
      (1L to 30L).map(id => id -> Seq.fill(8)(rnd.nextGaussian().toFloat)).toMap
    val vecs: Map[Long, Seq[Double]] = fvecs.map { case (id, v) => id -> v.map(_.toDouble) }
    val df = fvecs.toSeq
      .map { case (id, v) => (id, v.toArray) }
      .toDF("vec_id", "embedding")
    val (m, k, iters) = (2, 4, 2)
    val want = refPqBuild(vecs, m, k, iters)
    val cb = Similarity.pqBuild(df, "vec_id", "embedding", m, k, iters)
    val got = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(got.keySet == want.keySet)
    for (key <- want.keySet)
      assert(got(key).zip(want(key)).forall { case (a, b) => math.abs(a - b) < 1e-9 }, s"$key")
    // codes: the final assignment under the returned codebook
    val codes = Similarity.pqCodes(df, "vec_id", "embedding", cb, m)
    val gotCodes = codes.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val wantCodes = (for {
      (id, v) <- vecs.toSeq; s <- 0 until m
    } yield (id, s) -> want.collect {
      case ((cs, c), cv) if cs == s => (refL2sq(v.slice(s * 4, s * 4 + 4), cv), c)
    }.min._2).toMap
    assert(gotCodes == wantCodes)
    // ADC against query vec 1: fixed-order subspace sum, round 6
    val q = df.where($"vec_id" === 1L).select($"embedding")
    val topk = Similarity
      .pqAdcTopK(codes, "vec_id", cb, q, "embedding", m, topK = 10)
      .as[(Long, Double)].collect()
    val qv = vecs(1L)
    val wantAdc = vecs.keys.toSeq.map { id =>
      val adc = (0 until m)
        .map(s => refL2sq(qv.slice(s * 4, s * 4 + 4), want((s, wantCodes((id, s))))))
        .reduce(_ + _)
      (id, round6(adc))
    }.sortBy(t => (t._2, t._1)).take(10)
    assert(topk.toSeq == wantAdc)
  }

  test("pq: partition-order independent; contract guards") {
    val rnd = new scala.util.Random(5)
    val df = (1L to 40L).map(id => (id, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pqBuild(df, "vec_id", "embedding", 2, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val b = Similarity.pqBuild(df.repartition(13), "vec_id", "embedding", 2, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(a == b)
    intercept[IllegalArgumentException](
      Similarity.pqBuild(df, "vec_id", "embedding", m = 3, k = 4)) // 8 % 3 != 0
    intercept[IllegalArgumentException](
      Similarity.pqBuild(df, "vec_id", "embedding", m = 2, k = 1))
  }
}
