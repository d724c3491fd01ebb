package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Similarity

/** Scale-grade [[Similarity.ivfPqTopKBatch]] — the amortization curve
  * the correctness gate (q174: 3 queries over a 16-vector index)
  * cannot show: sec/query vs batch size on the 500k clustered recall
  * corpus, ON and OFF the dt broadcast gate (`maxBroadcastDtRows`
  * forced to 0 exercises the shuffle-fallback dot-table join — the
  * 10⁹-vector path where nq·m·k outgrows a broadcast), plus the
  * single-query face as the unamortized baseline.
  *
  * The corpus/coarse-quantizer/index recipe is ProfileRecall's OWN
  * (same synth generator, same nlist-64 k-means on the hash-derived
  * 10% train split, same ivfPqBuild knobs), so rows printed here are
  * directly comparable to the recall artifacts.
  *
  * Env: SPARK_GRAFT_BATCH_N (corpus rows, default 500000),
  * SPARK_GRAFT_BATCH_SIZES (default "1,10,30,100,300"),
  * SPARK_GRAFT_BATCH_M / _K (PQ knobs, default 8/16),
  * SPARK_GRAFT_BATCH_NPROBE (default 4), SPARK_GRAFT_BATCH_SHORTLIST
  * (default 0 = the 0.25×-bucket sizing rule via ivfPqShortlistFor),
  * SPARK_GRAFT_BATCH_INDEX (reuse an existing index path; default
  * builds one under java.io.tmpdir), SPARK_GRAFT_BATCH_OUT (JSONL
  * sink for scripts/assemble_recall.py, default /tmp/batch_probe.jsonl),
  * SPARK_GRAFT_CPUS.
  *
  * Dev-only measurement main; not part of the shipped library surface.
  */
object ProfileBatchProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BATCH_N", "500000").toLong
    val sizes = sys.env.getOrElse("SPARK_GRAFT_BATCH_SIZES", "1,10,30,100,300")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val m = sys.env.getOrElse("SPARK_GRAFT_BATCH_M", "8").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_BATCH_K", "16").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_BATCH_NPROBE", "4").toInt
    val nlist = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BATCH_OUT", "/tmp/batch_probe.jsonl")
    val spark = Engine.session("profile-batch-probe", s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def emit(s: String): Unit = { println(s); lines += s }

    val emb = ProfileRecall.synth(spark, n, dim = 64, corpus = "clustered", centers = 200)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val idx = sys.env.get("SPARK_GRAFT_BATCH_INDEX") match {
      case Some(p) => p
      case None =>
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_batch_ivfpq_${n}_${m}_$k"
        if (!new java.io.File(s"$p/postings").exists()) {
          val train = emb.where(pmod(xxhash64(col("vec_id")), lit(10)) === 0)
          val km = Similarity.kmeansTrain(train, "vec_id", "embedding", k = nlist, maxIter = 5)
          val cents = km.centroids.persist(); cents.count()
          Similarity.ivfPqBuild(spark, emb, "vec_id", "embedding",
            cents, "centroid_id", "centroid", m = m, k = k,
            indexPath = p, files = 16, trainOn = Some(train))
        }
        p
    }
    val shortlist = sys.env.getOrElse("SPARK_GRAFT_BATCH_SHORTLIST", "0").toInt match {
      case 0 => Similarity.ivfPqShortlistFor(spark, idx, topK = 10, nprobe = nprobe)
      case s => s
    }

    // unamortized baseline: the single-query face, per-query driver loop
    val nBase = math.min(sizes.max, 10)
    locally {
      val t0 = System.nanoTime()
      var rows = 0L
      (0L until nBase.toLong).foreach { q =>
        rows += Similarity.ivfPqTopK(spark, idx, "vec_id",
          emb.where(col("vec_id") === q).select("embedding"),
          m = m, topK = 10, nprobe = nprobe, shortlist = shortlist,
          rerank = emb, rerankVecCol = "embedding", excludeId = Some(q)).count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      emit(f"""{"family":"ivfpq_single_loop","n":$n,"m":$m,"k":$k,"nprobe":$nprobe,"shortlist":$shortlist,"batch":$nBase,"sec":$sec%.3f,"sec_per_query":${sec / nBase}%.3f,"rows":$rows}""")
    }

    for (b <- sizes; bcast <- Seq(true, false)) {
      val queries = emb.where(col("vec_id") < b)
        .select(col("vec_id"), col("embedding"))
      val gate = if (bcast) 1L << 22 else 0L
      val t0 = System.nanoTime()
      val rows = Similarity.ivfPqTopKBatch(spark, idx, "vec_id",
        queries, "vec_id", "embedding", m = m, topK = 10, nprobe = nprobe,
        shortlist = shortlist, rerank = emb, rerankVecCol = "embedding",
        excludeSelf = true, maxBroadcastDtRows = gate).count()
      val sec = (System.nanoTime() - t0) / 1e9
      emit(f"""{"family":"ivfpq_batch","n":$n,"m":$m,"k":$k,"nprobe":$nprobe,"shortlist":$shortlist,"batch":$b,"dt_broadcast":$bcast,"sec":$sec%.3f,"sec_per_query":${sec / b}%.3f,"rows":$rows}""")
    }
    val w = new java.io.PrintWriter(outPath)
    try lines.foreach(w.println) finally w.close()
    System.err.println(s"[batch-probe] wrote $outPath (${lines.size} rows)")
    spark.stop()
  }
}
