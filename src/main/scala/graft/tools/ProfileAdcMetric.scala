package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Similarity

/** A/B cost profile of [[Similarity.ivfPqTopK]]'s two ADC metrics on an
  * EXISTING index (pass the index path + a regenerated query corpus):
  * same queries, same knobs, per-metric wall time over nQ probes, plus
  * the executed plan of one probe per metric — for diagnosing where a
  * metric's probe cost diverges.
  *
  * Env: SPARK_GRAFT_ADC_INDEX (required), SPARK_GRAFT_ADC_M /
  * _NPROBE / _SHORTLIST (knobs, defaults 8/4/1953),
  * SPARK_GRAFT_RECALL_N, SPARK_GRAFT_RECALL_Q, SPARK_GRAFT_CPUS.
  */
object ProfileAdcMetric {
  def main(args: Array[String]): Unit = {
    val idx = sys.env("SPARK_GRAFT_ADC_INDEX")
    val n = sys.env.getOrElse("SPARK_GRAFT_RECALL_N", "500000").toLong
    val nQ = sys.env.getOrElse("SPARK_GRAFT_RECALL_Q", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session("profile-adc", s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // the clustered synth corpus — ProfileRecall's OWN generator, not a
    // copy (a drifted duplicate would silently profile a different
    // corpus than the recall artifacts this A/B is compared against)
    val emb = ProfileRecall.synth(spark, n, dim = 64, corpus = "clustered", centers = 200)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    def queryVec(q: Long) = emb.where(col("vec_id") === q).select("embedding")
    val shortlist = sys.env.getOrElse("SPARK_GRAFT_ADC_SHORTLIST", "1953").toInt
    val m = sys.env.getOrElse("SPARK_GRAFT_ADC_M", "8").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_ADC_NPROBE", "4").toInt
    for (metric <- Seq("l2", "dot", "l2", "dot")) {
      val t0 = System.nanoTime()
      var shortRows = 0L
      (0L until nQ.toLong).foreach { q =>
        shortRows += Similarity.ivfPqTopK(spark, idx, "vec_id", queryVec(q),
          m = m, topK = 10, nprobe = nprobe, shortlist = shortlist,
          rerank = emb, rerankVecCol = "embedding", excludeId = Some(q),
          metric = metric).count()
      }
      val sec = (System.nanoTime() - t0) / 1e9 / nQ
      println(f"METRIC $metric%-4s m=$m nprobe=$nprobe shortlist=$shortlist sec_per_query=$sec%.3f rows=$shortRows")
    }
    spark.stop()
  }
}
