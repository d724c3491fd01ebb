package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Similarity

/** Dev profiling harness for the PQ pipeline stages (the q150 shape:
  * m = 4, k = 8, two Lloyd rounds, top-20 ADC) — separates training,
  * coding and the ADC scan so the scale-step constant has an owner.
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session("profile-pq", s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"[prof] vectors=${emb.count()}")
    val cb = time("pqBuild (train, 2 rounds)") {
      val c = Similarity.pqBuild(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
      c.count(); c
    }
    val codes = time("pqCodes (assign)") {
      val c = Similarity.pqCodes(emb, "vec_id", "embedding", cb, m = 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"  code rows=${c.count()}")
      c
    }
    for (pass <- 1 to 2)
      time(s"pqAdcTopK (scan + top-20) pass$pass") {
        Similarity.pqAdcTopK(
          codes, "vec_id", cb,
          emb.where(col("vec_id") === 0L).select("embedding"), "embedding",
          m = 4, topK = 20).count()
      }
    spark.stop()
  }
}
