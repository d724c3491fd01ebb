package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextExpressions.{minhash_md5_signature, word_shingles}
import graft.operators.Dedup

/** Dev profiling harness for the md5 MinHash-LSH pipeline (q41). */
object ProfileMd5Minhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("profile-md5", s"local[32]", 32)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val fanned = docs.repartition(32)
    val base = fanned
      .select(col("doc_id"), word_shingles(col("text"), 3).as("shs"))
      .where(size(col("shs")) > 0)
      .cache()
    time("base (shingle arrays) materialize") { println(s"  rows=${base.count()}") }
    time("md5 signatures only (16 slots)") {
      println(s"  rows=${base.select(minhash_md5_signature(col("shs"), 16)).count()}")
    }
    time("full minhashLshPairsMd5") {
      println(s"  pairs=${Dedup.minhashLshPairsMd5(docs, "doc_id", "text", 3, 0.8).count()}")
    }
    time("full again (warm)") {
      println(s"  pairs=${Dedup.minhashLshPairsMd5(docs, "doc_id", "text", 3, 0.8).count()}")
    }
    spark.stop()
  }
}
