package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Dev profiling harness for the MinHash-LSH pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("profile")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = time("shingleTable count") {
      val s = Dedup.shingleTable(docs, "doc_id", "text", 3).cache()
      println(s"  rows=${s.count()}")
      s
    }
    val sig = time("minhash signatures (32)") {
      val g = Dedup.minhashSignatures(sh, 32).cache()
      println(s"  rows=${g.count()}")
      g
    }
    time("full minhashLshPairs") {
      println(s"  pairs=${Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8).count()}")
    }
    time("full ngramJaccardPairs") {
      println(s"  pairs=${Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()}")
    }
    spark.stop()
  }
}
