package graft.tools

import graft.Engine
import graft.operators.Graph

/** Dev profiling harness for the walk hash families: md5 (the
  * oracle-replayable default) vs xxhash64 (the production fast path) on
  * the co-purchase graph — the walk operator is hash-throughput-bound,
  * so the family swap is where its scale cost lives.
  */
object ProfileWalkHash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session("profile-walk", s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet")
    val edges = Graph.cooccurrenceEdges(li, "l_orderkey", "l_partkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prof] edges=${edges.count()}")
    for (fam <- Seq("md5", "xxhash64"); pass <- 1 to 2)
      time(s"randomWalks($fam) pass$pass") {
        Graph.randomWalks(edges, part, "p_partkey", walkLen = 4,
          salt = "wk", hashFamily = fam).count()
      }
    spark.stop()
  }
}
