package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: dump formatted physical plans for corpus queries to stdout
  * (plan-review pass: broadcasts, pushdown, codegen spans).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty && !args(0).startsWith("q")) args(0) else "/root/testdata/sf0.01"
    val only = args.filter(_.startsWith("q")).toSet
    val spark = Engine.session("explain")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n========== $name ==========")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
