package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("byTokenBudget: bins are contiguous and start-offsets respect the budget") {
    val docs = (1 to 100).map(i => (i.toLong, (i % 7 + 1) * 10L)).toDF("id", "toks")
    // global window is explicit opt-in (shardCol = None): spec-only shape
    val out = Pack.byTokenBudget(docs, "id", "toks", budget = 100L, shardCol = None)
      .select("id", "toks", "bin").as[(Long, Long, Long)].collect().sortBy(_._1)
    // bin ids are non-decreasing in pack order and start at 0
    assert(out.head._3 == 0L)
    assert(out.sliding(2).forall { case Array(a, b) => b._3 >= a._3; case _ => true })
    // each doc's start offset lies inside its bin: cum_before / budget == bin
    var cum = 0L
    out.foreach { case (_, toks, bin) =>
      assert(cum / 100L == bin)
      cum += toks
    }
  }

  test("byTokenBudget with shard column packs per shard independently") {
    val docs = Seq((0L, "a", 90L), (1L, "a", 90L), (2L, "b", 90L), (3L, "b", 90L))
      .toDF("id", "shard", "toks")
    val out = Pack.byTokenBudget(docs, "id", "toks", 100L, shardCol = Some("shard"))
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // second doc of each shard starts at offset 90 → bin 0; without
    // sharding doc 2 would start at 180 → bin 1
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("sharded packing plan has a partitioned window — no single-partition exchange") {
    val docs = (1 to 100).map(i => (i.toLong, i % 4, 10L)).toDF("id", "shard", "toks")
    val sharded = Pack.byTokenBudget(docs, "id", "toks", 100L, shardCol = Some("shard"))
    val shardedPlan = sharded.queryExecution.executedPlan.toString
    assert(!shardedPlan.contains("SinglePartition"),
      s"sharded packing must not funnel all rows through one task:\n$shardedPlan")
    // the global opt-in IS the single-partition shape (that's why it's opt-in)
    val global = Pack.byTokenBudget(docs, "id", "toks", 100L, shardCol = None)
    assert(global.queryExecution.executedPlan.toString.contains("SinglePartition"))
  }

  test("hashSplit: deterministic partition of rows into train/val/test") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val once = docs.select(col("doc_id"), Pack.hashSplit(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    val again = docs.select(col("doc_id"), Pack.hashSplit(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(once == again)
    assert(once.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(once.size == docs.count())
    // buckets always land in [0, 100)
    val buckets = docs.select(Pack.hashBucket(col("text"))).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 100))
  }
}
