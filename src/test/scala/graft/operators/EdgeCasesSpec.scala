package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.Text

/** Degenerate-input behavior: every operator must return empty (or
  * identity) results on empty inputs, not throw — at 100 TB some
  * partition, shard, or day is always empty.
  */
class EdgeCasesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noVecs = Seq.empty[(Long, Array[Float], String)]
    .toDF("vec_id", "embedding", "label")

  test("dedup family on an empty corpus") {
    assert(Dedup.exactGroups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.minhashLshPairs(noDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.minhashLshPairsMd5(noDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.simhashMd5Groups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashNearDupPairs(noDocs, "doc_id", "text").count() == 0)
  }

  test("similarity and quantization on an empty embedding table") {
    assert(Similarity.cosineTopK(noVecs, "vec_id", "embedding", 0L, 5).count() == 0)
    assert(Similarity.blockedNearDupPairs(noVecs, "vec_id", "embedding", "label", 0.5).count() == 0)
    assert(noVecs.select(Similarity.quantizeCodes(col("embedding"))).count() == 0)
  }

  test("pack / sessions / time-series on empty inputs") {
    val noToks = Seq.empty[(Long, Long)].toDF("id", "toks")
    assert(Pack.byTokenBudget(noToks, "id", "toks", 100L, shardCol = None).count() == 0)
    val noEv = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(TimeSeries.resampleForwardFill(noEv, "user_id", "ts", sum("value").as("v")).count() == 0)
    assert(Sessions.byGap(
      noEv.withColumn("event_id", lit(0L)), "user_id", "ts", "event_id", "value", 60L).count() == 0)
  }

  test("degenerate text: empty strings and single tokens survive every Text function") {
    val weird = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b")).toDF("doc_id", "text")
    val out = weird.select(
      Text.tokenCount(col("text")),
      Text.qualityScore(col("text")),
      Text.bagFingerprint(col("text")),
      Text.chunks(col("text"), 4, 1),
      Text.filterReason(col("text")),
      Text.langIdHeuristic(col("text"))
    )
    assert(out.count() == 4) // no exceptions; values may be null/NaN-free per function contracts
    val mm = Multimodal.fromDocuments(spark, weird)
    assert(Multimodal.extractFeatures(mm).count() == 4)
    assert(Multimodal.resizePayload(mm, 8).collect().forall(_.payload.length == 8))
  }
}
