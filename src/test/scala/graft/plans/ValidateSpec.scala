package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ValidateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = Seq[(Long, java.lang.Long, String)](
    (1L, 10L, "ok"),
    (2L, -5L, "ok"),
    (3L, null, "ok"),
    (4L, 7L, "bad")
  ).toDF("id", "amount", "status")

  test("report: violation counts, first-violation pointer, NULL fails closed") {
    val rep = Validate
      .report(
        fixture,
        "id",
        Seq(
          "amount_positive" -> (col("amount") > 0),
          "status_ok" -> (col("status") === "ok"),
          "id_present" -> col("id").isNotNull))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)).map(_.toString)))).toMap
    // id=2 (negative) and id=3 (NULL comparison → violation, fail-closed)
    assert(rep("amount_positive") == ((2L, Some("2"))))
    assert(rep("status_ok") == ((1L, Some("4"))))
    assert(rep("id_present") == ((0L, None)))
  }

  test("report is ONE aggregation over one scan — no per-rule jobs") {
    val plan = Validate
      .report(fixture, "id", Seq("a" -> (col("amount") > 0), "b" -> (col("status") === "ok")))
      .queryExecution.executedPlan.toString
    // a single scan feeding a single aggregate: one leaf, no union
    assert(!plan.contains("Union"), plan)
    assert("LocalTableScan|Scan".r.findAllIn(plan).length <= 2, plan)
  }

  test("duplicate rule names and empty rule lists are rejected") {
    intercept[IllegalArgumentException] {
      Validate.report(fixture, "id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Validate.report(fixture, "id", Seq("r" -> lit(true), "r" -> lit(false)))
    }
  }

  test("enforce: passes a clean table, names every failed rule otherwise") {
    val clean = Validate.enforce(
      fixture.where(col("id") === 1L), "id", Seq("amount_positive" -> (col("amount") > 0)))
    assert(clean.length == 1 && clean.head.getLong(1) == 0L)
    val ex = intercept[IllegalStateException] {
      Validate.enforce(
        fixture,
        "id",
        Seq(
          "amount_positive" -> (col("amount") > 0),
          "status_ok" -> (col("status") === "ok")))
    }
    assert(ex.getMessage.contains("amount_positive") && ex.getMessage.contains("status_ok"))
    assert(ex.getMessage.contains("first=2"))
  }

  test("empty input reports 0 violations per rule and passes enforce") {
    // an empty load is a realistic pre-publish input: sum() over zero
    // rows is NULL, which must surface as 0, not NULL counts / an NPE
    val empty = fixture.where(lit(false))
    val rules = Seq(
      "amount_positive" -> (col("amount") > 0),
      "status_ok" -> (col("status") === "ok"))
    val rep = Validate.report(empty, "id", rules).collect()
    assert(rep.length == 2)
    rep.foreach { r =>
      assert(r.getLong(1) == 0L, s"rule ${r.getString(0)} reported ${r.get(1)}")
      assert(r.get(2) == null)
    }
    val gate = Validate.enforce(empty, "id", rules)
    assert(gate.length == 2 && gate.forall(_.getLong(1) == 0L))
  }
}
