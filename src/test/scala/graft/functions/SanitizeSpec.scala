package graft.functions

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SanitizeSpec extends AnyFunSuite with SparkSpec {

  test("strips exactly the reference's forbidden chars and spaces") {
    assert(Sanitize.cleanName(" Date - Date Format ") == "Date_-_Date_Format")
    assert(Sanitize.cleanName("a,b;c{d}e(f)g\nh\ti=j") == "abcdefghij")
    assert(Sanitize.cleanName("clean_name") == "clean_name")
  }

  test("idempotent on arbitrary names (property)") {
    val prop = Prop.forAll { (s: String) =>
      val once = Sanitize.cleanName(s)
      Sanitize.cleanName(once) == once && !once.exists(",;{}()\n\t=".contains(_))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("sanitizeColumns renames all dirty columns in one projection") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("col one", "b;ad")
    val out = Sanitize.sanitizeColumns(df)
    assert(out.columns.toSeq == Seq("col_one", "bad"))
    // clean frame returned as-is (no extra projection node)
    val clean = Seq((1, 2)).toDF("a", "b")
    assert(Sanitize.sanitizeColumns(clean) eq clean)
  }
}
