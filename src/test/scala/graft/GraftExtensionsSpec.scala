package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  vec_norm2(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n2,
        |  word_shingles('a b c d', 3) AS sh,
        |  size(minhash_signature(word_shingles('a b c d', 3), 16)) AS sig_len,
        |  simhash64(word_shingles('a b c', 1)) AS sh64,
        |  minhash_md5_signature(word_shingles('a b c d', 3), 4)[0] AS mh_md5,
        |  simhash_md5_60(word_shingles('a b c', 1)) AS sh_md5,
        |  word_shingles_all('a b a b', 2) AS sh_all,
        |  zorder2(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS z,
        |  zorder_n(CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT)) AS zn,
        |  char_pairs('abc') AS cp
        |""".stripMargin).head()
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("n2") == 25.0)
    assert(row.getSeq[String](2).toList == List("a b c", "b c d"))
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getAs[String]("mh_md5").length == 32)
    assert(row.getAs[Long]("sh_md5") >= 0L && row.getAs[Long]("sh_md5") < (1L << 60))
    // duplicates kept, in order (the distinct variant would return 2)
    assert(row.getSeq[String](row.fieldIndex("sh_all")).toList ==
      List("a b", "b a", "a b"))
    // 3 = 0b011, 5 = 0b101 → interleave(a=3→even, b=5→odd) = 0b100111 = 39
    assert(row.getAs[Long]("z") == 39L)
    // bit 0 of dims 0/1/2 land at positions 0/1/2 → 0b111 = 7
    assert(row.getAs[Long]("zn") == 7L)
    assert(row.getSeq[String](row.fieldIndex("cp")).toList == List("ab", "bc"))
  }

  test("delta reader falls back to parquet when no delta jar is present") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("delta").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    val back = graft.sources.Lake.readDeltaOrParquet(spark, dir)
    assert(back.exists(_.count() == 2))
    assert(graft.sources.Lake.readDeltaOrParquet(spark, "/nonexistent-xyz").isEmpty)
  }
}
