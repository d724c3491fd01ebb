package graft.sources

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.plans.{MetaStore, Runner}

/** Executed JDBC path (S1 read / K5 write, `utils.py:83-104` /
  * `utils.py:481-490`) against embedded Derby — the same code paths a SQL
  * Server deployment uses, minus the network: Spark's JDBC source with a
  * driver class, a dbtable, and the reference's derived-table pushdown
  * trick.
  */
class JdbcSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def ts(ms: Long) = new Timestamp(ms)

  test("K5: MetaStore.appendJdbc writes; S1: jdbcReader reads back") {
    val recs = Seq(
      Runner.JobRunRecord("nis_a", "", "SUCCESS", ts(1000), ts(2000), 1),
      Runner.JobRunRecord("nis_b", "", "FAILURE", ts(3000), ts(4000), 1)
    )
    MetaStore.appendJdbc(spark, recs, url, "META", Map("driver" -> driver))
    // append is append: a second write adds rows
    MetaStore.appendJdbc(
      spark, Seq(Runner.JobRunRecord("nis_c", "", "SUCCESS", ts(5000), ts(6000), 1)),
      url, "META", Map("driver" -> driver))

    val full = Lake.jdbcReader(spark, url, "META", "app", "app", driver).load()
    assert(full.count() == 3)
    assert(full.columns.contains("job_status"))
  }

  test("S1 at scale: partitioned JDBC read = N tasks, rows complete and disjoint") {
    import spark.implicits._
    val props = new java.util.Properties()
    props.setProperty("driver", driver)
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode("append").jdbc(url, "PART_T", props)

    val df = Lake
      .jdbcReader(spark, url, "PART_T", "app", "app", driver,
        partitioning = Some(Lake.JdbcPartitioning("id", 1, 101, 4)))
      .load()
    // the scan itself fans out into numPartitions range queries
    assert(df.rdd.getNumPartitions == 4)
    // complete AND disjoint: every id exactly once across the partitions
    assert(df.select("id").as[Long].collect().sorted.toSeq == (1L to 100L))

    // stale bounds skew balance but never drop rows (open-ended first/last
    // stride predicates)
    val narrow = Lake
      .jdbcReader(spark, url, "PART_T", "app", "app", driver,
        partitioning = Some(Lake.JdbcPartitioning("id", 40, 60, 3)))
      .load()
    assert(narrow.rdd.getNumPartitions == 3)
    assert(narrow.count() == 100)
  }

  test("S1: pushdown query executes source-side via the derived-table trick") {
    val pushed = Lake
      .jdbcReader(
        spark, url, "META", "app", "app", driver,
        // Spark's JDBC writer creates case-sensitive (quoted) identifiers
        // and maps StringType to Derby CLOB (not '='-comparable), so the
        // source-side query quotes and casts — the same dialect quirks a
        // real SQL Server pushdown query has to own
        pushdownQuery = Some(
          """SELECT "job_name", "job_status" FROM META
            |WHERE CAST("job_status" AS VARCHAR(32)) = 'SUCCESS'""".stripMargin))
      .load()
    assert(pushed.columns.toSeq.map(_.toLowerCase) == Seq("job_name", "job_status"))
    assert(pushed.collect().map(_.getString(0)).sorted.toSeq == Seq("nis_a", "nis_c"))
  }
}
