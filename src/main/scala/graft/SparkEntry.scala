package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (E2, `table_jobs/nis_policies.py`) on sf=0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+§7 extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the two xxhash64-based
    * fast variants (q25 MinHash, q26 SimHash — DuckDB lacks xxhash64) →
    * driver records rows-only checks there; both have fully oracle-checked
    * md5-derived counterparts (q41, q42) plus exact-counterpart ScalaTests.
    * Every omission MUST carry an [[oracleNotes]] entry — Verify enforces
    * this, so an unoracled query cannot slip in silently.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ PipelineQueries.oracle

  /** Machine-readable contract for the queries deliberately absent from
    * [[oracleSql]]: why no SQL oracle can exist, and which fully-oracled
    * twin covers the semantics. Verify dumps this as `oracle_notes.json`
    * beside `oracle_sql.json`, so a `no_oracle` row in the CORRECTNESS
    * artifact is self-describing instead of indistinguishable from a
    * query someone simply forgot to oracle.
    */
  def oracleNotes: Map[String, String] = Map(
    "q25_dedup_minhash_lsh" ->
      ("no_oracle_by_design: banding hashes use xxhash64, which DuckDB lacks; " +
        "md5-twin:q41_dedup_minhash_md5 is fully oracled and DedupSpec proves " +
        "the candidate sets are identical after exact-Jaccard rescore"),
    "q26_dedup_simhash" ->
      ("no_oracle_by_design: fingerprint bits use xxhash64, which DuckDB lacks; " +
        "md5-twin:q42_dedup_simhash_md5 is fully oracled and DedupSpec proves " +
        "the candidate sets are identical after exact-Hamming rescore")
  )
}
