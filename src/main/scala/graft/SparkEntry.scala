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
    * the same parquet tables. Omitted only for q26 (xxhash64 SimHash —
    * groups are keyed by the raw signature value, which DuckDB cannot
    * reproduce) → driver records a rows-only check there, with the
    * md5-derived counterpart q42 fully oracled. q25's xxhash64 MinHash
    * IS fully oracled via its md5 twin's SQL: the exact rescore makes
    * the two value-equal on the test corpora (see PipelineQueries).
    * Every omission MUST carry an [[oracleNotes]] entry — Verify
    * enforces this, so an unoracled query cannot slip in silently.
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
    // q25 graduated to a full oracle: its exact-Jaccard rescore makes
    // the xxhash64 output provably equal to the md5 twin's absent a
    // banding miss, so q41's SQL oracles it too (PipelineQueries).
    // q26 cannot follow — a SimHash GROUP is keyed by the raw signature
    // value, so different hash functions genuinely group differently.
    "q26_dedup_simhash" ->
      ("no_oracle_by_design, PERMANENT (r11 decision): fingerprint bits use xxhash64, " +
        "which DuckDB lacks — and unlike q25, SimHash groups are keyed by the raw " +
        "signature value, so the md5-twin q42_dedup_simhash_md5 (fully oracled) is the " +
        "same operator under an oracle-replicable hash rather than a value-equal twin. " +
        "A q25-style transitive chain was TRIED in r11 and empirically fails: the two " +
        "families merge different near-dup sets (SimHash locality is hash-specific), " +
        "so no engine-independent oracle can exist. Machine-checkable gates: DedupSpec " +
        "'q26 closure' pins the family-independent invariants (exact-dup refinement, " +
        "keep_id/n_members structure) for BOTH signature families, and since r12 the " +
        "query output itself carries an invariant digest — exactdup_split_count, the " +
        "number of identical-token-set dup groups the signature grouping splits, 0 by " +
        "construction for any correct implementation — so the dumped parquet pins " +
        "structure even under the driver's rows-only check")
  )
}
