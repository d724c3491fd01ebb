package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage: all pairs of name values within a Levenshtein
  * distance bound, found WITHOUT the quadratic all-pairs comparison.
  *
  * Candidate generation is the positional q-gram count filter (Gravano
  * et al., "Approximate String Joins in a Database (Almost) for Free",
  * VLDB 2001): strings within edit distance `k` share, as multisets, at
  * least `max(|a|,|b|) − q + 1 − k·q` q-grams, so an equi-join on grams
  * plus a shared-count threshold admits every true pair (the filter has
  * NO false negatives) while rejecting the bulk of the cross product.
  * Survivors are rescored with the exact `levenshtein` — threshold form,
  * so the DP aborts early once the bound is exceeded — and only the rescore
  * decides membership: the answer is exact, never approximate.
  *
  * Strings too short for the count filter to bite (the threshold is
  * non-positive when `|s| ≤ q·(k+1) − 1`) are handled by a separate
  * sound path: a short string can only be within distance `k` of strings
  * at most `k` longer, so shorts join the length-window block directly.
  * That block is broadcast — the ultra-short vocabulary (≤ 5 chars at
  * the defaults) is tiny in any real name domain, and the join side is
  * length-filtered before it ships.
  *
  * Scale shape: the gram join's fan-out per gram is its vocabulary
  * frequency — bounded for entity-name domains (catalogs, org names,
  * addresses), whose vocabulary is fixed while the corpus grows; the
  * operators here run on DISTINCT names, so the working set is
  * vocabulary-scale, not corpus-scale. For open-vocabulary corpora the
  * documented escalation is prefix filtering (join only each string's
  * `k·q + 1` globally-rarest grams — Bayardo et al., WWW 2007), which
  * this module deliberately does not apply by default because the count
  * filter's multiset math is exactly replayable by the SQL oracle.
  *
  * Reference scope: the migration suite normalizes and matches table /
  * column identifiers exactly (`utils.py` sanitize + recon); this module
  * is the §7 extension of that matching to NOISY identifiers — the
  * entity-resolution step a lake ingesting 100 TB of scraped records
  * needs before [[Dedup]]'s content-level machinery applies.
  */
object Linkage {

  /** Unordered pairs of DISTINCT `nameCol` values within Levenshtein
    * distance `[1, maxDist]`, as `(name_a, name_b, dist)` with
    * `name_a < name_b`. Identical values (distance 0) are exact-dup
    * territory ([[Dedup.exactDuplicates]]) and deliberately excluded.
    */
  def fuzzyNamePairs(
      df: DataFrame,
      nameCol: String,
      maxDist: Int,
      q: Int = 2
  ): DataFrame = {
    val names = distinctNames(df, nameCol)
    val cands = candidates(names, names, maxDist, q, selfPairs = true)
    rescore(cands, maxDist).where(col("dist") >= 1)
  }

  /** Two-table linkage: every (left value, right value) pair within
    * Levenshtein distance `[0, maxDist]` — distance 0 (exact matches)
    * included, because a link IS the point here. Operates on the
    * DISTINCT value vocabularies of both sides; join the result back on
    * the name columns to link rows.
    */
  def fuzzyJoin(
      left: DataFrame,
      leftCol: String,
      right: DataFrame,
      rightCol: String,
      maxDist: Int,
      q: Int = 2
  ): DataFrame = {
    val l = distinctNames(left, leftCol)
    val r = distinctNames(right, rightCol)
    rescore(candidates(l, r, maxDist, q, selfPairs = false), maxDist)
  }

  /** Distinct non-null values of `nameCol` as a one-column `name` frame.
    * Vocabulary-scale by construction — every downstream join touches
    * names, never rows.
    */
  private def distinctNames(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).cast("string").as("name"))
      .where(col("name").isNotNull)
      .distinct()

  /** Candidate `(name_a, name_b)` pairs admitting every true pair within
    * distance `maxDist`: the q-gram count filter for strings long enough
    * for it to bite, a broadcast length-window block for the rest. With
    * `selfPairs` the output is deduped to `name_a < name_b`; otherwise
    * sides are preserved (left = `name_a`).
    */
  private def candidates(
      namesA: DataFrame,
      namesB: DataFrame,
      maxDist: Int,
      q: Int,
      selfPairs: Boolean
  ): DataFrame = {
    require(maxDist >= 1, s"linkage: maxDist must be at least 1, got $maxDist")
    require(q >= 1, s"linkage: gram size q must be at least 1, got $q")
    // below this length the count-filter threshold max(|a|,|b|)−q+1−k·q
    // can be non-positive, so the filter admits nothing it should and
    // the string must take the direct length-window path
    val shortMax = q * (maxDist + 1) - 1

    def grams(names: DataFrame, side: String): DataFrame =
      names
        .where(length(col("name")) > shortMax)
        .select(col("name").as(s"name_$side"),
          explode(expr(
            s"transform(sequence(1, length(name) - $q + 1), i -> substring(name, i, $q))"))
            .as("_lk_g"))
        .groupBy(s"name_$side", "_lk_g")
        .agg(count(lit(1)).as(s"_lk_c$side"))

    val pairCond =
      if (selfPairs) col("name_a") < col("name_b") else lit(true)
    // multiset shared-gram count: Σ min(count_a, count_b) per gram —
    // the exact quantity the VLDB'01 bound is stated over
    val longPairs = grams(namesA, "a")
      .join(grams(namesB, "b"), Seq("_lk_g"))
      .where(pairCond)
      .groupBy("name_a", "name_b")
      .agg(sum(least(col("_lk_ca"), col("_lk_cb"))).as("_lk_shared"))
      .where(
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist &&
          col("_lk_shared") >=
          greatest(length(col("name_a")), length(col("name_b"))) - q + 1 - maxDist * q)
      .select("name_a", "name_b")

    // shorts pair with ANYTHING within the length window (±maxDist); the
    // short vocabulary is broadcast — bounded by |alphabet|^shortMax in
    // principle and tiny in practice
    def shortSide(shorts: DataFrame, others: DataFrame, flip: Boolean): DataFrame = {
      val s = shorts.where(length(col("name")) <= shortMax)
        .withColumnRenamed("name", "_lk_s")
      val o = others
        .where(length(col("name")) <= shortMax + maxDist)
        .withColumnRenamed("name", "_lk_o")
      val joined = o.join(
        broadcast(s),
        abs(length(col("_lk_s")) - length(col("_lk_o"))) <= maxDist &&
          col("_lk_s") =!= col("_lk_o"))
      val (a, b) = if (flip) ("_lk_o", "_lk_s") else ("_lk_s", "_lk_o")
      joined.select(col(a).as("name_a"), col(b).as("name_b"))
    }

    val shortPairs =
      if (selfPairs)
        // one short member suffices; canonicalize to name_a < name_b
        shortSide(namesA, namesB, flip = false)
          .select(
            least(col("name_a"), col("name_b")).as("name_a"),
            greatest(col("name_a"), col("name_b")).as("name_b"))
      else
        // a short on EITHER side must reach the other side's window
        shortSide(namesA, namesB, flip = false)
          .unionByName(shortSide(namesB, namesA, flip = true))

    longPairs.unionByName(shortPairs).distinct()
  }

  /** Exact rescore: `levenshtein` in threshold form (−1 once the DP
    * exceeds `maxDist`, so hopeless candidates abort early) — row-local
    * codegen, no shuffle. Keeps `dist ∈ [0, maxDist]`.
    */
  private def rescore(cands: DataFrame, maxDist: Int): DataFrame =
    cands
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .where(col("dist") >= 0)
}
