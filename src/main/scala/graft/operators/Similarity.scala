package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an `ARRAY<FLOAT>` embedding column.
  *
  * All math is `zip_with` + `aggregate` column expressions in double
  * precision — codegen'd, deterministic left-to-right summation (matches
  * the DuckDB oracle bit-for-bit), no UDF.
  *
  * Scale paths:
  *  - brute-force top-k: broadcast the query vector; one scan, one top-k.
  *  - LSH-bucketed (random-hyperplane sign bits): candidate generation is
  *    an equi-join on bucket id, so the all-pairs work is per-bucket only.
  */
object Similarity {

  /** Deterministic left-fold dot product of two (equal-length) float
    * arrays, accumulated in double. Backed by the custom codegen'd
    * Catalyst expression (graft.functions.DotProductExpr) — Spark's
    * `zip_with`+`aggregate` route evaluates interpreted lambdas per row,
    * too slow for the inner loop of a corpus-scale similarity scan.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def norm2(a: Column): Column = graft.functions.VectorFunctions.vec_norm2(a)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_cosine(a, b)

  /** Brute-force exact top-k cosine neighbors of the row with id
    * `queryId`. The 1-row query side is broadcast; the scan side never
    * shuffles — only the global top-k (a TakeOrdered, partial per
    * partition) moves data.
    */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val q = emb.where(col(idCol) === queryId).select(col(vecCol).as("q_vec"))
    emb
      .where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col(idCol),
        round(cosine(col(vecCol), col("q_vec")), 6).as("cos_sim")
      )
      // a zero-norm (corrupt/padded) vector yields NULL (see
      // vec_cosine) — it must not occupy a top-k slot
      .where(col("cos_sim").isNotNull)
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Per-vector scalar quantization to integer codes in [0, levels-1]
    * (int8-style at levels=256): `code = round((x - min) / scale)` with
    * `scale = (max - min) / (levels - 1)`. The classic memory-reduction
    * step before ANN — codes are 4× smaller than float32 and reconstruct
    * within scale/2 per dimension. Constant vectors map to code 0. Pure
    * double-precision column expressions, so the DuckDB oracle replicates
    * it bit-for-bit (a hot-path variant would be a custom Expression like
    * DotProductExpr).
    */
  def quantizeCodes(vec: Column, levels: Int = 256): Column = {
    val d = transform(vec, x => x.cast("double"))
    val mn = array_min(d)
    val mx = array_max(d)
    val scale = (mx - mn) / lit((levels - 1).toDouble)
    when(mx === mn, transform(d, _ => lit(0L)))
      .otherwise(transform(d, x => round((x - mn) / scale).cast("long")))
  }

  /** Random-hyperplane LSH bucket id: sign bits of the dot products with
    * `planes`. One custom expression carrying the plane matrix as a
    * codegen reference object — not a per-coefficient literal tree. With
    * b planes → 2^b buckets of cosine-similar vectors.
    */
  def hyperplaneBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.VectorFunctions.hyperplane_bucket(vec, planes)

  /** Deterministic pseudo-random unit-free hyperplanes (xorshift-ish LCG
    * seeded by plane+dim index) — reproducible across runs and engines
    * without RNG state.
    */
  def deterministicPlanes(numPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until numPlanes).map { p =>
      Array.tabulate(dim) { d =>
        val x = (p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
        (x.toDouble / 0xffffffffL.toDouble) * 2.0 - 1.0
      }
    }

  /** ANN top-k via hyperplane LSH: candidates share the query's bucket in
    * any of `tables` independent hashings; exact cosine re-rank on the
    * candidate set. Returns (id, cos_sim); approximate — may miss
    * neighbors whose buckets never collide.
    */
  def annTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int,
      numPlanes: Int = 8,
      tables: Int = 4,
      dim: Int = 64
  ): DataFrame = {
    val bucketCols = (0 until tables).map { t =>
      struct(lit(t).as("t"), hyperplaneBucket(col(vecCol), planesFor(t, numPlanes, dim)).as("bkt"))
    }
    val banded = emb
      .select(col(idCol), col(vecCol), explode(array(bucketCols: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.t").as("t"), col("tb.bkt").as("bkt"))

    val qb = banded.where(col(idCol) === queryId).select(
      col("t").as("qt"),
      col("bkt").as("qbkt"),
      col(vecCol).as("q_vec")
    )
    banded
      .join(broadcast(qb), col("t") === col("qt") && col("bkt") === col("qbkt"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("q_vec")), 6).as("cos_sim"))
      .where(col("cos_sim").isNotNull) // zero-norm vectors must not occupy slots
      .distinct()
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  private def planesFor(table: Int, numPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until numPlanes).map { p =>
      Array.tabulate(dim) { d =>
        val x = (table * 2246822519L + p * 1315423911L + d * 2654435761L + 97531L) & 0xffffffffL
        (x.toDouble / 0xffffffffL.toDouble) * 2.0 - 1.0
      }
    }

  /** IVF (inverted-file) INDEX BUILD: every vector is assigned to its
    * nearest centroid by cosine (ties to the lowest centroid id) — the
    * coarse-quantization step of IVF ANN. The centroid set is broadcast
    * (coarse quantizers are tiny by construction), so assignment is one
    * scan plus a grouped argmax with map-side partial aggregation; the
    * shuffle carries (id, similarity, centroid) triples, never vectors.
    * Zero-norm vectors (NULL cosine) get no assignment and are therefore
    * unreachable by probes — the same exclusion every other similarity
    * path applies. Returns (idCol, centroid_id).
    */
  def ivfAssign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centIdCol: String,
      centVecCol: String
  ): DataFrame = {
    // the argmax tie-break negates the centroid id; a non-numeric id
    // would throw under ANSI (or silently invert the documented
    // lowest-id tie-break with ANSI off) — fail fast instead
    require(
      centroids.schema(centIdCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"ivfAssign: centroid id '$centIdCol' must be numeric, got " +
        centroids.schema(centIdCol).dataType.sql)
    val c = broadcast(centroids.select(col(centIdCol).as("_cid"), col(centVecCol).as("_cvec")))
    emb
      .select(col(idCol), col(vecCol))
      .crossJoin(c)
      .select(col(idCol), col("_cid"), cosine(col(vecCol), col("_cvec")).as("_cs"))
      .where(col("_cs").isNotNull)
      .groupBy(col(idCol))
      // argmax by (similarity desc, centroid id asc): the negated id in
      // the struct makes the lexicographic max break ties to the LOWEST id
      .agg(max(struct(col("_cs"), (-col("_cid")).as("_ncid"), col("_cid"))).as("_b"))
      .select(col(idCol), col("_b._cid").as("centroid_id"))
  }

  /** IVF ANN top-k: rank the centroids against the query, probe only the
    * `nprobe` nearest buckets, exact-cosine re-rank inside them. The
    * probed list is centroid-count-sized and broadcast; candidates come
    * from one join on the assignment table ([[ivfAssign]] — in a real
    * deployment that index is built once and reused across queries).
    * Recall is tunable: nprobe = centroid count makes it exact.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      centIdCol: String,
      centVecCol: String,
      queryId: Long,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    require(k > 0 && nprobe > 0)
    val q = emb.where(col(idCol) === queryId).select(col(vecCol).as("_qvec"))
    val probed = centroids
      .select(col(centIdCol).as("centroid_id"), col(centVecCol).as("_cvec"))
      .crossJoin(broadcast(q))
      .select(col("centroid_id"), cosine(col("_cvec"), col("_qvec")).as("_cs"))
      .where(col("_cs").isNotNull)
      .orderBy(col("_cs").desc, col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    val assign = ivfAssign(emb, idCol, vecCol, centroids, centIdCol, centVecCol)
    emb
      .select(col(idCol), col(vecCol))
      .join(assign.join(broadcast(probed), "centroid_id"), Seq(idCol))
      .where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), round(cosine(col(vecCol), col("_qvec")), 6).as("cos_sim"))
      .where(col("cos_sim").isNotNull)
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs within coarse partitions
    * (IVF-style): pairs are only compared when they share `blockCol` (e.g.
    * a cluster/label id), making the pair space linear-ish in corpus size.
    * Norms are precomputed once per vector before the self-join — the
    * per-pair work is a single dot product.
    */
  def blockedNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    val n = emb.select(
      col(idCol).as("id"),
      col(blockCol).as("blk"),
      col(vecCol).as("vec"),
      sqrt(norm2(col(vecCol))).as("nrm")
    )
    val a = n.as("a")
    val b = n.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        // zero-norm vectors → NULL (ANSI would throw on the division);
        // the threshold filter below then drops them
        when(col("a.nrm") * col("b.nrm") === 0, lit(null).cast("double"))
          .otherwise(dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
          .as("cs")
      )
      .where(col("cs") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cs"), 6).as("cos_sim"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicate pairs at `threshold`, LSH-blocked:
    * pairs are only compared when they share a bucket in at least one
    * table, then exact-cosine verified. Linear-ish in corpus size vs the
    * quadratic naive cross join.
    */
  def embeddingNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int = 8,
      tables: Int = 4,
      dim: Int = 64
  ): DataFrame = {
    val bucketCols = (0 until tables).map { t =>
      struct(lit(t).as("t"), hyperplaneBucket(col(vecCol), planesFor(t, numPlanes, dim)).as("bkt"))
    }
    val banded = emb
      .select(col(idCol), col(vecCol), explode(array(bucketCols: _*)).as("tb"))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("tb.t").as("t"), col("tb.bkt").as("bkt"))

    val l = banded.as("l")
    val r = banded.as("r")
    val cand = l
      .join(r, col("l.t") === col("r.t") && col("l.bkt") === col("r.bkt") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("l.vec").as("vec_a"), col("r.id").as("id_b"), col("r.vec").as("vec_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("cos_sim", round(cosine(col("vec_a"), col("vec_b")), 6))
      .where(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .orderBy("id_a", "id_b")
  }
}
