package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - s01: brute-force cosine top-k — the exact baseline. The tiny query
  *    side is broadcast, so the big side streams through one narrow pass:
  *    no shuffle of the corpus, which is the only shape that survives a
  *    100 TB corpus (cost = |corpus| x |queries|, embarrassingly parallel).
  *  - s02: LSH-bucketed ANN — random-hyperplane signs bucket the corpus;
  *    queries only score their own bucket (multi-probe over 4 tables).
  *    The hyperplane matrix is a deterministic seeded constant folded into
  *    the plan (and into the DuckDB oracle), so results are reproducible.
  *
  * Dot products run through `zip_with`/`aggregate` higher-order functions
  * in pure double arithmetic — a strict left fold, bit-identical to the
  * oracle's list_dot_product.
  */
object Similarity {

  private val TopK = 5
  private val NumQueries = 10
  private val Dim = 64
  // Retuned on the s05 recall gate (round 6): the 2^bits bucket count must
  // track corpus size (target ~N/30 buckets per table, i.e. bits ~
  // log2(N/30)), and more, narrower tables beat fewer, wider ones at equal
  // plane budget. The measured grid at sf0.01 (500 vectors, 32 planes both
  // ways): 4 tables x 8 bits -> recall 0.10 (top-k) / 0.10 (pairs);
  // 8 tables x 4 bits -> 0.60 / 0.80 at the same runtime. At 100 TB the
  // same rule holds in reverse: bits GROWS with the corpus so buckets stay
  // bounded (the sum-of-bucket^2 cost), which is what lshBucketStats
  // measures before a run commits to a banding.
  private val NumTables = 8 // LSH hash tables
  private val BitsPerTable = 4

  private def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Native codegen'd dot product (graft.functions.DotProductF64): strict
    * left fold, bit-identical to the oracle's list_dot_product. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotF64(a, b)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  /** Deterministic pseudo-random hyperplanes (seeded, engine-independent —
    * plain Scala so the same constants are embedded in the oracle SQL).
    * Delegates to [[graft.api.Graft.hyperplanes]], the single source of
    * truth these gates and the API operators share. */
  private[ops] lazy val hyperplanes: Array[Array[Double]] =
    graft.api.Graft.hyperplanes(NumTables * BitsPerTable, Dim, 20260812L)

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))


  /** s01: exact brute-force top-5 cosine neighbors for queries vec_id<10. */
  def s01BruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = corpus(s, dir).select($"vec_id", $"v", norm($"v").as("nrm"))
    val q = all.toDF("q_id", "qv", "qn").where($"q_id" < NumQueries)
    val cs = dot($"qv", $"v") / ($"qn" * $"nrm")
    val w = Window.partitionBy($"q_id").orderBy($"cs".desc, $"neighbor_id")
    broadcast(q).join(all, $"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id".as("neighbor_id"), cs.as("cs"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .where($"rank" <= TopK)
      .select($"q_id", $"rank", $"neighbor_id")
      .orderBy($"q_id", $"rank")
  }

  /** s02: LSH-bucketed ANN — same queries, candidates restricted to shared
    * hash-table buckets, then exact re-rank. Recall < 1 by design; the
    * oracle reproduces the identical bucketing so results still hash-match.
    * Thin binding of [[graft.api.Graft.annTopKLsh]]. */
  def s02LshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    graft.api.Graft.annTopKLsh(
      emb, $"vec_id", $"embedding",
      emb.where($"vec_id" < NumQueries), $"vec_id", $"embedding",
      dim = Dim, k = TopK, numTables = NumTables, bitsPerBucket = BitsPerTable)
      .orderBy($"q_id", $"rank")
  }

  /** s03: same exact top-k as s01, but reduced through the custom
    * TopKAggregator (partial top-k per partition before the exchange)
    * instead of a window sort over all candidate scores — the formulation
    * that scales; verified against the identical oracle as s01. */
  def s03TopKAggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    graft.api.Graft.annTopK(
      emb, $"vec_id", $"embedding",
      emb.where($"vec_id" < NumQueries), $"vec_id", $"embedding",
      k = TopK)
      .orderBy($"q_id", $"rank")
  }

  private val NumCentroids = 16
  private val NProbe = 4
  private val KmeansIters = 2

  /** s04: IVF-style ANN — a coarse quantizer partitions the corpus into
    * `NumCentroids` cells (one broadcast pass assigns every vector to its
    * max-cosine centroid); each query probes only its `NProbe` best cells
    * and exactly re-ranks that candidate subset. This is the inverted-file
    * scale path: the corpus is scanned once for assignment and the search
    * touches NProbe/NumCentroids of it, with the candidate join shuffling
    * on the cell id. The quantizer is TRAINED: [[graft.api.Graft.trainCentroids]]
    * runs `KmeansIters` deterministic spherical k-means rounds from a
    * seeded hash-order sample, and the oracle unrolls the identical rounds
    * in SQL (decimal-exact means), so the trained centroids — and the
    * search through them — still hash-match cross-engine. */
  def s04IvfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val cents = graft.api.Graft.trainCentroids(
      emb, $"vec_id", $"embedding", dim = Dim, k = NumCentroids,
      iters = KmeansIters)
    graft.api.Graft.annTopKIvf(
      emb, $"vec_id", $"embedding",
      emb.where($"vec_id" < NumQueries), $"vec_id", $"embedding",
      cents, $"c_id", $"centroid",
      k = TopK, nProbe = NProbe)
      .orderBy($"q_id", $"rank")
  }

  private val PairTopN = 50

  /** d08: embedding near-duplicate pairs, LSH-bucketed — the scale path the
    * d05 exact baseline is judged against. d05 scores every (a, b) pair (an
    * all-pairs cross join: correct, documented, and quadratic); here the
    * random-hyperplane tables of s02 bucket the corpus first, candidate
    * pairs only ever form INSIDE a (table, bucket) group — a self-join that
    * shuffles on the bucket key, never all-pairs — and only candidates get
    * the exact cosine re-rank. Output shape matches d05 (top-N pairs by
    * cosine, rank only, no float column) so baseline and scale path are
    * directly comparable; recall < 1 by design and the oracle reproduces
    * the identical bucketing, so results still hash-match.
    *
    * At 100 TB: cost is sum over buckets of bucket_size^2 (band width is
    * the skew lever, same as MinHash LSH banding), the cross-table dedup is
    * one exchange on the pair key, and the global top-N reduces partially
    * per partition (TakeOrdered) — no stage materializes the quadratic
    * pair space. */
  def d08EmbeddingLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.embeddingNearDupPairs(
      Tables.load(s, dir, "embeddings"), $"vec_id", $"embedding",
      dim = Dim, numTables = NumTables, bitsPerBucket = BitsPerTable,
      topN = PairTopN)
  }

  /** s05: recall@k of every approximate path against its exact baseline —
    * the tuning number for the ANN family ("recall < 1 by design" made
    * measurable): the s02 LSH and s04 IVF top-k joined to the s01 exact
    * top-k per query, and the d08 LSH pair mining joined to the d05 exact
    * top-50 pairs per left vector. One row per path with micro-average and
    * worst-unit recall; all counting is integer-exact (the only floats are
    * final single divisions), so the whole metric hash-matches the oracle
    * running the identical definition. Thin binding of
    * [[graft.api.Graft.recallSummary]]. */
  def s05AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = s01BruteForceTopK(s, dir)
    def tag(path: String, df: DataFrame): DataFrame =
      df.select(lit(path).as("path"), $"n_units", $"n_expected", $"n_hits",
        $"recall", $"min_unit_recall")
    tag("ivf", graft.api.Graft.recallSummary(
        exact, s04IvfTopK(s, dir), "q_id", "neighbor_id"))
      .union(tag("lsh", graft.api.Graft.recallSummary(
        exact, s02LshTopK(s, dir), "q_id", "neighbor_id")))
      .union(tag("pairs", graft.api.Graft.recallSummary(
        Dedup.d05EmbeddingPairs(s, dir), d08EmbeddingLshPairs(s, dir),
        "vec_a", "vec_b")))
      .orderBy($"path")
  }

  private val SemDedupThreshold = 0.45

  /** d11: semantic (embedding-cosine) corpus dedup END TO END — the
    * embedding-space analogue of the d07 text pipeline: LSH-bucketed
    * candidate pairs (d08's bucketing), exact cosine on candidates only,
    * edges at cosine >= 0.45, connected components, least-id keeper per
    * cluster; output is the retained corpus. Recall < 1 by design (a pair
    * the bucketing misses survives dedup); the oracle reproduces the
    * identical bucketing AND the transitive closure, so the decision is
    * still hash-matched end to end. Thin binding of
    * [[graft.api.Graft.semanticDedup]]. */
  def d11SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.semanticDedup(
      Tables.load(s, dir, "embeddings"), $"vec_id", $"embedding",
      dim = Dim, threshold = SemDedupThreshold,
      numTables = NumTables, bitsPerBucket = BitsPerTable)
      .select($"vec_id", $"label")
      .orderBy($"vec_id")
  }

  /** The cosine bar of the t37 semantic-decontamination gate. Set well
    * below 1.0 so the synthetic corpus's planted near-dup embeddings that
    * straddle the benchmark split produce real nonzero hits (the same
    * reason d11 uses 0.45), and above the ~0 cosine of unrelated
    * vectors. */
  private val SemContamThreshold = 0.45

  /** t37: embedding-space benchmark decontamination — the semantic
    * sibling of t06/t34: the same deterministic ~5% md5 bucket of ids
    * plays the benchmark suite (here over `embeddings`), and every other
    * vector reports how many distinct benchmark vectors sit within
    * cosine >= 0.45, over LSH-bucket-sharing candidates only (d08's
    * hyperplane tables — paraphrased leakage that shares no 5-grams
    * still lands here). Thin binding of
    * [[graft.api.Graft.semanticContamination]]; the oracle reproduces
    * the identical bucketing, so hits hash-match end to end. */
  def t37SemanticContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val bucket = conv(substring(md5($"vec_id".cast(StringType)), 1, 4), 16, 10)
      .cast(LongType)
    val isBench = bucket % 20 === 0
    graft.api.Graft.semanticContamination(
      emb.where(!isBench), $"vec_id", $"embedding",
      emb.where(isBench), $"vec_id", $"embedding",
      dim = Dim, threshold = SemContamThreshold,
      numTables = NumTables, bitsPerBucket = BitsPerTable)
      .withColumnRenamed("id", "vec_id")
      .orderBy($"vec_id")
  }

  /** s06: the corpus clustered END TO END — train the s04 quantizer, then
    * assign EVERY vector and emit the per-cluster datasheet (size, id
    * bounds, 1e-12-quantized exact mean member-to-centroid cosine). The
    * cluster-size column is the cell-balance number an IVF deployment
    * watches (a hot cell is a hot probe), and mean_cos is per-cluster
    * coherence. Thin binding of [[graft.api.Graft.trainCentroids]] +
    * [[graft.api.Graft.clusterCorpus]]; the oracle unrolls the identical
    * k-means rounds and assignment rule. */
  def s06ClusterCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val cents = graft.api.Graft.trainCentroids(
      emb, $"vec_id", $"embedding", dim = Dim, k = NumCentroids,
      iters = KmeansIters)
    graft.api.Graft.clusterCorpus(emb, $"vec_id", $"embedding",
        cents, $"c_id", $"centroid", dim = Dim)
      .orderBy($"c_id")
  }

  /** s07: lexical (BM25-shaped) retrieval — the sparse counterpart of the
    * dense ANN family: the first five documents as queries, top-10 corpus
    * docs each by saturated-tf x rational-idf relevance through the
    * inverted-index join. Scores themselves hash-match (1e-9-quantized
    * exact sums), not just ranks. Thin binding of
    * [[graft.api.Graft.lexicalTopK]]. */
  def s07Bm25TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    graft.api.Graft.lexicalTopK(docs, $"doc_id", $"text",
        docs.where($"doc_id" < 5), $"doc_id", $"text", k = 10)
      .orderBy($"q_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_ann_bruteforce" -> s01BruteForceTopK,
    "s06_cluster_corpus" -> s06ClusterCorpus,
    "s07_bm25_topk" -> s07Bm25TopK,
    "d11_semantic_dedup" -> d11SemanticDedup,
    "s02_ann_lsh" -> s02LshTopK,
    "s03_ann_topk_aggregator" -> s03TopKAggregator,
    "s04_ann_ivf" -> s04IvfTopK,
    "s05_ann_recall" -> s05AnnRecall,
    "d08_embedding_lsh_pairs" -> d08EmbeddingLshPairs,
    "t37_semantic_contamination" -> t37SemanticContamination)

  /** The oracle's unrolled k-means training chain — mirrors
    * [[graft.api.Graft.trainCentroids]] round for round: hash-order seeds,
    * max-cosine assignment with c_id tiebreak, DECIMAL(38,12)-exact
    * per-dimension means. Yields CTEs `kc0..kc\$iters`; the search CTEs
    * read the last one. */
  private def kmeansCtesSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |ptsn AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pts
              |         WHERE len(v) = $Dim AND list_dot_product(v, v) > 0),
              |kc0 AS (
              |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) AS BIGINT) - 1 AS c_id,
              |   v AS cv, sqrt(list_dot_product(v, v)) AS cn
              |  FROM (SELECT id, v FROM ptsn ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $k))""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s""",
                |asg$i AS (
                |  SELECT id, v, c_id,
                |   row_number() OVER (PARTITION BY id
                |     ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC, c_id) AS rk
                |  FROM ptsn, kc${i - 1}),
                |comp$i AS (
                |  SELECT c_id, pos,
                |   CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS m
                |  FROM (SELECT c_id, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos
                |        FROM asg$i WHERE rk = 1)
                |  GROUP BY c_id, pos),
                |kc$i AS (
                |  SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM
                |  (SELECT c_id, list(m ORDER BY pos) AS cv FROM comp$i GROUP BY c_id))""".stripMargin
    }
    sb.toString
  }

  private def planeSql(t: Int, b: Int): String =
    "[" + hyperplanes(t * BitsPerTable + b).mkString(", ") + "]"

  private def bucketSql(t: Int): String =
    (0 until BitsPerTable).map { b =>
      s"(CASE WHEN list_dot_product(v, ${planeSql(t, b)}) >= 0 THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")

  /** The per-path recall CTE pair of the s05 oracle: per-unit exact/hit
    * counts via LEFT JOIN (so zero-hit units still count), then the
    * integer-exact rollup mirrored by [[graft.api.Graft.recallSummary]]. */
  private def recallCteSql(name: String, exactRel: String, approxRel: String,
                           unit: String, item: String): String =
    s"""per_$name AS (
       |  SELECT e.$unit AS u, count(*) AS n_exp, count(a.$unit) AS n_hit
       |  FROM $exactRel e LEFT JOIN $approxRel a
       |    ON a.$unit = e.$unit AND a.$item = e.$item
       |  GROUP BY e.$unit),
       |sum_$name AS (
       |  SELECT '$name' AS path, CAST(count(*) AS BIGINT) AS n_units,
       |   CAST(sum(n_exp) AS BIGINT) AS n_expected,
       |   CAST(sum(n_hit) AS BIGINT) AS n_hits,
       |   min(CAST(n_hit AS DOUBLE) / n_exp) AS min_unit_recall
       |  FROM per_$name)""".stripMargin

  /** s05 oracle — composes the s01/s02/s04/d05/d08 oracle texts verbatim as
    * nested CTEs (one source of truth: any change to those oracles flows
    * into this one), then computes the identical recall definition. */
  private lazy val s05Sql: String =
    s"""WITH exact AS (${baseOracles("s01_ann_bruteforce")}),
       |lsh AS (${baseOracles("s02_ann_lsh")}),
       |ivf AS (${baseOracles("s04_ann_ivf")}),
       |pexact AS (${Dedup.oracles("d05_embedding_pairs")}),
       |papprox AS (${baseOracles("d08_embedding_lsh_pairs")}),
       |${recallCteSql("ivf", "exact", "ivf", "q_id", "neighbor_id")},
       |${recallCteSql("lsh", "exact", "lsh", "q_id", "neighbor_id")},
       |${recallCteSql("pairs", "pexact", "papprox", "vec_a", "vec_b")}
       |SELECT path, n_units, n_expected, n_hits,
       | CAST(n_hits AS DOUBLE) / n_expected AS recall, min_unit_recall
       |FROM (SELECT * FROM sum_ivf UNION ALL SELECT * FROM sum_lsh
       |      UNION ALL SELECT * FROM sum_pairs)
       |ORDER BY path""".stripMargin

  /** d11 oracle — d08's bucketed-candidate CTEs (identical hyperplane
    * constants), a cosine threshold instead of top-N, then the recursive
    * transitive closure + least-id keeper of the d06/d07 oracles. */
  private lazy val d11Sql: String =
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |      WHERE len(v) = $Dim AND list_dot_product(v, v) > 0),
       |b AS (${(0 until NumTables).map(t =>
          s"SELECT vec_id, v, nrm, $t AS tbl, ${bucketSql(t)} AS bkt FROM n")
          .mkString(" UNION ALL ")}),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, a.v AS va, a.nrm AS na,
       |   b2.vec_id AS vec_b, b2.v AS vb, b2.nrm AS nb
       |  FROM b a JOIN b b2 USING (tbl, bkt) WHERE a.vec_id < b2.vec_id),
       |edges AS (SELECT vec_a, vec_b FROM cand
       |          WHERE list_dot_product(va, vb) / (na * nb) >= $SemDedupThreshold),
       |verts AS (SELECT vec_a AS id FROM edges UNION SELECT vec_b FROM edges),
       |edges2 AS (SELECT vec_a AS a, vec_b AS b FROM edges
       |           UNION SELECT vec_b, vec_a FROM edges),
       |reach(a, b) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN edges2 e2 ON r.b = e2.a),
       |cc AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
       |dropids AS (SELECT id FROM cc WHERE comp <> id)
       |SELECT vec_id, label FROM embeddings
       |WHERE vec_id NOT IN (SELECT id FROM dropids)
       |ORDER BY vec_id""".stripMargin

  /** s06 oracle — the s04 k-means + assignment CTEs, then the per-cluster
    * rollup with the identical 1e-12 quantized-sum mean. */
  private lazy val s06Sql: String =
    s"""WITH ${kmeansCtesSql(NumCentroids, KmeansIters)},
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n0 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
       |       WHERE len(v) = $Dim AND list_dot_product(v, v) > 0),
       |c AS (SELECT c_id, cv, cn FROM kc$KmeansIters),
       |ranked AS (
       |  SELECT n.vec_id, c.c_id,
       |   list_dot_product(n.v, c.cv) / (n.nrm * c.cn) AS cs,
       |   row_number() OVER (PARTITION BY n.vec_id
       |     ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.c_id) AS c_rank
       |  FROM n0 n, c)
       |SELECT c_id, CAST(count(*) AS BIGINT) AS n_vectors,
       | min(vec_id) AS min_id, max(vec_id) AS max_id,
       | (CAST(sum(CAST(round(cs * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
       |   / CAST(count(*) AS BIGINT) AS mean_cos
       |FROM ranked WHERE c_rank = 1
       |GROUP BY c_id ORDER BY c_id""".stripMargin

  /** s07 oracle — the identical inverted-index BM25 pipeline; every float
    * literal CAST to DOUBLE (DuckDB parses bare decimals as DECIMAL and
    * decimal arithmetic would diverge from Spark's IEEE ops) and the
    * per-term contributions quantized to 1e-9 longs before summing. */
  private lazy val s07Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |   unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY doc_id, t),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
      |       FROM toks GROUP BY doc_id),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |dfx AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
      |q AS (SELECT DISTINCT doc_id AS q_id, t FROM toks WHERE doc_id < 5),
      |contrib AS (
      |  SELECT q.q_id, tf.doc_id,
      |   CAST(round(
      |     ((n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
      |     * ((tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
      |        / (tf + CAST(1.2 AS DOUBLE)
      |           * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
      |              + (CAST(0.75 AS DOUBLE) * dl.dl) / avgdl)))
      |     * CAST(1e9 AS DOUBLE)) AS BIGINT) AS c
      |  FROM q
      |  JOIN tf ON q.t = tf.t
      |  JOIN dfx ON tf.t = dfx.t
      |  JOIN dl ON tf.doc_id = dl.doc_id, stats
      |  WHERE tf.doc_id <> q.q_id),
      |sc AS (SELECT q_id, doc_id,
      |        CAST(sum(c) AS DOUBLE) / CAST(1e9 AS DOUBLE) AS score
      |       FROM contrib GROUP BY q_id, doc_id),
      |rk AS (SELECT q_id, doc_id, score,
      |        CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |       FROM sc)
      |SELECT q_id, rank, doc_id, score FROM rk WHERE rank <= 10
      |ORDER BY q_id, rank""".stripMargin

  /** t37 oracle: identical split, bucketing, and cosine bar as
    * [[t37SemanticContamination]] — the hyperplane constants render from
    * the same [[hyperplanes]] array, so the two sides cannot drift. */
  private lazy val t37Sql: String =
    s"""WITH e AS (SELECT vec_id,
       |  CAST(embedding AS DOUBLE[]) AS v,
       |  CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)) AS BIGINT) % 20 = 0 AS is_bench
       | FROM embeddings),
       |n AS (SELECT vec_id, is_bench, v, sqrt(list_dot_product(v, v)) AS nrm
       |      FROM e WHERE len(v) = $Dim AND list_dot_product(v, v) > 0),
       |b AS (${(0 until NumTables).map(t =>
          s"SELECT vec_id, is_bench, v, nrm, $t AS tbl, ${bucketSql(t)} AS bkt FROM n")
          .mkString(" UNION ALL ")}),
       |hit AS (
       |  SELECT DISTINCT c.vec_id, bm.vec_id AS b_id
       |  FROM b c JOIN b bm USING (tbl, bkt)
       |  WHERE NOT c.is_bench AND bm.is_bench
       |    AND list_dot_product(c.v, bm.v) / (c.nrm * bm.nrm) >= $SemContamThreshold),
       |nh AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits
       |       FROM hit GROUP BY vec_id)
       |SELECT e.vec_id, coalesce(nh.n_hits, 0) AS n_hits,
       | coalesce(nh.n_hits, 0) > 0 AS contaminated
       |FROM e LEFT JOIN nh ON e.vec_id = nh.vec_id
       |WHERE NOT e.is_bench
       |ORDER BY e.vec_id""".stripMargin

  lazy val oracles: Map[String, String] =
    baseOracles + ("s05_ann_recall" -> s05Sql) + ("d11_semantic_dedup" -> d11Sql) +
      ("s06_cluster_corpus" -> s06Sql) + ("s07_bm25_topk" -> s07Sql) +
      ("t37_semantic_contamination" -> t37Sql)

  private lazy val baseOracles: Map[String, String] = Map(
    "s01_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
         |sc AS (
         |  SELECT q.q_id, n.vec_id AS neighbor_id,
         |   list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cs
         |  FROM q JOIN n ON q.q_id <> n.vec_id),
         |rk AS (SELECT q_id, neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, neighbor_id) AS BIGINT) AS rank
         | FROM sc)
         |SELECT q_id, rank, neighbor_id FROM rk WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    // s03 computes the same exact top-k as s01 through the aggregator path
    "s03_ann_topk_aggregator" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $NumQueries),
         |sc AS (
         |  SELECT q.q_id, n.vec_id AS neighbor_id,
         |   list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cs
         |  FROM q JOIN n ON q.q_id <> n.vec_id),
         |rk AS (SELECT q_id, neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, neighbor_id) AS BIGINT) AS rank
         | FROM sc)
         |SELECT q_id, rank, neighbor_id FROM rk WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "s04_ann_ivf" ->
      s"""WITH ${kmeansCtesSql(NumCentroids, KmeansIters)},
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |c AS (SELECT c_id, cv, cn FROM kc$KmeansIters),
         |ranked AS (
         |  SELECT n.vec_id, n.v, n.nrm, c.c_id,
         |   row_number() OVER (PARTITION BY n.vec_id
         |     ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.c_id) AS c_rank
         |  FROM n, c),
         |assigned AS (SELECT vec_id, v, nrm, c_id AS cell FROM ranked WHERE c_rank = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS cell
         |  FROM ranked WHERE c_rank <= $NProbe AND vec_id < $NumQueries),
         |sc AS (
         |  SELECT p.q_id, a.vec_id AS neighbor_id,
         |   list_dot_product(p.qv, a.v) / (p.qn * a.nrm) AS cs
         |  FROM probes p JOIN assigned a USING (cell) WHERE p.q_id <> a.vec_id),
         |rk AS (SELECT q_id, neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, neighbor_id) AS BIGINT) AS rank
         | FROM sc)
         |SELECT q_id, rank, neighbor_id FROM rk WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "s02_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |b AS (${(0 until NumTables).map(t =>
            s"SELECT vec_id, v, nrm, $t AS tbl, ${bucketSql(t)} AS bkt FROM n")
            .mkString(" UNION ALL ")}),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, tbl, bkt FROM b WHERE vec_id < $NumQueries),
         |cand AS (
         |  SELECT DISTINCT q.q_id, b.vec_id, q.qv, q.qn, b.v, b.nrm
         |  FROM q JOIN b USING (tbl, bkt) WHERE q.q_id <> b.vec_id),
         |sc AS (SELECT q_id, vec_id AS neighbor_id,
         |  list_dot_product(qv, v) / (qn * nrm) AS cs FROM cand),
         |rk AS (SELECT q_id, neighbor_id,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, neighbor_id) AS BIGINT) AS rank
         | FROM sc)
         |SELECT q_id, rank, neighbor_id FROM rk WHERE rank <= $TopK
         |ORDER BY q_id, rank""".stripMargin,
    "d08_embedding_lsh_pairs" ->
      // unlike s01-s04, the n CTE mirrors embeddingNearDupPairs' up-front
      // drop of ragged/zero-norm vectors (undefined cosine)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
         |      WHERE len(v) = $Dim AND list_dot_product(v, v) > 0),
         |b AS (${(0 until NumTables).map(t =>
            s"SELECT vec_id, v, nrm, $t AS tbl, ${bucketSql(t)} AS bkt FROM n")
            .mkString(" UNION ALL ")}),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, a.v AS va, a.nrm AS na,
         |   b2.vec_id AS vec_b, b2.v AS vb, b2.nrm AS nb
         |  FROM b a JOIN b b2 USING (tbl, bkt) WHERE a.vec_id < b2.vec_id),
         |sc AS (SELECT vec_a, vec_b,
         |  list_dot_product(va, vb) / (na * nb) AS cs FROM cand),
         |top AS (SELECT vec_a, vec_b, cs FROM sc
         |  ORDER BY cs DESC, vec_a, vec_b LIMIT $PairTopN)
         |SELECT vec_a, vec_b,
         | CAST(row_number() OVER (ORDER BY cs DESC, vec_a, vec_b) AS BIGINT) AS rank
         |FROM top ORDER BY rank""".stripMargin)
}
