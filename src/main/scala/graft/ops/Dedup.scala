package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operator family over `documents` / `embeddings`:
  *
  *  - d01 exact dedup (content-hash groupBy);
  *  - d02 MinHash + LSH banding (shingle -> 15 minhashes -> 5 bands of
  *    3 -> band-bucket grouping -> candidate pairs with signature
  *    agreement; banding planner-derived, see
  *    [[graft.api.Graft.DefaultBands]]);
  *  - d03 exact n-gram Jaccard verification over the LSH candidates;
  *  - d04 SimHash (60-bit, word-level) signatures;
  *  - d05 embedding-cosine nearest pairs.
  *
  * Scale design: nothing here is all-pairs. d02/d03 only ever join within
  * LSH band buckets (the classic shuffle-on-band-key pattern: cost is
  * sum of bucket^2, not n^2); d05 ranks pairs from a single shuffle-free
  * top-N over a block-local cross join at test scale and is the baseline
  * for the LSH-bucketed variant in Similarity. MinHash functions use
  * md5-derived string minima so the DuckDB oracle can reproduce them
  * engine-portably; a production variant would swap in xxhash64 (cheaper,
  * Spark-codegen'd) without changing the dataflow shape.
  */
object Dedup {

  // Planner-derived banding (lshBandPlan(0.8, 0.95, 16) = 5 bands x 3
  // rows): see the derivation + measured-recall note at
  // [[graft.api.Graft.DefaultBands]]. Single source of truth — the oracle
  // SQL below renders from the same constants.
  private val Bands = graft.api.Graft.DefaultBands
  private val RowsPerBand = graft.api.Graft.DefaultRowsPerBand
  private val NumHashes = graft.api.Graft.DefaultNumHashes // 15
  private val JaccardBandThreshold = graft.api.Graft.DefaultMinAgreement // >=8/15 reported
  // d15's containment stage hunts LOW-symmetric-Jaccard pairs (a short
  // doc inside a long one), so it cannot ride the production banding: at
  // J ~ 0.25 the r=3 band keys collide with P = 1-(1-0.25^3)^5 ~ 8%
  // (the r=2 keys of the old 4x2 plan gave ~23%). It re-bands the SAME
  // 15-hash signatures as 7 bands x 2 rows (14 hashes): P ~ 36% at
  // J = 0.25 -- better than the engine ever had -- while the d02-family
  // keeps the selective 5x3 plan. The agreement cut stays recall-leaning
  // at 4 of 14 (~ the old 2-of-8 operating point).
  private val ContainmentBands = 7
  private val ContainmentRows = 2
  private val ContainmentAgree = 4

  /** Universal-hash minhash: one md5 per shingle -> 60-bit int, then 15
    * affine permutations h_i = (a_i*h + b_i) mod p over the 31-bit field
    * (products stay < 2^62, no overflow in either engine). 15x cheaper than
    * hashing every shingle 15 times, identical LSH semantics. The constants
    * embedded in the oracle SQL come from [[graft.api.Graft.minhashParams]]
    * — the SAME function [[graft.api.Graft.minhashSignatures]] evaluates —
    * so the two sides cannot drift apart. */
  private val P = graft.api.Graft.MinhashP
  private[ops] lazy val hashParams: Array[(Long, Long)] =
    graft.api.Graft.minhashParams(NumHashes, 777L)

  /** d01: exact duplicate grouping by content hash; keeper = min doc_id.
    * Thin binding of [[graft.api.Graft.exactDedup]]. */
  def d01Exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.exactDedup(Tables.load(s, dir, "documents"), $"doc_id", $"text")
      .withColumnRenamed("keeper_id", "keeper_doc_id")
      .orderBy($"keeper_doc_id")
  }

  /** d02: MinHash-LSH near-dup candidates with signature agreement >= 8/15.
    * Thin binding of [[graft.api.Graft.minhashSignatures]] +
    * [[graft.api.Graft.nearDupPairs]] (identical hash constants, so the
    * oracle is unchanged). */
  def d02MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    // no cache: the single-pass nearDupPairs scans the signatures once
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true) // doc_id is the documents table's key
    graft.api.Graft.nearDupPairs(sigs, minAgreement = JaccardBandThreshold)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"n_match")
      .orderBy($"doc_a", $"doc_b")
  }

  /** d03: exact char-5-gram Jaccard verification of the LSH+agreement
    * candidates (the verify stage of the dedup pipeline); reports J >= 0.5.
    * Thin binding of the Graft API minhash -> pairs -> jaccardVerify chain. */
  def d03NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true) // doc_id is the documents table's key
    // jaccardVerify persists the pairs itself (it consumes them for the
    // eager size gate plus both join sides)
    val pairs = graft.api.Graft.nearDupPairs(sigs, minAgreement = JaccardBandThreshold)
    graft.api.Graft.jaccardVerify(docs, $"doc_id", $"text", pairs)
      .where($"jaccard" >= 0.5)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
        $"n_inter", $"n_union", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** d04: 60-bit word-level SimHash signatures (single wide aggregate over
    * the exploded token stream). Thin binding of [[graft.api.Graft.simhash]]. */
  def d04Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.simhash(Tables.load(s, dir, "documents"), $"doc_id", $"text")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** d05: top-50 most-similar embedding pairs by cosine (the exact baseline
    * an ANN index is judged against). Output has no float column — ranks
    * only — so it is robust to last-ulp differences across engines. */
  def d05EmbeddingPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dotF = graft.functions.VectorFunctions.dotF64 _
    val emb = Tables.load(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast(DoubleType)).as("v"))
    val withNorm = emb.select($"vec_id", $"v", sqrt(dotF($"v", $"v")).as("nrm"))
    val l = withNorm.toDF("vec_a", "va", "na")
    val r = withNorm.toDF("vec_b", "vb", "nb")
    val dot = dotF($"va", $"vb")
    l.join(r, col("vec_a") < col("vec_b"))
      .select($"vec_a", $"vec_b", (dot / ($"na" * $"nb")).as("cs"))
      .orderBy($"cs".desc, $"vec_a", $"vec_b")
      .limit(50)
      .select($"vec_a", $"vec_b",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"cs".desc, $"vec_a", $"vec_b")).cast(LongType).as("rank"))
      .orderBy($"rank")
  }

  /** d06: duplicate clusters — connected components over the d02 candidate
    * graph, labeling every involved doc with the least doc_id reachable
    * from it (the cluster keeper) plus the cluster size. The final step of
    * a dedup pipeline: transitive closure turns pairwise matches into
    * keep/drop decisions. Thin binding of
    * [[graft.api.Graft.connectedComponents]] (min-label propagation with
    * pointer jumping, run to a proven fixpoint). */
  def d06DupGroups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true) // doc_id is the documents table's key
    val pairs = graft.api.Graft.nearDupPairs(sigs, minAgreement = JaccardBandThreshold)
    val bySize = org.apache.spark.sql.expressions.Window.partitionBy($"dup_group")
    graft.api.Graft.connectedComponents(pairs, $"id_a", $"id_b")
      .select($"id".as("doc_id"), $"component".as("dup_group"))
      .withColumn("group_size", count(lit(1)).over(bySize))
      .orderBy($"doc_id")
  }

  /** d07: the dedup pipeline END TO END — the composition a training-data
    * pipeline actually runs: (1) exact dedup keeps the least doc_id per
    * content hash; (2) MinHash/LSH candidates over the survivors;
    * (3) exact n-gram Jaccard verification (>= 0.5) turns candidates into
    * edges; (4) connected components make transitive keep/drop decisions
    * (each cluster keeps its least doc_id). Output: the retained corpus.
    * Thin binding of [[graft.api.Graft.dedupCorpus]]; every stage is the
    * oracle-verified operator from d01/d02/d03/d06 and this query pins
    * their composition. */
  def d07DedupPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.dedupCorpus(
      Tables.load(s, dir, "documents"), $"doc_id", $"text",
      minAgreement = JaccardBandThreshold)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** d10: chunk-level boilerplate removal — the paragraph-dedup stage of a
    * corpus-cleaning pipeline (CCNet-style: repeated license banners and
    * navigation chrome are dropped chunk-by-chunk, not document-by-
    * document). 10-token chunks whose content recurs in MORE than one
    * document are dropped from every document carrying them, and the
    * surviving text is rebuilt in order (the corpus's planted near-dups
    * make the repeated-chunk set non-trivial). Thin binding of
    * [[graft.api.Graft.dropBoilerplate]]. */
  def d10ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.dropBoilerplate(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", chunkWords = 10, maxDocFreq = 1)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** d12: PageRank over the near-dup candidate graph — duplicate
    * *centrality*: a document's rank grows with how many near-duplicates
    * it has and how central it sits in its duplication cluster (the signal
    * a crawl pipeline uses to pick canonical pages and to spot template
    * farms). Three unrolled rounds, damping 0.85, contributions quantized
    * to integer 1e-12 units and summed exactly so the double ranks are
    * bit-identical cross-engine (the oracle unrolls the identical rounds).
    * Thin binding of
    * [[graft.api.Graft.pageRank]] over the d02 candidate pairs. */
  def d12Pagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    val pairs = graft.api.Graft.nearDupPairs(sigs, minAgreement = JaccardBandThreshold)
    graft.api.Graft.pageRank(pairs, $"id_a", $"id_b")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** d13: the dedup pipeline under the PRODUCTION keeper policy — every
    * cluster keeps its LONGEST member (ties: least doc_id) instead of the
    * least id, the policy crawl pipelines actually run (the longest
    * near-dup usually carries the most content). Same chain as d07 with
    * `keepBy = n_chars`; the oracle re-ranks each transitive cluster with
    * the identical argmax. */
  def d13DedupKeepLongest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.dedupCorpus(
      Tables.load(s, dir, "documents"), $"doc_id", $"text",
      minAgreement = JaccardBandThreshold, keepBy = Some($"n_chars"))
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** d14: INCREMENTAL dedup — the production shape at scale: a new batch
    * is admitted against the already-ingested corpus without re-deduping
    * the corpus. Existing = the four-fifths of `documents` with
    * doc_id % 5 != 0; the batch = the held-out fifth PLUS exact
    * "re-crawls" of existing docs under fresh ids (doc_id + 10^12 —
    * far above any real doc_id, so synthetic ids can never collide with
    * genuine ones and corrupt the oracle's merged signatures).
    * Retained = batch rows that are neither exact copies nor verified
    * near-dups (agreement >= 4/8, Jaccard >= 0.5) of ANY existing row;
    * the re-crawls must all be dropped by the exact pass. Thin binding of
    * [[graft.api.Graft.dedupIncremental]] — corpus side never shuffles,
    * batch side broadcasts. */
  def d14IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val existing = docs.where($"doc_id" % 5 =!= 0)
    val recrawl = existing.where($"doc_id" % 97 === 3)
      .select(($"doc_id" + 1000000000000L).as("doc_id"), $"text", $"lang",
        $"source", $"n_chars")
    val incoming = docs.where($"doc_id" % 5 === 0).unionByName(recrawl)
    graft.api.Graft.dedupIncremental(existing, $"doc_id", $"text",
        incoming, $"doc_id", $"text", minAgreement = JaccardBandThreshold)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** d15: asymmetric containment verification — the near-dup check Jaccard
    * structurally misses. `containment = |A∩B| / min(|A|,|B|)` is 1.0 when
    * the shorter document's shingles all appear in the longer one (a quote,
    * a syndicated excerpt, a boilerplate-wrapped repost) even when the
    * length ratio drives Jaccard toward 0. Candidates come from the SAME
    * 15-hash signatures as d02 but re-banded 7x2 with a relaxed >= 4/14
    * agreement cut (a short doc inside a long one only partially drags
    * the long doc's minhashes down, so both the selective r=3 band keys
    * and the symmetric 8/15 cut would drop exactly the pairs this stage
    * exists to catch -- see ContainmentBands); containment >= 0.8. Thin
    * binding of [[graft.api.Graft.containmentVerify]]. */
  def d15Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    val pairs = graft.api.Graft.nearDupPairs(sigs, ContainmentBands,
      ContainmentRows, minAgreement = ContainmentAgree)
    graft.api.Graft.containmentVerify(docs, $"doc_id", $"text", pairs)
      .where($"containment" >= 0.8)
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
        $"n_inter", $"n_a", $"n_b", $"containment")
      .orderBy($"doc_a", $"doc_b")
  }

  /** d16: triangle counts + local clustering coefficient over the d02
    * near-dup candidate graph — the cohesion diagnostic that separates a
    * template farm (clique: clustering ~1.0) from a chain of incidental
    * pairwise matches (clustering 0), complementing d06's components
    * (membership) and d12's PageRank (centrality). Thin binding of
    * [[graft.api.Graft.triangleCounts]]. */
  def d16Triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    val pairs = graft.api.Graft.nearDupPairs(sigs, minAgreement = JaccardBandThreshold)
    graft.api.Graft.triangleCounts(pairs, $"id_a", $"id_b")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d16_triangles" -> d16Triangles,
    "d15_containment" -> d15Containment,
    "d12_pagerank" -> d12Pagerank,
    "d14_incremental_dedup" -> d14IncrementalDedup,
    "d13_dedup_keep_longest" -> d13DedupKeepLongest,
    "d01_exact_dedup" -> d01Exact,
    "d02_minhash_lsh" -> d02MinhashLsh,
    "d03_ngram_jaccard" -> d03NgramJaccard,
    "d04_simhash" -> d04Simhash,
    "d05_embedding_pairs" -> d05EmbeddingPairs,
    "d06_dup_groups" -> d06DupGroups,
    "d07_dedup_pipeline" -> d07DedupPipeline,
    "d09_lsh_bucket_stats" -> d09LshBucketStats,
    "d10_paragraph_dedup" -> d10ParagraphDedup)

  /** The minhash->banding->agreement CTE chain over relation `from`
    * (shared by the d02/d03/d06/d07 oracles); `minAgree` relaxes the
    * signature-agreement cut for recall-leaning stages (d15). */
  private[ops] def sigsSql(from: String = "documents",
                           minAgree: Int = JaccardBandThreshold,
                           bands: Int = Bands,
                           rowsPerBand: Int = RowsPerBand) =
    s"""sh AS (
       |  SELECT doc_id, substr(text, i, 5) AS s
       |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text)-4)) AS i
       |        FROM $from)),
       |h0t AS (
       |  SELECT doc_id,
       |   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $P AS h0
       |  FROM sh),
       |sigs AS (
       |  SELECT doc_id, ${hashParams.zipWithIndex
        .map { case ((a, b), i) => s"min((${a}*h0 + ${b}) % $P) AS h${i + 1}" }
        .mkString(", ")}
       |  FROM h0t GROUP BY doc_id),
       |b AS (${(1 to bands)
        .map { k =>
          val hs = ((k - 1) * rowsPerBand + 1 to k * rowsPerBand)
            .map(i => s"CAST(h$i AS VARCHAR)").mkString("||':'||")
          s"SELECT '$k:'||$hs AS bb, doc_id FROM sigs"
        }
        .mkString(" UNION ALL ")}),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM b l JOIN b r USING (bb) WHERE l.doc_id < r.doc_id),
       |agreed AS (
       |  SELECT doc_a, doc_b,
       |   CAST(${(1 to bands * rowsPerBand)
        .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")} AS BIGINT) AS n_match
       |  FROM cand
       |  JOIN sigs sa ON cand.doc_a = sa.doc_id
       |  JOIN sigs sb ON cand.doc_b = sb.doc_id
       |  WHERE ${(1 to bands * rowsPerBand)
        .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")} >= $minAgree)""".stripMargin

  /** d09: per-band LSH bucket statistics over the documents signatures —
    * the Σ bucket² predictor a run consults BEFORE committing to a banding
    * (est_pairs is exactly the candidate count d02 would generate per band;
    * max_bucket names the hot-bucket hazard). Thin binding of
    * [[graft.api.Graft.lshBucketStats]] on the same signatures as d02. */
  def d09LshBucketStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val sigs = graft.api.Graft.minhashSignatures(docs, $"doc_id", $"text",
      assumeUniqueIds = true)
    graft.api.Graft.lshBucketStats(sigs)
  }

  /** One unrolled PageRank round for the d12 oracle. Every scalar is
    * forced to DOUBLE (DuckDB parses bare 0.85 as DECIMAL — decimal
    * division would diverge from Spark's IEEE ops); contributions are
    * quantized to integer 1e-12 units and summed as BIGINTs exactly like
    * [[graft.api.Graft.pageRank]] (both engines' round() is half-away-
    * from-zero for positive doubles, and 1e12 is a DOUBLE literal in
    * both). */
  private def prRoundSql(i: Int): String =
    s"""r$i AS (
       |  SELECT e.b AS id,
       |   (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
       |     + CAST(0.85 AS DOUBLE)
       |       * (CAST(sum(CAST(round((r.rank / d.deg) * 1e12) AS BIGINT)) AS DOUBLE)
       |          / 1e12) AS rank
       |  FROM edges0 e
       |  JOIN r${i - 1} r ON e.a = r.id
       |  JOIN deg d ON e.a = d.id
       |  GROUP BY e.b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d16_triangles" ->
      s"""WITH ${sigsSql()},
         |e AS (SELECT doc_a AS a, doc_b AS b FROM agreed),
         |w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e1.b = e2.a),
         |tri AS (SELECT w.a, w.b, w.c FROM w JOIN e e3
         |        ON w.a = e3.a AND w.c = e3.b),
         |tv AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
         |       FROM (SELECT unnest([a, b, c]) AS id FROM tri) GROUP BY id),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
         |        FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |        GROUP BY id)
         |SELECT deg.id AS doc_id, degree,
         | coalesce(tv.n_triangles, 0) AS n_triangles,
         | CASE WHEN degree >= 2
         |      THEN (coalesce(tv.n_triangles, 0) * CAST(2.0 AS DOUBLE))
         |         / (degree * (degree - 1))
         |      ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
         |FROM deg LEFT JOIN tv ON deg.id = tv.id
         |ORDER BY doc_id""".stripMargin,
    "d15_containment" ->
      s"""WITH ${sigsSql(minAgree = ContainmentAgree, bands = ContainmentBands, rowsPerBand = ContainmentRows)},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM documents)
         |SELECT doc_a, doc_b,
         | CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter,
         | CAST(len(sa.sh) AS BIGINT) AS n_a,
         | CAST(len(sb.sh) AS BIGINT) AS n_b,
         | CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |   / least(len(sa.sh), len(sb.sh)) AS containment
         |FROM agreed
         |JOIN sets sa ON agreed.doc_a = sa.doc_id
         |JOIN sets sb ON agreed.doc_b = sb.doc_id
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |   / least(len(sa.sh), len(sb.sh)) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d14_incremental_dedup" ->
      s"""WITH existing AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  WHERE doc_id % 5 <> 0),
         |incoming AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000000000 AS doc_id, text, lang, source, n_chars
         |  FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 97 = 3),
         |alldocs AS (SELECT doc_id, text FROM existing
         |            UNION ALL SELECT doc_id, text FROM incoming),
         |${sigsSql("alldocs")},
         |cross_cand AS (
         |  SELECT CASE WHEN a.doc_a IN (SELECT doc_id FROM incoming)
         |              THEN a.doc_a ELSE a.doc_b END AS iid,
         |         CASE WHEN a.doc_a IN (SELECT doc_id FROM incoming)
         |              THEN a.doc_b ELSE a.doc_a END AS eid
         |  FROM agreed a
         |  WHERE (a.doc_a IN (SELECT doc_id FROM incoming))
         |     <> (a.doc_b IN (SELECT doc_id FROM incoming))),
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM alldocs),
         |near_hit AS (
         |  SELECT DISTINCT c.iid FROM cross_cand c
         |  JOIN sets si ON c.iid = si.doc_id
         |  JOIN sets se ON c.eid = se.doc_id
         |  WHERE CAST(len(list_intersect(si.sh, se.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(si.sh, se.sh))) >= 0.5),
         |exact_hit AS (
         |  SELECT DISTINCT i.doc_id FROM incoming i
         |  JOIN existing e ON md5(i.text) = md5(e.text))
         |SELECT doc_id, lang, source, n_chars FROM incoming
         |WHERE doc_id NOT IN (SELECT iid FROM near_hit)
         |  AND doc_id NOT IN (SELECT doc_id FROM exact_hit)
         |ORDER BY doc_id""".stripMargin,
    "d12_pagerank" ->
      s"""WITH ${sigsSql()},
         |edges0 AS (SELECT doc_a AS a, doc_b AS b FROM agreed
         |           UNION SELECT doc_b, doc_a FROM agreed),
         |deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges0 GROUP BY a),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM deg),
         |${prRoundSql(1)},
         |${prRoundSql(2)},
         |${prRoundSql(3)}
         |SELECT id AS doc_id, rank FROM r3 ORDER BY doc_id""".stripMargin,
    "d10_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |           FROM documents),
        |ch AS (
        |  SELECT doc_id, i - 1 AS pos,
        |   array_to_string(list_slice(t, (i-1)*10 + 1, i*10), ' ') AS chunk
        |  FROM (SELECT doc_id, t,
        |         unnest(generate_series(1, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS i
        |        FROM d)),
        |hot AS (SELECT md5(chunk) AS h FROM ch
        |        GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
        |fl AS (SELECT doc_id, pos, chunk,
        |        md5(chunk) IN (SELECT h FROM hot) AS is_hot FROM ch)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(count(*) FILTER (is_hot) AS BIGINT) AS n_dropped,
        | coalesce(string_agg(CASE WHEN NOT is_hot THEN chunk END, ' '
        |                     ORDER BY pos), '') AS clean_text
        |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d09_lsh_bucket_stats" ->
      s"""WITH ${sigsSql()},
         |counts AS (
         |  SELECT CAST(split_part(bb, ':', 1) AS BIGINT) AS band, bb,
         |   count(*) AS n
         |  FROM b GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         | CAST(sum(n) AS BIGINT) AS n_rows,
         | CAST(max(n) AS BIGINT) AS max_bucket,
         | CAST(sum(n * (n - 1) // 2) AS BIGINT) AS est_pairs
         |FROM counts GROUP BY band ORDER BY band""".stripMargin,
    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_doc_id""".stripMargin,
    "d02_minhash_lsh" ->
      s"""WITH ${sigsSql()}
         |SELECT doc_a, doc_b, n_match FROM agreed ORDER BY doc_a, doc_b""".stripMargin,
    "d03_ngram_jaccard" ->
      s"""WITH ${sigsSql()},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM documents)
         |SELECT doc_a, doc_b,
         | CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_inter,
         | CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT) AS n_union,
         | CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |   / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
         |FROM agreed
         |JOIN sets sa ON agreed.doc_a = sa.doc_id
         |JOIN sets sb ON agreed.doc_b = sb.doc_id
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |   / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d04_simhash" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
         |  FROM documents),
         |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h FROM w),
         |bits AS (
         |  SELECT doc_id, ${(0 until 60)
          .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(", ")}
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST(${(0 until 60)
          .map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)")
          .mkString(" + ")} AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,
    "d06_dup_groups" ->
      s"""WITH RECURSIVE ${sigsSql()},
         |verts AS (SELECT doc_a AS id FROM agreed UNION SELECT doc_b FROM agreed),
         |edges2 AS (SELECT doc_a AS a, doc_b AS b FROM agreed
         |           UNION SELECT doc_b, doc_a FROM agreed),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges2 e ON r.b = e.a),
         |cc AS (SELECT a AS doc_id, min(b) AS dup_group FROM reach GROUP BY a)
         |SELECT doc_id, dup_group,
         | CAST(count(*) OVER (PARTITION BY dup_group) AS BIGINT) AS group_size
         |FROM cc ORDER BY doc_id""".stripMargin,
    "d13_dedup_keep_longest" ->
      s"""WITH RECURSIVE ek AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |uniq AS (SELECT d.* FROM documents d JOIN ek ON d.doc_id = ek.doc_id),
         |${sigsSql("uniq")},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM uniq),
         |edges AS (
         |  SELECT doc_a, doc_b FROM agreed
         |  JOIN sets sa ON agreed.doc_a = sa.doc_id
         |  JOIN sets sb ON agreed.doc_b = sb.doc_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |     / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),
         |verts AS (SELECT doc_a AS id FROM edges UNION SELECT doc_b FROM edges),
         |edges2 AS (SELECT doc_a AS a, doc_b AS b FROM edges
         |           UNION SELECT doc_b, doc_a FROM edges),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN edges2 e2 ON r.b = e2.a),
         |cc AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |ks AS (SELECT cc.id, cc.comp, u.n_chars AS klen
         |       FROM cc JOIN uniq u ON u.doc_id = cc.id),
         |keepids AS (SELECT id FROM (
         |  SELECT id, row_number() OVER (
         |    PARTITION BY comp ORDER BY klen DESC, id) AS rn FROM ks)
         |  WHERE rn = 1),
         |dropids AS (SELECT id FROM ks WHERE id NOT IN (SELECT id FROM keepids))
         |SELECT doc_id, lang, source, n_chars FROM uniq
         |WHERE doc_id NOT IN (SELECT id FROM dropids)
         |ORDER BY doc_id""".stripMargin,
    "d07_dedup_pipeline" ->
      s"""WITH RECURSIVE uniq AS (
         |  SELECT d.* FROM documents d
         |  JOIN (SELECT md5(text) AS h, min(doc_id) AS k
         |        FROM documents GROUP BY 1) e ON d.doc_id = e.k),
         |${sigsSql("uniq")},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM uniq),
         |edges AS (
         |  SELECT doc_a, doc_b FROM agreed
         |  JOIN sets sa ON agreed.doc_a = sa.doc_id
         |  JOIN sets sb ON agreed.doc_b = sb.doc_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |     / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),
         |verts AS (SELECT doc_a AS id FROM edges UNION SELECT doc_b FROM edges),
         |edges2 AS (SELECT doc_a AS a, doc_b AS b FROM edges
         |           UNION SELECT doc_b, doc_a FROM edges),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN edges2 e2 ON r.b = e2.a),
         |cc AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |dropids AS (SELECT id FROM cc WHERE comp <> id)
         |SELECT doc_id, lang, source, n_chars FROM uniq
         |WHERE doc_id NOT IN (SELECT id FROM dropids)
         |ORDER BY doc_id""".stripMargin,
    "d05_embedding_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |p AS (
        |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
        |   list_dot_product(l.v, r.v) / (l.nrm * r.nrm) AS cs
        |  FROM n l JOIN n r ON l.vec_id < r.vec_id),
        |top AS (SELECT vec_a, vec_b, cs FROM p ORDER BY cs DESC, vec_a, vec_b LIMIT 50)
        |SELECT vec_a, vec_b,
        | CAST(row_number() OVER (ORDER BY cs DESC, vec_a, vec_b) AS BIGINT) AS rank
        |FROM top ORDER BY rank""".stripMargin)
}
