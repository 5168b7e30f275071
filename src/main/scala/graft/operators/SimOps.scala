package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.expressions.VectorExprs.{vecDot, vecNorm}

/** Similarity search over the embedding column (SURVEY §2 rows 53–55).
  *
  * q53 is the exact baseline: query-set × corpus brute cosine, top-k by
  * window rank. The query side is a small filtered subset that Spark
  * broadcasts, so the corpus is scanned once with no shuffle of the big
  * side — at 100 TB this is the "score everything against k probes"
  * pattern. q54 is the scale path: random-hyperplane LSH buckets the
  * corpus so each query only scores its bucket (recall measured against
  * q53 in `SimilaritySpec`).
  */
object SimOps {

  // native codegen expressions (graft.expressions.FloatVecDot) — the
  // declarative zip_with/aggregate form is interpreted per pair and ~20×
  // slower on the O(n·k) candidate-scoring path
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", vecNorm(col("embedding")))

  private def dot(a: Column, b: Column): Column = vecDot(a, b)

  // --- 53. brute-force cosine top-k -------------------------------------
  def q53(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("e_q"), col("nrm").as("n_q"))
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding").as("e_n"),
      col("nrm").as("n_n"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    corpus.join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos", round(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val q53Sql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding])) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    round(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
      |        FOR i IN range(1, len(q.embedding) + 1)]) / (q.nrm * c.nrm), 6) AS cos
      |  FROM e q JOIN e c ON q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT q_id, n_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
      |  FROM scored)
      |SELECT q_id, n_id, cos, rank FROM ranked
      |WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  // --- 54. random-hyperplane LSH ANN (rows-check; recall vs q53 in spec) -
  /** 8 deterministic pseudo-random hyperplanes → 8-bit sign bucket; each
    * query scores only its bucket. Integer-formula planes keep the op
    * reproducible without any stored model. */
  val NumPlanes = 8

  private def planeComponent(p: Int, j: Column): Column =
    ((lit(p) * 31 + j * 17) % 13 - 6).cast("double")

  private def bucketOf(emb: Column): Column =
    (0 until NumPlanes).map { p =>
      val d = aggregate(zip_with(emb, sequence(lit(0), size(emb) - 1),
        (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  def q54(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
      .withColumn("bucket", bucketOf(col("embedding")))
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"), col("bucket"))
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding").as("e_n"),
      col("nrm").as("n_n"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", round(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"), col("bucket"))
      .orderBy(col("q_id"), col("rank"))
  }

  // --- 56b. IVF-style ANN (coarse quantizer = per-label centroids) ------
  /** The 100 TB ANN path: a small centroid table (the coarse quantizer —
    * here the per-label centroids, i.e. a k-means that already converged)
    * is broadcast; every vector/query is assigned to its nearest
    * centroid (nprobe=1); search runs inside the cell only. Corpus scan
    * is one pass, candidates shrink by ~|cells|×. Recall vs q53 measured
    * in SimilaritySpec. */
  def q61(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    // centroid per label: decimal-exact per-dim means, assembled to array
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("dc"))
      .select(col("label").as("cell_id"),
        transform(col("dc"), x => x.getField("c").cast("float")).as("centroid"))
    val cells = cent.select(col("cell_id"), col("centroid"))
    // assign = argmax cosine against the broadcast centroid table
    def assign(df: DataFrame, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell_id"))
      df.crossJoin(broadcast(cells))
        .withColumn("ccos", vecDot(col("embedding"), col("centroid")) /
          (col("nrm") * vecNorm(col("centroid"))))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .drop("ccos", "crn", "centroid")
    }
    val corpus = assign(e, "vec_id")
      .select(col("vec_id").as("n_id"), col("embedding").as("e_n"),
        col("nrm").as("n_n"), col("cell_id"))
    val queries = assign(e.filter(col("vec_id") % 50 === 0), "vec_id")
      .select(col("vec_id").as("q_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"), col("cell_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    corpus.join(broadcast(queries), Seq("cell_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", round(dot(col("e_q"), col("e_n")) / (col("n_q") * col("n_n")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"), col("cell_id"))
      .orderBy(col("q_id"), col("rank"))
  }

  // --- 55. per-label vector statistics ----------------------------------
  /** Centroid via decimal-exact per-dimension sums (order-independent →
    * cross-engine deterministic); norms folded sequentially. */
  def q55(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val dims = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("v").cast("decimal(18,9)")).cast("double") / count(lit(1))).as("c"))
    val centroidNorm = dims.groupBy(col("label"))
      .agg(round(sqrt(sum(col("c") * col("c"))), 6).as("centroid_norm"))
    val norms = e.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("nrm").cast("decimal(18,9)")).cast("double") / count(lit(1)), 6)
          .as("avg_norm"))
    norms.join(centroidNorm, "label")
      .select(col("label"), col("n_vectors"), col("centroid_norm"), col("avg_norm"))
      .orderBy(col("label"))
  }

  val q55Sql: String =
    """WITH x AS (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding) AS v
      |  FROM embeddings),
      |cd AS (
      |  SELECT label, dim,
      |    CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
      |  FROM x GROUP BY label, dim),
      |cn AS (SELECT label, round(sqrt(SUM(c * c)), 6) AS centroid_norm FROM cd GROUP BY label),
      |vn AS (
      |  SELECT label, COUNT(*) AS n_vectors,
      |    round(CAST(SUM(CAST(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding]))
      |      AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
      |  FROM embeddings GROUP BY label)
      |SELECT label, n_vectors, centroid_norm, avg_norm
      |FROM vn JOIN cn USING (label)
      |ORDER BY label""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q53_knn_brute", q53, Some(q53Sql)),
    Op("q54_ann_lsh", q54, None),
    Op("q55_vector_stats", q55, Some(q55Sql)),
    Op("q61_ann_ivf", q61, None),
  )
}
