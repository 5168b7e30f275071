package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.Op.SUM_D
import graft.functions.Num.dsum

/** Bucketed-table storage path (SURVEY §2 r4, q93).
  *
  * The 100 TB fact-fact join strategy: pay the shuffle ONCE at write
  * time — both tables bucketed (and sorted) on the join key — and every
  * subsequent join on that key plans with no exchange on either side;
  * co-location replaces the network. This operator is deliberately
  * write-then-query: the write IS the operator (the storage layout is
  * the optimization), and the query half shows the layout is
  * transparent to results. Correctness is oracle-checked against the
  * plain parquet join; the no-shuffle plan shape of the big-big path is
  * pinned in BucketJoinSpec (with broadcast disabled — at test SF the
  * optimizer correctly prefers broadcasting the small side, which
  * bucketing must not and does not break).
  *
  * Bucket files live under a per-application path in the system temp
  * dir (concurrent JVMs — test forks beside Bench — must not clobber
  * each other's layout; the q105 artifact rule), cleaned at JVM exit
  * via the artifact registry. The write runs ONCE per corpus snapshot
  * (r18; the q105/q122/q126 standing-artifact convention): the
  * operator's own 100 TB story is "pay the shuffle once at write time,
  * every subsequent join rides the layout", so rebuilding both tables
  * on every invocation measured the opposite of the design; the
  * registered entry now measures the amortized bucketed join, the
  * production steady state. Rebuild triggers: corpus dir change or
  * missing catalog tables. Results are unchanged (the readout is the
  * same join; the oracle replays the plain-parquet join each run).
  */
object Bucketed {
  val Buckets = 8

  // session-lifetime guard: which corpus the bucketed layout describes
  private var bucketedDir: Option[String] = None

  private[operators] def q93Base(s: SparkSession): java.io.File =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_bucketed-${s.sparkContext.applicationId}")

  /** Build the bucketed layout for `dir` unless the live layout already
    * describes it (tables present in this session's catalog AND built
    * from the same dir). */
  private[operators] def q93Ensure(s: SparkSession, dir: String): Unit = {
    val base = q93Base(s)
    val haveTables = s.catalog.tableExists("g93_orders") &&
      s.catalog.tableExists("g93_lineitem")
    if (!bucketedDir.contains(dir) || !haveTables) {
      graft.TempArtifacts.register(base)
      Seq("g93_orders", "g93_lineitem").foreach(reset(s, base, _))
      Tables.orders(s, dir)
        .write.bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", new java.io.File(base, "g93_orders").getAbsolutePath)
        .mode("overwrite").saveAsTable("g93_orders")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", new java.io.File(base, "g93_lineitem").getAbsolutePath)
        .mode("overwrite").saveAsTable("g93_lineitem")
      bucketedDir = Some(dir)
    }
  }

  private[operators] def reset(s: SparkSession, base: java.io.File, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // retired/in-flight generation tables from a previous build of the
    // same artifact (graft.GenManifest catalog) go with it
    import scala.jdk.CollectionConverters._
    s.catalog.listTables().collectAsList().asScala.map(_.name)
      .filter(n => n.startsWith(s"${table}_r") || n.startsWith(s"${table}_c"))
      .foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
    graft.GenManifest.reset(base, table)
    // the in-memory catalog is fresh per JVM: orphaned file locations
    // from a previous run survive DROP TABLE, so clear them on disk too
    // (generation payload dirs `{table}_g*` included)
    val stale = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName == table || f.getName.startsWith(s"${table}_g"))
    stale.foreach(graft.GenManifest.rmTree)
  }

  def q93(s: SparkSession, dir: String): DataFrame = {
    q93Ensure(s, dir)
    s.table("g93_lineitem")
      .join(s.table("g93_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q93Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n, ${SUM_D("l_extendedprice")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q93_bucketed_join", q93, Some(q93Sql)),
  )
}
