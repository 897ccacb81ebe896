package graft.ingest

import java.sql.{BatchUpdateException, Connection, DriverManager, PreparedStatement, Statement}

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The C3 partial-success seam beyond a single backend (r25 verdict task 5).
  *
  * Adjudication: the verdict suggested "H2 + Derby already on classpath",
  * but this zero-egress image ships exactly ONE real JDBC engine — Derby
  * (`/opt/spark/jars/derby-*.jar`); H2/HSQLDB/SQLite exist nowhere on the
  * offline classpath or coursier cache. The task's intent — prove the
  * batched-append accounting is not an artifact of one backend's failure
  * shape — is closed with the two arms a closed world admits:
  *
  *   1. Derby IN-MEMORY subprotocol (`jdbc:derby:memory:`): the same
  *      engine through a different storage/connection path, driven through
  *      Spark's full executor-side `format("jdbc")` writer.
  *   2. A BigQuery-shaped batch-RPC dialect ([[BatchRpc]]): a minimal
  *      in-spec `java.sql.Driver` whose `executeBatch` implements the JDBC
  *      contract for PARTIAL batch failure — good rows land, bad rows get
  *      `Statement.EXECUTE_FAILED` statuses inside a
  *      `BatchUpdateException` — which is exactly the failure shape of the
  *      reference's sink (`/root/reference/main.py:448-468`:
  *      `insert_rows_json` inserts clean rows and returns per-row errors;
  *      the loop records "Batch N errors: ..." and CONTINUES, and
  *      `inserted` counts only fully-clean batches). Derby cannot produce
  *      this shape: its constraint violation aborts the whole statement.
  *
  * The second arm also pins the reference's documented at-least-once
  * discrepancy: a batch with per-row errors is counted as NOT inserted
  * even though its clean rows reached the backend — the same accounting
  * drift `main.py` accepts, made observable here.
  */
class SinkJdbcDialectsSpec extends AnyFunSuite with SparkSpec {

  // Derby writes derby.log at derby.system.home (default: cwd — which
  // left debris at the repo root, r26 verdict task 8). Point it at a temp
  // dir BEFORE the engine loads; only this suite touches Derby, so the
  // constructor runs early enough.
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby-home").toString)

  // ---- arm 1: Derby in-memory through Spark's full JDBC writer -----------

  private def memDb(name: String): String = s"jdbc:derby:memory:$name;create=true"

  test("Derby in-memory: C2 probe + C3 partial success through Spark's JDBC writer") {
    import spark.implicits._
    val url = memDb("dialects_c3")
    assert(!SinkJdbc.tableExists(url, "dest"))
    SinkJdbc.init(url, "dest", "v INT NOT NULL CHECK (v < 100)")
    assert(SinkJdbc.tableExists(url, "dest"))
    // batches [1,2,3] [4,5,999] [7,8] — the middle batch violates the CHECK
    val res = SinkJdbc.appendBatched(
      Seq(1, 2, 3, 4, 5, 999, 7, 8).toDF("v").coalesce(1), url, "dest", batchSize = 3)
    assert(res.attemptedBatches == 3)
    assert(res.batchErrors.size == 1 && res.batchErrors.head.contains("Batch 2"))
    assert(res.insertedRows == 5)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "dest").load()
      .select("v").collect().map(_.getInt(0)).sorted
    assert(back.toSeq == Seq(1, 2, 3, 7, 8))
  }

  // ---- arm 2: the BigQuery-shaped batch-RPC dialect -----------------------

  /** Minimal JDBC surface for a row-batched insert RPC with PER-ROW errors.
    * Rows > `rejectOver` fail individually: `executeBatch` lands the clean
    * rows and throws `BatchUpdateException` with per-row statuses — the
    * JDBC-spec shape of a partially-failed batch. State is static because
    * DriverManager owns driver instances.
    */
  private object BatchRpc {
    val URL = "jdbc:graftrpc:sink"
    val landed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var rejectOver: Long = Long.MaxValue
    def reset(rejectOver: Long): Unit = { landed.clear(); this.rejectOver = rejectOver }

    private def proxy[T](clazz: Class[T])(
        handler: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
      java.lang.reflect.Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
        (_, m, args) => {
          val a: Seq[AnyRef] = if (args == null) Nil else args.toSeq
          val key = (m.getName, a)
          if (handler.isDefinedAt(key)) handler(key)
          else m.getName match {
            case "close" | "clearBatch" | "setAutoCommit" | "commit" => null
            case "isClosed" => java.lang.Boolean.FALSE
            case "toString" => s"BatchRpc(${clazz.getSimpleName})"
            case other => throw new UnsupportedOperationException(s"BatchRpc: $other")
          }
        }).asInstanceOf[T]

    private def newStatement(): PreparedStatement = {
      var current: Long = 0L
      val batch = scala.collection.mutable.ArrayBuffer.empty[Long]
      proxy(classOf[PreparedStatement]) {
        case ("setLong", Seq(_, v: java.lang.Long)) => current = v; null
        case ("setInt", Seq(_, v: java.lang.Integer)) => current = v.longValue(); null
        case ("addBatch", Seq()) => batch += current; null
        case ("executeBatch", Seq()) =>
          val statuses = batch.map { v =>
            if (v > rejectOver) Statement.EXECUTE_FAILED
            else { landed.add(v); 1 }
          }.toArray
          val bad = statuses.zipWithIndex.collect {
            case (Statement.EXECUTE_FAILED, i) => i
          }
          batch.clear()
          if (bad.nonEmpty)
            throw new BatchUpdateException(
              s"rows ${bad.mkString(",")} rejected: value over $rejectOver",
              "22003", 0, statuses, null)
          statuses
      }
    }

    private def newConnection(): Connection = proxy(classOf[Connection]) {
      case ("prepareStatement", Seq(_: String)) => newStatement()
    }

    val driver: java.sql.Driver = proxy(classOf[java.sql.Driver]) {
      case ("acceptsURL", Seq(u: String)) => java.lang.Boolean.valueOf(u == URL)
      case ("connect", Seq(u: String, _)) => if (u == URL) newConnection() else null
    }
  }

  /** The per-batch writer for the RPC dialect: the raw JDBC batch API
    * (prepare → setLong/addBatch per row → ONE executeBatch), the direct
    * analogue of the reference's one `insert_rows_json` call per batch.
    * Driver-side collect is the test double's simplification — the
    * executor-parallel path is arm 1's real Spark writer.
    */
  private def rpcWriter(url: String): (org.apache.spark.sql.DataFrame, Long) => Unit =
    (df, _) => {
      val conn = DriverManager.getConnection(url)
      try {
        val ps = conn.prepareStatement("INSERT INTO sink (v) VALUES (?)")
        try {
          df.select("v").collect().foreach { r => ps.setLong(1, r.getLong(0)); ps.addBatch() }
          ps.executeBatch(): Unit
        } finally ps.close()
      } finally conn.close()
    }

  test("batch-RPC dialect: per-row errors inside a batch — reference accounting, at-least-once drift observable") {
    import spark.implicits._
    DriverManager.registerDriver(BatchRpc.driver)
    try {
      BatchRpc.reset(rejectOver = 100L)
      // batches [1,2,3] [4,999,6] [7,8]: batch 2 carries ONE bad row — the
      // per-row failure shape Derby cannot produce
      val df = Seq(1L, 2L, 3L, 4L, 999L, 6L, 7L, 8L).toDF("v").coalesce(1)
      val res = Sink.appendBatched(df, path = "sink", batchSize = 3,
        writeBatchOpt = Some(rpcWriter(BatchRpc.URL)))
      // reference semantics (main.py:448-468): the loop CONTINUES past the
      // failed batch, records its per-row error, and counts only fully
      // clean batches as inserted
      assert(res.attemptedBatches == 3)
      assert(res.insertedRows == 5, "only the two clean batches count")
      assert(res.batchErrors.size == 1)
      assert(res.batchErrors.head.contains("Batch 2"), res.batchErrors.head)
      assert(res.batchErrors.head.contains("rows 1 rejected"),
        s"per-row indexes must survive into the error report: ${res.batchErrors.head}")
      // the at-least-once drift the reference accepts: batch 2's clean rows
      // (4, 6) DID land even though the batch is not counted as inserted
      val landed = BatchRpc.landed.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
      assert(landed.toSeq == Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L))
    } finally DriverManager.deregisterDriver(BatchRpc.driver)
  }

  test("batch-RPC dialect: a fully clean run accounts every batch and row") {
    import spark.implicits._
    DriverManager.registerDriver(BatchRpc.driver)
    try {
      BatchRpc.reset(rejectOver = Long.MaxValue)
      val res = Sink.appendBatched((1L to 10L).toDF("v").coalesce(1),
        path = "sink", batchSize = 4, writeBatchOpt = Some(rpcWriter(BatchRpc.URL)))
      assert(res.insertedRows == 10 && res.attemptedBatches == 3 && res.batchErrors.isEmpty)
      assert(BatchRpc.landed.size == 10)
    } finally DriverManager.deregisterDriver(BatchRpc.driver)
  }
}
