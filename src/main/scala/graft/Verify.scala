package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: restrict to named queries (dev iteration only;
    // the driver always runs the full surface)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // dev-only master override (driver never sets it): the multi-JVM
    // invariance pass runs the SAME surface under local-cluster[2,16,m]
    // so shuffle blocks, broadcasts, and TypedImperativeAggregate partial
    // states cross a real process/serialization boundary (local[n] keeps
    // everything in one JVM and never exercises those paths)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      // data-size-derived shuffle parallelism via AQE coalescing — same
      // rationale and derivations as Bench (see the comments there); keeps
      // the correctness surface on the identical plan regime the bench runs
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", {
        def dirBytes(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
        val advisory = math.min(64L << 20, math.max(8L << 20,
          Runtime.getRuntime.maxMemory / cpus.toInt / 8))
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          math.min(4096L, math.max(cpus.toLong,
            dirBytes(new java.io.File(sfDir)) * 8 / advisory)).toString)
      })
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        math.min(64L << 20, math.max(8L << 20,
          Runtime.getRuntime.maxMemory / cpus.toInt / 8)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // read parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) directly as
      // the session's (UTC-pinned) TimestampType — skips the per-row NTZ->LTZ
      // cast Tables.t would otherwise add on every events scan
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // let the context cleaner reclaim checkpoint files of GC'd frames
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only speculative-attempt counter (driver never sets it): the
    // speculation-determinism pass must prove duplicate attempts actually
    // RACED (a run where zero tasks were speculated proves nothing), and
    // the WARN log level above hides the scheduler's INFO marking lines —
    // so count launched speculative attempts from the listener bus and
    // print the total as the artifact's evidence channel.
    val specCount = new java.util.concurrent.atomic.AtomicLong
    if (sys.env.get("SPARK_GRAFT_COUNT_SPECULATIVE").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskStart(
              e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
            if (e.taskInfo.speculative) { specCount.incrementAndGet(); () }
        })
    // reliable-checkpoint scratch for iterative queries (see Bench)
    val ckptDir = Files.createTempDirectory("graft-verify-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        // drop per-query persisted intermediates: the SQL cache AND any
        // RDD-level localCheckpoint blocks (clearCache can't reach the latter)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (sys.env.get("SPARK_GRAFT_COUNT_SPECULATIVE").contains("1"))
      System.err.println(s"[verify] speculative_attempts=${specCount.get}")
    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(ckptDir.toFile)
  }
}
