package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryNamePrefix...] — the optional prefixes
    // restrict the dump for local iteration; the driver passes none.
    val Array(sfDir, outDir) = args.take(2)
    val wanted = args.drop(2).toSeq
    def selected(name: String): Boolean =
      wanted.isEmpty || wanted.exists(name.startsWith)
    // Default 8, not nproc: this container advertises 32 CPUs but its
    // effective CPU quota is far lower (measured: local[32] runs the
    // md5/shingle-heavy queries ~10-20x SLOWER than local[8] from
    // oversubscription). The driver can override via SPARK_GRAFT_CPUS.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Driver-side partition discovery for the ≤256-directory index
      // stores (no listing Spark jobs), and nanos-timestamp handling set
      // once at session build (not per-call; see Tables.events).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Same local-FS I/O settings as Bench (guide §6): skip the .crc
      // sidecar filesystem and the fork-exec permission fallback, and
      // use the v2 output committer. Purely an I/O-layer choice — the
      // parquet bytes the oracle compares are identical.
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Queries are independent — release their transient barriers, but
      // keep the memoized shared tables warm (same fix as Bench,
      // VERDICT r6 #2/#3: a full clearCache made every consumer of the
      // shared signature/pair/frequency chain rebuild it per query,
      // which is exactly the wall-clock the driver's correctness gate
      // pays at sf0.01).
      graft.ops.SessionCaches.clearTransient(spark)
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
    spark.stop()
  }
}
