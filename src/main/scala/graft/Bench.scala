package graft

import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every registered query at SPARK_GRAFT_SF_DIR,
  * print ONE JSON line at the end plus per-query progress on stderr.
  *
  * Queries execute against the `noop` sink so the full plan runs (a bare
  * count() would let Catalyst collapse projections to a metadata-only
  * scan). Each query gets a wall-clock budget (SPARK_GRAFT_QUERY_TIMEOUT,
  * default 120 s) enforced by job-group cancellation, so one pathological
  * plan cannot eat the whole bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val perQuerySec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "120").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val ec: ExecutionContext = ExecutionContext.global

    // warm the JVM/codegen paths once so the first measured query isn't
    // charged ~5 s of JIT + classloading (the cluster-steady-state number
    // is the meaningful one)
    try graft.sources.Tables.names.foreach { n =>
      graft.sources.Tables(spark, sfDir, n).limit(1000)
        .write.mode("overwrite").format("noop").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    // dev-loop filter: SPARK_GRAFT_ONLY=q_a,q_simhash runs the matching
    // prefixes only; unset (the driver's mode) runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val fut = Future {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      val ok =
        try { Await.result(fut, perQuerySec.seconds); true }
        catch {
          case _: TimeoutException =>
            spark.sparkContext.cancelJobGroup(name)
            System.err.println(s"[bench] $name TIMED OUT after ${perQuerySec}s")
            false
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      spark.sparkContext.clearJobGroup()
      val sec = (System.nanoTime() - t0) / 1e9
      // isolation between queries: drop any cache a query leaked and nudge
      // GC so one allocation-heavy plan doesn't tax its successors' numbers.
      // catalog.clearCache only drops SQL-cached relations — localCheckpoint
      // blocks live as persisted RDDs and otherwise linger until the
      // ContextCleaner happens to run, taxing every later query's memory
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      // gc= is the JVM-wide collector time that overlapped this query — the
      // fingerprint of a cross-query-memory-pressure outlier (high gc share)
      // vs a genuinely slow plan (low gc share) when reading driver-run logs
      System.err.println(
        f"[bench] $name%-28s ${sec}%8.2fs gc=${gcMs - gc0}%dms ${if (ok) "" else "(FAILED)"}")
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
