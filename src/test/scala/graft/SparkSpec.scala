package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test harness: one SparkSession per suite (lazy), small local
  * parallelism, UTC — mirrors the driver's Verify session. */
trait SparkSpec extends AnyFunSuite {
  // Derby (JdbcSourceSpec's embedded db) writes derby.log into the cwd
  // unless told otherwise — keep the repo root clean
  System.setProperty("derby.stream.error.file",
    new java.io.File("target/derby.log").getAbsolutePath)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** The in-pass `maxGroupRows` guards raise from executor tasks via
    * `raise_error`, so the driver sees a SparkException chain rather
    * than a call-time require. Runs `body` (which must contain an
    * ACTION — the guard lives in the data pass) and asserts every
    * needle appears somewhere in the failure's cause-chain messages. */
  def interceptGuard(needles: String*)(body: => Any): Unit = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    needles.foreach(n => assert(msgs.contains(n), s"'$n' not in:\n$msgs"))
  }
}
