package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local JVM session, UTC, small
  * shuffle fan-out, ns-parquet compat (see Tables.events). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Drop spec-owned catalog tables AND any orphaned warehouse
    * directory a previous (crashed or drop-less) session left behind
    * — a fresh session's catalog is empty, so DROP alone cannot
    * clear leftovers and the next managed CREATE fails with
    * LOCATION_ALREADY_EXISTS. */
  def dropTables(names: String*): Unit = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.build(4, appName = "graft-test")
    // specs drive streams with addData + processAllAvailable and then
    // stop(); the engine's self-triggered NO-DATA batches race that
    // stop and abort mid-commit, spraying benign-but-ERROR-level
    // CANNOT_WRITE_STATE_STORE traces over green runs. Timeout/
    // watermark progress the suites rely on still fires in data
    // batches (the TTL spec passes with this off — asserted there).
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    s
  }
}
