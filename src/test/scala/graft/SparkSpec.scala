package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    // the events fixture stores TIMESTAMP(NANOS); read as long nanos
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // catalog tables (bucketing tests) land in a temp dir, not the cwd
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh_spec").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
