package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session
  override def afterAll(): Unit = () // session shared across suites
}

object SparkSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.catalog.graft", "graft.lake.sql.GraftSqlCatalog")
    .config("spark.sql.catalog.graft.warehouse",
      graft.ScratchDirs.create("graft-sqlwh-").toString)
    .config("spark.ui.enabled", "false")
    // Standing guard: no engine code path may funnel a large result
    // through the driver. Any test that tries to collect >32 MiB of
    // task results fails loudly instead of silently scaling O(data).
    .config("spark.driver.maxResultSize", "32m")
    .getOrCreate()
}
