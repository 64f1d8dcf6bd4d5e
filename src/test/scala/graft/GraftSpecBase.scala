package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs; sf0.001 keeps tests fast. */
trait GraftSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder(appName = "graft-test", master = "local[4]", shufflePartitions = 4).getOrCreate()

  override def afterAll(): Unit = {
    // shared across suites in one forked JVM; do not stop between suites
    super.afterAll()
  }
}
