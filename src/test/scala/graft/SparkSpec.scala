package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one per suite (JVM-cached across suites). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = Engine.session(
    appName = "graft-test", master = "local[4]", shufflePartitions = 4,
    warehouseDir = Some(
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
}
