package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession + fixture-file helpers for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def sqlc = spark.sqlContext

  /** Write a fixture file into a fresh temp dir; returns the file path. */
  def fixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-fixture")
    dir.toFile.deleteOnExit()
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  def tempDir(): Path = {
    val dir = Files.createTempDirectory("graft-out")
    dir.toFile.deleteOnExit()
    dir
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
