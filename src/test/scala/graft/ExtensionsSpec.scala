package graft

import graft.functions.{Entropy, PolyHash}
import graft.sources.Lookups
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import java.nio.file.Files

/** SQL-function registration via SparkSessionExtensions, and the CSV
  * lookup source (reference: TopDomains.scala). Own SparkSession — the
  * extension must be installed at session build time. */
class ExtensionsSpec extends AnyFlatSpec with Matchers {

  "GraftExtensions" should "register native expressions as SQL functions" in {
    val spark = SparkSpec.spark // shared session installs GraftExtensions
    val row = spark.sql(
      "SELECT string_entropy('abcdefg') AS e, poly_hash('hello') AS h").head()
    row.getDouble(0) shouldBe Entropy.stringEntropy("abcdefg") +- 1e-12
    row.getLong(1) shouldBe PolyHash.hash("hello", 31L)
    // DuckDB-verified golden for the same fold: list_reduce over ascii
    row.getLong(1) shouldBe 99162322L
  }

  "Lookups.topDomains" should "load rank,domain CSVs as a first-label set" in {
    val spark = SparkSpec.spark
    val f = Files.createTempDirectory("top").resolve("top-1m.csv").toFile
    val w = new java.io.PrintWriter(f)
    w.println("1,google.com"); w.println("2,youtube.co.uk"); w.println("3,google.de")
    w.close()
    Lookups.topDomains(spark, f.getAbsolutePath) shouldBe Set("google", "youtube")
  }
}
