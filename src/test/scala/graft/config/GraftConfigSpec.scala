package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.concurrent.duration._

class GraftConfigSpec extends AnyFunSuite with Matchers {

  private val config = GraftConfig(
    "spark.master" -> "local[2]",
    "retry.max" -> "5",
    "retry.delay" -> "30 seconds",
    "flag" -> "true",
    "millis" -> "1500")

  test("typed getters") {
    config("spark.master") shouldBe "local[2]"
    config.getInt("retry.max") shouldBe Some(5)
    config.getBoolean("flag") shouldBe Some(true)
    config.getInt("missing") shouldBe None
    a[NoSuchElementException] should be thrownBy config("missing")
  }

  test("durations parse strings and bare millisecond counts") {
    config.getDuration("retry.delay") shouldBe Some(30.seconds)
    config.getDuration("millis") shouldBe Some(1500.millis)
    GraftConfig("d" -> "500ms").getDuration("d") shouldBe Some(500.millis)
  }

  test("scoped strips the prefix") {
    val retry = config.scoped("retry")
    retry.getInt("max") shouldBe Some(5)
    retry.get("spark.master") shouldBe None
  }

  test("hasPath sees both leaves and subtrees") {
    config.hasPath("retry") shouldBe true
    config.hasPath("retry.max") shouldBe true
    config.hasPath("nope") shouldBe false
  }

  test("withFallback: our keys win") {
    val merged = GraftConfig("a" -> "1").withFallback(GraftConfig("a" -> "2", "b" -> "3"))
    merged("a") shouldBe "1"
    merged("b") shouldBe "3"
  }

  test("fromEnv imports only GRAFT_ variables, lowercased and dotted") {
    val env = Map("GRAFT_RETRY_MAX" -> "7", "PATH" -> "/bin", "GRAFT_MESSAGING_TRANSPORT" -> "memory")
    val c = GraftConfig.fromEnv(env)
    c.getInt("retry.max") shouldBe Some(7)
    c("messaging.transport") shouldBe "memory"
    c.get("path") shouldBe None
  }

  test("getPropertiesFile loads a referenced file, empty when absent, fails when missing") {
    val file = java.nio.file.Files.createTempFile("graft", ".properties")
    java.nio.file.Files.writeString(file, "user=john\npass=secret\n")
    val c = GraftConfig("database.properties" -> file.toString)
    val props = c.getPropertiesFile("database.properties")
    props.getProperty("user") shouldBe "john"
    props.getProperty("pass") shouldBe "secret"
    c.getPropertiesFile("absent.key").isEmpty shouldBe true
    a[java.io.FileNotFoundException] should be thrownBy
      GraftConfig("p" -> "/does/not/exist.properties").getPropertiesFile("p")
  }

  test("properties round trip") {
    val props = new java.util.Properties()
    props.setProperty("x.y", "z")
    GraftConfig.fromProperties(props)("x.y") shouldBe "z"
  }
}
