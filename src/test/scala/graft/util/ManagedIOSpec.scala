package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports reference core ManagedIOSpec.scala behavior. */
class ManagedIOSpec extends AnyFunSuite with Matchers {

  private class Resource(name: String, log: collection.mutable.Buffer[String],
      failOnClose: Boolean = false) extends AutoCloseable {
    override def close(): Unit = {
      log += s"close:$name"
      if (failOnClose) sys.error(s"close $name failed")
    }
  }

  test("closes the resource after the body") {
    val log = collection.mutable.Buffer.empty[String]
    val result = ManagedIO(new Resource("a", log)).map { _ => log += "body"; 42 }
    result shouldBe 42
    log.toList shouldBe List("body", "close:a")
  }

  test("nested resources close innermost-first") {
    val log = collection.mutable.Buffer.empty[String]
    for {
      _ <- ManagedIO(new Resource("outer", log))
      _ <- ManagedIO(new Resource("inner", log))
    } log += "body"
    log.toList shouldBe List("body", "close:inner", "close:outer")
  }

  test("body failure still closes, and wins over close failure") {
    val log = collection.mutable.Buffer.empty[String]
    val boom = intercept[RuntimeException] {
      ManagedIO(new Resource("a", log, failOnClose = true)).map(_ => sys.error("body failed"))
    }
    boom.getMessage shouldBe "body failed"
    log.toList shouldBe List("close:a")
  }

  test("close failure surfaces when the body succeeded") {
    val log = collection.mutable.Buffer.empty[String]
    val boom = intercept[RuntimeException] {
      ManagedIO(new Resource("a", log, failOnClose = true)).map(_ => 1)
    }
    boom.getMessage shouldBe "close a failed"
  }

  test("open failure skips body and close") {
    var bodyRan = false
    a[RuntimeException] should be thrownBy {
      ManagedIO[AutoCloseable] { val r: AutoCloseable = sys.error("cannot open"); r }
        .map(_ => bodyRan = true)
    }
    bodyRan shouldBe false
  }
}
