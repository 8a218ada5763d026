package graft.jdbc

import java.sql.{Connection, Statement}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Exercises the JDBC script runner against a recording in-memory driver
 * (no database engine ships in this environment).
 */
class DatabaseUtilsSpec extends AnyFunSuite with Matchers {
  import DatabaseUtilsSpec._

  test("runScripts executes every script and closes statement + connection") {
    Recording.reset()
    DatabaseUtils.runScriptsWith(() => mockConnection(),
      "CREATE TABLE t (x INT)", "INSERT INTO t VALUES (1)")
    Recording.executed.toList shouldBe List("CREATE TABLE t (x INT)", "INSERT INTO t VALUES (1)")
    Recording.closed.toList shouldBe List("statement", "connection")
  }

  test("a failing script still closes resources and surfaces the error") {
    Recording.reset()
    val e = intercept[RuntimeException] {
      DatabaseUtils.runScriptsWith(() => mockConnection(), "BOOM", "NEVER RUN")
    }
    e.getMessage shouldBe "sql failed: BOOM"
    Recording.executed.toList shouldBe List("BOOM")
    Recording.closed.toList shouldBe List("statement", "connection")
  }
}

object DatabaseUtilsSpec {
  object Recording {
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val closed = scala.collection.mutable.ArrayBuffer.empty[String]
    def reset(): Unit = { executed.clear(); closed.clear() }
  }

  private def proxy[T <: AnyRef](cls: Class[T])(handle: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      (_, method, args) => {
        val key = (method.getName, Option(args).getOrElse(Array.empty[AnyRef]))
        if (handle.isDefinedAt(key)) handle(key)
        else method.getReturnType match {
          case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
          case java.lang.Integer.TYPE => Integer.valueOf(0)
          case _ => null
        }
      }).asInstanceOf[T]

  def mockConnection(): Connection =
    proxy(classOf[Connection]) {
      case ("createStatement", _) =>
        proxy(classOf[Statement]) {
          case ("executeUpdate", stArgs) =>
            val sql = stArgs(0).asInstanceOf[String]
            Recording.executed += sql
            if (sql == "BOOM") throw new RuntimeException("sql failed: BOOM")
            Integer.valueOf(1)
          case ("close", _) => Recording.closed += "statement"; null
        }
      case ("close", _) => Recording.closed += "connection"; null
    }
}
