package graft.jdbc

import java.sql.{Connection, DriverManager}
import java.util.Properties

import graft.util.{Logging, ManagedIO}

/** JDBC helpers (reference core DatabaseUtils.scala:24-36). */
object DatabaseUtils extends Logging {

  /** Run SQL scripts against a JDBC url, closing connection and statement in all cases. */
  def runScripts(url: String, properties: Properties, scripts: String*): Unit =
    runScriptsWith(() => DriverManager.getConnection(url, properties), scripts: _*)

  /** Same, with an injectable connection factory (testing, pooling). */
  def runScriptsWith(connect: () => Connection, scripts: String*): Unit =
    for {
      connection <- ManagedIO(connect())
      statement <- ManagedIO(connection.createStatement)
      sql <- scripts
    } {
      logger.info(s"executing SQL script: $sql")
      statement.executeUpdate(sql)
    }
}
