package graft.jdbc

import java.sql.DriverManager
import java.util.Properties

import graft.util.{Logging, ManagedIO}

/** JDBC helpers (reference core DatabaseUtils.scala:24-36). */
object DatabaseUtils extends Logging {

  /** Run SQL scripts against a JDBC url, closing connection and statement in all cases. */
  def runScripts(url: String, properties: Properties, scripts: String*): Unit =
    for {
      connection <- ManagedIO(DriverManager.getConnection(url, properties))
      statement <- ManagedIO(connection.createStatement)
      sql <- scripts
    } {
      logger.info(s"executing SQL script on $url: $sql")
      statement.executeUpdate(sql)
    }
}
