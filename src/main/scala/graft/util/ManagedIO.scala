package graft.util

import scala.util.Try

/**
 * Minimal resource-management monad over `AutoCloseable`: resources opened in
 * a for-comprehension are closed (in all cases) when the body completes, and
 * close failures only surface when the body itself succeeded
 * (reference core ManagedIO.scala:24-41).
 *
 * {{{
 * for {
 *   conn <- ManagedIO(DriverManager.getConnection(url))
 *   stmt <- ManagedIO(conn.createStatement)
 * } stmt.executeUpdate(sql)
 * }}}
 */
case class ManagedIO[T <: AutoCloseable](resource: Try[T]) {
  def flatMap[U <: AutoCloseable](f: T => ManagedIO[U]): ManagedIO[U] = run(f)
  def map[U](f: T => U): U = run(f)
  def foreach(f: T => Unit): Unit = run(f)

  private def run[U](f: T => U): U = {
    val result = resource.flatMap(r => Try(f(r)))
    val closed = resource.flatMap(r => Try(r.close()))
    if (result.isSuccess) closed.get
    result.get
  }
}

object ManagedIO {
  def apply[T <: AutoCloseable](open: => T): ManagedIO[T] = ManagedIO(Try(open))
}
