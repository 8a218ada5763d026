package graft.util

import scala.util.control.NonFatal

/**
 * Minimal resource management over `AutoCloseable` with for-comprehension
 * support: the body runs against the opened resource, the resource closes
 * on every path, and a close failure surfaces only when the body itself
 * succeeded (matching the API contract of the reference's core
 * ManagedIO.scala:24-41, re-expressed here as plain try/finally
 * suppression rather than `Try` composition).
 *
 * {{{
 * for {
 *   conn <- ManagedIO(DriverManager.getConnection(url))
 *   stmt <- ManagedIO(conn.createStatement)
 * } stmt.executeUpdate(sql)
 * }}}
 *
 * Note the eager-open semantics: `ManagedIO(open)` acquires immediately
 * (an open failure is captured and rethrown when the value is used), and
 * each `map`/`flatMap`/`foreach` call runs one acquire-use-release cycle.
 */
final class ManagedIO[T <: AutoCloseable] private (acquired: Either[Throwable, T]) {

  def map[U](f: T => U): U = use(f)
  def flatMap[U <: AutoCloseable](f: T => ManagedIO[U]): ManagedIO[U] = use(f)
  def foreach(f: T => Unit): Unit = use(f)

  private def use[U](f: T => U): U = acquired match {
    case Left(openFailure) => throw openFailure
    case Right(resource) =>
      var bodyFailed = false
      try f(resource)
      catch {
        case e: Throwable =>
          bodyFailed = true
          throw e
      } finally {
        try resource.close()
        catch {
          // the body's failure is the primary signal; a close failure on
          // top of it is suppressed (close-after-success still throws)
          case closeFailure: Throwable => if (!bodyFailed) throw closeFailure
        }
      }
  }
}

object ManagedIO {
  def apply[T <: AutoCloseable](open: => T): ManagedIO[T] =
    new ManagedIO(
      try Right(open)
      catch { case NonFatal(e) => Left(e) })
}
