package graft.util

import org.slf4j.{Logger, LoggerFactory}

/** Mixin providing a lazily-initialized slf4j logger (reference core Logging.scala:19-21). */
trait Logging {
  @transient protected lazy val logger: Logger = LoggerFactory.getLogger(getClass)
}
