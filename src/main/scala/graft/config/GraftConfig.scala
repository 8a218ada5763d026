package graft.config

import java.io.FileInputStream
import java.util.Properties

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._
import scala.util.Try

/**
 * Zero-dependency typed configuration: an immutable key-value map with typed
 * getters, prefix scoping and layered fallbacks. Fills the role of the
 * reference's typesafe-config + Ficus readers (reference core
 * ConfigLoader.scala:29-47) without the external dependency — keys are
 * dotted paths, values come from properties files, the environment, or code.
 *
 * {{{
 * val config = GraftConfig.fromEnv().withFallback(GraftConfig.fromPropertiesFile(path))
 * val retry  = RetryOptions.fromConfig(config.scoped("retry"))
 * }}}
 */
final case class GraftConfig(entries: Map[String, String]) {

  def get(key: String): Option[String] = entries.get(key)
  def apply(key: String): String =
    entries.getOrElse(key, throw new NoSuchElementException(s"missing config key: $key"))

  def getOrElse(key: String, default: => String): String = entries.getOrElse(key, default)
  def getInt(key: String): Option[Int] = get(key).flatMap(v => Try(v.trim.toInt).toOption)
  def getLong(key: String): Option[Long] = get(key).flatMap(v => Try(v.trim.toLong).toOption)
  def getBoolean(key: String): Option[Boolean] =
    get(key).flatMap(v => Try(v.trim.toBoolean).toOption)

  /** Durations accept "500ms", "10s", "2 minutes", or bare millisecond counts. */
  def getDuration(key: String): Option[FiniteDuration] =
    get(key).flatMap { v =>
      Try(Duration(v.trim)).toOption.collect { case d: FiniteDuration => d }
        .orElse(Try(v.trim.toLong.millis).toOption)
    }

  def hasPath(key: String): Boolean =
    entries.contains(key) || entries.keys.exists(_.startsWith(key + "."))

  /** Sub-config of every key under `prefix.`, with the prefix stripped. */
  def scoped(prefix: String): GraftConfig = {
    val p = prefix + "."
    GraftConfig(entries.collect { case (k, v) if k.startsWith(p) => k.drop(p.length) -> v })
  }

  /** Keys in `this` win over `other`. */
  def withFallback(other: GraftConfig): GraftConfig = GraftConfig(other.entries ++ entries)

  def set(key: String, value: String): GraftConfig = GraftConfig(entries + (key -> value))

  /**
   * The value of `key` names a properties file to load (reference core
   * ConfigLoader.scala `propertiesValueReader`): empty when the key is
   * absent, fails when the path does not exist — used for e.g. JDBC
   * credentials kept outside the main config.
   */
  def getPropertiesFile(key: String): Properties =
    get(key).fold(new Properties()) { path =>
      val props = new Properties()
      val in = new FileInputStream(path)
      try props.load(in)
      finally in.close()
      props
    }
}

object GraftConfig {
  val empty: GraftConfig = GraftConfig(Map.empty[String, String])

  def apply(pairs: (String, String)*): GraftConfig = GraftConfig(pairs.toMap)

  def fromProperties(props: Properties): GraftConfig =
    GraftConfig(props.asScala.toMap)

  def fromPropertiesFile(path: String): GraftConfig = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in)
    finally in.close()
    fromProperties(props)
  }

  /**
   * Environment variables as config keys: `GRAFT_RETRY_MAX` -> `retry.max`.
   * Only `GRAFT_`-prefixed variables are imported to avoid collisions.
   */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig =
    GraftConfig(env.collect {
      case (k, v) if k.startsWith("GRAFT_") =>
        k.stripPrefix("GRAFT_").toLowerCase.replace('_', '.') -> v
    })

  /** Standard layering: explicit overrides > env > properties file (if given). */
  def load(propertiesFile: Option[String] = None, overrides: GraftConfig = empty): GraftConfig =
    overrides
      .withFallback(fromEnv())
      .withFallback(propertiesFile.fold(empty)(fromPropertiesFile))
}
