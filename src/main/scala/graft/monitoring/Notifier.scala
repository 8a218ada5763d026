package graft.monitoring

import graft.config.GraftConfig
import graft.util.Logging

/**
 * Human-facing job notifications — the reference posts to a Slack webhook
 * (reference core Slack.scala:24-67). graft keeps the same message shape
 * (job, state, emoji-coded severity, attached error) behind a transport
 * interface; the default transport logs, since this environment has no
 * network egress. A webhook transport would only override `send`.
 */
object Notifier {
  sealed abstract class Severity(val emoji: String)
  case object Info extends Severity(":information_source:")
  case object Good extends Severity(":white_check_mark:")
  case object Warn extends Severity(":warning:")
  case object Error extends Severity(":rotating_light:")

  case class Notification(job: String, severity: Severity, text: String, error: Option[String] = None) {
    def toPayload: String = Json.obj(
      "username" -> job,
      "icon_emoji" -> severity.emoji,
      "text" -> (text + error.fold("")(e => s"\n```$e```")))
  }

  def create(config: GraftConfig): Notifier =
    config.get("notifier.transport") match {
      case Some("memory") => new InMemoryNotifier
      case _ => new LogNotifier
    }
}

trait Notifier {
  def send(notification: Notifier.Notification): Unit

  final def jobStarted(job: String): Unit =
    send(Notifier.Notification(job, Notifier.Info, s"Job $job started"))
  final def jobCompleted(job: String): Unit =
    send(Notifier.Notification(job, Notifier.Good, s"Job $job completed"))
  final def jobFailed(job: String, failure: Throwable): Unit =
    send(Notifier.Notification(job, Notifier.Error, s"Job $job failed",
      Some(s"${failure.getClass.getName}: ${failure.getMessage}")))
}

class LogNotifier extends Notifier with Logging {
  override def send(n: Notifier.Notification): Unit = logger.info(n.toPayload)
}

class InMemoryNotifier extends Notifier {
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[Notifier.Notification]
  override def send(n: Notifier.Notification): Unit = buffer.synchronized { buffer += n; () }
  def notifications: Seq[Notifier.Notification] = buffer.synchronized(buffer.toVector)
}
