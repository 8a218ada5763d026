package graft.monitoring

import graft.config.GraftConfig
import graft.time.DateInterval
import graft.util.Logging

/** Process and stage lifecycle states (reference core monitoring/Events.scala:21-33). */
sealed trait StateRecord { def identifier: String = toString }
case object Processing extends StateRecord
case object Retrying extends StateRecord
case object Failed extends StateRecord
case object Complete extends StateRecord

case class RunEvent(
    jobId: String,
    processId: String,
    state: String,
    processingDate: String,
    timestamp: Long,
    duration: Long,
    message: String) {
  def toJson: String = Json.obj(
    "jobId" -> jobId, "processId" -> processId, "state" -> state,
    "processingDate" -> processingDate, "timestamp" -> timestamp,
    "duration" -> duration, "message" -> message)
}

case class StageEvent(
    jobId: String,
    processId: String,
    stage: String,
    state: String,
    timestamp: Long,
    duration: Long,
    message: String) {
  def toJson: String = Json.obj(
    "jobId" -> jobId, "processId" -> processId, "stage" -> stage,
    "state" -> state, "timestamp" -> timestamp, "duration" -> duration,
    "message" -> message)
}

case class MetricsEvent(
    jobId: String,
    processId: String,
    stage: String,
    timestamp: Long,
    metrics: Map[String, Double]) {
  def toJson: String = Json.obj(
    "jobId" -> jobId, "processId" -> processId, "stage" -> stage,
    "timestamp" -> timestamp,
    "metrics" -> Json.Raw(metrics.toSeq.sortBy(_._1).map { case (k, v) => Json.quote(k) + ":" + v }
      .mkString("{", ",", "}")))
}

/** Tiny hand-rolled JSON writer — events are flat, so no library needed. */
private[monitoring] object Json {
  /** A value that is already JSON and must not be quoted. */
  case class Raw(json: String)

  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def obj(fields: (String, Any)*): String =
    fields
      .map {
        case (k, Raw(j)) => quote(k) + ":" + j
        case (k, v: String) => quote(k) + ":" + quote(v)
        case (k, v) => quote(k) + ":" + v.toString
      }
      .mkString("{", ",", "}")
}

object MessagingSystem {
  /** Pick an implementation from config. `file` (with `messaging.dir`) is
    * the durable zero-dependency transport; a Kafka transport stays
    * deliberately unshipped — no client jar in this environment, and the
    * seam (this factory + `publish`) is exactly where one plugs in. */
  def create(config: GraftConfig): MessagingSystem =
    config.get("messaging.transport") match {
      case Some("memory") => new InMemoryMessagingSystem
      case Some("file") =>
        new FileMessagingSystem(config.get("messaging.dir").getOrElse(
          sys.error("messaging.transport=file needs messaging.dir")))
      case _ => new PrintMessagingSystem
    }

  /** What a publisher needs to know about the currently-running process. */
  trait Context {
    def jobId: String
    def eventDate: DateInterval
    def processId: String
    def startTime: Long
    def duration: Long = System.currentTimeMillis - startTime
  }
}

/**
 * Publishes job/stage lifecycle and metrics events to a transport
 * (reference core monitoring/MessagingSystem.scala:21-121). Implementations
 * only provide `publish`; the event shaping lives here.
 */
abstract class MessagingSystem {
  import MessagingSystem.Context

  def publish(topic: String, message: String): Unit
  def stop(): Unit = ()

  def publishProcessStarting(ctx: Context): Unit = publishRunEvent(ctx, Processing)
  def publishProcessComplete(ctx: Context): Unit = publishRunEvent(ctx, Complete)
  def publishProcessFailed(ctx: Context, failure: Throwable): Unit =
    publishRunEvent(ctx, Failed, failureToMessage(failure))

  def publishStageStarting(ctx: Context, stage: String, message: String = ""): Unit =
    publishStageEvent(ctx, Processing, stage, message)
  def publishStageComplete(ctx: Context, stage: String, message: String = ""): Unit =
    publishStageEvent(ctx, Complete, stage, message)
  def publishStageRetrying(ctx: Context, stage: String): Unit =
    publishStageEvent(ctx, Retrying, stage)
  def publishStageFailed(ctx: Context, stage: String, failure: Throwable): Unit =
    publishStageEvent(ctx, Failed, stage, failureToMessage(failure))

  def publishMetrics(ctx: Context, stage: String, metrics: Map[String, Double]): Unit =
    publish("metrics",
      MetricsEvent(ctx.jobId, ctx.processId, stage, System.currentTimeMillis(), metrics).toJson)

  private def publishRunEvent(ctx: Context, state: StateRecord, message: String = ""): Unit =
    publish("jobs",
      RunEvent(
        jobId = ctx.jobId,
        processId = ctx.processId,
        state = state.identifier,
        processingDate = ctx.eventDate.format("yyyy-MM-dd"),
        timestamp = System.currentTimeMillis(),
        duration = if (state == Complete) ctx.duration else 0L,
        message = message).toJson)

  private def publishStageEvent(ctx: Context, state: StateRecord, stage: String, message: String = ""): Unit =
    publish("stages",
      StageEvent(
        jobId = ctx.jobId,
        processId = ctx.processId,
        stage = stage,
        state = state.identifier,
        timestamp = System.currentTimeMillis(),
        duration = if (state == Complete) ctx.duration else 0L,
        message = message).toJson)

  private def failureToMessage(failure: Throwable): String =
    s"${failure.getClass.getName}: ${failure.getMessage}"
}

/** Logs every event — the default transport (reference core monitoring/PrintMessagingSystem.scala). */
class PrintMessagingSystem extends MessagingSystem with Logging {
  override def publish(topic: String, message: String): Unit =
    logger.info(s"[$topic] $message")
}

/**
 * Durable zero-dependency transport: appends each event as one JSON line
 * to `<dir>/<topic>.jsonl` — the events land as machine-readable history a
 * Spark job (or `spark.read.json`) can query directly, which makes this
 * the real replacement for a message bus on single-writer deployments
 * (the reference's Kafka transport needs a client jar this environment
 * lacks; the `publish` seam is unchanged, so swapping one in later
 * touches nothing else). Appends are synchronized and flushed per event:
 * a crash loses at most the in-flight line, and concurrent stages within
 * one runner never interleave bytes.
 */
class FileMessagingSystem(dir: String) extends MessagingSystem with Logging {
  private val root = java.nio.file.Paths.get(dir)
  java.nio.file.Files.createDirectories(root)
  private val writers = scala.collection.mutable.Map.empty[String, java.io.Writer]

  override def publish(topic: String, message: String): Unit = synchronized {
    val w = writers.getOrElseUpdate(topic, java.nio.file.Files.newBufferedWriter(
      root.resolve(s"$topic.jsonl"),
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND))
    w.write(message)
    w.write("\n")
    w.flush()
  }

  override def stop(): Unit = synchronized {
    writers.values.foreach { w =>
      try w.close() catch { case scala.util.control.NonFatal(_) => () }
    }
    writers.clear()
  }
}

/** Captures events in memory for assertions in tests. */
class InMemoryMessagingSystem extends MessagingSystem {
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  override def publish(topic: String, message: String): Unit =
    buffer.synchronized { buffer += topic -> message; () }
  def events: Seq[(String, String)] = buffer.synchronized(buffer.toVector)
  def topics: Seq[String] = events.map(_._1)
}
