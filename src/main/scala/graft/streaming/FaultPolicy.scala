package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Error classification + restart policy — reference O15
  * (`kafka/reponse_handler.go:26-48`): `isFatalError` panics the
  * connector on permanent Kafka errors (UnknownTopicOrPartition, and
  * anything not temporary) while transient transport errors
  * (temporary kafka errors, unexpected EOF, ECONNREFUSED, ECONNRESET,
  * EPIPE) are logged and retried by the producer.
  *
  * Spark already retries TASK failures; what it does not give is a
  * QUERY-level fatal-vs-transient policy — a dead broker connection
  * kills the streaming query exactly like a nonexistent topic does.
  * [[classify]] reproduces the reference's decision procedure over the
  * JVM exception chain, and [[supervise]] is the driver-side analog of
  * the reference's retry loop: restart the query from its checkpoint on
  * transient failure (the checkpoint makes the restart loss- and
  * dup-free, same as resume-from-ACK'd-LSN), re-throw on fatal.
  *
  * Classification is by exception class NAME up the cause chain, so the
  * policy works whether or not kafka-clients is on the classpath.
  */
object FaultPolicy {

  sealed trait FaultClass
  case object Fatal     extends FaultClass
  case object Transient extends FaultClass

  /** Markers of permanent failures — reponse_handler.go:37-39 singles out
    * UnknownTopicOrPartition; auth/config errors are the Java-client
    * non-retriable family (kafka-go surfaces them as non-Temporary()).
    */
  private val fatalMarkers = Seq(
    "UnknownTopicOrPartition", "InvalidTopic", "RecordTooLarge",
    "SaslAuthentication", "TopicAuthorization", "ClusterAuthorization",
    "Authentication", "Authorization", "UnsupportedVersion")

  /** Markers of transient transport trouble — reponse_handler.go:41-45:
    * temporary kafka errors (the Java client models these as
    * RetriableException subclasses, whose names end in that suffix or in
    * the leader/network families below), unexpected EOF and the
    * connection-reset errno family.
    */
  private val transientMarkers = Seq(
    "Retriable", "NotLeaderOrFollower", "NetworkException", "Disconnect",
    "TimeoutException", "EOFException", "UnexpectedEOF",
    "Connection reset", "Connection refused", "Broken pipe",
    "ECONNRESET", "ECONNREFUSED", "EPIPE")

  /** Walk the cause chain; the first matched marker decides. Fatal
    * markers win over transient ones at equal depth (the reference
    * checks UnknownTopicOrPartition before Temporary()); anything
    * unmatched is fatal — reponse_handler.go:47 `return true` is the
    * default, and silently retrying an unknown failure forever is the
    * one behavior a connector must not have.
    */
  def classify(t: Throwable): FaultClass = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) {
      val text = s"${cur.getClass.getName}: ${Option(cur.getMessage).getOrElse("")}"
      if (fatalMarkers.exists(text.contains)) return Fatal
      if (transientMarkers.exists(text.contains)) return Transient
      cur = cur.getCause
      depth += 1
    }
    Fatal
  }

  final case class Outcome(restarts: Int, fatal: Option[Throwable])

  /** Run a (re)startable streaming query under the policy: transient
    * termination → restart from checkpoint, up to `maxRestarts` times;
    * fatal termination → stop and re-throw (the reference's panic).
    * Returns once the query terminates cleanly (bounded input / stop())
    * or restarts are exhausted. `onFailure` fires once per failed
    * attempt, fatal or transient (≙ the reference's `IncrementErrOp`
    * error accounting).
    */
  def supervise(maxRestarts: Int, onFailure: () => Unit = () => ())(
      start: () => StreamingQuery): Outcome = {
    var restarts = 0
    while (true) {
      val q = start()
      if (q == null) return Outcome(restarts, None) // bounded run (snapshot_only)
      try {
        q.awaitTermination()
        return Outcome(restarts, None) // clean stop
      } catch {
        case t: Throwable =>
          onFailure()
          classify(t) match {
            case Fatal => throw t
            case Transient if restarts < maxRestarts =>
              restarts += 1 // retry from checkpoint
            case Transient =>
              return Outcome(restarts, Some(t))
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
