package graft.pipeline

/** Uniform stage event envelope shared by every CLI-launchable stage
  * (reference `orders_to_bronze.py:202-209,314-324`: every stage logs
  * `started`/`completed`, and on any error a `failed` event with the
  * cause before re-raising — a crashed run always leaves a log line
  * saying which stage died and why). Events append to
  * `<root>/_logs/pipeline.jsonl`, one JSON object per line.
  */
object StageEvents {

  def logEvent(root: String, stage: String, runId: String, status: String,
      extra: Map[String, Any] = Map.empty): Unit =
    graft.common.JsonIO.appendLine(s"$root/_logs/pipeline.jsonl",
      Map("stage" -> stage, "run_id" -> runId, "status" -> status,
        "ts" -> java.time.Instant.now().toString) ++ extra)

  def staged[A](root: String, stage: String, runId: String,
      extra: Map[String, Any] = Map.empty)(body: => A): A = {
    logEvent(root, stage, runId, "started", extra)
    try {
      val r = body
      logEvent(root, stage, runId, "completed", extra)
      r
    } catch {
      case e: Throwable =>
        logEvent(root, stage, runId, "failed",
          extra + ("error" -> e.toString.take(500)))
        throw e
    }
  }
}
