package graft.orchestration

import scala.util.{Failure, Success, Try}

/** In-process pipeline runner replacing the reference's Step Functions state
  * machine + trigger Lambda (SURVEY.md §2.6 O1-O5, O8;
  * `src/step_functions/pipeline_definition.json`): sequential stages with
  * per-stage retry/backoff and success/failure callbacks.
  *
  * Reference retry policy: 30 s interval, 1 retry, backoff 2.0, catch-all →
  * failure notification (`pipeline_definition.json:15-29`). Same defaults
  * here, with the sleep injectable so tests run instantly.
  */
object Pipeline {

  case class Stage(name: String, run: () => Unit)

  case class RetryPolicy(
      intervalMillis: Long = 30000L,
      maxRetries: Int = 1,
      backoffRate: Double = 2.0)

  sealed trait Result { def stageResults: Seq[(String, Int)] }
  case class Succeeded(stageResults: Seq[(String, Int)]) extends Result
  case class Failed(stage: String, error: Throwable,
      stageResults: Seq[(String, Int)]) extends Result

  /** Run stages sequentially; a stage failing all attempts aborts the
    * pipeline (reference `Catch` → NotifyFailure). Returns per-stage attempt
    * counts.
    */
  def run(stages: Seq[Stage],
      policy: RetryPolicy = RetryPolicy(),
      onSuccess: String => Unit = s => println(s"[pipeline] SUCCESS: $s"),
      onFailure: (String, Throwable) => Unit =
        (s, e) => println(s"[pipeline] FAILURE: $s: ${e.getMessage}"),
      sleep: Long => Unit = Thread.sleep): Result = {
    val done = scala.collection.mutable.ArrayBuffer[(String, Int)]()
    for (stage <- stages) {
      var attempt = 0
      var interval = policy.intervalMillis
      var outcome: Try[Unit] = Try(stage.run())
      while (outcome.isFailure && attempt < policy.maxRetries) {
        sleep(interval)
        interval = (interval * policy.backoffRate).toLong
        attempt += 1
        outcome = Try(stage.run())
      }
      outcome match {
        case Success(_) => done += stage.name -> (attempt + 1)
        case Failure(e) =>
          onFailure(stage.name, e)
          return Failed(stage.name, e, done.toSeq :+ (stage.name -> (attempt + 1)))
      }
    }
    onSuccess(stages.map(_.name).mkString(" → "))
    Succeeded(done.toSeq)
  }
}
