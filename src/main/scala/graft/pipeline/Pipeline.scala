package graft.pipeline

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** DAG-style pipeline runner with the reference's orchestration semantics
  * (SURVEY.md §2.3, reference k8s/dags/etl-gcp-vinicius-campos.py:40-173):
  *
  *  - typed task graph with explicit dependency wiring (`:163-173`)
  *  - per-task retry once (`retries: 1`, `:37`)
  *  - downstream tasks are skipped when an upstream fails (the count-check
  *    gates bucket cleanup, `:144-167`)
  *  - `alwaysRun` tasks execute even after an upstream failure — the
  *    cluster-teardown semantics the reference encodes in DAG edge order
  *    (delete-cluster runs on the even path, `:118-124`; see SURVEY §7.4.5)
  *
  * One process, one SparkSession: the reference's five process boundaries
  * (scheduler → worker → cloud function → Dataproc → BigQuery) collapse into
  * method calls; the only remaining boundary is Spark's driver↔executor RPC.
  */
final case class Task(
    name: String,
    deps: Seq[String] = Nil,
    retries: Int = 1,
    alwaysRun: Boolean = false)(
    val action: () => Unit)

sealed trait TaskResult
object TaskResult {
  case object Ok extends TaskResult
  final case class Failed(error: Throwable, attempts: Int) extends TaskResult
  case object Skipped extends TaskResult
}

final case class PipelineRun(results: Map[String, TaskResult]) {
  def succeeded: Boolean = results.values.forall(_ == TaskResult.Ok)
  def failed: Seq[String] = results.collect {
    case (n, _: TaskResult.Failed) => n }.toSeq
  def skipped: Seq[String] = results.collect {
    case (n, TaskResult.Skipped) => n }.toSeq
}

final class Pipeline(tasks: Seq[Task]) {
  private val byName = tasks.map(t => t.name -> t).toMap
  require(byName.size == tasks.size, "duplicate task names")
  tasks.foreach(t => t.deps.foreach(d =>
    require(byName.contains(d), s"task '${t.name}' depends on unknown '$d'")))

  /** Topological order (stable: declaration order among ready tasks). */
  private def topo: Seq[Task] = {
    val done = mutable.LinkedHashSet.empty[String]
    val pending = mutable.Queue(tasks: _*)
    var progress = true
    while (pending.nonEmpty && progress) {
      progress = false
      for (_ <- pending.indices) {
        val t = pending.dequeue()
        if (t.deps.forall(done.contains)) { done += t.name; progress = true }
        else pending.enqueue(t)
      }
    }
    require(pending.isEmpty, s"dependency cycle among: ${pending.map(_.name).mkString(",")}")
    done.toSeq.map(byName)
  }

  private def attempt(t: Task): TaskResult = {
    var last: Throwable = null
    for (i <- 0 to t.retries) {
      Try(t.action()) match {
        case Success(_) => return TaskResult.Ok
        case Failure(e) => last = e
      }
    }
    TaskResult.Failed(last, t.retries + 1)
  }

  /** Run the graph. A task runs iff all deps succeeded, or `alwaysRun` is
    * set and all deps have *settled* (any outcome).
    */
  def run(): PipelineRun = {
    val results = mutable.LinkedHashMap.empty[String, TaskResult]
    for (t <- topo) {
      val depsOk = t.deps.forall(d => results(d) == TaskResult.Ok)
      if (depsOk || t.alwaysRun) results(t.name) = attempt(t)
      else results(t.name) = TaskResult.Skipped
    }
    PipelineRun(results.toMap)
  }
}
