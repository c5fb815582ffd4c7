package graft.index

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Live per-stage progress event (reference D9: bloop streams per-repo
  * index progress percentages to its UI while syncing,
  * server/bleep/src/repo — here re-expressed against Spark's scheduler:
  * tasks of the job group stand in for files of the repo).
  */
case class ProgressEvent(stage: String, tasksDone: Int, tasksTotal: Int) {
  def percent: Int =
    if (tasksTotal <= 0) 0 else (tasksDone * 100) / tasksTotal
}

/** SparkListener that turns scheduler events for `graft:<stage>` job
  * groups into monotone ProgressEvents — the Spark-native replacement for
  * the reference's callback-per-file progress reporting. Attach with
  * `ProgressReporter.attach(spark)(onEvent)`, detach with `close()`.
  *
  * Scale note: this observes DRIVER-side scheduler events only (O(tasks)
  * tiny objects); it adds zero work to executors, unlike per-row
  * accumulator schemes, so it is safe to leave attached on a 1000-executor
  * build.
  */
class ProgressReporter(spark: SparkSession,
                       onEvent: ProgressEvent => Unit) extends SparkListener {

  private val stageGroup = mutable.Map.empty[Int, String] // stageId → stage
  private val groupTotals = mutable.Map.empty[String, Int]
  private val groupDone = mutable.Map.empty[String, Int]

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val group = Option(jobStart.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      .getOrElse("")
    if (group.startsWith(ProgressReporter.GroupPrefix)) {
      val stage = group.stripPrefix(ProgressReporter.GroupPrefix)
      synchronized {
        jobStart.stageIds.foreach(id => stageGroup(id) = stage)
      }
    }
  }

  private val countedStages = mutable.Set.empty[Int]

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
    synchronized {
      stageGroup.get(s.stageInfo.stageId).foreach { st =>
        // count each stage's tasks once — a fetch-failure RESUBMIT of the
        // same stageId must not inflate the total
        if (countedStages.add(s.stageInfo.stageId))
          groupTotals(st) = groupTotals.getOrElse(st, 0) + s.stageInfo.numTasks
        onEvent(ProgressEvent(st, groupDone.getOrElse(st, 0), groupTotals(st)))
      }
    }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    // failed/killed attempts also fire onTaskEnd — only successful task
    // completions are progress (a retry's success is counted when it lands)
    if (t.taskInfo == null || !t.taskInfo.successful) return
    stageGroup.get(t.stageId).foreach { st =>
      val total = groupTotals.getOrElse(st, 0)
      // speculative duplicates can over-count: clamp at the known total
      groupDone(st) = math.min(groupDone.getOrElse(st, 0) + 1,
        if (total > 0) total else Int.MaxValue)
      onEvent(ProgressEvent(st, groupDone(st), total))
    }
  }

  // stage-id bookkeeping is dropped on SUCCESSFUL completion so a listener
  // left attached across many builds does not grow without bound
  // (per-stage-NAME counters stay — they ARE the reported progress). A
  // FAILED attempt keeps its entries: the scheduler resubmits the same
  // stageId, whose retry tasks must still be recognized.
  override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
    synchronized {
      if (s.stageInfo.failureReason.isEmpty) {
        stageGroup.remove(s.stageInfo.stageId)
        countedStages.remove(s.stageInfo.stageId)
      }
    }

  def close(): Unit = spark.sparkContext.removeSparkListener(this)
}

object ProgressReporter {
  val GroupPrefix = "graft:"

  def attach(spark: SparkSession)(
      onEvent: ProgressEvent => Unit): ProgressReporter = {
    val r = new ProgressReporter(spark, onEvent)
    spark.sparkContext.addSparkListener(r)
    r
  }

  /** Run `body` under the job group progress reporters key on. */
  def inStage[T](spark: SparkSession, stage: String)(body: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(GroupPrefix + stage, s"graft index stage $stage",
      interruptOnCancel = false)
    try body
    finally sc.clearJobGroup()
  }
}
