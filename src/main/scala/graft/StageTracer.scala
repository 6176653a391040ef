package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Slow-run stage tracer (VERDICT r11 ask #1).
  *
  * Three consecutive rounds of driver benches measured `dedup_containment`
  * at 10–25× its quiet-host cost, and the artifacts could not distinguish
  * "loaded host" from "a real pathology that only manifests under
  * contention" (spill, GC, AQE re-plan). This listener turns that question
  * into data: it rides the bench session for the whole run, accumulates
  * per-stage aggregates (wall, executor run/CPU/GC time, shuffle bytes,
  * spill bytes, input/output bytes, peak execution memory, max/median task
  * duration), and [[graft.Bench]] snapshots it into the `BENCH_DETAIL.json`
  * entry whenever a query's measured wall exceeds 3× its archived builder
  * median. The verdict's diagnostic split:
  *   - spill / GC / task skew in the trace → the QUERY is the problem;
  *   - stages account for little of the wall (`unaccounted` high) or run
  *     time far below wall with no spill → scheduler/host delay, the
  *     environmental claim is proven.
  *
  * Overhead when not snapshotting: one map update per task end and per
  * stage completion, cleared per query — unmeasurable next to the queries.
  * All state is synchronized: listener events arrive on the bus thread
  * while clear()/snapshot run on the main thread.
  */
object StageTracer {
  /** Byte totals across one query's stages (MB). */
  final case class Bytes(shuffleReadMB: Double, shuffleWriteMB: Double,
      spillMB: Double, inputMB: Double, outputMB: Double)
}

final class StageTracer extends SparkListener {

  private final case class StageRec(
      id: Int, attempt: Int, name: String, wallSec: Double, tasks: Int,
      failed: Boolean, runSec: Double, cpuSec: Double, gcSec: Double,
      shuffleReadMB: Double, shuffleWriteMB: Double, spillMB: Double,
      inputMB: Double, outputMB: Double, peakMemMB: Double,
      taskMaxSec: Double, taskMedSec: Double)

  private val stages = mutable.ArrayBuffer.empty[StageRec]
  private val taskDur = mutable.HashMap.empty[(Int, Int), mutable.ArrayBuffer[Long]]

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    val k = (e.stageId, e.stageAttemptId)
    taskDur.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += e.taskInfo.duration
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    synchronized {
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for (s <- si.submissionTime; c <- si.completionTime)
        yield (c - s) / 1e3).getOrElse(0.0)
      val durs = taskDur.remove((si.stageId, si.attemptNumber()))
        .map(_.toSeq.sorted).getOrElse(Seq.empty)
      val mb = 1024.0 * 1024.0
      stages += StageRec(
        id = si.stageId, attempt = si.attemptNumber(),
        name = si.name.take(80), wallSec = wall, tasks = si.numTasks,
        failed = si.failureReason.isDefined,
        runSec = m.executorRunTime / 1e3,
        cpuSec = m.executorCpuTime / 1e9,
        gcSec = m.jvmGCTime / 1e3,
        shuffleReadMB = m.shuffleReadMetrics.totalBytesRead / mb,
        shuffleWriteMB = m.shuffleWriteMetrics.bytesWritten / mb,
        spillMB = (m.memoryBytesSpilled + m.diskBytesSpilled) / mb,
        inputMB = m.inputMetrics.bytesRead / mb,
        outputMB = m.outputMetrics.bytesWritten / mb,
        peakMemMB = m.peakExecutionMemory / mb,
        taskMaxSec = durs.lastOption.getOrElse(0L) / 1e3,
        taskMedSec =
          (if (durs.isEmpty) 0L else durs(durs.size / 2)) / 1e3)
    }

  /** Forget everything seen so far — called untimed before each query. */
  def clear(): Unit = synchronized { stages.clear(); taskDur.clear() }

  /** Per-query BYTE totals since the last clear() — the shuffle-byte
    * accounting of the 100 TB argument (VERDICT r12 ask #3): local
    * wall-clock ratios prove CPU shape, but bytes-on-exchange is the
    * cluster-network half local[32] cannot time. Summed over every stage
    * of the query's timed region; drain the listener bus before reading.
    *
    * Failed stage attempts are EXCLUDED: the byte columns are presented
    * as plan-determined exchange volume, and a task/stage retry would
    * otherwise double-count its shuffle/spill/input bytes (ADVICE r13).
    * The successful re-attempt of a retried stage is still counted —
    * exactly once. */
  def byteTotals: StageTracer.Bytes = synchronized {
    val ok = stages.filterNot(_.failed)
    StageTracer.Bytes(
      shuffleReadMB = ok.map(_.shuffleReadMB).sum,
      shuffleWriteMB = ok.map(_.shuffleWriteMB).sum,
      spillMB = ok.map(_.spillMB).sum,
      inputMB = ok.map(_.inputMB).sum,
      outputMB = ok.map(_.outputMB).sum)
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                case c if c < ' ' => " "; case c => c.toString }

  /** JSON snapshot of the stages seen since the last clear(), annotated
    * with how much of the query's wall they account for. Drain the
    * listener bus before calling. */
  def snapshotJson(queryWallSec: Double): String = synchronized {
    val sorted = stages.sortBy(-_.wallSec)
    val kept = sorted.take(12) // slowest stages carry the diagnosis
    def f(d: Double) = f"$d%.3f".replace(",", ".")
    val items = kept.map { s =>
      s"""{"id":${s.id},"name":"${esc(s.name)}","wall":${f(s.wallSec)},""" +
      s""""tasks":${s.tasks},"failed":${s.failed},"run":${f(s.runSec)},""" +
      s""""cpu":${f(s.cpuSec)},"gc":${f(s.gcSec)},""" +
      s""""shuffleReadMB":${f(s.shuffleReadMB)},""" +
      s""""shuffleWriteMB":${f(s.shuffleWriteMB)},""" +
      s""""spillMB":${f(s.spillMB)},"inputMB":${f(s.inputMB)},""" +
      s""""outputMB":${f(s.outputMB)},"peakMemMB":${f(s.peakMemMB)},""" +
      s""""taskMax":${f(s.taskMaxSec)},"taskMed":${f(s.taskMedSec)}}"""
    }.mkString("[", ",", "]")
    val wallSum = stages.map(_.wallSec).sum
    val gcSum = stages.map(_.gcSec).sum
    val spillSum = stages.map(_.spillMB).sum
    s"""{"nStages":${stages.size},"stageWallSum":${f(wallSum)},""" +
    s""""unaccounted":${f((queryWallSec - wallSum).max(0.0))},""" +
    s""""gcSum":${f(gcSum)},"spillSumMB":${f(spillSum)},""" +
    s""""stages":$items}"""
  }
}
