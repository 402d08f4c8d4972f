package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Env-gated (GRAFT_STAGE_LOG=1) per-stage diagnostics: prints wall
  * time, summed task run/CPU/GC time, and shuffle/spill volume for
  * every completed stage above a small wall-time floor. Used to
  * attribute the big-round scaling cliff (BASELINE.md round-2 notes)
  * to compute vs GC vs shuffle without a Spark UI in the sandbox.
  */
object StageLog {
  def maybeInstall(sc: SparkContext): Unit =
    if (sys.env.get("GRAFT_STAGE_LOG").contains("1")) {
      sc.addSparkListener(new SparkListener {
        override def onStageCompleted(
            e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wallMs = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          if (wallMs >= 2000) System.err.println(
            f"[stage ${si.stageId}%5d] wall=${wallMs / 1e3}%8.1fs " +
            f"tasks=${si.numTasks}%4d run=${m.executorRunTime / 1e3}%9.1fs " +
            f"cpu=${m.executorCpuTime / 1e9}%9.1fs " +
            f"gc=${m.jvmGCTime / 1e3}%8.1fs " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            f"spill=${m.memoryBytesSpilled / 1e6}%8.1fMB " +
            s"${si.name.takeWhile(_ != '\n').take(60)}")
        }
      })
    }
}
