package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Phase-level timing of the streaming bench entries (the optimization
  * round's measurement harness for the st* family): splits one entry's
  * wall time into staging writes, stream planning, per-micro-batch
  * execution (from the engine's own progress events), and the final
  * read-back, so the st seconds are attributed instead of guessed.
  *
  * Usage: StreamProbe <sfDir> <queryName> — honors SPARK_GRAFT_CPUS.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "st13_stream_left_outer"
    val spark = GraftSession.fromEnv(defaultCores = "32")
    // A/B experiment knob: SPARK_GRAFT_PROBE_CONF="k=v;k=v" applied to the
    // session before the query runs (streaming confs are read at query start)
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      System.err.println(s"[probe] conf $k=$v")
      spark.conf.set(k, v)
    })

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.err.println(s"[probe] query started ${e.id}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        System.err.println(f"[probe] batch ${p.batchId}%2d rows=${p.numInputRows}%6d " +
          s"triggerMs=${dur.get("triggerExecution")} " +
          s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} " +
          s"latestOffset=${dur.get("latestOffset")} " +
          s"queryPlanning=${dur.get("queryPlanning")} " +
          s"walCommit=${dur.get("walCommit")} " +
          s"commitBatch=${dur.get("commitOffsets")} " +
          s"state=${Option(p.stateOperators).map(_.toSeq.map(so =>
            s"(rows=${so.numRowsTotal},updMs=${so.allUpdatesTimeMs}," +
            s"rmMs=${so.allRemovalsTimeMs},commitMs=${so.commitTimeMs})")
            .mkString(",")).getOrElse("")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.err.println(s"[probe] query terminated")
    })

    // In-process stack sampler: every 100 ms, record the top interesting
    // frame of every executor task thread — a poor-man's profiler that
    // works where jstack/jcmd attach is sandboxed away.
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(100)
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
          if (t.getName.startsWith("Executor task launch") && frames.nonEmpty) {
            val sig = frames.take(40).map(f => s"${f.getClassName}.${f.getMethodName}")
              .filter(f => (f.startsWith("org.apache.spark") || f.startsWith("graft")) &&
                !f.startsWith("org.apache.spark.util."))
              .take(4).mkString(" <- ")
            val key = if (sig.isEmpty) frames.head.toString else sig
            sampleCounts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
          }
        }
      }
    })
    // the sampler itself costs wall time (getAllStackTraces safepoints) —
    // OFF by default; enable only for attribution runs, not timing runs
    val sample = sys.env.get("SPARK_GRAFT_PROBE_SAMPLER").contains("1")
    sampler.setDaemon(true)
    if (sample) sampler.start()

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      System.err.println(s"[probe] ---- rep $rep ($which) ----")
      val fn = SparkEntry.queries(which)
      val df = phase("build+run stream")(fn(spark, sfDir))
      phase("noop sink")(df.write.format("noop").mode("overwrite").save())
    }
    import scala.jdk.CollectionConverters._
    System.err.println("[probe] ---- task-thread stack samples (top 25) ----")
    sampleCounts.asScala.toSeq.sortBy(-_._2.get).take(25).foreach {
      case (k, v) => System.err.println(f"[probe] ${v.get}%6d  $k")
    }
    spark.stop()
  }
}
