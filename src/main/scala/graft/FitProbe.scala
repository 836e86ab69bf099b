package graft

import graft.pipelines.{EventsPipeline, FlowPipeline}
import graft.queries.PipelineQueries
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Phase-level timing of TopicModel.train — the optimization round's
  * measurement harness for the LDA-fit stage every pipeline is bound by.
  * Replays train()'s exact body (same layout contract) with a timer per
  * phase: dictionary build, docVector assembly, lda.fit, transform
  * (doc-mix materialization), and the wordProb build, so the fit stage's
  * seconds are attributed to a phase instead of guessed.
  *
  * Usage: FitProbe <sfDir> [flow|events] — honors SPARK_GRAFT_CPUS.
  */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "flow"
    val spark = GraftSession.fromEnv(defaultCores = "32")
    import spark.implicits._

    val wordCounts = which match {
      case "events" =>
        val events = Tables.load(spark, sfDir, "events")
        val cuts = EventsPipeline.computeCuts(events)
        graft.operators.Corpus.wordCounts(
          EventsPipeline.featurize(events, cuts),
          col("user_id"), col("word"))
      case _ =>
        val flows = FlowPipeline.validTimes(
          PipelineQueries.flowInput(spark, sfDir)).withColumn("__w", lit(1L))
        val fcuts = FlowPipeline.computeCuts(flows)
        FlowPipeline.corpus(FlowPipeline.featurize(flows, fcuts), col("__w"))
    }
    val wc = wordCounts.cache()
    wc.count()

    // optional in-process stack sampler (attribution runs only; costs time)
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    if (sys.env.get("SPARK_GRAFT_PROBE_SAMPLER").contains("1")) {
      val sampler = new Thread(() => {
        while (true) {
          Thread.sleep(100)
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
            if ((t.getName.startsWith("Executor task launch") ||
                 t.getName == "main") && frames.nonEmpty) {
              val sig = frames.take(40).map(f => s"${f.getClassName}.${f.getMethodName}")
                .filter(f => (f.startsWith("org.apache.spark") || f.startsWith("breeze") || f.startsWith("graft")) &&
                  !f.startsWith("org.apache.spark.util."))
                .take(4).mkString(" <- ")
              val key = if (sig.isEmpty) frames.head.toString else sig
              sampleCounts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
            }
          }
        }
      })
      sampler.setDaemon(true); sampler.start()
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import scala.jdk.CollectionConverters._
        System.err.println("[fit] ---- stack samples (top 20) ----")
        sampleCounts.asScala.toSeq.sortBy(-_._2.get).take(20).foreach {
          case (k, v) => System.err.println(f"[fit] ${v.get}%6d  $k")
        }
      }))
    }

    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[fit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      System.err.println(s"[fit] ---- rep $rep ($which) ----")
      val topicCount = 10
      val corpus = phase("corpus cache") {
        val c = wc.select(
          col("doc").cast("string").as("doc"),
          col("word").cast("string").as("word"),
          col("count").cast("double").as("cnt")).cache()
        c.count(); c
      }
      val dict = phase("dict build+count") {
        val d = graft.ml.ModelIO.denseWordIds(corpus.select("word")).cache()
        d.count(); d
      }
      val vocabSize = dict.count().toInt
      val docVectors = phase("docVectors build+cache") {
        val dv = corpus.join(dict, "word")
          .groupBy("doc")
          .agg(collect_list(struct(col("word_id"), col("cnt"))).as("pairs"))
          .map { row =>
            val doc = row.getString(0)
            val pairs = row.getSeq[Row](1)
              .map(r => (r.getInt(0), r.getDouble(1)))
              .sortBy(_._1)
            (doc, Vectors.sparse(vocabSize, pairs.map(_._1).toArray,
              pairs.map(_._2).toArray))
          }.toDF("doc", "features")
          .repartition(graft.ml.TopicModel.TrainLayoutPartitions, col("doc"))
          .sortWithinPartitions("doc")
          .cache()
        dv.count(); dv
      }
      val ldaModel = phase("lda.fit") {
        new LDA().setK(topicCount).setDocConcentration(2.5).setSeed(42L)
          .setMaxIter(10).setOptimizer("online").setFeaturesCol("features")
          .fit(docVectors)
      }
      val docMix = phase("transform+count (docMix)") {
        val dm = ldaModel.transform(docVectors)
          .select(col("doc"), vector_to_array(col("topicDistribution"))
            .cast("array<double>").as("topic_mix")).cache()
        dm.count(); dm
      }
      phase("wordProb build") {
        val tm = ldaModel.topicsMatrix
        val colSums = (0 until topicCount).map { t =>
          val s = (0 until vocabSize).map(w => tm(w, t)).sum
          if (s == 0.0) 1.0 else s
        }
        val rows = (0 until vocabSize).map { w =>
          (w, (0 until topicCount).map(t => tm(w, t) / colSums(t)).toArray)
        }
        val wp = spark.createDataFrame(rows).toDF("word_id", "topic_prob")
          .join(dict, "word_id").select("word", "topic_prob").cache()
        wp.count(); wp
      }
      System.err.println(s"[fit] docs=${docMix.count()} vocab=$vocabSize " +
        s"corpusRows=${corpus.count()}")
      docVectors.unpersist(); dict.unpersist(); corpus.unpersist()
      docMix.unpersist()
    }
    spark.stop()
  }
}
