package graft

import graft.pipelines.{DnsPipeline, FlowPipeline, ProxyPipeline}
import graft.sources.{Feedback, Lookups, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** User-facing analysis CLI — the reference's `SuspiciousConnects` entry
  * point (SuspiciousConnects.scala:29-58 + SuspiciousConnectsArgumentParser
  * .scala:9-110) re-expressed for the in-JVM engine: the MPI/ssh/model-file
  * plumbing (--mpicmd, --lpath, --nodes, ...) has no equivalent because
  * Spark owns training and distribution; everything a user steers survives.
  *
  *   graft.Main --analysis flow --input /data/flow.parquet \
  *     --scored /out/flow_results [--feedback scores.tsv] [--dupfactor 1000]
  *     [--threshold 1e-4] [--maxresults 200] [--topiccount 20]
  *     [--topdomains top-1m.csv] [--delimiter \t] [--seed 42]
  *
  * Output: delimited text in the reference's per-analysis row shape
  * (flow: input + src_score + dst_score; dns: worded row + score;
  * proxy: input + word + score), ascending by score.
  * The arg parser is hand-rolled: the surface is 10 flags and the build
  * deliberately adds no dependencies beyond Spark.
  */
object Main {

  final case class Config(analysis: String = "",
                          input: Seq[String] = Nil,
                          scored: String = "",
                          feedback: Option[String] = None,
                          dupFactor: Int = 1000,
                          threshold: Double = 1.0,
                          maxResults: Int = -1,
                          topicCount: Int = 20,
                          topDomains: Option[String] = None,
                          model: Option[String] = None,
                          delimiter: String = "\t",
                          seed: Long = 42L)

  val usage: String =
    """Usage: graft.Main --analysis <flow|dns|proxy> --input <parquet[,parquet...]>
      |                  --scored <output dir>
      |  [--feedback <tsv>]     headered TSV of analyst-scored rows (sev column)
      |  [--dupfactor <n>]      corpus weight for sev=3 feedback rows (default 1000)
      |  [--threshold <x>]      max probability to report (default 1.0 = everything)
      |  [--maxresults <k>]     top-k most suspicious rows (-1 = all below threshold)
      |  [--topiccount <k>]     LDA topics (default 20)
      |  [--topdomains <csv>]   rank,domain popularity list (reference top-1m.csv)
      |  [--model <dir>]        model store: load if present, else train + save here
      |  [--delimiter <c>]      output field separator (default tab)
      |  [--seed <n>]           LDA seed (default 42)""".stripMargin

  def parse(args: Seq[String]): Either[String, Config] = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case ("--analysis" | "-z") :: v :: t => loop(t, c.copy(analysis = v))
      case ("--input" | "-i") :: v :: t =>
        loop(t, c.copy(input = v.split(",").toSeq.filter(_.nonEmpty)))
      case ("--scored" | "-s") :: v :: t => loop(t, c.copy(scored = v))
      case ("--feedback" | "-f") :: v :: t => loop(t, c.copy(feedback = Some(v)))
      case ("--dupfactor" | "-d") :: v :: t => loop(t, c.copy(dupFactor = v.toInt))
      case ("--threshold" | "-e") :: v :: t => loop(t, c.copy(threshold = v.toDouble))
      case ("--maxresults" | "-k") :: v :: t => loop(t, c.copy(maxResults = v.toInt))
      case ("--topiccount" | "-u") :: v :: t => loop(t, c.copy(topicCount = v.toInt))
      case "--topdomains" :: v :: t => loop(t, c.copy(topDomains = Some(v)))
      case ("--model" | "-m") :: v :: t => loop(t, c.copy(model = Some(v)))
      case ("--delimiter" | "-b") :: v :: t => loop(t, c.copy(delimiter = v))
      case "--seed" :: v :: t => loop(t, c.copy(seed = v.toLong))
      case other :: _ => Left(s"unrecognized or valueless argument: $other")
    }
    try loop(args.toList, Config()).flatMap { c =>
      if (!Set("flow", "dns", "proxy").contains(c.analysis))
        Left("--analysis must be one of: flow, dns, proxy")
      else if (c.input.isEmpty) Left("--input is required")
      else if (c.scored.isEmpty) Left("--scored is required")
      else Right(c)
    } catch {
      case e: NumberFormatException => Left(s"bad numeric argument: ${e.getMessage}")
    }
  }

  /** Feedback TSV schemas: the columns each featurizer reads + `sev`
    * (reference: FlowPreLDA.scala:60-98, DNSPreLDA.scala:56-88,
    * ProxyFeedback.scala:28-38 — same fields, named instead of indexed). */
  def feedbackSchema(analysis: String): StructType = analysis match {
    case "flow" => StructType(Seq(
      StructField("trhour", IntegerType), StructField("trminute", IntegerType),
      StructField("trsec", IntegerType), StructField("sip", StringType),
      StructField("dip", StringType), StructField("sport", IntegerType),
      StructField("dport", IntegerType), StructField("ipkt", LongType),
      StructField("ibyt", LongType), StructField("sev", IntegerType)))
    case "dns" => StructType(Seq(
      StructField("frame_time", StringType), StructField("unix_tstamp", LongType),
      StructField("frame_len", IntegerType), StructField("ip_dst", StringType),
      StructField("dns_qry_name", StringType), StructField("dns_qry_class", StringType),
      StructField("dns_qry_type", IntegerType), StructField("dns_qry_rcode", IntegerType),
      StructField("sev", IntegerType)))
    case _ => StructType(Seq(
      StructField("p_date", StringType), StructField("p_time", StringType),
      StructField("clientip", StringType), StructField("host", StringType),
      StructField("reqmethod", StringType), StructField("useragent", StringType),
      StructField("resconttype", StringType), StructField("respcode", StringType),
      StructField("fulluri", StringType), StructField("sev", IntegerType)))
  }

  /** Train + score + shape results for one analysis; factored out of main
    * so tests can drive the full CLI path on an existing session. */
  def runAnalysis(spark: SparkSession, c: Config): DataFrame = {
    val input = Tables.loadPaths(spark, c.input)
    val fb = c.feedback.map(p => Feedback.load(spark, p,
      feedbackSchema(c.analysis), sevCol = "sev", sev = 3,
      duplicationFactor = c.dupFactor))
    // --topdomains, else the reference's default: a top-1m.csv in the
    // working directory when one exists (DNSWordCreation.scala:41 reads it
    // unconditionally; here its absence just means an empty popular list).
    // The list stays a DISTRIBUTED frame end-to-end — classing is a
    // broadcast join, never a driver collect of a million strings (the
    // reference's TopDomains.scala:9-13 Set is the shape avoided here).
    // lazy: only the dns/proxy branches consume it — flow must not pay the
    // CSV scan.
    lazy val popular = c.topDomains
      .orElse(Some("top-1m.csv").filter(p => new java.io.File(p).exists))
      .map(p => Lookups.topDomainsDF(spark, p))
      .getOrElse(DnsPipeline.popularFrame(spark, Set.empty))
    // --model: score with a stored model when one exists at the path,
    // otherwise train and persist there (train-once-score-later).
    def stored[M](load: String => M, train: () => M, save: (M, String) => Unit): M =
      c.model match {
        case Some(p) =>
          try load(p)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            val m = train(); save(m, p); m
          }
        case None => train()
      }
    c.analysis match {
      case "flow" =>
        val model = stored(FlowPipeline.load(spark, _),
          () => FlowPipeline.train(input, topicCount = c.topicCount,
            seed = c.seed, feedback = fb), FlowPipeline.save)
        FlowPipeline.results(input, model, c.threshold, c.maxResults)
      case "dns" =>
        val model = stored(DnsPipeline.load(spark, _),
          () => DnsPipeline.trainWithLookup(input, popular,
            topicCount = c.topicCount, seed = c.seed, feedback = fb),
          DnsPipeline.save)
        DnsPipeline.results(input, model, c.threshold, c.maxResults)
      case "proxy" =>
        val model = stored(ProxyPipeline.load(spark, _),
          () => ProxyPipeline.trainWithLookup(input, popular,
            topicCount = c.topicCount, seed = c.seed, feedback = fb),
          ProxyPipeline.save)
        ProxyPipeline.results(input, model, c.threshold, c.maxResults)
    }
  }

  def main(args: Array[String]): Unit = parse(args.toIndexedSeq) match {
    case Left(err) =>
      System.err.println(s"error: $err\n$usage")
      sys.exit(2)
    case Right(c) =>
      val spark = GraftSession.fromEnv()
      // one output file only when the result is top-k bounded; an unbounded
      // (--maxresults -1) result keeps its partitioning.
      // sys.exit inside the catch would throw past the finally (the session
      // would only stop via the JVM shutdown hook) — record the code, let
      // try/finally complete, exit after.
      var exitCode = 0
      try Sinks.writeTsv(runAnalysis(spark, c), c.scored,
        singleFile = c.maxResults >= 0, sep = c.delimiter)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          System.err.println(s"error: ${e.getMessage}")
          exitCode = 1
      } finally spark.stop()
      if (exitCode != 0) sys.exit(exitCode)
  }
}
