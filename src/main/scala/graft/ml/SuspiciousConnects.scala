package graft.ml

import graft.operators.{Corpus, Scoring}
import org.apache.spark.ml.{Estimator, Model => MlModel}
import org.apache.spark.ml.param.{DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** spark.ml Pipeline integration of the suspicious-connects model: an
  * Estimator/Model pair over any frame with (doc, word) columns, so the
  * anomaly scorer composes with standard MLlib pipeline stages (the
  * featurization stays DataFrame column work, as the pipelines/ modules
  * show). fit() builds the corpus and trains LDA; transform() appends
  * `score` = P(word | doc's topic mix) with uniform fallbacks.
  */
class SuspiciousConnectsEstimator(override val uid: String)
    extends Estimator[SuspiciousConnectsModel] {

  def this() = this(Identifiable.randomUID("suspconn"))

  final val docCol = new Param[String](this, "docCol", "document id column")
  final val wordCol = new Param[String](this, "wordCol", "word column")
  final val topicCount = new IntParam(this, "topicCount", "number of topics")
  final val alpha = new DoubleParam(this, "alpha", "doc concentration")
  final val maxIter = new IntParam(this, "maxIter", "LDA iterations")
  setDefault(docCol -> "doc", wordCol -> "word", topicCount -> 20,
    alpha -> 2.5, maxIter -> 10)

  def setDocCol(v: String): this.type = set(docCol, v)
  def setWordCol(v: String): this.type = set(wordCol, v)
  def setTopicCount(v: Int): this.type = set(topicCount, v)
  def setAlpha(v: Double): this.type = set(alpha, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)

  override def fit(dataset: Dataset[_]): SuspiciousConnectsModel = {
    val wc = Corpus.wordCounts(dataset.toDF(), col($(docCol)), col($(wordCol)))
    val topics = TopicModel.train(wc, $(topicCount), $(alpha),
      seed = 42L, maxIter = $(maxIter))
    val m = new SuspiciousConnectsModel(uid, topics)
    copyValues(m).setParent(this)
  }

  override def copy(extra: ParamMap): SuspiciousConnectsEstimator =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("score", DoubleType))
}

class SuspiciousConnectsModel(override val uid: String,
                              val topics: TopicModel.Model)
    extends MlModel[SuspiciousConnectsModel] with MLWritable {

  final val docCol = new Param[String](this, "docCol", "document id column")
  final val wordCol = new Param[String](this, "wordCol", "word column")
  setDefault(docCol -> "doc", wordCol -> "word")

  override def transform(dataset: Dataset[_]): DataFrame =
    Scoring.score(dataset.toDF(), col($(docCol)), col($(wordCol)), topics)

  override def copy(extra: ParamMap): SuspiciousConnectsModel =
    copyValues(new SuspiciousConnectsModel(uid, topics), extra).setParent(parent)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("score", DoubleType))

  /** Train-once-score-later across sessions: params as JSON metadata, the
    * topic model via [[TopicModel.save]] (parquet — exact doubles, so a
    * loaded model transforms bit-identically). */
  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val spark = sparkSession
      import spark.implicits._
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      Seq((uid, $(docCol), $(wordCol)))
        .toDF("uid", "doc_col", "word_col")
        .write.mode(mode).json(s"$path/metadata")
      TopicModel.save(topics, s"$path/topics")
    }
  }
}

object SuspiciousConnectsModel extends MLReadable[SuspiciousConnectsModel] {

  override def read: MLReader[SuspiciousConnectsModel] =
    new MLReader[SuspiciousConnectsModel] {
      override def load(path: String): SuspiciousConnectsModel = {
        val spark = sparkSession
        val meta = spark.read.json(s"$path/metadata").head()
        val m = new SuspiciousConnectsModel(meta.getAs[String]("uid"),
          TopicModel.load(spark, s"$path/topics"))
        m.set(m.docCol, meta.getAs[String]("doc_col"))
        m.set(m.wordCol, meta.getAs[String]("word_col"))
        m
      }
    }

  override def load(path: String): SuspiciousConnectsModel = super.load(path)
}
