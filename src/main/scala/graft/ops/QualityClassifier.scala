package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fasttext-style linear quality classifier — the model-based document
  * filter a curation pipeline runs after the heuristic gates (the CCNet
  * shape: learn "looks like the high-quality reference corpus" from weak
  * labels, keep the top of the score distribution).
  *
  * Features are hashed bag-of-words (`HashingTF` over the same whitespace
  * tokens every other TextOps operator uses — fixed `numFeatures`-dim
  * sparse vectors, no vocabulary build, no driver state), the model is
  * L-BFGS logistic regression. Training aggregates gradient partials
  * tree-wise across executors (one vector of `numFeatures` doubles per
  * partial — bounded by the feature dim, not the corpus); scoring is a
  * broadcast of one weight vector and a per-row sparse dot product, so
  * the filter runs at scan speed over 100 TB exactly like the heuristic
  * gates do.
  */
object QualityClassifier {

  final case class QualityModel(model: LogisticRegressionModel, numFeatures: Int)

  private def featurize(df: DataFrame, textCol: String, numFeatures: Int): DataFrame =
    new HashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(numFeatures)
      .transform(df.withColumn("__toks", TextOps.tokens(col(textCol))))

  /** Train on weakly labeled rows (`labelCol` ∈ {0, 1}; 1 = quality). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 30,
            regParam: Double = 1e-4): QualityModel = {
    val feats = featurize(labeled, textCol, numFeatures)
      .withColumn("__label", col(labelCol).cast("double"))
    val lr = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
    QualityModel(lr.fit(feats), numFeatures)
  }

  /** Score every row with P(quality); adds `outCol`, drops the plumbing. */
  def score(m: QualityModel, df: DataFrame, textCol: String,
            outCol: String = "quality_prob"): DataFrame = {
    val model = m.model.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setFeaturesCol("__feat").setProbabilityCol("__p")
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
    model.transform(featurize(df, textCol, m.numFeatures))
      .withColumn(outCol, vector_to_array(col("__p"))(1))
      .drop("__toks", "__feat", "__p", "__pred", "__raw")
  }

  /** The full filter: train on weak labels, keep rows scoring ≥ `cutoff`. */
  def filterByQuality(m: QualityModel, df: DataFrame, textCol: String,
                      cutoff: Double = 0.5): DataFrame =
    score(m, df, textCol).where(col("quality_prob") >= cutoff)
      .drop("quality_prob")
}
