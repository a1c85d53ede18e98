package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.graft.GraftParamsIO
import org.apache.spark.ml.param.{Param, ParamMap, DoubleParam, StringArrayParam}
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom Estimator/Model pair re-expressing the reference's
  * `PercentageCalc` sklearn transformer (SURVEY.md §2.12; ref:
  * modelling/helpers.py:7-69): at fit time learn per-group totals of the
  * feature columns; at transform time replace each feature with
  * value / (group_total / constant), computing totals on the fly for
  * groups unseen at fit (the ref's intent — its `is None` check is dead
  * code, see SURVEY.md §7.4 item 9; we implement the union-of-totals
  * semantics).
  *
  * Scale notes: fit is one hash aggregation over the group key; transform
  * is a broadcast-or-shuffle left join of learned totals plus a windowed
  * total for unseen groups — no driver-side state beyond the model's
  * (group → totals) frame, which stays a DataFrame (never collected).
  */
class PercentageCalc(override val uid: String)
    extends Estimator[PercentageCalcModel] with MLWritable {

  def this() = this(Identifiable.randomUID("pctCalc"))

  final val byGroup: Param[String] =
    new Param(this, "byGroup", "grouping column")
  final val variables: StringArrayParam =
    new StringArrayParam(this, "variables", "feature columns to normalize")
  final val constant: DoubleParam =
    new DoubleParam(this, "constant", "denominator scale (ref default 15)")

  setDefault(constant -> 15.0)

  def setByGroup(v: String): this.type = set(byGroup, v)
  def setVariables(v: Array[String]): this.type = set(variables, v)
  def setConstant(v: Double): this.type = set(constant, v)

  override def fit(dataset: Dataset[_]): PercentageCalcModel = {
    val g = $(byGroup)
    val sums = $(variables).map(v => PercentageCalc.exactSum(v).as(s"__tot_$v"))
    val totals = dataset.groupBy(col(g)).agg(sums.head, sums.tail: _*)
    val model = new PercentageCalcModel(uid, totals)
    model.set(model.byGroup, g)
    model.set(model.variables, $(variables))
    model.set(model.constant, $(constant))
    model.setParent(this)
  }

  override def copy(extra: ParamMap): PercentageCalc = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = schema

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit =
      GraftParamsIO.saveMetadata(PercentageCalc.this, path, sparkSession)
  }
}

object PercentageCalc extends MLReadable[PercentageCalc] {
  /** Group totals via exact decimal aggregation (scale 10 covers real
    * feature data): a raw double sum depends on partition/accumulation
    * order, which would make the learned totals nondeterministic across
    * cluster layouts (see graft.QueryKit). */
  private[ml] def exactSum(v: String) =
    sum(col(v).cast(org.apache.spark.sql.types.DecimalType(28, 10)))
      .cast(org.apache.spark.sql.types.DoubleType)

  override def read: MLReader[PercentageCalc] = new MLReader[PercentageCalc] {
    override def load(path: String): PercentageCalc =
      GraftParamsIO.loadAndSetParams(path, sparkSession,
        classOf[PercentageCalc].getName, uid => new PercentageCalc(uid))
  }

  override def load(path: String): PercentageCalc = super.load(path)
}

class PercentageCalcModel(
    override val uid: String,
    val totals: DataFrame) extends Model[PercentageCalcModel] with MLWritable {

  final val byGroup: Param[String] =
    new Param(this, "byGroup", "grouping column")
  final val variables: StringArrayParam =
    new StringArrayParam(this, "variables", "feature columns to normalize")
  final val constant: DoubleParam =
    new DoubleParam(this, "constant", "denominator scale")

  override def transform(dataset: Dataset[_]): DataFrame = {
    val g = $(byGroup)
    val k = $(constant)
    val df = dataset.toDF()

    // totals for groups present now but unseen at fit (ref:
    // helpers.py:53-69 — recompute and union)
    val sums = $(variables).map(v => PercentageCalc.exactSum(v).as(s"__new_$v"))
    val fresh = df.groupBy(col(g)).agg(sums.head, sums.tail: _*)
      .join(totals.select(col(g)), Seq(g), "left_anti")
      .select(col(g) +: $(variables).map(v => col(s"__new_$v").as(s"__tot_$v")): _*)
    val allTotals = totals.unionByName(fresh)

    val joined = df.join(allTotals, Seq(g), "left")
    $(variables).foldLeft(joined) { (acc, v) =>
      acc.withColumn(v, col(v) / (col(s"__tot_$v") / lit(k)))
    }.drop($(variables).map(v => s"__tot_$v"): _*)
  }

  override def copy(extra: ParamMap): PercentageCalcModel = {
    val m = new PercentageCalcModel(uid, totals)
    copyValues(m, extra).setParent(parent)
  }

  override def transformSchema(schema: StructType): StructType = schema

  /** Persistence in MLlib's standard stage layout (metadata via the
    * [[GraftParamsIO]] shim + the learned totals as parquet under
    * `totals/`), so a fitted `PipelineModel` CONTAINING this stage
    * round-trips through plain `save`/`PipelineModel.load` — K8 parity
    * for the points pipeline, whose first stage the ref pickles along
    * with the rest (modelling_2 cell 17). The totals are written by the
    * cluster as distributed parquet, not driver-collected. */
  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      GraftParamsIO.saveMetadata(PercentageCalcModel.this, path, sparkSession)
      totals.write.parquet(new Path(path, "totals").toString)
    }
  }
}

object PercentageCalcModel extends MLReadable[PercentageCalcModel] {
  override def read: MLReader[PercentageCalcModel] = new MLReader[PercentageCalcModel] {
    override def load(path: String): PercentageCalcModel = {
      val totals = sparkSession.read.parquet(new Path(path, "totals").toString)
      GraftParamsIO.loadAndSetParams(path, sparkSession,
        classOf[PercentageCalcModel].getName,
        uid => new PercentageCalcModel(uid, totals))
    }
  }

  override def load(path: String): PercentageCalcModel = super.load(path)
}
